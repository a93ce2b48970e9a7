"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas
iterators (``mapInPandas``).

The decode step itself (JPEG -> pixels, wav -> samples) needs libraries
not present in this container, so it is STUBBED: ``decoder='stub'``
raises NotImplementedError at evaluation time, ``decoder='fake'`` runs a
deterministic byte-level feature extractor through the exact same Spark
plumbing — schema, partitioning, Arrow batch shape are all real and
tested; only the codec is fake.

Scale notes: binary payloads ride in the same parquet row groups as
their metadata (no small-file problem, no side channel); mapInPandas
streams Arrow batches so peak memory is one batch per core, not one
table; all metadata predicates (byte_len, content hash) are native
column expressions evaluated *before* any Python stage, so pruning and
pushdown still happen on the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def with_binary_payload(documents: DataFrame) -> DataFrame:
    """Simulate a multimodal table from ``documents``: the utf-8 bytes of
    ``text`` stand in for an image/audio payload, with typed metadata
    columns the way a real ingest would record them."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.length(payload).alias("byte_len"),
        F.sha2(payload, 256).alias("content_sha256"),
        F.lit("text/plain").alias("media_type"),
    )


def binary_metadata(documents: DataFrame) -> DataFrame:
    """Metadata-only projection (no Python, no payload materialization
    beyond the hash): the query-layer face of a multimodal table."""
    return with_binary_payload(documents).select("doc_id", "byte_len", "content_sha256")


# features ride as DOUBLE, not FLOAT: f0 carries n_bytes, and float32 is
# only integer-exact to 2^24 — a >16 MiB payload would round while the
# DuckDB oracle stays exact. double is integer-exact to 2^53.
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level 'decoder': 8 features derived from the
    payload (length, first/last bytes, simple moments). Stands in for a
    real image/audio decode with the same batch shape."""
    feats = []
    for b in pdf["payload"]:
        data = bytes(b or b"")
        n = len(data)
        head = data[0] if n else 0
        tail = data[-1] if n else 0
        s = sum(data[:256])
        feats.append(
            [
                float(n),
                float(head),
                float(tail),
                float(s % 997),
                float(n % 256),
                float((head + tail) % 256),
                float(s % 256),
                float(min(n, 255)),
            ]
        )
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": [len(bytes(b or b"")) for b in pdf["payload"]],
            "features": feats,
        }
    )


def decode_features(multimodal: DataFrame, *, decoder: str = "stub") -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    decoder='stub'  -> NotImplementedError at evaluation (real codecs not
                       in this container; plug pillow/librosa here).
    decoder='fake'  -> deterministic byte-level features, same plumbing.
    """

    if decoder == "stub":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this container; use decoder='fake' for the plumbing path"
            )
            yield  # pragma: no cover

    elif decoder == "fake":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _fake_decode_batch(pdf)

    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    return multimodal.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("pixels", BinaryType()),
    ]
)


def resize_images(
    multimodal: DataFrame, *, width: int = 8, height: int = 8, decoder: str = "stub"
) -> DataFrame:
    """Decode-and-resize plumbing: one output row per input, pixels as a
    w*h grayscale byte buffer. decoder='stub' raises (pillow not in this
    container — plug Image.open(...).resize((w,h)) there); 'fake'
    nearest-neighbor-samples the raw payload bytes to w*h
    deterministically, exercising the identical batch shape."""

    if decoder == "stub":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "image decode requires pillow; use decoder='fake' for the "
                "plumbing path"
            )
            yield  # pragma: no cover

    elif decoder == "fake":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            n_out = width * height
            for pdf in batches:
                out = []
                for b in pdf["payload"]:
                    data = bytes(b or b"")
                    if not data:
                        out.append(bytes(n_out))
                        continue
                    # nearest-neighbor byte sampling = a real resize's
                    # access pattern without a codec
                    step = len(data) / n_out
                    out.append(bytes(data[int(i * step) % len(data)] for i in range(n_out)))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "width": width,
                        "height": height,
                        "pixels": out,
                    }
                )

    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    return multimodal.select("doc_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    multimodal: DataFrame,
    *,
    frame_bytes: int = 64,
    every_nth: int = 4,
    decoder: str = "stub",
) -> DataFrame:
    """Frame-sampling plumbing: one-to-MANY mapInPandas fan-out (each
    payload yields every_nth-th fixed-width 'frame'). The fan-out-inside-
    Arrow-batches shape is what a real video sampler produces; only the
    container parsing is stubbed/faked."""

    if decoder == "stub":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "video demux requires av/ffmpeg; use decoder='fake' for the "
                "plumbing path"
            )
            yield  # pragma: no cover

    elif decoder == "fake":

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, idxs, frames = [], [], []
                for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                    data = bytes(b or b"")
                    n_frames = len(data) // frame_bytes
                    for k in range(0, n_frames, every_nth):
                        ids.append(doc_id)
                        idxs.append(k)
                        frames.append(data[k * frame_bytes : (k + 1) * frame_bytes])
                yield pd.DataFrame(
                    {"doc_id": ids, "frame_idx": idxs, "frame": frames}
                )

    else:
        raise ValueError(f"unknown decoder {decoder!r}")

    return multimodal.select("doc_id", "payload").mapInPandas(run, FRAME_SCHEMA)
