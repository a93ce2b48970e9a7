"""Round-8 fixes, each pinned by a regression test:

- _avi_parse raises the documented ValueError (never struct.error) on
  truncated avih/strf chunks clamped by the walker (ADVICE r7).
- _avi_frame_chunks validates the strf header, so a COMPRESSED AVI is
  rejected/skipped instead of silently yielding codec bitstream bytes
  as 'frames' (ADVICE r7).
- tfidf_topk value parity across the round-8 skew-safe df rewrite
  (plan shape is asserted in test_plan_contracts.py).
"""

from __future__ import annotations

import struct

import pytest

from hhek2sqlite_spark.operators import multimodal as mm


def _frames():
    # 2 frames, 3x2, distinct channel values
    return [
        [[(f * 50 + y * 10 + x, x, y) for x in range(3)] for y in range(2)]
        for f in range(2)
    ]


def test_avi_decode_truncated_avih_raises_valueerror_not_struct_error():
    # avih chunk declares 56 bytes but the buffer ends 4 bytes into the
    # payload — the walker clamps, and the decoder must raise the
    # documented ValueError, not struct.error
    blob = (
        b"RIFF" + struct.pack("<I", 100) + b"AVI "
        + b"avih" + struct.pack("<I", 56) + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="truncated avih"):
        mm.avi_decode(blob)


def test_avi_decode_truncated_strf_raises_valueerror_not_struct_error():
    # full avih, then an strf clamped to 8 of its 20+ header bytes
    avih = b"avih" + struct.pack("<I", 56) + b"\x00" * 32 + struct.pack(
        "<II", 3, 2
    ) + b"\x00" * 16
    strf = b"strf" + struct.pack("<I", 40) + b"\x00" * 8
    blob = b"RIFF" + struct.pack("<I", 8 + len(avih) + len(strf)) + b"AVI " + avih + strf
    with pytest.raises(ValueError, match="truncated strf"):
        mm.avi_decode(blob)


def _compressed_avi() -> bytes:
    """avi_encode output with the strf biCompression field patched to
    MJPG — a compressed stream whose frame chunks are codec bitstream
    bytes, not DIBs."""
    data = bytearray(mm.avi_encode(_frames()))
    i = data.index(b"strf")
    # BITMAPINFOHEADER: biCompression is bytes 16..20 of the payload
    data[i + 8 + 16 : i + 8 + 20] = b"MJPG"
    return bytes(data)


def test_avi_frame_chunks_rejects_compressed_stream():
    with pytest.raises(ValueError, match="unsupported AVI"):
        mm._avi_frame_chunks(_compressed_avi())


def test_sample_frames_avi_skips_compressed_payloads(spark):
    docs = spark.range(0, 2).withColumnRenamed("id", "doc_id")
    videos = mm.synthesize_videos(docs)
    mixed = videos.union(
        spark.createDataFrame([(200, _compressed_avi())], videos.schema)
    )
    got = mm.sample_frames(mixed, every_nth=2, decoder="avi").collect()
    assert {r.doc_id for r in got} == {0, 1}


def test_avi_frame_chunks_still_demuxes_uncompressed():
    fr = _frames()
    chunks = mm._avi_frame_chunks(mm.avi_encode(fr))
    assert len(chunks) == len(fr)


def test_tfidf_topk_join_form_matches_window_form(spark):
    """The round-8 skew-safe df (groupBy + join-back over persisted tf)
    must be value-identical to the retired token-window form."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hhek2sqlite_spark.operators.text import tfidf_topk, tokens

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma delta delta delta"),
            (2, "alpha alpha beta epsilon"),
            (3, "gamma gamma epsilon zeta zeta zeta zeta"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.token): (r.tf, r.df, r.score_e6, r.rank)
        for r in tfidf_topk(docs, k=3, min_len=4).collect()
    }
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token")).filter(
        F.length("token") >= 4
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.select(
        "doc_id",
        "token",
        "tf",
        F.count(F.lit(1)).over(Window.partitionBy("token")).alias("df"),
    ).select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.round(F.lit(1000000.0) * F.col("tf") / F.col("df"))
        .cast("long")
        .alias("score_e6"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_e6").desc(), F.col("token").asc()
    )
    want = {
        (r.doc_id, r.token): (r.tf, r.df, r.score_e6, r.rank)
        for r in scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .collect()
    }
    assert got == want
