#!/usr/bin/env python
"""Store-path vs recompute-path scaling for ingest-time semantic dedup
(round 16, VERDICT r15 #1's "Done" evidence) — writes
SCALING_SEMDEDUP_STORE.json.

The claim under test: with a FIXED incoming batch and a GROWING corpus,

- ``semantic_dedup_incremental`` (recompute shape) re-assigns the whole
  corpus per invocation, so its per-batch wall grows ~linearly with the
  corpus;
- ``semantic_dedup_incremental_from_store`` against a pre-built,
  parquet-materialized store pays only batch assignment + one streamed
  store join, so its per-batch wall should stay ~flat (the store SCAN
  grows, but scanning pre-quantized columns is a tiny constant vs
  re-running the assignment matmuls + an N-row checkpoint).

Corpora: the scaling_semdedup.py sign-flip series (contiguous ids,
copy c isometric under an independent Rademacher pattern) — reused
verbatim so the two artifacts share one fixture lineage. The fixed
batch is the registry recipe applied to the x1 corpus only (vec_id %
10 == 0, +-2%% elementwise, ids offset by 10^7 — colliding with
nothing at any K). Ground truth is therefore IDENTICAL at every K
(the batch's near-dup partners live in copy 0, present everywhere), so the
rejected counts should be NEAR-invariant across K (exact invariance is
not guaranteed: the fine seed set grows with K, and re-routing can
split a batch vector from its copy-0 partner — the SEMDEDUP_RECALL
mechanism), while store-vs-recompute count equality at every K is an
exact parity requirement.

Store build wall and on-disk size are reported separately per K: the
build is the once-per-corpus-version cost the store amortizes.

Usage: python scripts/scaling_semdedup_store.py [K ...] (default 1 4 16)
Run on a QUIET box only (BASELINE.md: 1-min loadavg < 1 at start).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hhek2sqlite_spark.operators.similarity import (  # noqa: E402
    append_to_semdedup_store,
    build_semdedup_store,
    materialize_semdedup_store,
    semantic_dedup_incremental,
    semantic_dedup_incremental_from_store,
)
from hhek2sqlite_spark.operators.util import (  # noqa: E402
    owned_result,
    release_local_checkpoints,
)
from hhek2sqlite_spark.session import get_spark  # noqa: E402
from scripts.scaling_semdedup import build_series  # noqa: E402

STRIDE = 64
COARSE_K = 16
TAU_E6 = 990_000
BATCH_OFFSET = 10_000_000
REPS = 3
SLOW_CUTOFF_SEC = 15.0


def _median_time(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _measure(fn) -> float:
    t0 = time.perf_counter()
    fn()  # warm
    warm = time.perf_counter() - t0
    return _median_time(fn, 1 if warm > SLOW_CUTOFF_SEC else REPS)


def _corpus(spark, d: str):
    return spark.read.parquet(f"{d}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )


def _fixed_batch(spark, x1_dir: str):
    """The registry injection recipe over the x1 corpus — the SAME
    batch at every K (fixed-batch protocol)."""
    base = _corpus(spark, x1_dir)
    return base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + BATCH_OFFSET).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            * (
                F.lit(1.0)
                + F.lit(0.01) * ((F.col("vec_id") + i) % 5 - 2).cast("double")
            ),
        ).alias("embedding"),
    )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    # x1 is always built: the FIXED batch derives from the x1 corpus
    dirs = build_series(sorted(set(ks) | {1}))
    spark = get_spark("hhek2sqlite_spark-scaling-semdedup-store")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
    spark.conf.set("spark.sql.files.openCostInBytes", str(16384))

    batch = _fixed_batch(spark, dirs["x1"]).localCheckpoint(eager=True)
    n_batch = batch.count()

    points: dict[str, dict] = {}
    loadavg = [round(x, 2) for x in os.getloadavg()]
    for k in ks:
        label = f"x{k}"
        d = dirs[label]
        corpus = _corpus(spark, d)

        # --- store build (once per corpus version; amortized cost) ----
        store_path = os.path.join(d, "semdedup_store.parquet")
        t0 = time.perf_counter()
        with owned_result(
            build_semdedup_store(corpus, seed_stride=STRIDE, coarse_k=COARSE_K)
        ) as st:
            st.write.mode("overwrite").parquet(store_path)
        build_sec = time.perf_counter() - t0
        store = spark.read.parquet(store_path)

        # --- per-batch walls: store path vs recompute path -------------
        def run_store():
            with owned_result(
                semantic_dedup_incremental_from_store(
                    store, batch, tau_e6=TAU_E6, coarse_k=COARSE_K
                )
            ) as out:
                out.write.format("noop").mode("overwrite").save()

        def run_recompute():
            with owned_result(
                semantic_dedup_incremental(
                    corpus,
                    batch,
                    seed_stride=STRIDE,
                    tau_e6=TAU_E6,
                    coarse_k=COARSE_K,
                )
            ) as out:
                out.write.format("noop").mode("overwrite").save()

        store_sec = _measure(run_store)
        recompute_sec = _measure(run_recompute)

        # --- parity at scale: identical admit/reject decisions ---------
        # (ADVICE r16: compare the rejected vec_id SETS, not counts —
        # a different-but-equal-sized rejected set must ABORT the chain,
        # not be quietly recorded as parity)
        out_s = semantic_dedup_incremental_from_store(
            store, batch, tau_e6=TAU_E6, coarse_k=COARSE_K
        )
        rej_ids_store = {
            r["vec_id"]
            for r in out_s.filter("admitted = 0").select("vec_id").collect()
        }
        n_store = out_s.count()
        release_local_checkpoints(out_s)
        out_r = semantic_dedup_incremental(
            corpus, batch, seed_stride=STRIDE, tau_e6=TAU_E6, coarse_k=COARSE_K
        )
        rej_ids_recompute = {
            r["vec_id"]
            for r in out_r.filter("admitted = 0").select("vec_id").collect()
        }
        release_local_checkpoints(out_r)
        assert rej_ids_store == rej_ids_recompute, (
            label,
            sorted(rej_ids_store ^ rej_ids_recompute)[:20],
        )
        rej_store = len(rej_ids_store)
        rej_recompute = len(rej_ids_recompute)

        points[label] = {
            "store_batch_sec": round(store_sec, 4),
            "recompute_batch_sec": round(recompute_sec, 4),
            "speedup": round(recompute_sec / store_sec, 2),
            "store_build_sec": round(build_sec, 4),
            "store_bytes": _dir_bytes(store_path),
            "batch_rows": n_store,
            "rejected_store": rej_store,
            "rejected_recompute": rej_recompute,
        }
        assert n_store == n_batch, (n_store, n_batch)
        print(f"{label}: {points[label]}", file=sys.stderr)

    # --- multi-batch APPEND sequence (round 17, VERDICT r16 #1) -----------
    # The steady-state production loop the append path enables: K batch
    # slices judged one after another against ONE store with ZERO rebuilds,
    # each slice's admitted rows folded in before the next arrives. Claims
    # under test: (a) per-slice wall stays FLAT across the sequence (no
    # O(corpus) term re-enters), (b) every slice's decisions are EXACTLY
    # (set-equal) the recompute reference over (corpus + previously
    # admitted), under the frozen seed fence the store metadata records.
    seq_label = f"x{ks[-1]}"
    seq_corpus = _corpus(spark, dirs[seq_label])
    n_slices = 8
    slices = [
        batch.filter((F.col("vec_id") - BATCH_OFFSET) / 10 % n_slices == i)
        .localCheckpoint(eager=True)
        for i in range(n_slices)
    ]
    seq_store_path = os.path.join(dirs[seq_label], "semdedup_store_seq.parquet")
    with owned_result(
        build_semdedup_store(
            seq_corpus,
            seed_stride=STRIDE,
            seed_max_id=BATCH_OFFSET,  # frozen fence: appended rows never seed
            coarse_k=COARSE_K,
        )
    ) as st:
        seq_store = materialize_semdedup_store(st, seq_store_path)

    seq_walls, seq_rejected, existing = [], [], seq_corpus
    for i, sl in enumerate(slices):
        t0 = time.perf_counter()
        dec, seq_store = append_to_semdedup_store(seq_store, sl, tau_e6=TAU_E6)
        rej_ids = {
            r["vec_id"]
            for r in dec.filter("admitted = 0").select("vec_id").collect()
        }
        seq_walls.append(round(time.perf_counter() - t0, 4))
        # recompute reference (NOT timed into the append wall): same fence,
        # corpus grown by previously admitted rows
        ref = semantic_dedup_incremental(
            existing,
            sl,
            seed_stride=STRIDE,
            seed_max_id=BATCH_OFFSET,
            tau_e6=TAU_E6,
            coarse_k=COARSE_K,
        )
        ref_rej = {
            r["vec_id"]
            for r in ref.filter("admitted = 0").select("vec_id").collect()
        }
        release_local_checkpoints(ref)
        assert rej_ids == ref_rej, (i, sorted(rej_ids ^ ref_rej)[:20])
        adm_ids = [r["vec_id"] for r in dec.filter("admitted = 1").select("vec_id").collect()]
        existing = existing.unionByName(sl.filter(F.col("vec_id").isin(adm_ids)))
        seq_rejected.append(len(rej_ids))
        print(
            f"seq[{i}] wall={seq_walls[-1]}s rejected={len(rej_ids)}",
            file=sys.stderr,
        )
    sequence = {
        "corpus": seq_label,
        "n_slices": n_slices,
        "fence": BATCH_OFFSET,
        "per_slice_wall_sec": seq_walls,
        "per_slice_rejected": seq_rejected,
        "wall_last_over_first": round(seq_walls[-1] / seq_walls[0], 2),
        "decisions_equal_recompute_every_slice": True,  # asserted above
        "rebuilds": 0,
    }

    first, last = f"x{ks[0]}", f"x{ks[-1]}"
    out = {
        "protocol": {
            "reps": REPS,
            "stat": "median",
            "warm_runs": 1,
            "series": "scaling_semdedup sign-flip corpora; FIXED batch "
            "(x1 injection recipe) at every K",
            "stride": STRIDE,
            "coarse_k": COARSE_K,
            "tau_e6": TAU_E6,
        },
        "loadavg_at_start": loadavg,
        "series": [f"x{k}" for k in ks],
        "n_batch": n_batch,
        "points": points,
        "store_growth": round(
            points[last]["store_batch_sec"] / points[first]["store_batch_sec"], 2
        ),
        "recompute_growth": round(
            points[last]["recompute_batch_sec"]
            / points[first]["recompute_batch_sec"],
            2,
        ),
        "rejected_invariant_across_k": len(
            {p["rejected_store"] for p in points.values()}
        )
        == 1,
        # set-equality ASSERTED per K above (ADVICE r16) — reaching this
        # line means it held everywhere
        "store_equals_recompute_everywhere": True,
        "sequence": sequence,
    }
    out_path = os.environ.get("SPARK_GRAFT_SEMDEDUP_STORE_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_SEMDEDUP_STORE.json",
    )
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
