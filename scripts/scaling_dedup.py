#!/usr/bin/env python
"""Dedicated scaling curve for the near-dup cluster tier
(``dedup_keep_best``, ``minhash_clusters``) — writes SCALING_DEDUP.json.

Why not scripts/scaling_curve.py's series: make_scaled's text copies
differ from their originals by a one-token suffix, so the K copies of
every document sit at shingle-Jaccard ~0.97 — one mutual near-dup
clique per original, candidate pairs and cluster sizes growing as K².
That is the replication artifact, not either engine (the same reason
the pair generators are excluded there).

This script builds a series whose cluster structure is EXACTLY
replicated per copy instead: copy c applies a deterministic character
SUBSTITUTION CIPHER (letters rotated by 7c mod 26, digits by 3c mod
10). A character bijection maps every 8-char shingle set bijectively,
so within-copy Jaccard — and therefore the MinHash clustering and the
keep-best choice — is preserved EXACTLY (n_chars is also unchanged, so
the keep-policy's quality ordering is identical). Across copies the
ciphered shingle alphabets are disjoint for any shingle containing a
letter or digit, so cross-copy similarity collapses to ~0 and true
pairs grow exactly linearly: K * (pairs at x1) — verified by the
oracle row counts this script records.

Usage: python scripts/scaling_dedup.py [K ...]      (default: 1 2 4 8)
Builds testdata_scaled_dedup/x{K}/documents.parquet from
/root/testdata/sf0.1, measures Spark vs the DuckDB oracle (median of
3, 1 warm rep — scaling_curve.py's protocol), writes SCALING_DEDUP.json.

Run on a QUIET box only (BASELINE.md: 15-min loadavg < 1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.compute as pc  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from hhek2sqlite_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from hhek2sqlite_spark.session import get_spark  # noqa: E402

NAMES = ("dedup_keep_best", "minhash_clusters")
SRC = "/root/testdata/sf0.1/documents.parquet"
DST_ROOT = "testdata_scaled_dedup"
ID_SHIFT = 10**7
REPS = 3
SLOW_CUTOFF_SEC = 15.0

# r13 (x16/x32 points): the single-node oracle's recursive closure grew
# 19.9s -> 385s over x1..x8 at r12 — extrapolated x32 is hours. A point
# where the oracle blows its budget IS the measurement (the single-node
# blowup the curve exists to show), so the oracle gets ONE run under an
# interrupt timer; a fired timer records oracle_sec=null with the
# budget as the recorded floor.
ORACLE_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_ORACLE_BUDGET", "900"))

_LOWER = "abcdefghijklmnopqrstuvwxyz"
_UPPER = _LOWER.upper()
_DIGIT = "0123456789"


def _cipher(c: int) -> dict[int, str] | None:
    """Per-copy substitution cipher (None for copy 0 = identity)."""
    if c == 0:
        return None
    rl = 7 * c % 26
    rd = 3 * c % 10
    table = {}
    for i, ch in enumerate(_LOWER):
        table[ord(ch)] = _LOWER[(i + rl) % 26]
    for i, ch in enumerate(_UPPER):
        table[ord(ch)] = _UPPER[(i + rl) % 26]
    for i, ch in enumerate(_DIGIT):
        table[ord(ch)] = _DIGIT[(i + rd) % 10]
    return table


def _copy(base: pa.Table, c: int) -> pa.Table:
    cols = {}
    cipher = _cipher(c)
    for field in base.schema:
        col = base[field.name]
        if field.name == "doc_id":
            col = pc.add(col, c * ID_SHIFT)
        elif field.name == "text" and cipher is not None:
            col = pa.array(
                (None if t is None else t.translate(cipher))
                for t in col.to_pylist()
            )
        cols[field.name] = col
    return pa.table(cols)


def _measure(fn) -> float:
    t0 = time.perf_counter()
    fn()
    warm = time.perf_counter() - t0
    if warm > SLOW_CUTOFF_SEC:
        return warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def _oracle_measure(con, fn) -> float | None:
    """One budget-guarded run first; median-of-REPS only when the
    oracle is fast enough that the reps carry no budget risk. Returns
    None when the interrupt timer fired (wall >= ORACLE_BUDGET_SEC)."""
    import threading

    timer = threading.Timer(ORACLE_BUDGET_SEC, con.interrupt)
    timer.start()
    t0 = time.perf_counter()
    try:
        fn()
    except duckdb.Error:
        return None
    finally:
        timer.cancel()
    warm = time.perf_counter() - t0
    if warm > SLOW_CUTOFF_SEC:
        return warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = pq.read_table(SRC)
    spark = get_spark("hhek2sqlite_spark-scaling-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    # untimed session warmup: the FIRST heavy query in a fresh session
    # pays JVM/codegen/shuffle warmup (measured: 18.2s warm vs ~6s
    # steady for dedup_keep_best) and the >SLOW_CUTOFF single-rep path
    # would record that sample; burn the warmup on an untimed run
    QUERIES[NAMES[0]](spark, os.path.dirname(SRC)).write.format(
        "noop"
    ).mode("overwrite").save()
    results: dict = {
        "protocol": {"reps": REPS, "stat": "median", "warm_runs": 1},
        "series": [f"x{k}" for k in ks],
        "queries": {n: {} for n in NAMES},
    }
    for k in ks:
        d = os.path.join(root, DST_ROOT, f"x{k}")
        os.makedirs(d, exist_ok=True)
        out = pa.concat_tables([_copy(base, c) for c in range(k)])
        pq.write_table(out, os.path.join(d, "documents.parquet"))
        con = duckdb.connect()
        con.execute(f"SET threads={os.cpu_count()}")
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM read_parquet("
            f"'{os.path.join(d, 'documents.parquet')}')"
        )
        for name in NAMES:
            fn = QUERIES[name]
            spark_sec = _measure(
                lambda: fn(spark, d).write.format("noop").mode("overwrite").save()
            )
            rows_box = {}

            def _oracle():
                rows_box["n"] = len(con.execute(ORACLE_SQL[name]).fetchall())

            oracle_sec = _oracle_measure(con, _oracle)
            rec = {
                "spark_sec": round(spark_sec, 4),
                "oracle_sec": (
                    round(oracle_sec, 4) if oracle_sec is not None else None
                ),
            }
            if oracle_sec is not None:
                rec["ratio_raw"] = round(spark_sec / oracle_sec, 2)
                rec["oracle_rows"] = rows_box["n"]
            else:
                rec["oracle_budget_exceeded_sec"] = ORACLE_BUDGET_SEC
                rec["ratio_upper_bound"] = round(
                    spark_sec / ORACLE_BUDGET_SEC, 4
                )
            results["queries"][name][f"x{k}"] = rec
            print(f"x{k} {name}: {results['queries'][name][f'x{k}']}",
                  file=sys.stderr)
        con.close()
    first, last = f"x{ks[0]}", f"x{ks[-1]}"
    slopes = {}
    for name, pts in results["queries"].items():
        if first not in pts or last not in pts:
            continue
        # oracle growth uses the LAST point the oracle finished within
        # budget; a budget-exceeded tail point is recorded as a floor
        last_orc = None
        for k in ks:
            key = f"x{k}"
            if key in pts and pts[key].get("oracle_sec") is not None:
                last_orc = key
        entry = {
            "spark_growth": round(
                pts[last]["spark_sec"] / pts[first]["spark_sec"], 2
            ),
            "ratio_first": pts[first].get("ratio_raw"),
        }
        if last_orc is not None:
            entry["oracle_growth_through"] = last_orc
            entry["oracle_growth"] = round(
                pts[last_orc]["oracle_sec"] / pts[first]["oracle_sec"], 2
            )
            entry["ratio_last_measured"] = pts[last_orc].get("ratio_raw")
            entry["rows_growth"] = round(
                pts[last_orc]["oracle_rows"]
                / max(1, pts[first]["oracle_rows"]),
                2,
            )
        if pts[last].get("oracle_sec") is None:
            entry["oracle_exceeded_budget_at"] = last
            entry["ratio_upper_bound_at_last"] = pts[last].get(
                "ratio_upper_bound"
            )
        else:
            entry["ratio_last"] = pts[last].get("ratio_raw")
        slopes[name] = entry
    results["slopes"] = slopes
    with open(os.path.join(root, "SCALING_DEDUP.json"), "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(json.dumps({"series": results["series"], "slopes": slopes}))
    spark.stop()


if __name__ == "__main__":
    main()
