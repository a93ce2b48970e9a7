"""Local emulation of the driver's correctness gate: run a Spark query and
its DuckDB oracle SQL side-by-side on the same parquet tables and compare
row count + column names + order-insensitive values (exactly -- the driver
hashes values, so "close" is not good enough).

Normalization mirrors an order-insensitive value hash: columns sorted by
name, rows sorted by all columns, every value rendered to a canonical
string (decimals exact, floats via repr, timestamps ISO).

The rendering is deliberately REPR-STRICT — ``Decimal('2494.00')``,
``2494.0`` (float64) and ``2494`` (int64) are three DIFFERENT canonical
strings. Round 1 proved the driver's hash distinguishes exactly these
(25 hash-FAILs with verified-identical values, CORRECTNESS_r01), while
the old local gate normalized them away (trailing-zero stripping), so
pytest was green while the driver was red. Local green must imply driver
green: no numeric normalization happens here. Query plans are therefore
required to emit hash-stable boundary types — BIGINT for counts/integer
sums and DOUBLE for money (exact-decimal math internally, one final
cast) — on BOTH the Spark and the oracle side.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd

from hhek2sqlite_spark.sources.parquet import TABLES


@dataclass
class ParityResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    problems: list[str] = field(default_factory=list)

    def __str__(self) -> str:  # pragma: no cover - debugging aid
        status = "OK " if self.ok else "FAIL"
        msg = f"[{status}] {self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"
        for p in self.problems:
            msg += f"\n    - {p}"
        return msg


def _canon_value(v) -> str:
    import numpy as np

    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "<NULL>"
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, float):  # covers np.float64/np.float32
        # shortest-roundtrip repr: bit-identical float64 on both sides
        # canonicalizes identically; anything else is a real mismatch
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # exact, trailing zeros KEPT: Decimal('2494.00') != float 2494.0
        # by design — the driver's hash sees the same difference
        return format(v, "f")
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _col_kind(col: pd.Series) -> str:
    """Physical kind of a column: numpy kind letter, except object columns
    are classified by their first non-null value (decimal/str/bytes/...)
    so Spark's Decimal-as-object is distinguishable from real strings."""
    kind = col.dtype.kind
    if kind != "O":
        return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}.get(kind, kind)
    for v in col:
        if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        if isinstance(v, bytes):
            return "bytes"
        return type(v).__name__
    return "all-null"


def _canon_frame(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort()
    return rows


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    problems: list[str] = []
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return ParityResult(name, False, len(spark_pdf), len(oracle_pdf), problems)
    if len(spark_pdf) != len(oracle_pdf):
        problems.append("row count mismatch")
    # dtype-kind guard: a Decimal (object) column vs a float64 column can
    # render identically when no value has a trailing-zero digit — green
    # by luck, red at the driver. Compare the physical column kinds too.
    for c in sorted(spark_pdf.columns):
        sk, ok = _col_kind(spark_pdf[c]), _col_kind(oracle_pdf[c])
        if sk != ok:
            problems.append(f"dtype-kind mismatch on {c!r}: spark={sk} oracle={ok}")
    s_rows = _canon_frame(spark_pdf)
    o_rows = _canon_frame(oracle_pdf)
    if s_rows != o_rows:
        shown = 0
        for i, (a, b) in enumerate(zip(s_rows, o_rows)):
            if a != b:
                problems.append(f"row {i}: spark={a} oracle={b}")
                shown += 1
                if shown >= 5:
                    break
        if len(s_rows) != len(o_rows):
            problems.append(f"row canon lengths differ: {len(s_rows)} vs {len(o_rows)}")
        if not problems:
            problems.append("value mismatch (rows differ but no pairwise diff?)")
    return ParityResult(name, not problems, len(spark_pdf), len(oracle_pdf), problems)


def run_parity(spark, name: str, query_fn, oracle_sql: str, sf_dir: str) -> ParityResult:
    from hhek2sqlite_spark.operators.util import release_local_checkpoints

    df = query_fn(spark, sf_dir)
    spark_pdf = df.toPandas()
    # free localCheckpoint block sets deterministically — a full-registry
    # sweep in one session must not pool orphaned checkpoint blocks
    # while waiting on the (nondeterministic) ContextCleaner
    release_local_checkpoints(df)
    oracle_pdf = run_oracle(oracle_sql, sf_dir)
    return compare_frames(name, spark_pdf, oracle_pdf)
