"""Parquet sources for the driver's synthetic tables (TESTDATA.md).

Scale notes: ``spark.read.parquet`` gives vectorized columnar scans with
predicate pushdown + column pruning for free — every query in ``plans/``
is written so its filters and projections reach the scan (verify with
``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``). At
100 TB the same call reads a partitioned directory tree; nothing here
assumes single-file inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver's fixture tables (TESTDATA.md). Order mirrors dependency-ish
# order the way the reference fixes its ten-table copy order
# (/root/reference/hhek2sqlite.go:1287-1296).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Session-scoped parquet SCHEMA cache (round 18, guide §5 — the driver
# should do almost no data work): a schema-less ``spark.read.parquet``
# runs a 1-task footer-inference JOB at every DataFrame construction,
# which the bench pays once per table per query per rep — pure serial
# driver latency (~0.05-0.1s each) that a production deployment never
# pays because the metastore/catalog supplies the schema. Caching the
# inferred StructType per path is the metastore equivalent: METADATA
# only, in-process only (dies with the interpreter), and every query
# still computes its RESULT from the parquet bytes on every run.
_SCHEMA_CACHE: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = _SCHEMA_CACHE.get(path)
    if schema is None:
        schema = spark.read.parquet(path).schema  # one footer job per path
        _SCHEMA_CACHE[path] = schema
    df = spark.read.schema(schema).parquet(path)
    if name == "events":
        df = _normalize_events(df)
    return df


def _normalize_events(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a canonical ``TIMESTAMP`` regardless of
    how the driver wrote the fixture. Known layouts:

    - parquet TIMESTAMP(NANOS) read as a raw nanosecond long (under
      ``spark.sql.legacy.parquet.nanosAsLong``): integer-DIV to micros
      (epoch nanos overflow double's 53-bit mantissa, so float division
      would drift by microseconds);
    - parquet ``timestamp[us]`` with no UTC annotation, read by Spark as
      ``TIMESTAMP_NTZ``: cast to ``TIMESTAMP`` — the session TZ is pinned
      UTC on every build path, so epoch values are unchanged and DuckDB's
      ``epoch_us(ts)`` oracles keep matching;
    - already ``TIMESTAMP``: pass through.

    Anything else raises so a driver-side fixture refresh fails loudly at
    load instead of deep inside a window expression.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(dt, TimestampNTZType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    elif isinstance(dt, TimestampType):
        pass
    else:
        raise TypeError(
            f"events.ts has unrecognized type {dt}; expected raw nanos LONG, "
            "TIMESTAMP_NTZ, or TIMESTAMP — fixture layout drifted, update "
            "_normalize_events"
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
