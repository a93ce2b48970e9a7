"""Executor-parallel JDBC source/sink (SURVEY.md S1/S2 at cluster scale).

``sqlite_io`` is the single-FILE interchange path: a SQLite file has one
writer by design, so it streams through the driver and says so. This
module is the single-SERVER path the north star names ("DataFrame
read/write with JDBC"): ``df.write.format("jdbc")`` opens one connection
PER PARTITION on the executors, each issuing batched parameterized
INSERTs — the write scales with the cluster until the database itself
saturates, which is the correct bottleneck to end on.

The reference reaches its Jet/Access side through ODBC DSNs
(/root/reference/hhek2sqlite.go:1265-1275); the Spark-idiomatic
equivalent of "point me at a database by connection string" is exactly
this module. With the UCanAccess driver jar on the classpath the same
functions read/write an actual ``.mdb`` (url
``jdbc:ucanaccess:///path/to/file.mdb``) — that jar is not vendored
here (see README "MDB/Jet story"), so the capability is exercised in
tests against Apache Derby embedded, which ships with Spark.

Scale notes (100 TB rules):
- Writes: ``batchsize`` bounds per-round-trip rows; ``numPartitions``
  caps concurrent connections (a 1000-executor cluster must not open
  1000 connections against one database — coalesce first).
- Reads: a naive ``spark.read.jdbc(url, table)`` is ONE connection on
  ONE executor regardless of cluster size. ``read_table_jdbc`` demands
  the 4-tuple (partitionColumn, lowerBound, upperBound, numPartitions)
  for anything non-tiny so the scan fans out into range-predicate
  queries, one per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hhek2sqlite_spark.schema.registry import COPY_ORDER

_DEFAULT_BATCH = 10_000


def write_table_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "overwrite",
    batch_size: int = _DEFAULT_BATCH,
    max_connections: int | None = None,
    driver: str | None = None,
    options: dict[str, str] | None = None,
) -> None:
    """Write one table through executor-side JDBC connections.

    ``max_connections`` coalesces the DataFrame so at most that many
    partitions (= connections = concurrent INSERT streams) hit the
    target; leave None to use the DataFrame's own partitioning.
    ``mode="overwrite"`` drops/recreates the table (the S6/S7
    truncate-before-load shape; pass ``truncate`` via ``options`` to
    keep DDL), ``"append"`` adds rows.
    """
    if max_connections is not None:
        df = df.coalesce(max_connections)
    w = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if driver:
        w = w.option("driver", driver)
    for k, v in (options or {}).items():
        w = w.option(k, v)
    w.mode(mode).save()


def read_table_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    driver: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Read one table (or a ``(SELECT ...) alias`` subquery) over JDBC.

    With the partition 4-tuple given, Spark issues ``num_partitions``
    range-bounded queries in parallel — the only JDBC read shape that
    scales. Without it the read is a single connection: fine for dims,
    wrong for facts (and this function says so rather than guessing).
    """
    r = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and "
                "num_partitions (Spark fans the scan out into one "
                "range-predicate query per partition)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load()


def write_database_jdbc(
    tables: dict[str, DataFrame],
    url: str,
    *,
    mode: str = "overwrite",
    batch_size: int = _DEFAULT_BATCH,
    max_connections: int | None = None,
    driver: str | None = None,
) -> dict[str, int]:
    """Write a full hhek database in the reference's fixed copy order
    (FK parents before children, /root/reference/hhek2sqlite.go:1287-1296).
    Returns per-table row counts."""
    counts: dict[str, int] = {}
    for name in COPY_ORDER:
        if name in tables:
            # cache so the lineage runs ONCE (the write materializes it) and
            # the reported count is the same rows the write saw, even for
            # non-deterministic inputs
            df = tables[name].cache()
            try:
                write_table_jdbc(
                    df,
                    url,
                    name,
                    mode=mode,
                    batch_size=batch_size,
                    max_connections=max_connections,
                    driver=driver,
                )
                counts[name] = df.count()
            finally:
                df.unpersist()
    return counts
