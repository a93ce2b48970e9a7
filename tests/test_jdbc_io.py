"""Executor-parallel JDBC sink/source against Apache Derby embedded
(ships with Spark — no network, same JVM, real JDBC protocol).

This is the capability test for sources/jdbc_io.py: writes open one
connection per partition on the executor side (nothing funnels through
toLocalIterator), reads fan out into range-predicate queries when the
partition 4-tuple is given.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hhek2sqlite_spark.sources.jdbc_io import read_table_jdbc, write_table_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_available() -> bool:
    try:
        import glob
        import os

        import pyspark

        return bool(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar")))
    except Exception:  # pragma: no cover
        return False


pytestmark = pytest.mark.skipif(
    not _derby_available(), reason="Derby JDBC driver not on Spark classpath"
)


@pytest.fixture
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/jdbcdb;create=true"


def test_jdbc_roundtrip_parallel_write(spark, derby_url):
    """Write 4 partitions (4 executor-side connections), read back with a
    4-way partitioned scan, and require exact set equality including
    NULLs, non-ASCII text and decimals."""
    df = (
        spark.range(0, 1000, 1, 4)
        .select(
            F.col("id").cast("bigint").alias("k"),
            F.when(F.col("id") % 7 == 0, None)
            .otherwise(F.concat(F.lit("räksmörgås-"), F.col("id")))
            .alias("txt"),
            (F.col("id").cast("decimal(19,4)") / F.lit(7).cast("decimal(19,4)"))
            .cast("decimal(19,4)")
            .alias("amount"),
        )
    )
    write_table_jdbc(df, derby_url, "t_roundtrip", driver=DERBY_DRIVER, batch_size=100)

    back = read_table_jdbc(
        spark,
        derby_url,
        "t_roundtrip",
        driver=DERBY_DRIVER,
        partition_column="k",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=4,
    )
    assert back.rdd.getNumPartitions() == 4  # scan actually fanned out
    a = df.select("k", "txt", F.col("amount").cast("decimal(19,4)"))
    b = back.select("k", "txt", F.col("amount").cast("decimal(19,4)"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_jdbc_append_and_overwrite_modes(spark, derby_url):
    df = spark.range(5).select(F.col("id").alias("k"))
    write_table_jdbc(df, derby_url, "t_modes", driver=DERBY_DRIVER)
    write_table_jdbc(df, derby_url, "t_modes", mode="append", driver=DERBY_DRIVER)
    n = read_table_jdbc(spark, derby_url, "t_modes", driver=DERBY_DRIVER).count()
    assert n == 10
    write_table_jdbc(df, derby_url, "t_modes", mode="overwrite", driver=DERBY_DRIVER)
    n = read_table_jdbc(spark, derby_url, "t_modes", driver=DERBY_DRIVER).count()
    assert n == 5


def test_jdbc_read_partition_tuple_enforced(spark, derby_url):
    df = spark.range(3).select(F.col("id").alias("k"))
    write_table_jdbc(df, derby_url, "t_enforce", driver=DERBY_DRIVER)
    with pytest.raises(ValueError, match="num_partitions"):
        read_table_jdbc(
            spark, derby_url, "t_enforce", driver=DERBY_DRIVER, partition_column="k"
        )


def test_jdbc_max_connections_caps_write_parallelism(spark, derby_url):
    """max_connections coalesces before the write — the knob that stops a
    wide cluster from opening one connection per task against a single
    database."""
    df = spark.range(0, 100, 1, 32).select(F.col("id").alias("k"))
    write_table_jdbc(
        df, derby_url, "t_capped", driver=DERBY_DRIVER, max_connections=2
    )
    n = read_table_jdbc(spark, derby_url, "t_capped", driver=DERBY_DRIVER).count()
    assert n == 100
