"""Bucketed co-located join: the one-time-shuffle layout must produce
exchange-free join plans — the scale claim is asserted on the physical
plan, same style as test_plan_contracts."""

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

from hhek2sqlite_spark.sources.bucketed import co_located_join, write_bucketed
from hhek2sqlite_spark.sources.parquet import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdemo")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{loc}'")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "bucketdemo.b_orders",
        bucket_cols=["o_orderkey"],
        buckets=8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"),
        "bucketdemo.b_lineitem",
        bucket_cols=["l_orderkey"],
        buckets=8,
        sort_cols=["l_orderkey"],
    )
    yield "bucketdemo.b_orders", "bucketdemo.b_lineitem"
    spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_co_located_join_has_no_exchange(spark, bucketed_tables):
    # hint("merge"): at test scale orders fits the broadcast threshold,
    # which would bypass bucketing entirely; at 100 TB both sides are
    # fact-sized and sort-merge is the only option — the hint makes the
    # test exercise that path
    orders_t, lineitem_t = bucketed_tables
    joined = (
        spark.table(lineitem_t)
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table(orders_t).hint("merge"), "o_orderkey")
    )
    p = _plan(joined)
    assert not re.findall(r"^\(\d+\) \w*Exchange", p, flags=re.MULTILINE), p
    assert "SortMergeJoin" in p
    assert p.count("Bucketed: true") == 2, p


def test_co_located_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    orders_t, lineitem_t = bucketed_tables
    co = (
        spark.table(lineitem_t)
        .join(
            spark.table(orders_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    plain = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {tuple(r) for r in co.collect()} == {tuple(r) for r in plain.collect()}


def test_bucketed_agg_skips_shuffle(spark, bucketed_tables):
    # aggregation keyed on the bucket column also rides the layout:
    # partial agg is already final per bucket, no exchange needed
    orders_t, _ = bucketed_tables
    agg = spark.table(orders_t).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    p = _plan(agg)
    assert not re.findall(r"^\(\d+\) \w*Exchange", p, flags=re.MULTILINE), p
    assert "Bucketed: true" in p
