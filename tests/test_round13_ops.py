"""Round-13 operator tests: TPC-H Q16/Q19 planner shapes and the
span-dedup tier (hand-computed values + plan contracts)."""

from __future__ import annotations

import contextlib
import io
import re

import pytest


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _scan_count(plan: str) -> int:
    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


# --- Q16 shape: part_supplier_diversity --------------------------------------


def test_part_supplier_diversity_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext

    part = spark.createDataFrame(
        [
            (1, "Brand#1", "SMALL x", 4),     # survives
            (2, "Brand#21", "SMALL y", 4),    # excluded brand
            (3, "Brand#1", "MEDIUM z", 4),    # excluded type prefix
            (4, "Brand#1", "SMALL w", 5),     # size not in list
            (5, "Brand#2", "ECONOMY a", 9),   # survives
        ],
        "p_partkey long, p_brand string, p_type string, p_size int",
    )
    supplier = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.5)],
        "s_suppkey long, s_acctbal double",
    )
    li = spark.createDataFrame(
        [(1, 1), (1, 1), (1, 2), (1, 3), (5, 1), (2, 1), (3, 1), (4, 1)],
        "l_partkey long, l_suppkey long",
    )
    tabs = {"part": part, "supplier": supplier, "lineitem": li}
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
            for r in ext.q_part_supplier_diversity(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {
        # s2 is denylisted; s1 counted once despite the duplicate pair
        ("Brand#1", "SMALL x", 4): 2,
        ("Brand#2", "ECONOMY a", 9): 1,
    }


def test_part_supplier_diversity_plan_contract(spark):
    """NOT IN must compile to a LEFT ANTI join (never a full-row
    NOT-IN null-checking nested loop: s_suppkey is non-null here),
    with exactly three scans and the part predicates pushed."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_part_supplier_diversity(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 3, plan
    assert "LeftAnti" in plan, plan
    assert "Union" not in plan, plan
    # brand/type/size predicate set reaches the part scan
    assert re.search(r"PushedFilters: \[.*p_size.*\]", plan), plan


# --- Q19 shape: disjunctive_revenue -------------------------------------------


def test_disjunctive_revenue_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext

    part = spark.createDataFrame(
        [
            (1, "Brand#12", 3),
            (2, "Brand#16", 8),
            (3, "Brand#10", 12),
            (4, "Brand#12", 20),  # size outside every arm
        ],
        "p_partkey long, p_brand string, p_size int",
    )
    li = spark.createDataFrame(
        [
            (1, 5.0, 100.0, 0.1),    # arm 1 -> 90
            (1, 15.0, 100.0, 0.0),   # qty outside arm 1, brand outside 2/3
            (2, 15.0, 200.0, 0.0),   # arm 2 -> 200
            (3, 25.0, 50.0, 0.5),    # arm 3 -> 25
            (4, 5.0, 999.0, 0.0),    # part matches no arm
        ],
        "l_partkey long, l_quantity double, l_extendedprice double, "
        "l_discount double",
    )
    tabs = {"part": part, "lineitem": li}
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        rows = ext.q_disjunctive_revenue(spark, "unused").collect()
    finally:
        ext.load_table = orig
    assert len(rows) == 1
    assert float(rows[0]["revenue"]) == pytest.approx(315.0)
    assert rows[0]["n_lines"] == 3


def test_disjunctive_revenue_plan_contract(spark):
    """Q19's planner test: the OR-of-conjunctions must stay ONE scan
    per table (no Union-of-scans), with the CNF-derivable per-side
    implications pushed into BOTH parquet scans — the l_quantity OR
    of ranges into lineitem, the (p_brand, p_size) OR into part —
    and the full disjunction riding the join as a residual."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_disjunctive_revenue(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 2, plan
    assert "Union" not in plan, plan
    # per-side OR implications reached the scans
    assert re.search(
        r"PushedFilters: \[.*Or\(.*l_quantity.*\]", plan
    ), plan
    assert re.search(r"PushedFilters: \[.*Or\(.*p_brand.*\]", plan), plan


# --- exact substring-span dedup ----------------------------------------------


def test_span_dedup_hand_computed(spark):
    from hhek2sqlite_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # spans (a b c),(b c d): both first
            (2, "x a b c d"),        # (x a b) first; (a b c),(b c d) dup
            (3, "a b c a b c a"),    # 5 spans; dups: pos1,pos4 (a b c of
                                     # doc1), pos5 (b c a of own pos2)
            (4, "too short"),        # < window -> no row
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_frac_e6"])
        for r in span_dedup(docs, window=3).collect()
    }
    assert got == {
        1: (2, 0, 0),
        2: (3, 2, 666667),
        3: (5, 3, 600000),
    }


def test_span_dedup_first_occurrence_kept_within_doc(spark):
    """A span repeated only WITHIN one document: the first position is
    kept, later ones counted — the policy must not require a second
    document."""
    from hhek2sqlite_spark.operators.dedup import span_dedup

    docs = spark.createDataFrame(
        [(7, "p q r p q r")], "doc_id long, text string"
    )
    rows = span_dedup(docs, window=3).collect()
    assert len(rows) == 1
    # spans: (p q r),(q r p),(r p q),(p q r) -> last is the only dup
    assert (rows[0]["n_spans"], rows[0]["n_dup_spans"]) == (4, 1)


def test_span_dedup_plan_contract(spark):
    """Scale contract: no Window at occurrence grain (the hot-fp skew
    hazard); the dup counting rides map-side-combined HashAggregates
    and one fp-keyed join on the per-(fp,doc) REDUCED relation."""
    import contextlib
    import io

    import hhek2sqlite_spark.plans.extensions as ext

    df = ext.q_span_dedup(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan, plan
    assert "HashAggregate" in plan, plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan, plan


# --- Q5 shape: regional_supplier_volume ---------------------------------------


def test_regional_supplier_volume_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext
    from datetime import datetime

    region = spark.createDataFrame(
        [(1, "ASIA"), (2, "EUROPE")], "r_regionkey int, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 1), (11, "CHINA", 1), (20, "FRANCE", 2)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    supplier = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 20)], "s_suppkey long, s_nationkey int"
    )
    customer = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 20), (4, 10)],
        "c_custkey long, c_nationkey int",
    )
    orders = spark.createDataFrame(
        [
            (1, 1, datetime(1996, 3, 1)),
            (2, 2, datetime(1996, 6, 1)),
            (3, 3, datetime(1996, 7, 1)),
            (4, 4, datetime(1995, 7, 1)),   # out of range
            (5, 1, datetime(1997, 2, 1)),   # out of range
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 100.0, 0.0),   # JAPAN cust, JAPAN supp -> 100
            (1, 2, 50.0, 0.0),    # JAPAN cust, CHINA supp -> cycle miss
            (2, 2, 200.0, 0.1),   # CHINA-CHINA -> 180
            (3, 1, 999.0, 0.0),   # FRANCE cust -> cycle miss
            (4, 1, 777.0, 0.0),   # order out of date range
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    )
    tabs = {
        "region": region, "nation": nation, "supplier": supplier,
        "customer": customer, "orders": orders, "lineitem": li,
    }
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            r["n_name"]: (float(r["revenue"]), r["n_lines"])
            for r in ext.q_regional_supplier_volume(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {"JAPAN": (100.0, 1), "CHINA": (180.0, 1)}


def test_regional_supplier_volume_plan_contract(spark):
    """The join CYCLE (c_nationkey = s_nationkey) must ride a join as a
    COMPOSITE hash key — never a post-join Filter — with all six scans
    present exactly once."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_regional_supplier_volume(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 6, plan
    assert re.search(
        r"keys \[2\]: \[l_suppkey#\d+L?, c_nationkey#\d+", plan
    ), plan
    assert "Union" not in plan, plan


# --- Q18 shape: large_order_customers -----------------------------------------


def test_large_order_customers_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext
    from datetime import datetime

    orders = spark.createDataFrame(
        [
            (1, 1, 1000.0, datetime(1996, 1, 2)),
            (2, 2, 500.0, datetime(1996, 2, 3)),
            (3, 2, 750.0, datetime(1996, 3, 4)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate timestamp",
    )
    customer = spark.createDataFrame(
        [(1, "Alice"), (2, "Bob")], "c_custkey long, c_name string"
    )
    li = spark.createDataFrame(
        [
            (1, 150.0), (1, 100.0),          # 250 > 200 -> kept
            (2, 60.0),                        # 60 -> dropped
            (3, 67.0), (3, 67.0), (3, 67.0),  # 201 > 200 -> kept
        ],
        "l_orderkey long, l_quantity double",
    )
    tabs = {"orders": orders, "customer": customer, "lineitem": li}
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            r["orderkey"]: (r["c_name"], r["sum_qty_c"], r["totalprice_c"],
                            r["orderdate"])
            for r in ext.q_large_order_customers(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {
        1: ("Alice", 25000, 100000, "1996-01-02"),
        3: ("Bob", 20100, 75000, "1996-03-04"),
    }


def test_large_order_customers_plan_contract(spark):
    """The per-order aggregate must reduce lineitem BEFORE any join
    (never aggregate join-widened rows): the plan's lineitem branch is
    Scan -> partial HashAggregate -> Exchange -> HashAggregate ->
    Filter, and only then the joins."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_large_order_customers(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 3, plan
    # exactly one fact exchange keyed on l_orderkey
    assert len(re.findall(r"hashpartitioning\(l_orderkey", plan)) == 1, plan
    assert "partial_sum" in plan, plan
