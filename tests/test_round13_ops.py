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
    COMPOSITE hash key — never a post-join Filter — and the fact must
    be SEMI-filtered by the region's supplier keys before the orderkey
    exchange (r13 scaling finding: the unfiltered fact rode the big
    shuffle). The semi branch re-scans the dimension chain (9 scans,
    dimension-sized — the fact is scanned exactly once)."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_regional_supplier_volume(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 9, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "LeftSemi" in plan, plan
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


# --- Q6 shape: discount_revenue_forecast --------------------------------------


def test_discount_revenue_forecast_hand_computed(spark):
    import datetime as dt

    import hhek2sqlite_spark.plans.extensions as ext

    ts = dt.datetime
    li = spark.createDataFrame(
        [
            # in band, in discount range, qty < 24 -> 100*0.05 = 5.0
            (ts(1997, 3, 1), 0.05, 10.0, 100.0),
            # boundary discounts are INCLUSIVE -> 200*0.04 + 300*0.06
            (ts(1997, 6, 1), 0.04, 23.0, 200.0),
            (ts(1997, 6, 2), 0.06, 1.0, 300.0),
            # excluded: qty at the boundary (strict <)
            (ts(1997, 6, 3), 0.05, 24.0, 999.0),
            # excluded: discount outside the range
            (ts(1997, 6, 4), 0.07, 1.0, 999.0),
            # excluded: shipped outside the year band
            (ts(1998, 1, 1), 0.05, 1.0, 999.0),
        ],
        "l_shipdate timestamp, l_discount double, l_quantity double, "
        "l_extendedprice double",
    )
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: {"lineitem": li}[n]
        rows = ext.q_discount_revenue_forecast(spark, "unused").collect()
    finally:
        ext.load_table = orig
    assert len(rows) == 1
    # e6 units: cents * discount_e4
    assert rows[0]["forfeited_rev_e6"] == (
        100_00 * 500 + 200_00 * 400 + 300_00 * 600
    )
    assert rows[0]["n_lines"] == 3


def test_discount_revenue_forecast_plan_contract(spark):
    """Q6's planner test is pure pushdown: ONE scan, ZERO joins, all
    three range predicates reaching the parquet scan, and the read
    schema pruned to exactly the four referenced columns."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_discount_revenue_forecast(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 1, plan
    assert "Join" not in plan, plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert re.search(rf"PushedFilters: \[.*{col}.*\]", plan), plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and sorted(f.split(":")[0] for f in m.group(1).split(",")) == [
        "l_discount",
        "l_extendedprice",
        "l_quantity",
        "l_shipdate",
    ], plan


# --- Q9 shape: product_profit_by_nation ---------------------------------------


def test_product_profit_by_nation_hand_computed(spark):
    import datetime as dt

    import hhek2sqlite_spark.plans.extensions as ext

    ts = dt.datetime
    part = spark.createDataFrame(
        [(1, "red widget", 10.0), (2, "blue bolt", 99.0)],
        "p_partkey long, p_name string, p_retailprice double",
    )
    supplier = spark.createDataFrame(
        [(1, 10), (2, 20)], "s_suppkey long, s_nationkey long"
    )
    nation = spark.createDataFrame(
        [(10, "SWEDEN", 0), (20, "NORWAY", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    orders = spark.createDataFrame(
        [(100, ts(1996, 5, 1)), (200, ts(1997, 5, 1))],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            # red part, SWEDEN, 1996: rev=100*(1-0.1), cost=0.6*10*2
            (100, 1, 1, 2.0, 100.0, 0.1),
            # red part, NORWAY, 1997: rev=50, cost=0.6*10*1
            (200, 1, 2, 1.0, 50.0, 0.0),
            # non-red part: excluded entirely
            (100, 2, 1, 1.0, 999.0, 0.0),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double",
    )
    tabs = {
        "part": part,
        "supplier": supplier,
        "nation": nation,
        "orders": orders,
        "lineitem": li,
    }
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            (r["n_name"], r["order_year"]): (r["profit_e6"], r["n_lines"])
            for r in ext.q_product_profit_by_nation(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    # e6 units: rev = cents*(1e4-d_e4); cost = cents(retail)*cents(qty)*60
    assert got == {
        ("SWEDEN", 1996): (100_00 * 9000 - 10_00 * 200 * 60, 1),
        ("NORWAY", 1997): (50_00 * 10000 - 10_00 * 100 * 60, 1),
    }


def test_product_profit_by_nation_plan_contract(spark):
    """Q9's planner test: four scans; the part and supplier->nation
    attaches are BROADCAST joins; lineitem is scanned ONCE; the
    p_name substring filter reaches the part scan."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_product_profit_by_nation(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 5, plan  # li, part, supplier, nation, orders
    assert plan.count("lineitem.parquet") == 1, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert re.search(r"PushedFilters: \[.*p_name.*\]", plan), plan


# --- Q10 shape: returned_item_customers ---------------------------------------


def test_returned_item_customers_hand_computed(spark):
    import datetime as dt

    import hhek2sqlite_spark.plans.extensions as ext

    ts = dt.datetime
    orders = spark.createDataFrame(
        [
            (100, 1, ts(1996, 2, 1)),
            (200, 2, ts(1996, 3, 1)),
            (300, 1, ts(1995, 12, 31)),  # outside the quarter
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (100, "R", 100.0, 0.1),   # cust 1 -> 90
            (100, "R", 10.0, 0.0),    # cust 1 -> 10
            (100, "N", 999.0, 0.0),   # not returned
            (200, "R", 50.0, 0.5),    # cust 2 -> 25
            (300, "R", 999.0, 0.0),   # order outside quarter
        ],
        "l_orderkey long, l_returnflag string, l_extendedprice double, "
        "l_discount double",
    )
    cust = spark.createDataFrame(
        [(1, "Alice", 12.34, 10), (2, "Bob", -1.0, 20)],
        "c_custkey long, c_name string, c_acctbal double, c_nationkey long",
    )
    nation = spark.createDataFrame(
        [(10, "SWEDEN"), (20, "NORWAY")], "n_nationkey long, n_name string"
    )
    tabs = {
        "orders": orders,
        "lineitem": li,
        "customer": cust,
        "nation": nation,
    }
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            r["c_custkey"]: (
                r["c_name"],
                r["n_name"],
                r["acctbal_c"],
                r["returned_rev_e6"],
            )
            for r in ext.q_returned_item_customers(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {
        1: ("Alice", "SWEDEN", 1234, 100_00 * 9000 + 10_00 * 10000),
        2: ("Bob", "NORWAY", -100, 50_00 * 5000),
    }


def test_returned_item_customers_plan_contract(spark):
    """Q10's planner test: the top-k must compile to
    TakeOrderedAndProject (per-partition k + k-row merge, not a global
    sort) and run BEFORE the customer/nation decoration joins — the
    aggregate is keyed on bare o_custkey with no dimension columns in
    the exchange."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_returned_item_customers(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 4, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert re.search(r"PushedFilters: \[.*l_returnflag.*\]", plan), plan
    # the custkey rollup exchange carries no customer attributes
    assert len(re.findall(r"hashpartitioning\(o_custkey", plan)) == 1, plan


# --- Q14 shape: promo_revenue_share -------------------------------------------


def test_promo_revenue_share_hand_computed(spark):
    import datetime as dt

    import hhek2sqlite_spark.plans.extensions as ext

    ts = dt.datetime
    part = spark.createDataFrame(
        [(1, "PROMO"), (2, "STANDARD")], "p_partkey long, p_type string"
    )
    li = spark.createDataFrame(
        [
            (1, ts(1997, 9, 10), 100.0, 0.1),  # promo -> 90
            (2, ts(1997, 9, 20), 200.0, 0.0),  # plain -> 200
            (1, ts(1997, 10, 1), 999.0, 0.0),  # outside month
        ],
        "l_partkey long, l_shipdate timestamp, l_extendedprice double, "
        "l_discount double",
    )
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: {"part": part, "lineitem": li}[n]
        rows = ext.q_promo_revenue_share(spark, "unused").collect()
    finally:
        ext.load_table = orig
    assert len(rows) == 1
    num = 100_00 * 9000
    den = num + 200_00 * 10000
    assert rows[0]["promo_rev_e6"] == num
    assert rows[0]["total_rev_e6"] == den
    import math

    assert rows[0]["promo_share_e6"] == math.floor(1e6 * num / den + 0.5)


def test_promo_revenue_share_plan_contract(spark):
    """Q14's planner test: two scans, the part flag attaches by
    BROADCAST hash join (zero exchanges on the fact before the one-row
    reduce), numerator and denominator in the SAME aggregate (no
    second lineitem scan), ship-month pushed."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_promo_revenue_share(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 2, plan
    assert plan.count("lineitem.parquet") == 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert re.search(r"PushedFilters: \[.*l_shipdate.*\]", plan), plan


# --- rare-token (hapax) share --------------------------------------------------


def test_rare_token_share_hand_computed(spark):
    from hhek2sqlite_spark.operators.text import rare_token_share

    docs = spark.createDataFrame(
        [(1, "a a b e e"), (2, "a c"), (3, "d")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_rare"], r["rare_share_e6"])
        for r in rare_token_share(docs, max_count=2).collect()
    }
    # corpus counts: a=3 (never rare), b=1, e=2, c=1, d=1 (all rare);
    # occurrences weight the share (doc 1 counts BOTH e's)
    assert got == {
        1: (5, 3, 600000),
        2: (2, 1, 500000),
        3: (1, 1, 1000000),
    }


def test_rare_token_share_plan_contract(spark):
    """The shared (doc, token) relation must be materialized ONCE: the
    final plan reads the checkpointed RDD on both join sides — zero
    parquet scans and zero Generate (explode) nodes downstream."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(ext.q_rare_token_share(spark, "/root/testdata/sf0.001"))
    assert _scan_count(plan) == 0, plan
    assert "Generate" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_rare_token_share_matches_pure_python_reference(spark):
    """Deterministic randomized corpus vs an independent pure-Python
    reference (Counter-based): exact equality on every doc, plus the
    global invariant sum(n_rare) == total occurrences of rare types."""
    import random
    from collections import Counter

    from hhek2sqlite_spark.operators.text import rare_token_share

    rng = random.Random(1313)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(40):
        words = [rng.choice(vocab) for _ in range(rng.randint(1, 15))]
        if d % 4 == 0:
            words.append(f"unique{d}")  # guaranteed hapax
        docs.append((d, " ".join(words)))

    corpus = Counter(w for _, t in docs for w in t.split())
    expect = {}
    for d, t in docs:
        ws = t.split()
        n_rare = sum(1 for w in ws if corpus[w] <= 2)
        import math

        expect[d] = (
            len(ws),
            n_rare,
            math.floor(1e6 * n_rare / len(ws) + 0.5),
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_rare"], r["rare_share_e6"])
        for r in rare_token_share(df, max_count=2).collect()
    }
    assert got == expect
    rare_total = sum(c for c in corpus.values() if c <= 2)
    assert sum(v[1] for v in got.values()) == rare_total
