"""Round-12 tests: hand-computed values for the Q4/Q20 planner shapes
and budget_variance, grouped_ols degenerate-group / negative-rounding
behavior (ADVICE r11), and the meta-test keeping the UCanAccess
jar-keyed proof warm (VERDICT r11 task 3)."""

from __future__ import annotations

from datetime import datetime

import pytest

from pyspark.sql import functions as F


# --- grouped_ols edge semantics (ADVICE r11) ---------------------------------


def _ols_on(spark, rows):
    """Run the grouped_ols plan body on an in-memory events relation."""
    import hhek2sqlite_spark.plans.extensions as ext

    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, _n: df
        return {
            r["event_type"]: r.asDict()
            for r in ext.q_grouped_ols(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig


def test_grouped_ols_degenerate_groups_dropped(spark):
    """n == 1 and all-same-day groups have den == 0 and must be absent
    (not NaN-cast-to-0) — the oracle's CAST(NaN) would raise."""
    rows = [
        ("single", datetime(2024, 1, 5), 10.0),
        ("oneday", datetime(2024, 1, 3, 1), 10.0),
        ("oneday", datetime(2024, 1, 3, 2), 20.0),
        ("ok", datetime(2024, 1, 1), 1.0),
        ("ok", datetime(2024, 1, 2), 2.0),
    ]
    got = _ols_on(spark, rows)
    assert set(got) == {"ok"}
    assert got["ok"]["slope_e6"] == 100 * 1_000_000  # +1.00 dollar/day in cents


def test_grouped_ols_negative_slope_hand_computed(spark):
    """Descending series: slope must be exactly -150 cents/day and the
    floor(x+0.5) convention must hold on the negative axis."""
    rows = [
        ("down", datetime(2024, 1, 1), 4.0),
        ("down", datetime(2024, 1, 2), 2.5),
        ("down", datetime(2024, 1, 3), 1.0),
    ]
    got = _ols_on(spark, rows)
    # x = 0,1,2 ; y = 400,250,100 cents -> slope = -150, intercept = 400
    assert got["down"]["slope_e6"] == -150 * 1_000_000
    assert got["down"]["intercept_cents"] == 400


def test_grouped_ols_negative_half_boundary_floors_up(spark):
    """Exact -0.5 slope boundary in e6: floor(-x.5 + 0.5) rounds toward
    +inf (matching the oracle's FLOOR(x+0.5)), NOT away from zero.
    Series y = 0, -1 cents over x = 0,1 day: slope = -1 cent/day
    = -1_000_000 e6 exactly; the half-boundary case needs a non-integer
    slope, so use x = 0,2 days with y = 0,-1: slope = -0.5 cents/day ->
    e6 = -500000 exactly (representable); the ROUNDING path is exercised
    by intercept: y = 1,0,0 over x=0,1,2 -> slope=-0.5, intercept =
    (1 - (-0.5)*1) ... hand-check below."""
    rows = [
        ("b", datetime(2024, 1, 1), 0.01),
        ("b", datetime(2024, 1, 2), 0.0),
        ("b", datetime(2024, 1, 3), 0.0),
    ]
    got = _ols_on(spark, rows)
    # x=0,1,2 y=1,0,0: n=3 sx=3 sy=1 sxy=0 sxx=5 -> den=6, num=-3
    # slope = -0.5 cents/day -> slope_e6 = floor(-500000 + 0.5) = -500000
    assert got["b"]["slope_e6"] == -500000
    # intercept = (sy - slope*sx)/n = (1 + 0.5*3)/3 = 0.8333 -> floor(+0.5)=1
    assert got["b"]["intercept_cents"] == 1


# --- Q4 shape: late_priority_orders ------------------------------------------


def test_late_priority_orders_hand_computed(spark, tmp_path):
    import hhek2sqlite_spark.plans.extensions as ext

    orders = spark.createDataFrame(
        [
            # in range, has a late line -> counted
            (1, "1-URGENT", datetime(1997, 1, 10)),
            # in range, only on-time lines -> not counted
            (2, "1-URGENT", datetime(1997, 2, 1)),
            # out of range, late line -> not counted
            (3, "2-HIGH", datetime(1996, 12, 31)),
            # in range, no lines at all -> not counted
            (4, "2-HIGH", datetime(1997, 3, 1)),
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, datetime(1997, 1, 15)),   # on time
            (1, datetime(1997, 6, 1)),    # late (>60d)
            (2, datetime(1997, 2, 20)),   # on time
            (3, datetime(1998, 1, 1)),    # late but order out of range
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    tabs = {"orders": orders, "lineitem": li}
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = {
            r["priority"]: r["n_orders"]
            for r in ext.q_late_priority_orders(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {"1-URGENT": 1}


def _plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_late_priority_orders_single_lineitem_scan(spark):
    """Decorrelation contract (r12 rewrite): EXISTS collapses to a
    per-order MAX behind a BROADCAST inner join — one lineitem scan,
    one orders scan, and the fact side must never be the build side of
    a shuffle join (the original left-semi form shuffled full fact
    rows and degraded on the scaling curve)."""
    import re

    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(ext.q_late_priority_orders(spark, "/root/testdata/sf0.001"))
    # count "(n) Scan parquet" node headers (each scan prints once there)
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftSemi" not in plan, plan


# --- Q20 shape: dominant_part_suppliers --------------------------------------


def test_dominant_part_suppliers_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext

    # part 1: supp 1 ships 100, supp 2 ships 10 -> supp1 share*nsupp =
    # 2*100=200 > 4*110? No (200 < 440). Make it extreme: 100 vs 1.
    # nsupp=2: supp1 q*nsupp = 200 > 4*101=404? No. With MULT=4 a
    # 2-supplier part can never qualify (max q*2 < 2t < 4t) — use a
    # 6-supplier part: supp1 q=100, five others q=1 each; t=105,
    # q*nsupp = 600 > 420 -> qualifies.
    li = spark.createDataFrame(
        [(1, 1, 100.0)] + [(1, s, 1.0) for s in range(2, 7)]
        # part 2 contested but balanced -> nobody qualifies
        + [(2, 1, 5.0), (2, 2, 5.0)]
        # part 3 single-supplier -> excluded by nsupp > 1
        + [(3, 3, 1000.0)],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    supplier = spark.createDataFrame(
        [(s, f"S{s}", float(s)) for s in range(1, 8)],
        "s_suppkey long, s_name string, s_acctbal double",
    )
    tabs = {"lineitem": li, "supplier": supplier}
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        got = sorted(
            r["s_suppkey"]
            for r in ext.q_dominant_part_suppliers(spark, "unused").collect()
        )
    finally:
        ext.load_table = orig
    assert got == [1]


# --- budget_variance ----------------------------------------------------------


def test_budget_variance_hand_computed(spark):
    import hhek2sqlite_spark.plans.extensions as ext

    orders = spark.createDataFrame(
        [
            ("1-URGENT", datetime(1995, 1, 10), 10.00),
            ("1-URGENT", datetime(1995, 1, 20), 5.00),
            ("1-URGENT", datetime(1996, 1, 5), 20.00),
            # month present only in actual year
            ("1-URGENT", datetime(1996, 2, 5), 7.00),
            # other years ignored
            ("1-URGENT", datetime(1997, 1, 5), 99.00),
        ],
        "o_orderpriority string, o_orderdate timestamp, o_totalprice double",
    )
    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, _n: orders
        got = {
            (r["typ"], r["m"]): (r["budget_c"], r["actual_c"], r["variance_c"])
            for r in ext.q_budget_variance(spark, "unused").collect()
        }
    finally:
        ext.load_table = orig
    assert got == {
        ("1-URGENT", 1): (1500, 2000, 500),
        ("1-URGENT", 2): (0, 700, 700),
    }


def test_budget_variance_single_orders_scan(spark):
    """Plan contract: conditional aggregation, not a self-join — the
    fact is scanned ONCE and there is no Join node at all."""
    import re

    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(ext.q_budget_variance(spark, "/root/testdata/sf0.001"))
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M)
    assert len(scans) == 1, plan
    assert "Join" not in plan, plan


# --- plan contracts for the round-12 TPC-H shapes ------------------------------


def _scan_count(plan: str) -> int:
    import re

    return len(re.findall(r"^\(\d+\) Scan parquet", plan, flags=re.M))


def test_dominant_part_suppliers_single_lineitem_scan(spark):
    """Q20 contract: the aggregate-threshold IN must NOT become a
    second scan of the fact — one lineitem scan, one supplier scan,
    and the per-part total via Window (not a join-back)."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_dominant_part_suppliers(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 2, plan
    assert "Window" in plan and "LeftSemi" in plan, plan


def test_top_revenue_supplier_single_fact_scan(spark):
    """Q15 contract: the scalar MAX must come from the already-reduced
    (and localCheckpoint'ed) per-supplier relation — the fact parquet
    is never scanned in the final plan at all (the tfidf rule), only
    the supplier dim is."""
    import hhek2sqlite_spark.plans.extensions as ext
    from hhek2sqlite_spark.operators.util import release_local_checkpoints

    df = ext.q_top_revenue_supplier(spark, "/root/testdata/sf0.001")
    plan = _plan_text(df)
    try:
        assert _scan_count(plan) == 1, plan  # supplier dim only
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    finally:
        release_local_checkpoints(df)


def test_cheapest_supplier_parts_no_self_join(spark):
    """Q2 contract: the correlated scalar-min decorrelates to a window
    over the reduced (part,supplier) relation — one lineitem scan, and
    the part prefilter joins BEFORE the window (broadcast)."""
    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(
        ext.q_cheapest_supplier_parts(spark, "/root/testdata/sf0.001")
    )
    assert _scan_count(plan) == 3, plan  # lineitem + part + supplier, once each
    assert "Window" in plan, plan


# --- Q2 shape: cheapest_supplier_parts ----------------------------------------


def _with_tables(spark, tabs, qname):
    import hhek2sqlite_spark.plans.extensions as ext

    orig = ext.load_table
    try:
        ext.load_table = lambda _s, _d, n: tabs[n]
        return getattr(ext, qname)(spark, "unused").collect()
    finally:
        ext.load_table = orig


def test_cheapest_supplier_parts_hand_computed(spark):
    li = spark.createDataFrame(
        [
            # part 1 (size 15): supp 1 min 5.00, supp 2 min 4.00 -> supp 2
            (1, 1, 5.00), (1, 1, 9.00), (1, 2, 4.00),
            # part 2 (size 15): tie at 3.00 -> both suppliers qualify
            (2, 1, 3.00), (2, 2, 3.00),
            # part 3 (size 20): filtered out by the dimension prefilter
            (3, 1, 1.00),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, 15), (2, 15), (3, 20)], "p_partkey long, p_size int"
    )
    supplier = spark.createDataFrame(
        [(1, "S1"), (2, "S2")], "s_suppkey long, s_name string"
    )
    rows = _with_tables(
        spark,
        {"lineitem": li, "part": part, "supplier": supplier},
        "q_cheapest_supplier_parts",
    )
    got = sorted((r["p_partkey"], r["s_suppkey"], r["min_cost_c"]) for r in rows)
    assert got == [(1, 2, 400), (2, 1, 300), (2, 2, 300)]


# --- Q13 shape: order_count_distribution --------------------------------------


def test_order_count_distribution_zero_bucket_and_join_condition(spark):
    cust = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [
            (1, 10, "2-HIGH"),
            (1, 11, "2-HIGH"),
            # urgent order must not count (rides the JOIN condition) —
            # customer 2 still appears, in the ZERO bucket
            (2, 12, "1-URGENT"),
        ],
        "o_custkey long, o_orderkey long, o_orderpriority string",
    )
    rows = _with_tables(
        spark,
        {"customer": cust, "orders": orders},
        "q_order_count_distribution",
    )
    got = {r["c_count"]: r["custdist"] for r in rows}
    # cust 1 -> 2 orders; cust 2 -> 0 (urgent excluded); cust 3 -> 0
    assert got == {2: 1, 0: 2}


# --- Q15 shape: top_revenue_supplier -------------------------------------------


def test_top_revenue_supplier_tie_keeps_both(spark):
    li = spark.createDataFrame(
        [
            (1, datetime(1997, 2, 1), 100.0, 0.0),
            (2, datetime(1997, 3, 1), 50.0, 0.0),
            (2, datetime(1997, 4, 1), 50.0, 0.0),  # ties supplier 1
            (3, datetime(1997, 5, 1), 99.0, 0.0),
            (1, datetime(1998, 1, 1), 500.0, 0.0),  # outside the window
        ],
        "l_suppkey long, l_shipdate timestamp, l_extendedprice double, "
        "l_discount double",
    )
    supplier = spark.createDataFrame(
        [(1, "S1"), (2, "S2"), (3, "S3")], "s_suppkey long, s_name string"
    )
    rows = _with_tables(
        spark, {"lineitem": li, "supplier": supplier}, "q_top_revenue_supplier"
    )
    got = sorted((r["s_suppkey"], r["rev_e6"]) for r in rows)
    assert got == [(1, 100_00 * 10_000), (2, 100_00 * 10_000)]


# --- streaming funnel twin (VERDICT r11 task 7) -------------------------------


def test_streaming_funnel_matches_batch(spark, sf_dir):
    """Drain the watermarked stateful funnel over the events fixture
    and compare its per-user final stage vector against the batch
    plan's — the batch-parity contract for the streaming twin."""
    import pyspark.sql.functions as F

    from hhek2sqlite_spark.operators.funnel import funnel_stages
    from hhek2sqlite_spark.sources.parquet import load_table
    from hhek2sqlite_spark.streaming.funnel import streaming_funnel

    q = (
        streaming_funnel(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("funnel_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table("funnel_out")
    # stage times fill in monotonically, so the max-furthest row per
    # user is that user's final state
    final = emitted.groupBy("user_id").agg(F.max("furthest").alias("furthest"))
    got = final.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.sum((F.col("furthest") >= 1).cast("long")).alias("users_view"),
        F.sum((F.col("furthest") >= 2).cast("long")).alias("users_click"),
        F.sum((F.col("furthest") >= 3).cast("long")).alias("users_purchase"),
    ).collect()[0]
    exp = funnel_stages(load_table(spark, sf_dir, "events")).collect()[0]
    assert got.users_total == exp.users_total
    assert got.users_view == exp.users_view
    assert got.users_click == exp.users_click
    assert got.users_purchase == exp.users_purchase


def test_nation_market_share_single_fact_scan_and_hand_value(spark):
    """Q8 contract + hand value: the conditional share must come from
    ONE lineitem scan (CASE inside the same aggregate, no self-join),
    and the share math must be exact."""
    import re

    import hhek2sqlite_spark.plans.extensions as ext

    plan = _plan_text(ext.q_nation_market_share(spark, "/root/testdata/sf0.001"))
    # the formatted node header carries no table name; each scan node's
    # detail block has exactly one Location line naming the file
    li_scans = re.findall(r"^Location:.*lineitem", plan, flags=re.M)
    assert len(li_scans) == 1, plan
    assert "LeftSemi" in plan, plan

    # hand-computed: market = region 0's single customer; supplier 1 is
    # the target nation's, supplier 2 is not -> share 25.00% in e6
    region = spark.createDataFrame([(0, "ASIA"), (1, "EUROPE")],
                                   "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "NATION_7", 0), (1, "NATION_1", 0), (2, "NATION_2", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    cust = spark.createDataFrame([(1, 0), (2, 2)],
                                 "c_custkey long, c_nationkey int")
    supp = spark.createDataFrame([(1, 0), (2, 1)],
                                 "s_suppkey long, s_nationkey int")
    orders = spark.createDataFrame(
        [(10, 1, datetime(1997, 1, 1)), (11, 2, datetime(1997, 1, 2))],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (10, 1, 25.0, 0.0),   # target nation supplies 25.00
            (10, 2, 75.0, 0.0),   # other nation supplies 75.00
            (11, 1, 999.0, 0.0),  # order outside the region: excluded
        ],
        "l_orderkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double",
    )
    rows = _with_tables(
        spark,
        {"lineitem": li, "orders": orders, "customer": cust,
         "supplier": supp, "nation": nation, "region": region},
        "q_nation_market_share",
    )
    assert [(r["order_year"], r["mkt_share_e6"]) for r in rows] == [
        (1997, 250000)
    ]


def test_streaming_retention_matches_batch(spark, sf_dir):
    """Drain the stateful retention twin and check the aggregated
    cohort x week triangle equals the batch plan's exactly."""
    import pyspark.sql.functions as F

    from hhek2sqlite_spark.operators.funnel import retention_cohorts
    from hhek2sqlite_spark.sources.parquet import load_table
    from hhek2sqlite_spark.streaming.funnel import streaming_retention

    q = (
        streaming_retention(spark, sf_dir)
        .writeStream.format("memory")
        .queryName("retention_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.cohort_week, r.activity_week): r.n
        for r in spark.table("retention_out")
        .groupBy("cohort_week", "activity_week")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    exp = {
        (r.cohort_week, r.activity_week): r.active_users
        for r in retention_cohorts(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == exp


# --- UCanAccess proof stays warm (VERDICT r11 task 3) -------------------------


def test_ucanaccess_proof_collects_and_skips_only_on_env(tmp_path, monkeypatch):
    """Meta-test: the jar-keyed real-Jet-consumer test must still EXIST
    and its auto-skip must be keyed on HHEK_UCANACCESS_JARS and nothing
    else — so the proof can't rot into an always-skip. If the jars env
    var IS set in this environment, the real test runs in the suite and
    this meta-check is moot."""
    import os

    from tests import test_jdbc_io as mod

    fn = getattr(mod, "test_ucanaccess_roundtrip_when_jar_present", None)
    assert fn is not None, "jar-keyed UCanAccess test was removed"
    if os.environ.get("HHEK_UCANACCESS_JARS"):
        pytest.skip("jars present: the real test runs, meta-check moot")
    with pytest.raises(pytest.skip.Exception) as exc:
        fn(tmp_path)
    assert "HHEK_UCANACCESS_JARS" in str(exc.value), (
        "skip reason drifted away from the jars env var: " + str(exc.value)
    )
