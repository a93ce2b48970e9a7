"""Reference-fidelity query layer (SURVEY.md section 2), expressed on the
driver's TPC-H-ish fixture tables.

Every reference operator shape gets a ``(spark, sf_dir) -> DataFrame``
builder here plus a DuckDB oracle SQL string. The driver hash-compares
the two at sf=0.01, so both sides follow one convention:

**Exact-decimal money, hash-stable boundary types.** The reference's
correctness bar is exact decimal comparison
(/root/reference/db_test.go:262-267; money is Jet ``Currency`` ->
``DECIMAL(19,4)``, /root/reference/hhek2sqlite.go:197). The fixture
stores money as float64, so every money expression casts to
``DECIMAL(18,2)`` *before* aggregation — decimal sums are exact and
order-independent in both Spark and DuckDB, where float sums are neither.
No ``avg`` via floating point; derived ratios are decimal-division-free
(sum+count pairs instead).

The FINAL projection of every money column then casts to DOUBLE on both
sides (``MONEY_SUM``/``MONEY4_SUM`` below are the boundary type): the
internal math is exact, and a correctly-rounded decimal->double cast of
the same exact value is bit-identical in both engines, so the driver's
value hash matches. Emitting the decimal itself does NOT hash-match:
Spark's toPandas renders DecimalType as fixed-scale ``decimal.Decimal``
(``Decimal('2494.00')``) while DuckDB's ``.df()`` renders DECIMAL as
float64 (``2494.0``) — round 1 lost 25 queries to exactly that
(CORRECTNESS_r01, VERDICT.md "What's wrong" #1). Same rule for integer
sums: DuckDB ``SUM(INTEGER)`` is HUGEINT (-> pandas float64), so every
oracle-side integer SUM is wrapped ``CAST(... AS BIGINT)`` to match
Spark's int64.

**Scale.** Each builder is a declarative plan: filters/projections reach
the parquet scan via Catalyst pushdown, joins are plain equi-joins that
AQE plans (broadcast for dimension tables, sort-merge + skew-split for
fact-fact). Nothing collects to the driver; nothing is order-dependent
except explicitly sorted top-k outputs with a unique tiebreaker.

Reference parity citations are on each builder.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hhek2sqlite_spark.sources.parquet import load_table

MONEY = "decimal(18,2)"  # per-row money values (fixture prices < 10^8)
# Boundary type for aggregated/emitted money: exact decimal math happens
# BEFORE this cast; double is the driver-hash-stable output rendering
# (see module docstring). Sums stay exactly representable in a double up
# to 2^53 minor units; at larger true scale switch the boundary to
# integer minor units (CAST(x*100 AS BIGINT)) on both sides.
MONEY_SUM = "double"
MONEY4_SUM = "double"


def _money(col):
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


# Exact integer minor units ("cents") for aggregated money. Fixture money
# is float64 with <=2 decimals, so ROUND(x*100) is exact; BIGINT sums are
# exact, order-independent, and ~2x faster than DECIMAL sums (Spark backs
# precision>18 decimals with JVM BigDecimal; sum buffers always cross 18
# — measured 1.97s -> 1.06s on pricing_summary at sf0.1). The boundary
# divides by 100.0 into DOUBLE: the cents integer is < 2^53, so the
# correctly-rounded quotient is bit-identical in both engines.
# Discounted prices use e6 units (cents x discount-e4) — same rules.
# ENVELOPE (100 TB): a single group's sum must stay under 2^63 minor
# units (9.2e16 currency units in cents, 9.2e12 in e6 units); groups
# that could exceed it belong on the DECIMAL path (_money + sum), which
# stays the convention in plans/hhek.py where reference Currency
# fidelity — not throughput — is the requirement.
def _cents(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def _disc_e6(price_col: str, disc_col: str):
    """price*(1-disc) in exact e6 minor units: cents x (1e4 - disc_e4)."""
    d_e4 = F.round(F.col(disc_col) * 10000).cast("long")
    return _cents(price_col) * (F.lit(10000) - d_e4)


def _out100(col):
    return (col / F.lit(100.0)).cast(MONEY_SUM)


def _out1e6(col):
    return (col / F.lit(1000000.0)).cast(MONEY4_SUM)


_SC = "CAST(ROUND({0}*100) AS BIGINT)"  # SQL cents of a column
_SD6 = (
    "CAST(ROUND({0}*100) AS BIGINT) * (10000 - CAST(ROUND({1}*10000) AS BIGINT))"
)  # SQL e6 discounted price


# ---------------------------------------------------------------------------
# A2 — flagship: balance reconciliation
# Reference: account balance = start + deposits - purchases, asserted exact
# (/root/reference/db_test.go:142-149,381-386). Mapped: per-customer balance
# = acctbal + sum(signed lineitem amount), sign negative for returned items
# ('R' plays the reference's Inkop/purchase role, deposits otherwise).
# ---------------------------------------------------------------------------

def q_balance_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    signed = lineitem.select(
        "l_orderkey",
        F.when(F.col("l_returnflag") == "R", -_cents("l_extendedprice"))
        .otherwise(_cents("l_extendedprice"))
        .alias("signed_c"),
    )
    # lineitem->orders is fact-fact (sort-merge at scale); orders->customer
    # AQE-broadcasts while customer is small and shuffles when it is not.
    ledger = (
        signed.join(orders.select("o_orderkey", "o_custkey"), signed.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("signed_c").alias("net_c"))
    )
    return (
        ledger.join(customer, ledger.o_custkey == customer.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            _out100(_cents("c_acctbal")).alias("start_saldo"),
            _out100(F.col("net_c")).alias("ledger_net"),
            _out100(_cents("c_acctbal") + F.col("net_c")).alias("saldo"),
        )
    )


SQL_BALANCE_RECONCILIATION = f"""
WITH signed AS (
    SELECT l_orderkey,
           CASE WHEN l_returnflag = 'R' THEN -{_SC.format('l_extendedprice')}
                ELSE {_SC.format('l_extendedprice')} END AS signed_c
    FROM lineitem
), ledger AS (
    SELECT o.o_custkey, CAST(SUM(s.signed_c) AS BIGINT) AS net_c
    FROM signed s JOIN orders o ON s.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey
)
SELECT c.c_custkey AS c_custkey,
       c.c_name AS c_name,
       {_SC.format('c.c_acctbal')} / 100.0 AS start_saldo,
       l.net_c / 100.0 AS ledger_net,
       ({_SC.format('c.c_acctbal')} + l.net_c) / 100.0 AS saldo
FROM ledger l JOIN customer c ON l.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# A1 — COUNT(*) per table (/root/reference/hhek2sqlite.go:1137-1146,
# db_test.go:404-408): the reference's progress denominator + row-count
# assertions, as one unioned relation.
# ---------------------------------------------------------------------------

_COUNT_TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def q_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Measured counter-result (round 6, sf0.1, same-session A/B): fusing
    # the 7 counts into one union-scan + groupBy(table_name) job is
    # SLOWER (1.0s vs 0.62s) — the 7 per-table agg stages are
    # independent and the scheduler runs them CONCURRENTLY, so their
    # single-row exchanges don't stack up as serial job floor, while the
    # fused form pushes every row through a keyed hash-aggregate instead
    # of 7 plain counters. The union-of-aggs stays.
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
        )
        for t in _COUNT_TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


SQL_ROW_COUNTS = " UNION ALL ".join(
    f"SELECT '{t}' AS table_name, COUNT(*) AS n_rows FROM {t}" for t in _COUNT_TABLES
)


# ---------------------------------------------------------------------------
# P2 — point lookup on PK (/root/reference/db_test.go:414-415,476-478):
# parameterized WHERE (Lopnr=?) returning <=1 row. Catalyst pushes the
# predicate into the parquet scan (PushedFilters: [EqualTo(c_custkey,42)]).
# ---------------------------------------------------------------------------

def q_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
            _money("c_acctbal").cast(MONEY_SUM).alias("acctbal"),
        )
    )


SQL_POINT_LOOKUP = f"""
SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
       CAST(CAST(c_acctbal AS {MONEY}) AS {MONEY_SUM}) AS acctbal
FROM customer WHERE c_custkey = 42
"""


# ---------------------------------------------------------------------------
# Latent FK joins (SURVEY.md 2.3): customer->nation->region, the engine's
# materialization of the reference's implicit FKs
# (/root/reference/db_test.go:290-309). Dimensions broadcast.
# ---------------------------------------------------------------------------

def q_fk_join_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _out100(F.sum(_cents("c_acctbal"))).alias("total_acctbal"),
        )
    )


SQL_FK_JOIN_REGION = f"""
SELECT r.r_name AS r_name,
       COUNT(*) AS n_customers,
       CAST(SUM({_SC.format('c.c_acctbal')}) AS BIGINT) / 100.0 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


# ---------------------------------------------------------------------------
# Orphan detection / referential integrity (SURVEY.md 2.3): left_anti join,
# the engine's version of the reference roundtrip count checks
# (/root/reference/db_test.go:150-171). Emitted as per-FK orphan counts so
# the result is stable (single row per relationship).
# ---------------------------------------------------------------------------

def q_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    li_orphans = (
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.lit("lineitem->orders").alias("fk"), F.count(F.lit(1)).alias("n_orphans"))
    )
    ord_orphans = (
        orders.select("o_custkey")
        .join(customer.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.lit("orders->customer").alias("fk"), F.count(F.lit(1)).alias("n_orphans"))
    )
    return li_orphans.unionAll(ord_orphans)


SQL_ORPHAN_CHECK = """
SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'orders->customer' AS fk, COUNT(*) AS n_orphans
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


# ---------------------------------------------------------------------------
# A3 — running balance window: the reference's Transaktioner.Saldo column
# (maintained per-row by the original app, dropped by the converter at
# /root/reference/hhek2sqlite.go:260 because it is derivable). Derived here
# per customer over order date with the PK as deterministic tiebreaker
# (SURVEY.md 2.6: Spark promises no row order, so golden determinism needs
# the explicit sort key).
# ---------------------------------------------------------------------------

def q_running_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _out100(F.sum(_cents("o_totalprice")).over(w)).alias("saldo"),
    )


SQL_RUNNING_BALANCE = f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM({_SC.format('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS saldo
FROM orders
"""


# ---------------------------------------------------------------------------
# Budget pivot (SURVEY.md 2.4): the reference's Budget table is a
# materialized 12-month MONEY pivot (/root/reference/hhek2sqlite.go:1041);
# its analytic equivalent is groupBy(Typ).pivot(month).sum. Mapped onto
# order priority x order month.
# ---------------------------------------------------------------------------

_MONTHS = ("jan", "feb", "mar", "apr", "maj", "jun", "jul", "aug", "sep", "okt", "nov", "dec")


def q_budget_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    pivoted = (
        orders.select(
            F.col("o_orderpriority").alias("typ"),
            F.month("o_orderdate").alias("m"),
            _cents("o_totalprice").alias("amt_c"),
        )
        # explicit pivot values -> single shuffle, no value-discovery job
        .groupBy("typ")
        .pivot("m", list(range(1, 13)))
        .agg(F.sum("amt_c"))
    )
    cols = [F.col("typ")] + [
        _out100(F.coalesce(F.col(str(i + 1)), F.lit(0))).alias(name)
        for i, name in enumerate(_MONTHS)
    ]
    return pivoted.select(*cols)


SQL_BUDGET_PIVOT = "SELECT o_orderpriority AS typ, " + ", ".join(
    f"COALESCE(CAST(SUM(CASE WHEN month(o_orderdate) = {i + 1} "
    f"THEN {_SC.format('o_totalprice')} END) AS BIGINT), 0) / 100.0 AS {name}"
    for i, name in enumerate(_MONTHS)
) + " FROM orders GROUP BY o_orderpriority"


# ---------------------------------------------------------------------------
# Uniqueness constraint check (SURVEY.md 4.3): the reference's unique
# indexes (e.g. Konton.Benamning, /root/reference/hhek2sqlite.go:675) become
# assertions -- duplicate-key groups must be empty. Returns offending keys.
# ---------------------------------------------------------------------------

def q_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


SQL_UNIQUENESS_CHECK = """
SELECT c_custkey, COUNT(*) AS n_dups FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1
"""


# ---------------------------------------------------------------------------
# Table equivalence (SURVEY.md 2.7): the roundtrip test is semantically
# A exceptAll A' == empty in both directions (/root/reference/db_test.go:104-136).
# Demonstrated as a self-compare (the general two-table form is
# operators/compare.py); count form keeps the result shape stable.
# ---------------------------------------------------------------------------

def q_table_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    b = orders.select("o_orderkey", "o_custkey", "o_orderstatus")
    diff = a.exceptAll(b).unionAll(b.exceptAll(a))
    return diff.agg(F.count(F.lit(1)).alias("n_diff_rows"))


SQL_TABLE_EQUIVALENCE = """
WITH a AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
     b AS (SELECT o_orderkey, o_custkey, o_orderstatus FROM orders),
     d AS ((SELECT * FROM a EXCEPT ALL SELECT * FROM b)
           UNION ALL (SELECT * FROM b EXCEPT ALL SELECT * FROM a))
SELECT COUNT(*) AS n_diff_rows FROM d
"""


# ---------------------------------------------------------------------------
# P3/F8 — empty-bytes -> NULL (/root/reference/hhek2sqlite.go:639-643,
# :1118-1122): len(x)<1 routed to SQL NULL. Applied to events.props and
# summarized so the null-routing is observable in the result.
# ---------------------------------------------------------------------------

def q_empty_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    routed = events.select(
        "event_type",
        F.nullif(F.trim(F.col("props")), F.lit("")).alias("props_or_null"),
    )
    return routed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("props_or_null").alias("n_nonnull_props"),
    )


SQL_EMPTY_TO_NULL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(NULLIF(TRIM(props), '')) AS n_nonnull_props
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Pricing summary (TPC-H Q1 shape) -- the bench headliner: wide scan, one
# shuffle on a tiny key space, exact-decimal discount arithmetic
# (decimal(18,2) * decimal(5,4) stays exact in both engines).
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _out100(F.sum(_cents("l_quantity"))).alias("sum_qty"),
            _out100(F.sum(_cents("l_extendedprice"))).alias("sum_base_price"),
            _out1e6(F.sum(_disc_e6("l_extendedprice", "l_discount"))).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({_SC.format('l_quantity')}) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM({_SC.format('l_extendedprice')}) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM({_SD6.format('l_extendedprice', 'l_discount')}) AS BIGINT) / 1000000.0 AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Top-k revenue (TPC-H Q3 shape): selective join + agg + deterministic
# top-k (unique tiebreaker per SURVEY.md 2.6). TakeOrderedAndProject --
# no global sort materializes at scale.
# ---------------------------------------------------------------------------

def q_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(_out1e6(F.sum(_disc_e6("l_extendedprice", "l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TOP_REVENUE = f"""
SELECT o.o_orderkey AS o_orderkey, o.o_orderpriority AS o_orderpriority,
       CAST(SUM({_SD6.format('l.l_extendedprice', 'l.l_discount')}) AS BIGINT) / 1000000.0 AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Month-over-month (SURVEY.md 2.5): budget-vs-actual style analytic —
# monthly revenue with LAG delta. The reference's Budget matrix is monthly;
# this is the window-analytic reading of it.
# ---------------------------------------------------------------------------

def q_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon")
        )
        .agg(F.sum(_cents("o_totalprice")).alias("rev_c"))
    )
    w = Window.orderBy("yr", "mon")
    return monthly.select(
        "yr",
        "mon",
        _out100(F.col("rev_c")).alias("revenue"),
        _out100(F.col("rev_c") - F.lag("rev_c", 1).over(w)).alias("mom_delta"),
    )


SQL_MONTH_OVER_MONTH = f"""
WITH monthly AS (
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mon,
           CAST(SUM({_SC.format('o_totalprice')}) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1, 2
)
SELECT yr, mon, rev_c / 100.0 AS revenue,
       (rev_c - LAG(rev_c, 1) OVER (ORDER BY yr, mon)) / 100.0 AS mom_delta
FROM monthly
"""


# ---------------------------------------------------------------------------
# Range + multi-column predicates (SURVEY.md 2.2: absent in the reference,
# free from Catalyst — both push to the parquet scan as PushedFilters).
# ---------------------------------------------------------------------------

def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_quantity") < 25)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _out100(F.sum(_cents("l_extendedprice"))).alias("sum_price"),
        )
    )


SQL_RANGE_FILTER = f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM({_SC.format('l_extendedprice')}) AS BIGINT) / 100.0 AS sum_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
  AND l_discount >= 0.05 AND l_quantity < 25
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Three-way drilldown with HAVING: customer -> orders -> lineitem, the full
# latent-FK chain of the model in one plan (join order left to Catalyst).
# ---------------------------------------------------------------------------

def q_customer_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    # pre-aggregate lineitem per order BEFORE the joins: the orderkey is
    # unique per pre-agg row, so the customer-level COUNT DISTINCT
    # becomes a plain count (no distinct-expand double shuffle) and the
    # join carries |orders| rows instead of |lineitem| — measured -34%
    # at sf0.1, bit-identical output (integer cent sums reassociate
    # freely)
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items_o"),
        F.sum(_cents("l_extendedprice")).alias("cents_o"),
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items_o").alias("n_items"),
            _out100(F.sum("cents_o")).alias("total_price"),
        )
        .filter(F.col("n_orders") >= 5)
    )


SQL_CUSTOMER_DRILLDOWN = f"""
SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       COUNT(*) AS n_items,
       CAST(SUM({_SC.format('l.l_extendedprice')}) AS BIGINT) / 100.0 AS total_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
HAVING COUNT(DISTINCT o.o_orderkey) >= 5
"""


# ---------------------------------------------------------------------------
# LEFT OUTER aggregate (SURVEY.md 2.3): customers including those with zero
# orders — outer-join semantics + null-safe aggregates, the TPC-H Q13 shape.
# ---------------------------------------------------------------------------

def q_customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),  # counts non-null only
            _out100(F.coalesce(F.sum(_cents("o_totalprice")), F.lit(0))).alias(
                "total_spent"
            ),
        )
    )


SQL_CUSTOMER_ORDER_PROFILE = f"""
SELECT c.c_custkey AS c_custkey, c.c_mktsegment AS c_mktsegment,
       COUNT(o.o_orderkey) AS n_orders,
       COALESCE(CAST(SUM({_SC.format('o.o_totalprice')}) AS BIGINT), 0) / 100.0 AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# ROLLUP (SURVEY.md 2.4: grouping-sets family — Budget's Jan..Dec matrix is a
# materialized pivot; rollup is its analytic generalization). Spark expands
# rollup into a single expand+aggregate — one shuffle for all grouping sets.
# ---------------------------------------------------------------------------

def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup(F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mon"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _out100(F.sum(_cents("o_totalprice"))).alias("revenue"),
        )
    )


SQL_ROLLUP_REVENUE = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mon,
       COUNT(*) AS n_orders,
       CAST(SUM({_SC.format('o_totalprice')}) AS BIGINT) / 100.0 AS revenue
FROM orders
GROUP BY ROLLUP (CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER))
"""


# ---------------------------------------------------------------------------
# INTERSECT / set ops (SURVEY.md 2.7): customers active in both 1996 and
# 1997. Spark plans INTERSECT as a left-semi aggregate join.
# ---------------------------------------------------------------------------

def q_intersect_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return y96.intersect(y97)


SQL_INTERSECT_YEARS = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


# ---------------------------------------------------------------------------
# Top-k per group (SURVEY.md 2.5/2.6: ranking window + deterministic
# tiebreaker). Unlike global top-k (TakeOrderedAndProject), per-group rank
# is one shuffle on the group key + in-partition sort — no global sort.
# ---------------------------------------------------------------------------

def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            _money("o_totalprice").cast(MONEY_SUM).alias("totalprice"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


SQL_TOPK_PER_GROUP = f"""
SELECT o_orderpriority, o_orderkey,
       CAST(CAST(o_totalprice AS {MONEY}) AS {MONEY_SUM}) AS totalprice,
       CAST(rank AS INTEGER) AS rank
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
    FROM orders
) WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# Exact discrete median per group (SURVEY.md 2.4: percentile family).
# Engine-agnostic formulation: the element at ROW_NUMBER == (n+1)/2 under a
# deterministic (value, PK) order — identical in any engine, unlike
# percentile_approx (sketched) or quantile functions (tie-handling varies).
# ---------------------------------------------------------------------------

def q_median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = orders.select(
        "o_orderpriority",
        _money("o_totalprice").cast(MONEY_SUM).alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_orders"),
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_orders + 1) div 2")
    ).select("o_orderpriority", F.col("price").alias("median_price"), "n_orders")


SQL_MEDIAN_ORDER_VALUE = f"""
WITH ranked AS (
    SELECT o_orderpriority,
           CAST(CAST(o_totalprice AS {MONEY}) AS {MONEY_SUM}) AS price,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_orders
    FROM orders
)
SELECT o_orderpriority, price AS median_price, n_orders
FROM ranked WHERE rn = (n_orders + 1) // 2
"""


# ---------------------------------------------------------------------------
# CUBE (SURVEY.md 2.4: grouping-sets family, generalizing rollup_revenue).
# Spark plans cube as ONE expand + aggregate — all 4 grouping sets share a
# single shuffle. grouping() bits are emitted explicitly so both engines
# report the identical grouping-set id.
# ---------------------------------------------------------------------------

def q_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    gid = (
        F.grouping("o_orderstatus") * F.lit(2) + F.grouping("o_orderpriority")
    ).cast("long")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        gid.alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        _out100(F.sum(_cents("o_totalprice"))).alias("revenue"),
    )


SQL_CUBE_REVENUE = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus)*2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM({_SC.format('o_totalprice')}) AS BIGINT) / 100.0 AS revenue
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Trailing RANGE-frame window (SURVEY.md 2.5: frame specs beyond ROWS).
# 7-day trailing spend per customer: RANGE over epoch seconds, so peers
# (same-day orders) aggregate together regardless of row order —
# deterministic without a tiebreaker, unlike a ROWS frame.
# ---------------------------------------------------------------------------

_TRAILING_S = 7 * 86400


def q_trailing_week_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-_TRAILING_S, 0)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            # fixture timestamps are NTZ; session TZ is pinned UTC, so the
            # cast-to-timestamp epoch equals the oracle's epoch_us//1e6
            F.unix_seconds(F.col("o_orderdate").cast("timestamp")).alias("epoch_s"),
            _cents("o_totalprice").alias("price_c"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            "epoch_s",
            _out100(F.sum("price_c").over(w)).alias("trailing_spend"),
        )
    )


SQL_TRAILING_WEEK_SPEND = f"""
SELECT o_custkey, o_orderkey,
       epoch_us(o_orderdate)//1000000 AS epoch_s,
       CAST(SUM({_SC.format('o_totalprice')}) OVER (
            PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate)//1000000
            RANGE BETWEEN {_TRAILING_S} PRECEDING AND CURRENT ROW) AS BIGINT) / 100.0 AS trailing_spend
FROM orders
"""


# ---------------------------------------------------------------------------
# EXISTS / left-semi join (SURVEY.md 2.3: the semi-join the reference's
# RI checks imply, complement of orphan_check's anti-join).
# ---------------------------------------------------------------------------

def q_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    # range predicates, not year() == 1997: a function over the column
    # blocks parquet predicate pushdown; the half-open range reaches the
    # scan as PushedFilters and prunes row groups by min/max stats
    orders97 = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    return (
        customer.join(orders97, customer.c_custkey == orders97.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


SQL_ACTIVE_CUSTOMERS = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1997)
"""


# ---------------------------------------------------------------------------
# COUNT(DISTINCT) exact + HLL sketch pair. The exact form is the oracle
# tier; approx_count_distinct is the 100 TB path (fixed-size HLL sketch
# per group, mergeable map-side — no distinct-key shuffle at all) and is
# checked rows-only + an error-bound test (sketch values are
# implementation-specific, no cross-engine hash match by design).
# ---------------------------------------------------------------------------

def q_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_DISTINCT_CUSTOMERS = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


# KMV (k-minimum-values) sketch parameters: estimate = (k-1) * 2^44 / v_k
# where v_k is the k-th smallest distinct 44-bit hash. 44 bits (11 md5 hex
# digits) keeps every hash < 2^44 — exactly representable as double, so
# the one float division is bit-identical in any engine. Falls back to the
# exact count when a group has fewer than k distinct keys.
_KMV_K = 256
_KMV_HASH_BITS_RANGE = float((_KMV_K - 1) * (1 << 44))
_KMV_HASH_SPARK = (
    "cast(conv(substring(md5(cast(o_custkey AS string)), 1, 11), 16, 10) AS bigint)"
)


def q_approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per priority via a DETERMINISTIC
    KMV sketch — unlike HLL (whose sketch is engine-private), the
    estimate is a pure function of md5 values, so DuckDB reproduces it
    exactly and the driver hash-matches it. Spark's native
    ``approx_count_distinct`` (HLL, mergeable, single-pass) remains the
    production scale path — its error bound is pytest-verified
    (tests/test_extensions.py::test_approx_distinct_within_error_bound);
    KMV here costs one distinct + one per-group top-k window, the price
    of cross-engine determinism."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderpriority", F.expr(_KMV_HASH_SPARK).alias("h")
    ).distinct()
    w = Window.partitionBy("o_orderpriority").orderBy("h")
    topk = d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
    agg = topk.groupBy("o_orderpriority").agg(
        F.max("h").alias("vk"), F.count(F.lit(1)).alias("n_seen")
    )
    est = F.when(F.col("n_seen") < _KMV_K, F.col("n_seen")).otherwise(
        F.floor(F.lit(_KMV_HASH_BITS_RANGE) / F.col("vk"))
    )
    return agg.select(
        "o_orderpriority", est.cast("long").alias("approx_customers")
    )


SQL_APPROX_DISTINCT_CUSTOMERS = f"""
WITH d AS (
    SELECT DISTINCT o_orderpriority,
           CAST('0x' || substr(md5(o_custkey::VARCHAR), 1, 11) AS BIGINT) AS h
    FROM orders
),
r AS (
    SELECT o_orderpriority, h,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
    FROM d
),
t AS (
    SELECT o_orderpriority, MAX(h) AS vk, COUNT(*) AS n_seen
    FROM r WHERE rn <= {_KMV_K} GROUP BY o_orderpriority
)
SELECT o_orderpriority,
       CAST(CASE WHEN n_seen < {_KMV_K} THEN n_seen
                 ELSE floor({_KMV_HASH_BITS_RANGE!r} / vk) END AS BIGINT) AS approx_customers
FROM t
"""


# ---------------------------------------------------------------------------
# DISTINCT (SURVEY.md 2.7: set-op family; map-side partial agg then one
# shuffle on the pair key).
# ---------------------------------------------------------------------------

def q_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").distinct()


SQL_DISTINCT_PAIRS = "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"


# ---------------------------------------------------------------------------
# Correlated scalar subquery, decorrelated (TPC-H Q17 shape). The
# reference has no subqueries; this is the query layer generalizing its
# point-lookup-then-compare pattern (/root/reference/db_test.go:262-267 —
# fetch a value, compare against a derived expectation) to a per-group
# derived threshold. Spark: the "subquery" is a per-part aggregate joined
# back to the fact — one shuffle on l_partkey serves both the agg and the
# self-join, and AQE broadcasts the 1-row-per-part agg side when small.
# "qty < 0.2 * avg(qty)" is expressed by cross-multiplication
# (5*qty*n < sum) so NO division happens — exact decimal semantics in
# both engines, no float ratio, no precision negotiation.
# ---------------------------------------------------------------------------

def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty_c = _cents("l_quantity")
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(qty_c).alias("sum_qty_c"), F.count(F.lit(1)).alias("n_li")
    )
    small = lineitem.join(per_part, "l_partkey").filter(
        qty_c * F.col("n_li") * 5 < F.col("sum_qty_c")
    )
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            _out100(F.sum(_cents("l_extendedprice"))).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


SQL_SMALL_QTY_REVENUE = f"""
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM({_SC.format('l_quantity')}) AS BIGINT) AS sum_qty_c,
           COUNT(*) AS n_li
    FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand AS p_brand,
       CAST(SUM({_SC.format('l.l_extendedprice')}) AS BIGINT) / 100.0 AS small_qty_revenue,
       COUNT(*) AS n_small
FROM lineitem l
JOIN per_part pp ON l.l_partkey = pp.l_partkey
JOIN part p ON l.l_partkey = p.p_partkey
WHERE {_SC.format('l.l_quantity')} * pp.n_li * 5 < pp.sum_qty_c
GROUP BY p.p_brand
"""


# ---------------------------------------------------------------------------
# Conditional aggregation over a fact-fact join (TPC-H Q12 shape): the
# reference's signed-by-type ledger convention (Inkop negates,
# /root/reference/db_test.go:142-149) generalized to CASE-bucketed
# counters. The date filter is a half-open range on the raw column so it
# reaches the parquet scan as PushedFilters; the CASE sits inside the
# partial agg (map-side combine), so only (linestatus, 2 counters) rows
# cross the wire.
# ---------------------------------------------------------------------------

def q_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_PRIORITY_MIX = """
SELECT l.l_linestatus AS l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l.l_linestatus
"""


# ---------------------------------------------------------------------------
# HAVING over COUNT(DISTINCT) (TPC-H Q16 shape): group-filter semantics
# the reference's uniqueness checks imply (groupBy(key).count() > 1,
# SURVEY.md 4.3) promoted to a real reporting query. The distinct-count
# agg shuffles once on l_suppkey (Spark plans count-distinct as a
# two-phase expand/agg on the same key — no extra exchange); the HAVING
# filter runs post-agg on 100s of rows, then the supplier dimension
# broadcasts.
# ---------------------------------------------------------------------------

def q_prolific_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    per_supp = (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            _out100(F.sum(_cents("l_extendedprice"))).alias("revenue"),
        )
        .filter(F.col("n_parts") >= 520)
    )
    return per_supp.join(
        supplier, per_supp.l_suppkey == supplier.s_suppkey
    ).select("s_suppkey", "s_name", "n_parts", "revenue")


SQL_PROLIFIC_SUPPLIERS = f"""
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       g.n_parts AS n_parts, g.revenue AS revenue
FROM (
    SELECT l_suppkey,
           COUNT(DISTINCT l_partkey) AS n_parts,
           CAST(SUM({_SC.format('l_extendedprice')}) AS BIGINT) / 100.0 AS revenue
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(DISTINCT l_partkey) >= 520
) g JOIN supplier s ON g.l_suppkey = s.s_suppkey
"""


# ---------------------------------------------------------------------------
# J4 — Betalningar ⋈ LÅN (loan-payment rollup): the reference's one
# nullable-key latent join (Betalningar.LanLopnr -> LÅN.Löpnr, index
# /root/reference/hhek2sqlite.go:444, FK dbinfo.txt:30). Mapped onto the
# fixture: lineitem rows play Betalningar with a NULLABLE loan key (only
# high line numbers are "loan payments"), supplier plays LÅN with
# s_acctbal as AktLaneskuld. LEFT join keeps non-loan payments in one
# NULL-key rollup group; the loan dimension broadcasts. The hhek-schema
# form is plans/hhek.py::loan_payment_rollup (golden-fixture tested).
# ---------------------------------------------------------------------------

def q_loan_payment_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    payments = lineitem.select(
        F.when(F.col("l_linenumber") >= 4, F.col("l_suppkey")).alias("lan_lopnr"),
        _cents("l_extendedprice").alias("belopp_c"),
    )
    loans = supplier.select(
        F.col("s_suppkey").alias("lan_lopnr"),
        F.col("s_name").alias("langivare"),
        _cents("s_acctbal").alias("akt_laneskuld_c"),
    )
    return (
        payments.join(F.broadcast(loans), "lan_lopnr", "left")
        .groupBy("lan_lopnr", "langivare", "akt_laneskuld_c")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            _out100(F.sum("belopp_c")).alias("total_paid"),
        )
        .select(
            "lan_lopnr",
            "langivare",
            _out100(F.col("akt_laneskuld_c")).alias("akt_laneskuld"),
            "n_payments",
            "total_paid",
        )
    )


SQL_LOAN_PAYMENT_ROLLUP = f"""
WITH payments AS (
    SELECT CASE WHEN l_linenumber >= 4 THEN l_suppkey END AS lan_lopnr,
           {_SC.format('l_extendedprice')} AS belopp_c
    FROM lineitem
)
SELECT p.lan_lopnr AS lan_lopnr,
       s.s_name AS langivare,
       {_SC.format('s.s_acctbal')} / 100.0 AS akt_laneskuld,
       COUNT(*) AS n_payments,
       CAST(SUM(p.belopp_c) AS BIGINT) / 100.0 AS total_paid
FROM payments p LEFT JOIN supplier s ON p.lan_lopnr = s.s_suppkey
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "balance_reconciliation": q_balance_reconciliation,
    "row_counts": q_row_counts,
    "point_lookup": q_point_lookup,
    "fk_join_region": q_fk_join_region,
    "orphan_check": q_orphan_check,
    "running_balance": q_running_balance,
    "budget_pivot": q_budget_pivot,
    "uniqueness_check": q_uniqueness_check,
    "table_equivalence": q_table_equivalence,
    "empty_to_null": q_empty_to_null,
    "pricing_summary": q_pricing_summary,
    "top_revenue": q_top_revenue,
    "month_over_month": q_month_over_month,
    "range_filter": q_range_filter,
    "customer_drilldown": q_customer_drilldown,
    "distinct_pairs": q_distinct_pairs,
    "rollup_revenue": q_rollup_revenue,
    "intersect_years": q_intersect_years,
    "customer_order_profile": q_customer_order_profile,
    "topk_per_group": q_topk_per_group,
    "median_order_value": q_median_order_value,
    "cube_revenue": q_cube_revenue,
    "trailing_week_spend": q_trailing_week_spend,
    "active_customers": q_active_customers,
    "distinct_customers": q_distinct_customers,
    "approx_distinct_customers": q_approx_distinct_customers,
    "small_qty_revenue": q_small_qty_revenue,
    "priority_mix": q_priority_mix,
    "prolific_suppliers": q_prolific_suppliers,
    "loan_payment_rollup": q_loan_payment_rollup,
}

ORACLE_SQL: dict[str, str] = {
    "balance_reconciliation": SQL_BALANCE_RECONCILIATION,
    "row_counts": SQL_ROW_COUNTS,
    "point_lookup": SQL_POINT_LOOKUP,
    "fk_join_region": SQL_FK_JOIN_REGION,
    "orphan_check": SQL_ORPHAN_CHECK,
    "running_balance": SQL_RUNNING_BALANCE,
    "budget_pivot": SQL_BUDGET_PIVOT,
    "uniqueness_check": SQL_UNIQUENESS_CHECK,
    "table_equivalence": SQL_TABLE_EQUIVALENCE,
    "empty_to_null": SQL_EMPTY_TO_NULL,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "top_revenue": SQL_TOP_REVENUE,
    "month_over_month": SQL_MONTH_OVER_MONTH,
    "range_filter": SQL_RANGE_FILTER,
    "customer_drilldown": SQL_CUSTOMER_DRILLDOWN,
    "distinct_pairs": SQL_DISTINCT_PAIRS,
    "rollup_revenue": SQL_ROLLUP_REVENUE,
    "intersect_years": SQL_INTERSECT_YEARS,
    "customer_order_profile": SQL_CUSTOMER_ORDER_PROFILE,
    "topk_per_group": SQL_TOPK_PER_GROUP,
    "median_order_value": SQL_MEDIAN_ORDER_VALUE,
    "cube_revenue": SQL_CUBE_REVENUE,
    "trailing_week_spend": SQL_TRAILING_WEEK_SPEND,
    "active_customers": SQL_ACTIVE_CUSTOMERS,
    "distinct_customers": SQL_DISTINCT_CUSTOMERS,
    "approx_distinct_customers": SQL_APPROX_DISTINCT_CUSTOMERS,
    "small_qty_revenue": SQL_SMALL_QTY_REVENUE,
    "priority_mix": SQL_PRIORITY_MIX,
    "prolific_suppliers": SQL_PROLIFIC_SUPPLIERS,
    "loan_payment_rollup": SQL_LOAN_PAYMENT_ROLLUP,
}
