"""Query layer over the hhek data model itself (the reference's tables as
DataFrames — golden fixture or SQLite-ingested).

These are the reference's validation queries (/root/reference/db_test.go
checkDB1, :150-387) plus the derived aggregates its data model implies
(SURVEY.md sections 2.3-2.5): balance reconciliation, running balance,
latent FK joins, uniqueness / referential-integrity assertions.

All money stays DecimalType(19,4) end-to-end — exact, per the reference's
exact-decimal compares (/root/reference/db_test.go:262-267).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hhek2sqlite_spark.schema.fixtures import DEPOSIT_SENTINEL, TYP_DEPOSIT


def signed_amount(typ_col: str = "Typ", belopp_col: str = "Belopp"):
    """Ledger sign convention: deposits (Insättning) add, everything else
    subtracts (/root/reference/db_test.go:142-149: balance 0 + 1.10 - 0.10
    - 0.10 = 0.90)."""
    return F.when(F.col(typ_col) == TYP_DEPOSIT, F.col(belopp_col)).otherwise(-F.col(belopp_col))


def account_balances(konton: DataFrame, transaktioner: DataFrame) -> DataFrame:
    """Flagship A2: per-account balance = StartSaldo + sum(signed amounts).

    A deposit's account is TillKonto (FrånKonto is the '---' sentinel);
    a purchase/transfer debits FrånKonto. Broadcast join: Konton is a
    dimension table at any scale.
    """
    t = transaktioner.select(
        F.when(F.col("FrånKonto") == DEPOSIT_SENTINEL, F.col("TillKonto"))
        .otherwise(F.col("FrånKonto"))
        .alias("konto"),
        signed_amount().alias("signed"),
    )
    ledger = t.groupBy("konto").agg(F.sum("signed").alias("net"))
    return (
        F.broadcast(konton)
        .join(ledger, konton.Benämning == ledger.konto, "left")
        .select(
            "Löpnr",
            "Benämning",
            F.col("StartSaldo"),
            F.coalesce(F.col("net"), F.lit(0).cast("decimal(19,4)")).alias("net"),
            (F.col("StartSaldo") + F.coalesce(F.col("net"), F.lit(0)))
            .cast("decimal(19,4)")
            .alias("saldo"),
        )
    )


def running_balance(transaktioner: DataFrame) -> DataFrame:
    """A3: recompute the Saldo column the reference drops
    (/root/reference/hhek2sqlite.go:260): cumulative signed sum per
    account ordered by (Datum, Löpnr) — Löpnr tiebreaks because Spark
    promises no row order (SURVEY.md 2.6)."""
    t = transaktioner.withColumn(
        "konto",
        F.when(F.col("FrånKonto") == DEPOSIT_SENTINEL, F.col("TillKonto")).otherwise(
            F.col("FrånKonto")
        ),
    )
    w = (
        Window.partitionBy("konto")
        .orderBy("Datum", "Löpnr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.withColumn("Saldo", F.sum(signed_amount()).over(w).cast("decimal(19,4)")).drop(
        "konto"
    )


def point_lookup(df: DataFrame, lopnr: int) -> DataFrame:
    """P2: WHERE (Löpnr=?) — /root/reference/db_test.go:414-415."""
    return df.filter(F.col("Löpnr") == F.lit(lopnr))


def ledger_with_person(transaktioner: DataFrame, personer: DataFrame) -> DataFrame:
    """Latent FK join Transaktioner.Vem -> Personer.Namn
    (/root/reference/db_test.go:305-309)."""
    return transaktioner.join(
        F.broadcast(personer.select(F.col("Namn").alias("Vem"), F.col("Född"), F.col("Kön"))),
        "Vem",
        "left",
    )


def loan_payment_rollup(betalningar: DataFrame, lan: DataFrame) -> DataFrame:
    """Latent join J4: Betalningar.LanLopnr -> LÅN.Löpnr (secondary index
    /root/reference/hhek2sqlite.go:444, FK /root/reference/dbinfo.txt:30)
    — loan-payment reporting, the one reference join with a NULLABLE key
    (most payments are not loan payments).

    LEFT join keeps non-loan payments as one NULL-key rollup group; the
    LÅN dimension broadcasts (a household has few loans at any scale).
    Money stays DecimalType(19,4) end-to-end: per-loan interest +
    amortization totals against the loan's current debt (AktLaneskuld).
    """
    loans = lan.select(
        F.col("Löpnr").alias("LanLopnr"),
        "Langivare",
        "AktLaneskuld",
    )
    dec = "decimal(19,4)"
    return (
        betalningar.join(F.broadcast(loans), "LanLopnr", "left")
        .groupBy("LanLopnr", "Langivare", "AktLaneskuld")
        .agg(
            F.count(F.lit(1)).alias("n_payments"),
            F.sum("Belopp").cast(dec).alias("total_belopp"),
            F.sum("Ranta").cast(dec).alias("total_ranta"),
            F.sum(F.col("FastAmort") + F.col("RorligAmort")).cast(dec).alias("total_amort"),
        )
    )


def check_unique(df: DataFrame, *cols: str) -> DataFrame:
    """Uniqueness constraint as an assertion relation: offending keys
    (must be empty) — the reference's unique indexes, SURVEY.md 4.3."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_dups")).filter(F.col("n_dups") > 1)


def check_orphans(child: DataFrame, child_key: str, parent: DataFrame, parent_key: str) -> DataFrame:
    """Referential integrity via left_anti join: child rows whose FK has
    no parent (non-null keys only)."""
    return (
        child.filter(F.col(child_key).isNotNull())
        .join(parent, child[child_key] == parent[parent_key], "left_anti")
    )


def tables_equivalent(a: DataFrame, b: DataFrame) -> DataFrame:
    """Roundtrip equivalence (SURVEY.md 2.7): symmetric multiset
    difference; empty means A == A'."""
    return a.exceptAll(b).withColumn("side", F.lit("a_minus_b")).unionByName(
        b.exceptAll(a).withColumn("side", F.lit("b_minus_a"))
    )
