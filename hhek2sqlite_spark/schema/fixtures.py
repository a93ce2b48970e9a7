"""Golden fixture: the reference's test dataset as literal DataFrames.

Contents mirror the GOTEST1.MDB recipe (/root/reference/db_test.go:142-149)
and seed rows (/root/reference/dbinfo.txt:191-193): 3 Personer, 1 Plats,
1 Konto ('Plånboken'), 3 Transaktioner on 2020-12-24, 1 DtbVer row.
Deliberately includes the reference's non-ASCII / case-sensitivity probes
(€ is 0x80 in windows-1252; 'räksmörgås' vs 'RÄKSMÖRGÅS' must stay
distinct — /root/reference/db_test.go:148-149,316-368).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from hhek2sqlite_spark.schema.registry import HHEK_TABLES

D = Decimal

GOLDEN_ROWS: dict[str, list[tuple]] = {
    "DtbVer": [("3.01", "Databas med stöd för betalning till Postgirot", " ")],
    "Platser": [(1, "Plats Ett", "", "", "")],
    "Personer": [
        (1, "Gemensamt", 0, "Gemensamt"),
        (2, "Person Ett", 1999, "Man"),
        (3, "Person Två", 2001, "Kvinna"),
    ],
    "Konton": [
        (1, "", "Plånboken", D("0.9000"), D("0.0000"), "", D("0.0000"), ""),
    ],
    "BetalKonton": [],
    "Överföringar": [],
    "Betalningar": [],
    "LÅN": [],
    "Budget": [],
    "Transaktioner": [
        (1, "---", "Plånboken", "Insättning", "2020-12-24", "Studiestöd",
         "Gemensamt", D("1.1000"), None, False, "En transaktion"),
        (2, "Plånboken", "Plats Ett", "Inköp", "2020-12-24", "Livsmedel",
         "Person Ett", D("0.1000"), None, False, "Tom € räksmörgås"),
        (3, "Plånboken", "Plats Ett", "Inköp", "2020-12-24", "Livsmedel",
         "Person Två", D("0.1000"), None, False, "Tom € RÄKSMÖRGÅS"),
    ],
}

# Sentinel FrånKonto for deposits (/root/reference/db_test.go:237-241)
DEPOSIT_SENTINEL = "---"
TYP_DEPOSIT = "Insättning"
TYP_PURCHASE = "Inköp"


def golden_table(spark: SparkSession, name: str) -> DataFrame:
    spec = HHEK_TABLES[name]
    return spark.createDataFrame(GOLDEN_ROWS[name], spec.spark_schema())


def golden_tables(spark: SparkSession) -> dict[str, DataFrame]:
    return {name: golden_table(spark, name) for name in HHEK_TABLES}
