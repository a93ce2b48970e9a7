"""Roundtrip property: read(write(df)) == df per table, including the
reference's defect cases as *fixed* behavior (SURVEY.md 2.12 — the bugs
become tests): Betalningar keeps a non-empty Text (the reference drops
the 15th value), OvrUtg stays exact decimal (reference quotes it as a
string), Överföringar's NULL Kontrollnr survives, quotes and non-ASCII
survive without escaping machinery.
"""

from decimal import Decimal

import pytest

from hhek2sqlite_spark.plans import hhek
from hhek2sqlite_spark.schema.fixtures import golden_tables
from hhek2sqlite_spark.schema.registry import HHEK_TABLES
from hhek2sqlite_spark.sources import sqlite_io

D = Decimal


@pytest.fixture(scope="module")
def extra_tables(spark):
    """Rows exercising the defect-shaped paths on the tables the golden
    fixture leaves empty."""
    t = golden_tables(spark)
    t["Betalningar"] = spark.createDataFrame(
        [
            # non-empty Text: the reference's 14-of-15-columns INSERT bug
            # (/root/reference/hhek2sqlite.go:521-536) would lose this
            (1, "Plånboken", "Plats Ett", "Bet", "2020-12-24", "Hyra",
             "Person Ett", D("100.0000"), 'O\'Brien "quoted" text', D("1.2500"),
             D("0.0000"), D("0.0000"), D("9.9900"), None, ""),
            (2, "Plånboken", "Plats Ett", "Bet", "2020-12-25", "Lån",
             "Person Två", D("200.0000"), "", D("0.0000"),
             D("50.0000"), D("25.0000"), D("0.0001"), 1, "G"),
        ],
        HHEK_TABLES["Betalningar"].spark_schema(),
    )
    t["Överföringar"] = spark.createDataFrame(
        [
            # NULL Kontrollnr: empty-bytes -> NULL path (hhek2sqlite.go:639-643)
            (1, "Plånboken", "Sparkonto", D("500.0000"), "2020-12-01",
             "Månadsvis", "Sparande", "Gemensamt", None, "2021-12-01", "N"),
            (2, "Sparkonto", "Plånboken", D("0.5000"), "2020-12-15",
             "En gång", "Återföring", "Gemensamt", 42, "", "J"),
        ],
        HHEK_TABLES["Överföringar"].spark_schema(),
    )
    t["LÅN"] = spark.createDataFrame(
        [
            (1, "Banken AB", "Bolån", "L-123", D("1000000.0000"), "2015-01-01",
             "2015-01-02", "2025-01-01", "2045-01-01", D("800000.0000"),
             D("300000.0000"), D("500000.0000"), 1.25, 2.5, "M",
             D("1500.0000"), D("1000.0000"), D("500.0000"), D("25.0000"),
             "J", "Gemensamt", "Plånboken", "", "Anteckning med å ä ö €",
             "BudgetR", "BudgetA", "BudgetÖ"),
        ],
        HHEK_TABLES["LÅN"].spark_schema(),
    )
    t["Budget"] = spark.createDataFrame(
        [
            (1, "Mat", "N", 1, "Januari",
             D("100.0000"), D("100.0000"), D("100.0000"), D("100.0000"),
             D("100.0000"), D("100.0000"), D("100.0000"), D("100.0000"),
             D("100.0000"), D("100.0000"), D("100.0000"), D("100.0000"), None),
        ],
        HHEK_TABLES["Budget"].spark_schema(),
    )
    t["BetalKonton"] = spark.createDataFrame(
        [(1, "Girokonto", "12345-6", "K-1", "S-1")],
        HHEK_TABLES["BetalKonton"].spark_schema(),
    )
    return t


def test_full_database_roundtrip(spark, extra_tables, tmp_path):
    db = str(tmp_path / "hhek.db")
    counts = sqlite_io.write_database(extra_tables, db)
    assert counts["Transaktioner"] == 3 and counts["Betalningar"] == 2
    back = sqlite_io.read_database(spark, db)
    assert set(back) == set(extra_tables)
    for name, original in extra_tables.items():
        diff = hhek.tables_equivalent(original, back[name])
        assert diff.count() == 0, f"{name} roundtrip mismatch: {diff.collect()[:5]}"


def test_betalningar_text_survives(spark, extra_tables, tmp_path):
    db = str(tmp_path / "b.db")
    sqlite_io.write_database({"Betalningar": extra_tables["Betalningar"]}, db)
    row = (
        sqlite_io.read_table(spark, db, "Betalningar")
        .filter("`Löpnr` = 1").collect()[0]
    )
    assert row.Text == 'O\'Brien "quoted" text'  # quote fidelity, no escaping bug
    assert row.OvrUtg == D("9.9900")  # exact decimal, not a quoted string
    assert row.LanLopnr is None


def test_kontrollnr_null_roundtrip(spark, extra_tables, tmp_path):
    db = str(tmp_path / "k.db")
    sqlite_io.write_database({"Överföringar": extra_tables["Överföringar"]}, db)
    rows = {r.Löpnr: r for r in sqlite_io.read_table(spark, db, "Överföringar").collect()}
    assert rows[1].Kontrollnr is None
    assert rows[2].Kontrollnr == 42


def test_double_write_idempotent(spark, extra_tables, tmp_path):
    # S6 truncate-before-load: writing twice must not duplicate rows
    db = str(tmp_path / "i.db")
    sqlite_io.write_database({"Personer": extra_tables["Personer"]}, db)
    sqlite_io.write_table(extra_tables["Personer"], db, "Personer")
    assert sqlite_io.read_table(spark, db, "Personer").count() == 3


def test_money_precision_envelope(spark, tmp_path):
    """The NUMERIC-affinity money column is double-limited by design
    (format parity with the reference — see sqlite_io module docstring):
    <=15 significant digits roundtrip exactly; an 18-digit amount is
    coerced to REAL storage and re-quantized, documenting the envelope
    rather than silently claiming exactness."""
    exact = D("12345678901.2345")        # 15 sig digits: inside the envelope
    beyond = D("12345678901234.5678")    # 18 sig digits: beyond double
    rows = [
        (1, "", "Konto Exakt", exact, D("0.0000"), "", D("0.0000"), ""),
        (2, "", "Konto Bortom", beyond, D("0.0000"), "", D("0.0000"), ""),
    ]
    df = spark.createDataFrame(rows, HHEK_TABLES["Konton"].spark_schema())
    db = str(tmp_path / "prec.db")
    sqlite_io.write_database({"Konton": df}, db)
    back = {r.Löpnr: r.Saldo for r in sqlite_io.read_table(spark, db, "Konton").collect()}
    assert back[1] == exact
    # beyond the envelope: value comes back double-rounded, not exact
    assert back[2] != beyond
    assert abs(back[2] - beyond) < D("0.01")


def test_convert_sqlite_to_parquet_and_back(spark, extra_tables, tmp_path):
    db1 = str(tmp_path / "src.db")
    pq = str(tmp_path / "pq")
    db2 = str(tmp_path / "dst.db")
    sqlite_io.write_database(extra_tables, db1)
    sqlite_io.convert(spark, db1, pq)
    sqlite_io.convert(spark, pq, db2, create_indexes=True)
    back = sqlite_io.read_database(spark, db2)
    for name, original in extra_tables.items():
        assert hhek.tables_equivalent(original, back[name]).count() == 0, name
    # reverse direction creates the secondary indexes (SURVEY.md 2.12)
    import sqlite3

    con = sqlite3.connect(db2)
    idx = {r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='index'")}
    con.close()
    assert "Platser_idxNamn" in idx and "Personer_idxNamn" in idx
    assert len([i for i in idx if "_idx" in i]) == 15
