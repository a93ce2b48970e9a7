"""Parity with the reference's own MDB fixture test (checkDB1,
/root/reference/db_test.go:150-171): read GOTEST1.MDB with the pure
Python Jet 2.0 reader and reproduce every assertion the reference's
Windows/ODBC path makes — row counts, person/place/transaction values,
the cp1252 Euro sign, and the golden saldo 0.90 — then run the
flagship balance reconciliation on the REAL HHEK data through Spark.

Skips (not fails) when the read-only fixture is absent."""

from __future__ import annotations

from decimal import Decimal

import pytest

from hhek2sqlite_spark.sources.jet2 import (
    HHEK_SCHEMAS,
    Jet2File,
    default_mdb_path,
    jet2_table,
)

MDB = default_mdb_path()
pytestmark = pytest.mark.skipif(MDB is None, reason="GOTEST1.MDB fixture absent")


@pytest.fixture(scope="module")
def mdb():
    return Jet2File(MDB)


def test_catalog_lists_all_ten_hhek_tables(mdb):
    assert set(mdb.tables) == {
        "DtbVer",
        "Konton",
        "Personer",
        "Transaktioner",
        "Överföringar",
        "Budget",
        "Platser",
        "BetalKonton",
        "Betalningar",
        "LÅN",
    }


def test_row_counts_match_checkdb1(mdb):
    # db_test.go:151-170: Personer 3, Platser 1, Transaktioner 3
    assert mdb.row_count("Personer") == 3
    assert mdb.row_count("Platser") == 1
    assert mdb.row_count("Transaktioner") == 3


def test_personer_rows_match_checkdb1(mdb):
    # db_test.go:172-222 (hämtaPerson 1..3)
    rows = {r["Löpnr"]: r for r in mdb.read_rows("Personer")}
    assert rows[1]["Namn"] == "Gemensamt"
    assert rows[1]["Född"] == "0"
    assert rows[1]["Kön"] == "Gemensamt"
    assert rows[2]["Namn"] == "Person Ett"
    assert rows[2]["Född"] == "1999"
    assert rows[2]["Kön"] == "Man"
    assert rows[3]["Namn"] == "Person Två"
    assert rows[3]["Född"] == "2001"
    assert rows[3]["Kön"] == "Kvinna"


def test_platser_row_matches_checkdb1(mdb):
    (row,) = mdb.read_rows("Platser")
    assert row["Namn"] == "Plats Ett"


def test_transaktion_1_matches_checkdb1(mdb):
    rows = {r["Löpnr"]: r for r in mdb.read_rows("Transaktioner")}
    t1 = rows[1]
    assert t1["Typ"] == "Insättning"
    assert t1["FrånKonto"] == "---"
    assert t1["TillKonto"] == "Plånboken"
    assert t1["Vad"] == "Studiestöd"
    assert t1["Datum"] == "2020-12-24"
    assert t1["Vem"] == "Gemensamt"
    assert t1["Belopp"] == Decimal("1.10")
    assert t1["Text"] == "En transaktion"
    assert t1["Fastöverföring"] is False


def test_transaction_euro_sign_and_case_pair(mdb):
    # the reference's non-ASCII fixture pair: cp1252 0x80 = Euro, and
    # the upper/lower comment twins that exercise collation defects
    texts = {r["Löpnr"]: r["Text"] for r in mdb.read_rows("Transaktioner")}
    assert texts[2] == "Tom € räksmörgås"
    assert texts[3] == "Tom € RÄKSMÖRGÅS"
    vems = {r["Löpnr"]: r["Vem"] for r in mdb.read_rows("Transaktioner")}
    assert vems[2] == "Person Ett" and vems[3] == "Person Två"


def test_konto_saldo_is_golden_090(mdb):
    # db_test.go:374-385: Konto 1 Benämning 'Plånboken', saldo 0.90
    (k,) = mdb.read_rows("Konton")
    assert k["Benämning"] == "Plånboken"
    assert k["Saldo"] == Decimal("0.90")
    assert k["Löpnr"] == 1


def test_transaktion_saldo_column_is_null(mdb):
    # the fixed-column bitmap marks Saldo absent on every transaction
    # row — the running saldo lives in Konton, not per-transaction
    assert all(r["Saldo"] is None for r in mdb.read_rows("Transaktioner"))


def test_spark_balance_reconciliation_on_real_mdb(spark):
    """The flagship query on REAL reference data: signed transaction
    sum (Insättning +, everything else -) must equal Konton.Saldo —
    the same 0.90 the reference's golden test asserts."""
    from pyspark.sql import functions as F

    trans = jet2_table(spark, MDB, "Transaktioner")
    konton = jet2_table(spark, MDB, "Konton")
    signed = trans.select(
        F.when(F.col("Typ") == "Insättning", F.col("Belopp"))
        .otherwise(-F.col("Belopp"))
        .alias("signed")
    )
    total = signed.agg(F.sum("signed").alias("s")).collect()[0].s
    saldo = konton.collect()[0].Saldo
    assert total == saldo == Decimal("0.9000")


def test_jet2_table_schema_types(spark):
    df = jet2_table(spark, MDB, "Transaktioner")
    kinds = dict(df.dtypes)
    assert kinds["Belopp"] == "decimal(19,4)"
    assert kinds["Löpnr"] == "int"
    assert kinds["Fastöverföring"] == "boolean"
    assert kinds["Text"] == "string"
    assert df.count() == 3


def test_budget_layout_verified_against_real_bytes(mdb):
    """Budget's derived layout (round 7) decodes GOTEST1's 34 default
    budget entries coherently: this is the fixture that DISAMBIGUATED
    the reversed null-bitmap byte order (15 fixed cols -> 2 mask
    bytes) — all months present at 0.00, Kontrollnr NULL over junk
    bytes, Löpnr a clean 1..34 sequence."""
    from decimal import Decimal

    rows = mdb.read_rows("Budget")
    assert len(rows) == mdb.row_count("Budget") == 34
    assert sorted(r["Löpnr"] for r in rows) == list(range(1, 35))
    assert all(r["Kontrollnr"] is None for r in rows)
    months = ("Jan", "Feb", "Mar", "Apr", "Maj", "Jun",
              "Jul", "Aug", "Sep", "Okt", "Nov", "Dec")
    assert all(r[m] == Decimal("0") for r in rows for m in months)
    assert {r["Inkomst"] for r in rows} == {"J", "N"}
    assert "Lön efter skatt" in {r["Typ"] for r in rows}
    assert all(r["HurOfta"] == 1 for r in rows)


def test_raw_decode_unregistered_layout(mdb):
    # schema-less decode still works on any table's raw rows
    from hhek2sqlite_spark.sources.jet2 import _decode_row

    raws = [
        _decode_row(r, None) for r in mdb._raw_rows(mdb.tables["Budget"])
    ]
    assert len(raws) == 34
    all_var = {v for r in raws for v in r["_var"]}
    assert "Lön efter skatt" in all_var


def test_schemas_cover_all_ten_hhek_tables():
    assert set(HHEK_SCHEMAS) == {
        "Personer", "Platser", "BetalKonton", "DtbVer", "Transaktioner",
        "Konton", "Betalningar", "LÅN", "Överföringar", "Budget",
    }


# writer (S8 closure) --------------------------------------------------------


def test_write_jet2_roundtrips_gotest1(mdb, tmp_path):
    """Read the reference fixture, write a fresh .mdb with the writer,
    read it back with the independent reader: every typed table must
    survive value-identically — the reference's own MDB->MDB test shape
    (db_test.go Test1 writes GOTEST1b.mdb and re-checks it)."""
    from hhek2sqlite_spark.sources.jet2 import write_jet2

    names = ("Personer", "Platser", "Transaktioner", "Konton", "BetalKonton", "DtbVer")
    tables = {n: (HHEK_SCHEMAS[n], mdb.read_rows(n)) for n in names}
    out = str(tmp_path / "copy.mdb")
    write_jet2(out, tables)
    back = Jet2File(out)
    assert set(back.tables) == set(names)
    for n in names:
        assert back.read_rows(n) == mdb.read_rows(n)


def test_write_jet2_null_and_bool_fixed_columns(tmp_path):
    from hhek2sqlite_spark.sources.jet2 import write_jet2

    schema = HHEK_SCHEMAS["Transaktioner"]
    rows = [
        {
            "Belopp": Decimal("12.3456"),
            "Löpnr": 1,
            "Saldo": None,  # NULL fixed column -> bitmap bit clear
            "Fastöverföring": True,  # bool lives in the bitmap
            "FrånKonto": "A",
            "TillKonto": "B",
            "Typ": "Inköp",
            "Datum": "2021-01-01",
            "Vad": "åäö €",  # cp1252 payload
            "Vem": "",
            "Text": "x" * 100,
        }
    ]
    p = str(tmp_path / "t.mdb")
    write_jet2(p, {"Transaktioner": (schema, rows)})
    (got,) = Jet2File(p).read_rows("Transaktioner")
    assert got == rows[0] | {"Belopp": Decimal("12.3456")}


def test_write_jet2_multipage_table(tmp_path):
    """More rows than one 2048-byte page holds -> multiple data pages,
    all grouped back to the table by the TDEF pointer."""
    from hhek2sqlite_spark.sources.jet2 import write_jet2

    schema = HHEK_SCHEMAS["Personer"]
    rows = [
        {"Löpnr": i, "Namn": f"Person {i:04d}", "Född": "1990", "Kön": "X" * 8}
        for i in range(200)
    ]
    p = str(tmp_path / "many.mdb")
    write_jet2(p, {"Personer": (schema, rows)})
    f = Jet2File(p)
    assert f.row_count("Personer") == 200
    assert f.read_rows("Personer") == rows
    # genuinely multi-page (each row ~30B; 200 rows > one page)
    assert len(f._pages_by_tdef[f.tables["Personer"]]) >= 3


# derived layouts (round 7): writer-roundtrip validation ---------------------


def _roundtrip(tmp_path, table, rows):
    from hhek2sqlite_spark.sources.jet2 import write_jet2

    p = str(tmp_path / f"{table}.mdb")
    write_jet2(p, {table: (HHEK_SCHEMAS[table], rows)})
    return Jet2File(p).read_rows(table)


def test_betalningar_roundtrip(tmp_path):
    rows = [
        {
            "Belopp": Decimal("-1234.5600"),
            "Löpnr": 1,
            "Ranta": Decimal("12.0000"),
            "FastAmort": None,
            "RorligAmort": Decimal("0.0000"),
            "OvrUtg": Decimal("3.2100"),
            "LanLopnr": 7,
            "FrånKonto": "Lönekonto",
            "TillPlats": "Banken",
            "Typ": "Lån",
            "Datum": "2021-03-31",
            "Vad": "Räntebetalning",
            "Vem": "Åsa",
            "Text": "kvartalsränta",
            "Grey": "",
        },
        {
            "Belopp": Decimal("0.0100"),
            "Löpnr": 2,
            "Ranta": None,
            "FastAmort": Decimal("100.0000"),
            "RorligAmort": None,
            "OvrUtg": None,
            "LanLopnr": None,
            "FrånKonto": "X",
            "TillPlats": "Y",
            "Typ": "",
            "Datum": "2021-04-01",
            "Vad": "",
            "Vem": "",
            "Text": "",
            "Grey": "GG",
        },
    ]
    assert _roundtrip(tmp_path, "Betalningar", rows) == rows


def test_lan_roundtrip_with_single_and_memo(tmp_path):
    import struct

    rows = [
        {
            "TotLanebelopp": Decimal("1500000.0000"),
            "AktLaneskuld": Decimal("1234567.8900"),
            "RorligDel": Decimal("500000.0000"),
            "FastDel": Decimal("1000000.0000"),
            # float32-representable values roundtrip exactly
            "FastRanta": struct.unpack("<f", struct.pack("<f", 3.25))[0],
            "RorligRanta": struct.unpack("<f", struct.pack("<f", 4.5))[0],
            "Ranta": Decimal("4062.5000"),
            "FastAmort": Decimal("2000.0000"),
            "RorligAmort": None,
            "OvrUtg": Decimal("0.0000"),
            "Löpnr": 1,
            "Langivare": "SBAB",
            "EgenBeskrivn": "Bolån",
            "LanNummer": "123-456-789",
            "StartDatum": "2020-01-01",
            "RegDatum": "2020-01-02",
            "RantJustDatum": "2025-01-01",
            "SlutBetDatum": "2060-01-01",
            "HurOfta": "M",
            "Rakning": "J",
            "Vem": "Åsa & Örjan",
            "FrånKonto": "Lönekonto",
            "Grey": "",
            "Anteckningar": "kort inline-anteckning",  # MEMO inline text
            "BudgetRanta": "4100",
            "BudgetAmort": "2000",
            "BudgetOvriga": "",
        }
    ]
    assert _roundtrip(tmp_path, "LÅN", rows) == rows


def test_overforingar_roundtrip(tmp_path):
    rows = [
        {
            "Belopp": Decimal("500.0000"),
            "Löpnr": i,
            "Kontrollnr": None if i % 2 else i * 10,
            "FrånKonto": "Lönekonto",
            "TillKonto": "Sparkonto",
            "Datum": "2021-01-25",
            "HurOfta": "Månadsvis",
            "Vad": "Sparande",
            "Vem": "Åsa",
            "TillDatum": "",
            "Rakning": "N",
        }
        for i in range(1, 8)
    ]
    assert _roundtrip(tmp_path, "Överföringar", rows) == rows


def test_budget_roundtrip_of_real_fixture_rows(mdb, tmp_path):
    """The strongest validation available for a derived layout: re-encode
    the REAL 34 GOTEST1 Budget rows (15 fixed cols -> 2-byte reversed
    null bitmap) and decode them back value-identically."""
    rows = mdb.read_rows("Budget")
    assert _roundtrip(tmp_path, "Budget", rows) == rows


def test_spark_reverse_conversion_to_mdb(spark, tmp_path):
    """The reference's reverse direction (-backa: SQLite -> MDB), as
    Spark DataFrame -> .mdb: write Personer through jet2_write_table
    and read it back typed."""
    from hhek2sqlite_spark.sources.jet2 import jet2_table, jet2_write_table

    df = jet2_table(spark, MDB, "Personer")
    out = str(tmp_path / "back.mdb")
    assert jet2_write_table(df, out, "Personer") == 3
    back = jet2_table(spark, out, "Personer")
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
