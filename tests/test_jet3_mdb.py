"""Jet 3 reader tests against the synthetic fixture (tests/jet3_fixture.py
— independent byte-level builder from the same public mdbtools format
description; see JET_VALIDATION.md for what this does and does not prove).

Checks mirror checkDB1 (/root/reference/db_test.go:150-171): row counts
3/1/3, the 0.90 account balance, the cp1252 € / räksmörgås probes —
plus the Jet-3-specific machinery: self-describing TDEFs, null bitmap
over all columns, booleans in the bitmap, deleted-row skip, long-row
jump table, inline/LVAL/chain memos, datetime doubles, and the version
dispatch (Jet 2.0 passthrough, Jet 4/ACE refusal by name)."""

from __future__ import annotations

from datetime import datetime
from decimal import Decimal

import pytest

from tests.jet3_fixture import (
    CHAIN_TEXT,
    LONG_PAD,
    LVAL_SINGLE,
    build_jet3,
    build_jet4_header,
)


@pytest.fixture(scope="module")
def jet3_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("jet3") / "fixture.mdb"
    build_jet3(str(p))
    return str(p)


@pytest.fixture(scope="module")
def jet3(jet3_path):
    from hhek2sqlite_spark.sources.jet3 import Jet3File

    return Jet3File(jet3_path)


def test_catalog_lists_user_tables_only(jet3):
    assert set(jet3.tables) == {
        "Personer", "Platser", "Konton", "Transaktioner", "Typer"
    }


def test_checkdb1_row_counts(jet3):
    # the deleted Personer row must not count
    assert jet3.row_count("Personer") == 3
    assert jet3.row_count("Platser") == 1
    assert jet3.row_count("Transaktioner") == 3


def test_personer_values_and_deleted_row_skipped(jet3):
    rows = jet3.read_rows("Personer")
    assert [r["Löpnr"] for r in rows] == [1, 2, 3]
    assert [r["Född"] for r in rows] == [0, 1999, 2001]
    assert rows[1]["Namn"] == "Person Ett"
    assert rows[2]["Kön"] == "Kvinna"
    assert not any(r["Namn"] == "Borttagen" for r in rows)


def test_konton_balance_exact_decimal(jet3):
    (r,) = jet3.read_rows("Konton")
    assert r["Saldo"] == Decimal("0.9000")
    assert r["StartSaldo"] == Decimal("0.0000")
    assert r["Benämning"] == "Plånboken"


def test_transaktioner_cp1252_and_nulls_and_bools(jet3):
    rows = jet3.read_rows("Transaktioner")
    assert [r["Belopp"] for r in rows] == [
        Decimal("1.1000"), Decimal("0.1000"), Decimal("0.1000")
    ]
    assert all(r["Saldo"] is None for r in rows)  # NULL fixed column
    assert [r["Fastöverföring"] for r in rows] == [False, False, True]
    assert rows[1]["Text"] == "Tom € räksmörgås"
    assert rows[2]["Text"] == "Tom € RÄKSMÖRGÅS"  # case stays distinct
    # ledger semantics reproduce the 0.90 balance
    bal = sum(
        r["Belopp"] if r["Typ"] == "Insättning" else -r["Belopp"]
        for r in rows
    )
    assert bal == Decimal("0.9000")


def test_typer_scalar_types(jet3):
    rows = {r["Id"]: r for r in jet3.read_rows("Typer")}
    assert rows[1]["B"] == 7
    assert rows[1]["F"] == 1.5
    assert rows[1]["D"] == 2.25
    assert rows[1]["När"] == datetime(2020, 12, 24)
    assert rows[1]["Aktiv"] is True
    assert rows[4]["När"] == datetime(2024, 2, 29)
    # NULLs across every fixed type
    assert rows[3]["B"] is None and rows[3]["F"] is None
    assert rows[3]["D"] is None and rows[3]["När"] is None


def test_memo_inline_lval_and_chain(jet3):
    rows = {r["Id"]: r for r in jet3.read_rows("Typer")}
    assert rows[1]["Note"] == "kort anteckning"
    assert rows[2]["Note"] == LVAL_SINGLE.decode("cp1252")
    assert rows[3]["Note"] == CHAIN_TEXT
    assert rows[4]["Note"] is None


def test_long_row_jump_table(jet3):
    rows = {r["Id"]: r for r in jet3.read_rows("Typer")}
    assert rows[2]["Pad"] == LONG_PAD  # 400-char value in a >255B row


def test_sniff_and_dispatch(jet3_path, tmp_path):
    from hhek2sqlite_spark.sources.jet3 import Jet3File
    from hhek2sqlite_spark.sources.mdb import open_mdb, sniff_mdb_version

    assert sniff_mdb_version(jet3_path) == "jet3"
    assert isinstance(open_mdb(jet3_path), Jet3File)
    # Jet 2.0 passthrough
    from hhek2sqlite_spark.sources.jet2 import Jet2File, default_mdb_path

    p2 = default_mdb_path()
    if p2 is not None:
        assert sniff_mdb_version(p2) == "jet2"
        assert isinstance(open_mdb(p2), Jet2File)
    # Jet 4: dispatched to the native Jet 4 reader (r12) — a bare
    # header page parses no catalog, so the structural error must come
    # from the Jet 4 parser, not a version refusal
    p4 = str(tmp_path / "jet4.mdb")
    build_jet4_header(p4)
    assert sniff_mdb_version(p4) == "jet4"
    with pytest.raises(ValueError, match="page 2 beyond file end"):
        open_mdb(p4)
    # ACE (r13): dispatched into the Jet 4 parser (shared structure per
    # the public mdbtools dispatch) — a bare header page fails
    # STRUCTURALLY in the parser, not with a version refusal
    pace = str(tmp_path / "ace.mdb")
    hdr = bytearray(4096)
    hdr[0:2] = b"\x00\x01"
    hdr[4:20] = b"Standard Jet DB\x00"
    hdr[0x14] = 0x02
    with open(pace, "wb") as fh:
        fh.write(bytes(hdr))
    assert sniff_mdb_version(pace) == "ace"
    with pytest.raises(ValueError, match="page 2 beyond file end"):
        open_mdb(pace)


def test_jet2_reader_names_jet3_and_points_at_new_reader(jet3_path):
    from hhek2sqlite_spark.sources.jet2 import Jet2File

    with pytest.raises(ValueError, match="Jet 3.*jet3"):
        Jet2File(jet3_path)


def test_jet3_reader_refuses_jet2(tmp_path):
    from hhek2sqlite_spark.sources.jet2 import default_mdb_path
    from hhek2sqlite_spark.sources.jet3 import Jet3File

    p2 = default_mdb_path()
    if p2 is None:
        pytest.skip("GOTEST1.MDB fixture absent")
    with pytest.raises(ValueError, match="Jet 2.0"):
        Jet3File(p2)


def test_spark_dataframes_typed(spark, jet3_path):
    from hhek2sqlite_spark.sources.jet3 import jet3_read_database

    dfs = jet3_read_database(spark, jet3_path)
    t = dfs["Transaktioner"]
    kinds = dict(t.dtypes)
    assert kinds["Belopp"] == "decimal(19,4)"
    assert kinds["Fastöverföring"] == "boolean"
    assert t.count() == 3
    ty = dfs["Typer"]
    kinds = dict(ty.dtypes)
    assert kinds["När"] == "timestamp"
    assert kinds["F"] == "float" and kinds["D"] == "double"
    assert kinds["B"] == "int" and kinds["Note"] == "string"
    pers = dfs["Personer"]
    assert dict(pers.dtypes)["Född"] == "smallint"


def test_cli_convert_jet3_to_sqlite(spark, jet3_path, tmp_path):
    """End-to-end: the convert() path a reference user runs, with a
    Jet 3 source — the vintage the reference's ODBC driver accepted
    but sources/jet2.py refuses."""
    import sqlite3

    from hhek2sqlite_spark.sources.sqlite_io import convert

    out = str(tmp_path / "out.db")
    counts = convert(spark, jet3_path, out)
    assert counts["Personer"] == 3
    assert counts["Transaktioner"] == 3
    con = sqlite3.connect(out)
    try:
        n = con.execute("SELECT COUNT(*) FROM Personer").fetchone()[0]
        assert n == 3
        texts = [
            r[0]
            for r in con.execute(
                "SELECT Text FROM Transaktioner ORDER BY Löpnr"
            )
        ]
        assert texts[1] == "Tom € räksmörgås"
    finally:
        con.close()


def test_overflow_pointer_row_read_exactly_once(jet3):
    """Typer Id=4 is stored on PG_OVF and reached ONLY via a 0x4000
    lookup slot on the main data page; the overflow page is owned by
    the same TDEF, so the sequential scan must not double-read it,
    and the deleted decoy at overflow slot 0 must stay invisible."""
    ids = [r["Id"] for r in jet3.read_rows("Typer")]
    assert sorted(ids) == [1, 2, 3, 4]  # 4 exactly once, never 666
    assert jet3.row_count("Typer") == 4
