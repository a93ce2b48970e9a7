"""End-to-end CLI test: the module main converts SQLite -> parquet ->
SQLite and the roundtrip preserves every table (the reference's Test1
shape, /root/reference/db_test.go:83-140, driven through the argparse
face instead of Go flags)."""

import os

from hhek2sqlite_spark.__main__ import build_parser, main
from hhek2sqlite_spark.plans import hhek
from hhek2sqlite_spark.schema.fixtures import golden_tables
from hhek2sqlite_spark.sources.sqlite_io import read_database, write_database


def test_cli_roundtrip(spark, tmp_path):
    src_db = str(tmp_path / "src.db")
    par_dir = str(tmp_path / "parquet")
    dst_db = str(tmp_path / "roundtrip.db")

    tables = golden_tables(spark)
    write_database(tables, src_db)

    # forward: SQLite -> parquet (the reference's optin/optout flags)
    assert main(["convert", "--optin", src_db, "--optout", par_dir, "--readonly"]) == 0
    assert os.path.isdir(os.path.join(par_dir, "Transaktioner"))

    # reverse: parquet -> SQLite, with the reverse-direction indexes (S5)
    assert main(["convert", "--optin", par_dir, "--optout", dst_db, "--indexes"]) == 0

    back = read_database(spark, dst_db)
    for name, df in tables.items():
        assert hhek.tables_equivalent(df, back[name]).count() == 0, name

    # S5: reverse direction created secondary indexes
    import sqlite3

    con = sqlite3.connect(dst_db)
    try:
        idx = {r[0] for r in con.execute(
            "SELECT name FROM sqlite_master WHERE type='index' AND name LIKE '%idx%'"
        )}
    finally:
        con.close()
    # registry renders table-prefixed names, e.g. Personer_idxNamn
    assert "Personer_idxNamn" in idx and "Platser_idxNamn" in idx


def test_cli_rejects_missing_args(capsys):
    parser = build_parser()
    try:
        parser.parse_args(["convert"])
        raised = False
    except SystemExit:
        raised = True
    assert raised


def test_cli_query_list_and_run(capsys):
    assert main(["query", "--list"]) == 0
    names = capsys.readouterr().out.split()
    assert "balance_reconciliation" in names and len(names) >= 78

    assert main(["query", "row_counts", "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    out = capsys.readouterr().out
    assert "row_counts: " in out and "rows" in out

    assert main(["query", "no_such_query"]) == 2
    assert main(["query"]) == 2
