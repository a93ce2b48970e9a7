"""The reference's golden assertions (/root/reference/db_test.go:150-387,
checkDB1) ported onto the literal-row fixture DataFrames: row counts,
point lookups with every field, exact-decimal amounts, the derived
balance 0.90, case-sensitive non-ASCII text, and the constraint checks.
"""

from decimal import Decimal

import pytest

from hhek2sqlite_spark.plans import hhek
from hhek2sqlite_spark.schema.fixtures import golden_tables


@pytest.fixture(scope="module")
def tables(spark):
    return golden_tables(spark)


def test_row_counts(tables):
    # db_test.go:152-171: Personer=3, Platser=1, Transaktioner=3
    assert tables["Personer"].count() == 3
    assert tables["Platser"].count() == 1
    assert tables["Transaktioner"].count() == 3
    assert tables["Konton"].count() == 1
    assert tables["DtbVer"].count() == 1


def test_point_lookup_person(tables):
    # db_test.go:410-433
    row = hhek.point_lookup(tables["Personer"], 2).collect()[0]
    assert (row.Namn, row.Född, row.Kön) == ("Person Ett", 1999, "Man")
    row3 = hhek.point_lookup(tables["Personer"], 3).collect()[0]
    assert (row3.Namn, row3.Född, row3.Kön) == ("Person Två", 2001, "Kvinna")


def test_point_lookup_plats(tables):
    row = hhek.point_lookup(tables["Platser"], 1).collect()[0]
    assert row.Namn == "Plats Ett"


def test_point_lookup_transaktion_exact_decimal(tables):
    # db_test.go:470-513: every field incl. exact Belopp
    row = hhek.point_lookup(tables["Transaktioner"], 1).collect()[0]
    assert row.FrånKonto == "---"
    assert row.TillKonto == "Plånboken"
    assert row.Typ == "Insättning"
    assert row.Datum == "2020-12-24"
    assert row.Vad == "Studiestöd"
    assert row.Vem == "Gemensamt"
    assert row.Belopp == Decimal("1.1000")
    assert row.Fastöverföring is False
    assert row.Text == "En transaktion"


def test_non_ascii_case_sensitivity(tables):
    # db_test.go:316-368: € survives; räksmörgås != RÄKSMÖRGÅS
    texts = {r.Text for r in tables["Transaktioner"].collect()}
    assert "Tom € räksmörgås" in texts
    assert "Tom € RÄKSMÖRGÅS" in texts
    assert len(texts) == 3


def test_balance_reconciliation_is_090(tables):
    # db_test.go:381-386: Saldo == 0.9 exactly (0 + 1.10 - 0.10 - 0.10)
    res = hhek.account_balances(tables["Konton"], tables["Transaktioner"]).collect()
    assert len(res) == 1
    assert res[0].Benämning == "Plånboken"
    assert res[0].saldo == Decimal("0.9000")
    # and it must equal the stored Saldo column (fixture models the app)
    stored = tables["Konton"].collect()[0].Saldo
    assert res[0].saldo == stored


def test_running_balance_recomputes_saldo(tables):
    rb = hhek.running_balance(tables["Transaktioner"]).orderBy("Löpnr").collect()
    assert [r.Saldo for r in rb] == [
        Decimal("1.1000"), Decimal("1.0000"), Decimal("0.9000"),
    ]


def test_ledger_person_join(tables):
    # db_test.go:305-309: Vem resolves to a person for every row
    joined = hhek.ledger_with_person(tables["Transaktioner"], tables["Personer"])
    assert joined.filter("`Född` IS NULL").count() == 0


def test_unique_constraints_hold(tables):
    assert hhek.check_unique(tables["Personer"], "Namn").count() == 0
    assert hhek.check_unique(tables["Konton"], "Benämning").count() == 0
    assert hhek.check_unique(tables["Platser"], "Namn").count() == 0


def test_no_orphans(tables):
    # purchases point at an existing Plats (db_test.go:290-294)
    purchases = tables["Transaktioner"].filter("Typ = 'Inköp'")
    orphans = hhek.check_orphans(purchases, "TillKonto", tables["Platser"], "Namn")
    assert orphans.count() == 0


def test_table_equivalence_self(tables):
    diff = hhek.tables_equivalent(tables["Transaktioner"], tables["Transaktioner"])
    assert diff.count() == 0
