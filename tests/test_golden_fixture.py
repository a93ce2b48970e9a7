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


def _loan_fixture(spark):
    """Betalningar/LÅN rows for J4 (the golden MDB has none — the recipe
    at /root/reference/db_test.go:142-149 created no loans — so the J4
    fixture extends it: two loans, two payments on loan 1, one on loan 2,
    one non-loan payment with NULL LanLopnr)."""
    from hhek2sqlite_spark.schema.registry import HHEK_TABLES

    D = Decimal
    z = D("0.0000")
    lan_rows = [
        (1, "Banken", "Bolån", "L-1", D("1000.0000"), "2020-01-01", "2020-01-01",
         "", "", D("900.0000"), z, D("900.0000"), 0.035, 0.0, "12",
         D("2.5000"), D("10.0000"), z, z, "", "Gemensamt", "Plånboken", "",
         "", "", "", ""),
        (2, "Kreditgivaren", "Billån", "L-2", D("500.0000"), "2021-06-01",
         "2021-06-01", "", "", D("400.0000"), z, D("400.0000"), 0.059, 0.0,
         "12", D("1.0000"), D("5.0000"), z, z, "", "Person Ett", "Plånboken",
         "", "", "", "", ""),
    ]
    bet_rows = [
        (1, "Plånboken", "Plats Ett", "Lån", "2021-01-15", "Amortering",
         "Gemensamt", D("12.5000"), "", D("2.5000"), D("10.0000"), z, z, 1, ""),
        (2, "Plånboken", "Plats Ett", "Lån", "2021-02-15", "Amortering",
         "Gemensamt", D("12.5000"), "", D("2.5000"), D("10.0000"), z, z, 1, ""),
        (3, "Plånboken", "Plats Ett", "Lån", "2021-02-20", "Amortering",
         "Person Ett", D("6.0000"), "", D("1.0000"), D("5.0000"), z, z, 2, ""),
        (4, "Plånboken", "Plats Ett", "Räkning", "2021-03-01", "El",
         "Gemensamt", D("30.0000"), "", z, z, z, z, None, ""),
    ]
    lan = spark.createDataFrame(lan_rows, HHEK_TABLES["LÅN"].spark_schema())
    bet = spark.createDataFrame(bet_rows, HHEK_TABLES["Betalningar"].spark_schema())
    return bet, lan


def test_loan_payment_rollup(spark):
    # J4: Betalningar.LanLopnr -> LÅN.Löpnr (hhek2sqlite.go:444, dbinfo.txt:30)
    bet, lan = _loan_fixture(spark)
    rows = {r.LanLopnr: r for r in hhek.loan_payment_rollup(bet, lan).collect()}
    assert set(rows) == {1, 2, None}
    loan1 = rows[1]
    assert loan1.Langivare == "Banken"
    assert loan1.AktLaneskuld == Decimal("900.0000")
    assert loan1.n_payments == 2
    assert loan1.total_belopp == Decimal("25.0000")
    assert loan1.total_ranta == Decimal("5.0000")
    assert loan1.total_amort == Decimal("20.0000")
    loan2 = rows[2]
    assert loan2.Langivare == "Kreditgivaren"
    assert loan2.n_payments == 1
    assert loan2.total_amort == Decimal("5.0000")
    # non-loan payments roll into the NULL-key group, loan columns NULL
    other = rows[None]
    assert other.Langivare is None
    assert other.n_payments == 1
    assert other.total_belopp == Decimal("30.0000")
