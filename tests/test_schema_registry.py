"""Schema registry sanity: the 10 tables, column counts, types, and
dialect DDL rendering (SURVEY.md section 1.2-1.3)."""

from decimal import Decimal

from pyspark.sql.types import BooleanType, DecimalType, IntegerType, LongType, StringType

from hhek2sqlite_spark.schema.registry import (
    COPY_ORDER,
    HHEK_TABLES,
    render_create_index,
    render_create_table,
    spark_schema,
)


def test_ten_tables_in_copy_order():
    assert COPY_ORDER == (
        "DtbVer", "Platser", "Personer", "Konton", "BetalKonton",
        "Överföringar", "Betalningar", "LÅN", "Budget", "Transaktioner",
    )


def test_column_counts():
    expected = {
        "DtbVer": 3, "Platser": 5, "Personer": 4, "Konton": 8,
        "BetalKonton": 5, "Överföringar": 11, "Betalningar": 15,
        "LÅN": 27, "Budget": 18, "Transaktioner": 11,
    }
    for name, n in expected.items():
        assert len(HHEK_TABLES[name].columns) == n, name


def test_transaktioner_schema_types():
    s = spark_schema("Transaktioner")
    assert isinstance(s["Löpnr"].dataType, LongType)
    assert isinstance(s["Belopp"].dataType, DecimalType)
    assert s["Belopp"].dataType == DecimalType(19, 4)
    assert isinstance(s["Fastöverföring"].dataType, BooleanType)
    assert not s["Fastöverföring"].nullable
    assert isinstance(s["Datum"].dataType, StringType)  # dates are strings in the model


def test_personer_dialect_coercion():
    # Född: TEXT(4) in Jet, INTEGER in SQLite (hhek2sqlite.go:84 vs :106)
    s = spark_schema("Personer")
    assert isinstance(s["Född"].dataType, IntegerType)
    fodd = next(c for c in HHEK_TABLES["Personer"].columns if c.name == "Född")
    assert fodd.ddl_type("sqlite") == "INTEGER"
    assert fodd.ddl_type("jet") == "TEXT(4)"


def test_ddl_rendering_both_dialects():
    sqlite = render_create_table("Transaktioner", "sqlite")
    jet = render_create_table("Transaktioner", "jet")
    assert '"Transaktioner"' in sqlite and "DECIMAL(19,4)" in sqlite
    assert "CURRENCY" in jet and "TEXT(40)" in jet and "COUNTER" in jet
    assert '"Fastöverföring" BOOLEAN NOT NULL' in sqlite
    assert '"Fastöverföring" BIT NOT NULL' in jet


def test_index_ddl_fifteen_secondary_indexes():
    # 15 secondary indexes across the model (SURVEY.md section 1.2)
    all_ix = [stmt for t in HHEK_TABLES for stmt in render_create_index(t)]
    assert len(all_ix) == 15
    uniq = [s for s in all_ix if "UNIQUE" in s]
    assert len(uniq) == 5  # Platser, Personer, Konton, BetalKonton, Budget


def test_money_headroom():
    # DecimalType(19,4) must hold Jet Currency's full range
    assert DecimalType(19, 4).precision - DecimalType(19, 4).scale >= 15
    assert Decimal("922337203685477.5807") < Decimal(10) ** 15
