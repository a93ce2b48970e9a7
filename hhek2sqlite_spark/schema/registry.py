"""Schema registry: the reference's 10-table relational model as Spark
StructTypes plus dual-dialect DDL rendering.

The reference declares every table twice — a Jet/Access dialect and an
SQLite dialect selected by the direction flag ``revopt``
(/root/reference/hhek2sqlite.go:58; e.g. Transaktioner at :175 vs :197)
— and a third authoritative copy lives in the UTF-16 schema dump
(/root/reference/dbinfo.txt). Here the single source of truth is a typed
``TableSpec``; each dialect is a *rendering* of it, so direction is a
parameter instead of duplicated code (SURVEY.md section 1.2, 3.2).

Logical types (SURVEY.md section 1.3):
- money  -> DecimalType(19,4)  (Jet Currency / SQLite DECIMAL(19,4) — the
  exactness bar, /root/reference/db_test.go:262-267)
- counter-> LongType PK, preserved verbatim across copies
- text(n)-> StringType (length recorded for DDL, not enforced by Spark)
- dates  -> StringType 'yyyy-MM-dd' for fidelity; the query layer exposes
  to_date views
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DecimalType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

# logical type tags -> (spark type, sqlite DDL, jet DDL)
_LOGICAL = {
    "counter": (LongType(), "INTEGER", "COUNTER"),
    "int": (IntegerType(), "INTEGER", "INTEGER"),
    "smallint": (ShortType(), "SMALLINT", "BYTE"),
    "money": (DecimalType(19, 4), "DECIMAL(19,4)", "CURRENCY"),
    "float": (FloatType(), "REAL", "SINGLE"),
    "bool": (BooleanType(), "BOOLEAN", "BIT"),
    "memo": (StringType(), "TEXT", "LONGTEXT"),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    logical: str  # 'text' | one of _LOGICAL keys
    length: int = 0  # text length for DDL (0 = n/a)
    nullable: bool = True
    # dialect-dependent coercion (e.g. Personer.Fodd TEXT(4) in Jet,
    # INTEGER in SQLite — /root/reference/hhek2sqlite.go:84 vs :106)
    sqlite_type_override: str | None = None

    @property
    def spark_type(self) -> DataType:
        if self.logical == "text":
            return StringType() if self.sqlite_type_override != "INTEGER" else IntegerType()
        return _LOGICAL[self.logical][0]

    def ddl_type(self, dialect: str) -> str:
        if self.logical == "text":
            if dialect == "sqlite":
                return self.sqlite_type_override or "TEXT"
            return f"TEXT({self.length})" if self.length else "LONGTEXT"
        spark_t, sqlite_t, jet_t = _LOGICAL[self.logical]
        return sqlite_t if dialect == "sqlite" else jet_t


@dataclass(frozen=True)
class IndexSpec:
    name: str
    columns: tuple[str, ...]
    unique: bool = False


@dataclass(frozen=True)
class TableSpec:
    name: str
    columns: tuple[ColumnSpec, ...]
    pk: tuple[str, ...] = ()
    # secondary indexes exist in the reverse/Jet direction only
    # (/root/reference/hhek2sqlite.go:84-98 vs :100-109; SURVEY.md 4.3)
    indexes: tuple[IndexSpec, ...] = field(default_factory=tuple)

    def spark_schema(self) -> StructType:
        return StructType(
            [StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )

    @property
    def unique_keys(self) -> tuple[tuple[str, ...], ...]:
        keys = [self.pk] if self.pk else []
        keys += [ix.columns for ix in self.indexes if ix.unique]
        return tuple(keys)


def _t(name: str, logical: str = "text", length: int = 0, **kw) -> ColumnSpec:
    return ColumnSpec(name, logical, length, **kw)


def _moneys(*names: str) -> list[ColumnSpec]:
    return [_t(n, "money") for n in names]


# ---------------------------------------------------------------------------
# The ten tables, column-for-column from SURVEY.md section 1.2 (sources:
# /root/reference/hhek2sqlite.go DDL pairs + /root/reference/dbinfo.txt).
# Order is the reference's fixed copy order (hhek2sqlite.go:1287-1296).
# ---------------------------------------------------------------------------

HHEK_TABLES: dict[str, TableSpec] = {
    t.name: t
    for t in (
        TableSpec(
            "DtbVer",
            (
                _t("VerNum", length=4, nullable=False),
                _t("Benämning", length=80),
                _t("Losenord", length=8),
            ),
            pk=("VerNum",),
        ),
        TableSpec(
            "Platser",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("Namn", length=40),
                _t("Gironummer", length=20),
                _t("Typ", length=2),
                _t("RefKonto", length=40),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxNamn", ("Namn",), unique=True),),
        ),
        TableSpec(
            "Personer",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("Namn", length=50),
                _t("Född", length=4, sqlite_type_override="INTEGER"),
                _t("Kön", length=10),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxNamn", ("Namn",), unique=True),),
        ),
        TableSpec(
            "Konton",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("KontoNummer", length=20),
                _t("Benämning", length=40),
                _t("Saldo", "money"),
                _t("StartSaldo", "money"),
                _t("StartManad", length=10),
                _t("SaldoArsskifte", "money"),
                _t("ArsskifteManad", length=10),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxBenämning", ("Benämning",), unique=True),),
        ),
        TableSpec(
            "BetalKonton",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("Konto", length=40),
                _t("Kontonummer", length=40),
                _t("Kundnummer", length=40),
                _t("Sigillnummer", length=40),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxKonto", ("Konto",), unique=True),),
        ),
        TableSpec(
            "Överföringar",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("FrånKonto", length=40),
                _t("TillKonto", length=40),
                _t("Belopp", "money"),
                _t("Datum", length=10),
                _t("HurOfta", length=15),
                _t("Vad", length=40),
                _t("Vem", length=40),
                _t("Kontrollnr", "int"),  # nullable: empty -> NULL is a tested path
                _t("TillDatum", length=10),
                _t("Rakning", length=1),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxFranTill", ("FrånKonto", "TillKonto")),),
        ),
        TableSpec(
            "Betalningar",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("FrånKonto", length=40),
                _t("TillPlats", length=40),
                _t("Typ", length=40),
                _t("Datum", length=10),
                _t("Vad", length=40),
                _t("Vem", length=50),
                _t("Belopp", "money"),
                _t("Text", length=60),
                _t("Ranta", "money"),
                _t("FastAmort", "money"),
                _t("RorligAmort", "money"),
                _t("OvrUtg", "money"),
                _t("LanLopnr", "int"),  # FK -> LÅN.Löpnr
                _t("Grey", length=2),
            ),
            pk=("Löpnr",),
            indexes=(
                IndexSpec("idxDatum", ("Datum",)),
                IndexSpec("idxFrånKonto", ("FrånKonto",)),
                IndexSpec("idxLanLopnr", ("LanLopnr",)),
                IndexSpec("idxTillPlats", ("TillPlats",)),
            ),
        ),
        TableSpec(
            "LÅN",
            tuple(
                [
                    _t("Löpnr", "counter", nullable=False),
                    _t("Langivare", length=40),
                    _t("EgenBeskrivn", length=40),
                    _t("LanNummer", length=25),
                    _t("TotLanebelopp", "money"),
                    _t("StartDatum", length=10),
                    _t("RegDatum", length=10),
                    _t("RantJustDatum", length=10),
                    _t("SlutBetDatum", length=10),
                ]
                + _moneys("AktLaneskuld", "RorligDel", "FastDel")
                + [
                    _t("FastRanta", "float"),
                    _t("RorligRanta", "float"),
                    _t("HurOfta", length=2),
                ]
                + _moneys("Ranta", "FastAmort", "RorligAmort", "OvrUtg")
                + [
                    _t("Rakning", length=1),
                    _t("Vem", length=40),
                    _t("FrånKonto", length=40),
                    _t("Grey", length=2),
                    _t("Anteckningar", "memo"),
                    _t("BudgetRanta", length=40),
                    _t("BudgetAmort", length=40),
                    _t("BudgetOvriga", length=40),
                ]
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxLangiv", ("Langivare",)),),
        ),
        TableSpec(
            "Budget",
            tuple(
                [
                    _t("Löpnr", "counter", nullable=False),
                    _t("Typ", length=40),
                    _t("Inkomst", length=1),
                    _t("HurOfta", "smallint"),
                    _t("StartMånad", length=10),
                ]
                + _moneys(
                    "Jan", "Feb", "Mar", "Apr", "Maj", "Jun",
                    "Jul", "Aug", "Sep", "Okt", "Nov", "Dec",
                )
                + [_t("Kontrollnr", "int")]
            ),
            pk=("Löpnr",),
            indexes=(
                IndexSpec("idxTyp", ("Typ",), unique=True),
                IndexSpec("idxInkomst", ("Inkomst",)),
                IndexSpec("idxInkomstTyp", ("Inkomst", "Typ")),
                IndexSpec("idxKontrollnr", ("Kontrollnr",)),
            ),
        ),
        TableSpec(
            "Transaktioner",
            (
                _t("Löpnr", "counter", nullable=False),
                _t("FrånKonto", length=40),
                _t("TillKonto", length=40),
                _t("Typ", length=40),
                _t("Datum", length=10),
                _t("Vad", length=40),
                _t("Vem", length=50),
                _t("Belopp", "money"),
                _t("Saldo", "money"),  # running balance; derivable (dropped by the
                # reference at hhek2sqlite.go:260, recomputed by our query layer)
                _t("Fastöverföring", "bool", nullable=False),
                _t("Text", length=60),
            ),
            pk=("Löpnr",),
            indexes=(IndexSpec("idxFranTill", ("FrånKonto", "TillKonto")),),
        ),
    )
}

COPY_ORDER = tuple(HHEK_TABLES)  # insertion order == reference copy order


def spark_schema(table: str) -> StructType:
    return HHEK_TABLES[table].spark_schema()


def _q(ident: str, dialect: str) -> str:
    # both dialects accept double-quoted identifiers (needed: Swedish
    # letters and the LÅN table name)
    return f'"{ident}"'


def render_create_table(table: str, dialect: str = "sqlite") -> str:
    """Render CREATE TABLE in the given dialect ('sqlite' | 'jet')."""
    spec = HHEK_TABLES[table]
    cols = []
    for c in spec.columns:
        line = f"{_q(c.name, dialect)} {c.ddl_type(dialect)}"
        if not c.nullable:
            line += " NOT NULL"
        if spec.pk == (c.name,):
            line += " PRIMARY KEY"
        cols.append(line)
    body = ",\n  ".join(cols)
    return f"CREATE TABLE {_q(spec.name, dialect)} (\n  {body}\n)"


def render_create_index(table: str, dialect: str = "jet") -> list[str]:
    """Secondary index DDL — reverse/Jet direction only in the reference
    (SQLite direction creates none; SURVEY.md section 2.12)."""
    spec = HHEK_TABLES[table]
    out = []
    for ix in spec.indexes:
        uniq = "UNIQUE " if ix.unique else ""
        cols = ", ".join(_q(c, dialect) for c in ix.columns)
        # Jet index names are per-table; SQLite's are database-global, so
        # that dialect qualifies them with the table name
        name = ix.name if dialect == "jet" else f"{spec.name}_{ix.name}"
        out.append(
            f"CREATE {uniq}INDEX {_q(name, dialect)} ON {_q(spec.name, dialect)} ({cols})"
        )
    return out
