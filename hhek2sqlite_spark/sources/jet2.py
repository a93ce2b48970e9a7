"""Pure-Python reader for Jet 2.0 (Access 2.0) .mdb files — the format
HHEK databases actually use.

Reference anchor: /root/reference/hhek2sqlite.go:1195 creates its MDB
with "Jet OLEDB:Engine Type=3" (= Jet 2.0) and reads it through the
Windows ODBC Access driver; /root/reference/db_test.go:150-171
(checkDB1) asserts row counts 3/1/3 for Personer/Platser/Transaktioner
and Konton saldo 0.90 against GOTEST1.MDB. This module reads that same
file without Windows, ODBC, or any third-party jar, so the Spark
pipeline can ingest a real HHEK source end-to-end.

Format notes (reverse-engineered from GOTEST1.MDB in round 6; the
page/row concepts mirror the public mdbtools documentation of the
later Jet 3 format, with Jet 2 differences observed directly):

- 2048-byte pages. Page type in byte 0: 0x05 = table definition
  (TDEF), 0x06 = data page, 0x04/0x03 = index pages, others unused
  here.
- Data page header: u16 type/flags, u16 checksum-ish, u32 OWNING TDEF
  PAGE NUMBER (@4), u16 row count (@8), u16 free-space pointer (@10),
  8 reserved bytes, then u16 row offsets from @20 (low 12 bits =
  offset; high bits are flags — 0x8000 observed nowhere live, treated
  as deleted like Jet 3's delflag).
- A table's catalog id in MSysObjects IS its TDEF page number, so
  grouping data pages by the u32 at @4 reconstructs each table's pages
  without walking page chains.
- Row layout: u16 total length, u8 n_fixed_cols, u8 n_var_cols,
  fixed-column bytes (table-specific storage order — NOT the CREATE
  TABLE order; Boolean columns occupy no bytes), var-column bytes,
  then a trailer read backward from the row end: null/bool bitmap over
  the fixed columns (ceil(n_fixed/8) bytes, bit clear = NULL for
  nullable types and = False for Booleans), u8 n_var, and n_var+1
  one-byte offsets (ascending when read forward) bounding each
  var-length value.
- Text is cp1252 (the reference's F1 transcode pair); Currency is a
  little-endian int64 of 1/10000ths.

The catalog (MSysObjects) is itself a table at TDEF page 3 whose rows
follow the same layout: first fixed u32 = object id, first var column
= object name.

Scale note: .mdb is a single-file desktop format (GOTEST1 is 160 KB;
real HHEK files are MBs) — this is an INGEST EDGE, not a distributed
scan path. jet2_table() materializes rows driver-side once and hands
Spark a DataFrame, the same envelope as the SQLite source
(sources/sqlite_io.py); the 100 TB path starts after this boundary.
"""

from __future__ import annotations

import os
import struct
from decimal import ROUND_HALF_UP, Decimal

PAGE_SIZE = 2048
CATALOG_TDEF = 3  # MSysObjects' own TDEF page — fixed by the engine

_SYSTEM_NAMES = frozenset(
    {"Tables", "Databases", "Relationships", "MSysDb"}
)

# Column kinds for the fixed region, with their byte widths.
# short = Access SMALLINT (2B int16), single = Access REAL (4B float32).
_FIXED_WIDTHS = {
    "long": 4,
    "currency": 8,
    "byte": 1,
    "bool": 0,
    "short": 2,
    "single": 4,
}


class TableSchema:
    """Physical row layout for one table: fixed columns in STORAGE
    order (observed, not DDL order) and var columns in trailer-offset
    order."""

    def __init__(self, fixed, var):
        self.fixed = fixed  # [(name, kind)] kind in _FIXED_WIDTHS
        self.var = var  # [name]


# Physical layouts for all 10 HHEK tables.
#
# Six are verified against GOTEST1.MDB's actual bytes (round 6). The
# observed storage rule across every one of them: take the REAL HHEK
# database's column order (the Access SQL export in the reference's
# dbinfo.txt:15-160, which reflects on-disk table order), keep the
# fixed-width (non-text) columns first IN THAT RELATIVE ORDER, then the
# var-length (text/memo) columns in that relative order. Note this is
# NOT the reference Go tool's CREATE TABLE order (hhek2sqlite.go:175
# puts Löpnr first; the observed Transaktioner fixed order is Belopp,
# Löpnr, Saldo, Fastöverföring — dbinfo order, refuting the Go order).
#
# Three more tables (Betalningar, LÅN, Överföringar — reference column
# lists hhek2sqlite.go:481,1056,593) are DERIVED from dbinfo.txt types +
# that learned rule, and validated by writer-roundtrip only (GOTEST1 has
# zero rows in them, so there are no real bytes to diff against; a real
# HHEK file would be the true test). Budget (hhek2sqlite.go:803) IS
# byte-verified against real fixture bytes like the round-6 tables:
# GOTEST1's Budget holds 34 rows, and decoding them is what
# disambiguated the REVERSED multi-byte null-bitmap byte order (see
# _decode_row; tests/test_jet2_mdb.py).
# Access DDL type map: MONEY->currency, COUNTER/INTEGER->long,
# SMALLINT->short, REAL->single, BIT->bool, TEXT(n)/LONGTEXT->var.
# LÅN's Anteckningar is a LONGTEXT (MEMO): real Jet stores long memo
# values on separate LVAL pages with a 12-byte pointer in the var slot;
# this module handles INLINE memo text only (fine for roundtrip and for
# short notes) and makes no claim about LVAL decoding — see
# _decode_row's honesty note.
HHEK_SCHEMAS = {
    "Personer": TableSchema(
        [("Löpnr", "long")], ["Namn", "Född", "Kön"]
    ),
    "Platser": TableSchema(
        [("Löpnr", "long")], ["Namn", "Gironummer", "Typ", "RefKonto"]
    ),
    "BetalKonton": TableSchema(
        [("Löpnr", "long")],
        ["Konto", "Kontonummer", "Kundnummer", "Sigillnummer"],
    ),
    "DtbVer": TableSchema([], ["VerNum", "Benämning", "Losenord"]),
    "Transaktioner": TableSchema(
        [
            ("Belopp", "currency"),
            ("Löpnr", "long"),
            ("Saldo", "currency"),
            ("Fastöverföring", "bool"),
        ],
        ["FrånKonto", "TillKonto", "Typ", "Datum", "Vad", "Vem", "Text"],
    ),
    "Konton": TableSchema(
        [
            ("Saldo", "currency"),
            ("StartSaldo", "currency"),
            ("Löpnr", "long"),
            ("SaldoArsskifte", "currency"),
        ],
        ["KontoNummer", "Benämning", "StartManad", "ArsskifteManad"],
    ),
    # --- derived layouts (round 7): dbinfo.txt order + the learned
    # fixed-then-var partition rule; writer-roundtrip-validated ---
    "Betalningar": TableSchema(
        [
            ("Belopp", "currency"),
            ("Löpnr", "long"),
            ("Ranta", "currency"),
            ("FastAmort", "currency"),
            ("RorligAmort", "currency"),
            ("OvrUtg", "currency"),
            ("LanLopnr", "long"),
        ],
        ["FrånKonto", "TillPlats", "Typ", "Datum", "Vad", "Vem", "Text", "Grey"],
    ),
    "LÅN": TableSchema(
        [
            ("TotLanebelopp", "currency"),
            ("AktLaneskuld", "currency"),
            ("RorligDel", "currency"),
            ("FastDel", "currency"),
            ("FastRanta", "single"),
            ("RorligRanta", "single"),
            ("Ranta", "currency"),
            ("FastAmort", "currency"),
            ("RorligAmort", "currency"),
            ("OvrUtg", "currency"),
            ("Löpnr", "long"),
        ],
        [
            "Langivare",
            "EgenBeskrivn",
            "LanNummer",
            "StartDatum",
            "RegDatum",
            "RantJustDatum",
            "SlutBetDatum",
            "HurOfta",
            "Rakning",
            "Vem",
            "FrånKonto",
            "Grey",
            "Anteckningar",  # MEMO: inline text only, see header note
            "BudgetRanta",
            "BudgetAmort",
            "BudgetOvriga",
        ],
    ),
    "Överföringar": TableSchema(
        [
            ("Belopp", "currency"),
            ("Löpnr", "long"),
            ("Kontrollnr", "long"),
        ],
        [
            "FrånKonto",
            "TillKonto",
            "Datum",
            "HurOfta",
            "Vad",
            "Vem",
            "TillDatum",
            "Rakning",
        ],
    ),
    "Budget": TableSchema(
        [
            ("HurOfta", "short"),
            ("Jan", "currency"),
            ("Feb", "currency"),
            ("Mar", "currency"),
            ("Apr", "currency"),
            ("Maj", "currency"),
            ("Jun", "currency"),
            ("Jul", "currency"),
            ("Aug", "currency"),
            ("Sep", "currency"),
            ("Okt", "currency"),
            ("Nov", "currency"),
            ("Dec", "currency"),
            ("Kontrollnr", "long"),
            ("Löpnr", "long"),
        ],
        ["Typ", "Inkomst", "StartMånad"],
    ),
}


def _decode_row(buf: bytes, schema: TableSchema | None):
    """Decode one row. With a schema returns {col: value}; without,
    returns {'_fixed': bytes, '_var': [bytes, ...]} raw parts."""
    n_fixed = buf[2]
    n_var = buf[3]
    end = len(buf)
    mask_len = (n_fixed + 7) // 8 if n_fixed else 0
    # The bitmap's BYTES are stored in reverse order — the trailer is
    # written back-to-front, like the var offsets. Verified against
    # GOTEST1's Budget rows (15 fixed cols -> 2 mask bytes "5f ff":
    # reversed it reads cols 0-12 present / Kontrollnr NULL / Löpnr
    # present, matching the months-all-0.00 + junk-bytes-under-
    # Kontrollnr + Löpnr=1..34 the data shows; unreversed it claimed
    # the implausible "Maj and Jul NULL among zero-valued months").
    # All six round-6 tables have <=8 fixed cols (1 mask byte), where
    # the orders coincide — Budget is the disambiguating fixture.
    mask = int.from_bytes(buf[end - mask_len : end], "big") if mask_len else 0
    end -= mask_len
    trailer_n_var = buf[end - 1]
    if trailer_n_var != n_var:
        raise ValueError(f"row trailer n_var {trailer_n_var} != header {n_var}")
    end -= 1
    # n_var+1 bounds; the LAST trailer byte is the FIRST (lowest) bound,
    # so reading backward already yields ascending order
    bounds = [buf[end - 1 - i] for i in range(n_var + 1)]
    # the var region must end exactly where the offset table begins and
    # the bounds must ascend; a >255-byte row (long-row encoding, not
    # reverse-engineerable from the fixture — see _encode_row) or any
    # other misparse breaks this invariant. Garbage values would be
    # silently decoded otherwise.
    if bounds[-1] != end - (n_var + 1) or any(
        bounds[i] > bounds[i + 1] for i in range(n_var)
    ):
        raise ValueError(
            "row var-offset table inconsistent with trailer position — "
            "likely a long-row (>255B) encoding this reader does not support"
        )
    var_vals = [
        buf[bounds[i] : bounds[i + 1]].decode("cp1252") for i in range(n_var)
    ]
    if schema is None:
        # bounds[0] (the trailer's lowest bound) marks the end of the
        # fixed region even when n_var == 0 — slicing to the buffer end
        # there would wrongly include the trailer bytes.
        return {"_fixed": buf[4 : bounds[0]], "_var": var_vals}
    if len(schema.fixed) != n_fixed or len(schema.var) != n_var:
        raise ValueError(
            f"schema mismatch: file has {n_fixed} fixed/{n_var} var, "
            f"schema {len(schema.fixed)}/{len(schema.var)}"
        )
    out = {}
    pos = 4
    for i, (name, kind) in enumerate(schema.fixed):
        present = bool(mask >> i & 1)
        if kind == "bool":
            out[name] = present  # Booleans live IN the bitmap
            continue
        w = _FIXED_WIDTHS[kind]
        raw = buf[pos : pos + w]
        pos += w
        if not present:
            out[name] = None
        elif kind == "long":
            out[name] = struct.unpack("<i", raw)[0]
        elif kind == "short":
            out[name] = struct.unpack("<h", raw)[0]
        elif kind == "single":
            out[name] = struct.unpack("<f", raw)[0]
        elif kind == "byte":
            out[name] = raw[0]
        else:  # currency: int64 of 1/10000ths, exact decimal
            out[name] = Decimal(struct.unpack("<q", raw)[0]) / Decimal(10000)
    for name, val in zip(schema.var, var_vals):
        out[name] = val
    return out


class Jet2File:
    """One parsed .mdb: catalog + data pages grouped by owning table."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._data = fh.read()
        if len(self._data) % PAGE_SIZE:
            raise ValueError(f"{path}: not a whole number of {PAGE_SIZE}B pages")
        self._pages_by_tdef: dict[int, list[int]] = {}
        for p in range(len(self._data) // PAGE_SIZE):
            pg = self._page(p)
            if pg[0] == 0x06:
                tdef = struct.unpack_from("<I", pg, 4)[0]
                self._pages_by_tdef.setdefault(tdef, []).append(p)
        self.tables = {}  # name -> tdef page id
        for row in self._raw_rows(CATALOG_TDEF):
            obj_id = struct.unpack_from("<I", row, 4)[0]
            name = _decode_row(row, None)["_var"][0]
            if not name.startswith("MSys") and name not in _SYSTEM_NAMES:
                self.tables[name] = obj_id

    def _page(self, p: int) -> bytes:
        return self._data[p * PAGE_SIZE : (p + 1) * PAGE_SIZE]

    def _raw_rows(self, tdef: int):
        for p in self._pages_by_tdef.get(tdef, ()):
            pg = self._page(p)
            n = struct.unpack_from("<H", pg, 8)[0]
            for i in range(n):
                raw_off = struct.unpack_from("<H", pg, 20 + 2 * i)[0]
                off = raw_off & 0x0FFF
                if raw_off & 0x8000 or off == 0:  # deleted / moved
                    continue
                ln = struct.unpack_from("<H", pg, off)[0]
                yield pg[off : off + ln]

    def row_count(self, table: str) -> int:
        return sum(1 for _ in self._raw_rows(self.tables[table]))

    def read_rows(self, table: str, schema: TableSchema | None = None):
        """Decode a table's rows. Uses the verified HHEK layout when
        registered; otherwise returns raw fixed/var parts."""
        schema = schema or HHEK_SCHEMAS.get(table)
        return [_decode_row(r, schema) for r in self._raw_rows(self.tables[table])]


def _spark_schema_for(schema: TableSchema):
    """Spark StructType for a physical layout: Currency ->
    DecimalType(19,4), Long -> int, SMALLINT -> short, REAL -> float,
    Bool -> boolean, text (cp1252-decoded) -> string."""
    from pyspark.sql import types as T

    kinds = {
        "long": T.IntegerType(),
        "short": T.ShortType(),
        "single": T.FloatType(),
        "byte": T.IntegerType(),
        "bool": T.BooleanType(),
        "currency": T.DecimalType(19, 4),
    }
    spark_fields = [
        T.StructField(name, kinds[kind], True) for name, kind in schema.fixed
    ]
    spark_fields += [T.StructField(name, T.StringType(), True) for name in schema.var]
    return T.StructType(spark_fields)


def _table_df(spark, f: "Jet2File", table: str):
    schema = HHEK_SCHEMAS.get(table)
    if schema is None:
        raise ValueError(f"no verified physical layout for table {table!r}")
    rows = f.read_rows(table, schema)
    st = _spark_schema_for(schema)
    ordered = [tuple(r[fld.name] for fld in st.fields) for r in rows]
    return spark.createDataFrame(ordered, st)


def jet2_table(spark, path: str, table: str):
    """Read one HHEK table from a Jet 2.0 .mdb into a Spark DataFrame
    (driver-side materialization — ingest edge, see module docstring)."""
    return _table_df(spark, Jet2File(path), table)


def jet2_read_database(spark, path: str):
    """Read every layout-registered table from a .mdb: one parse of the
    file, one typed DataFrame per table (the forward half of the
    reference's ``konvertera``, hhek2sqlite.go:1230-1299)."""
    f = Jet2File(path)
    return {
        name: _table_df(spark, f, name)
        for name in f.tables
        if name in HHEK_SCHEMAS
    }


def default_mdb_path() -> str | None:
    """The reference fixture, when present (read-only)."""
    p = "/root/reference/GOTEST1.MDB"
    return p if os.path.exists(p) else None


# ---------------------------------------------------------------------------
# Jet 2.0 WRITER (round 6) — the inverse of the reader above, closing the
# reference's S8 capability (empty-MDB bootstrap + reverse conversion,
# hhek2sqlite.go:1177-1202) without Windows/COM. The writer emits the
# page/row structures documented in this module's format notes: a db
# header page, the MSysObjects catalog (TDEF page 3 + data page), and
# per table a TDEF page plus data pages with trailer-encoded rows.
#
# Honesty note: validation is (a) roundtrip through the independent
# reader in this module and (b) structural agreement with the
# reference's GOTEST1.MDB (same page headers, row trailers, and
# catalog-id-equals-TDEF-page invariant). Real Access/ODBC cannot be
# exercised in this environment; index pages and usage bitmaps are NOT
# emitted (readers that require them would need a compact pass).
# ---------------------------------------------------------------------------


def _encode_row(schema: TableSchema, row: dict) -> bytes:
    """Inverse of _decode_row for a registered layout."""
    n_fixed = len(schema.fixed)
    n_var = len(schema.var)
    fixed = bytearray()
    mask = 0
    for i, (name, kind) in enumerate(schema.fixed):
        v = row.get(name)
        if kind == "bool":
            if v:
                mask |= 1 << i
            continue
        if v is not None:
            mask |= 1 << i
        if kind == "long":
            fixed += struct.pack("<i", int(v) if v is not None else 0)
        elif kind == "short":
            fixed += struct.pack("<h", int(v) if v is not None else 0)
        elif kind == "single":
            fixed += struct.pack("<f", float(v) if v is not None else 0.0)
        elif kind == "byte":
            fixed += bytes([int(v) & 0xFF if v is not None else 0])
        else:  # currency
            # route non-Decimal inputs through Decimal(str(v)) so a
            # float money column (e.g. a foreign parquet source) is
            # converted by its decimal literal, not its binary value —
            # int(1.15 * 10000) == 11499 would silently corrupt the
            # stored amount by 0.0001 (review finding). Half-up keeps
            # sub-1/10000 inputs from truncating toward zero.
            if v is None:
                units = 0
            else:
                dv = v if isinstance(v, Decimal) else Decimal(str(v))
                units = int(
                    (dv * 10000).to_integral_value(rounding=ROUND_HALF_UP)
                )
            fixed += struct.pack("<q", units)
    var_bytes = [
        ("" if row.get(name) is None else str(row[name])).encode("cp1252")
        for name in schema.var
    ]
    body = bytearray()
    body += bytes(2)  # length placeholder
    body.append(n_fixed)
    body.append(n_var)
    body += fixed
    bounds = [len(body)]
    for vb in var_bytes:
        body += vb
        bounds.append(len(body))
    if bounds[-1] > 255:
        # Documented cap, not an implementation shortcut: the trailer
        # var-offset bytes observed in GOTEST1.MDB are u8, so a row
        # whose var region ends past byte 255 is unrepresentable in the
        # verified format. Real Jet has a long-row encoding (Jet 3
        # documents u8 offsets + jump tables), but GOTEST1 contains no
        # long rows to reverse-engineer Jet 2.0's variant from, and
        # inventing one would silently corrupt data. All-maximal HHEK
        # rows (e.g. Betalningar with every TEXT at declared width) can
        # exceed this; typical rows don't. Fail loudly instead.
        raise ValueError(
            f"row is {bounds[-1]} bytes; the verified Jet 2.0 row format "
            "(u8 var offsets) caps rows at 255 bytes — long-row encoding "
            "is not reverse-engineerable from the available fixture"
        )
    # trailer: offsets with the LAST byte the FIRST bound, then n_var,
    # then the fixed-column bitmap
    for b in reversed(bounds):
        body.append(b)
    body.append(n_var)
    mask_len = (n_fixed + 7) // 8 if n_fixed else 0
    # reversed byte order, matching the reader (see _decode_row)
    body += mask.to_bytes(mask_len, "big")
    struct.pack_into("<H", body, 0, len(body))
    return bytes(body)


def _pack_data_pages(tdef_page: int, rows: list[bytes]) -> list[bytes]:
    """Pack encoded rows into 0x06 data pages: header + u16 offset slots
    growing from @20, row bytes packed downward from the page end."""
    pages = []
    cur: list[bytes] = []

    def flush():
        pg = bytearray(PAGE_SIZE)
        pg[0] = 0x06
        struct.pack_into("<I", pg, 4, tdef_page)
        struct.pack_into("<H", pg, 8, len(cur))
        pos = PAGE_SIZE
        for i, rb in enumerate(cur):
            pos -= len(rb)
            pg[pos : pos + len(rb)] = rb
            struct.pack_into("<H", pg, 20 + 2 * i, pos | 0x1000)
        struct.pack_into("<H", pg, 10, (pos - 0x1000) & 0xFFFF)
        pages.append(bytes(pg))
        cur.clear()

    for rb in rows:
        used = sum(len(r) for r in cur)
        slots = 20 + 2 * (len(cur) + 1)
        if cur and slots + used + len(rb) > PAGE_SIZE:
            flush()
        cur.append(rb)
    if cur:
        flush()
    return pages


# Minimal MSysObjects row: the reader needs the object id (first fixed
# u32) and the name (first var column). Observed GOTEST1 rows carry 9
# fixed / 4 var columns; we emit the same shape with the unused fields
# zero/empty.
_CATALOG_SCHEMA = TableSchema(
    [("Id", "long")] + [(f"_f{i}", "long") for i in range(8)],
    ["Name", "_v1", "_v2", "_v3"],
)


def write_jet2(path: str, tables: dict[str, tuple[TableSchema, list[dict]]]) -> None:
    """Write a Jet 2.0 .mdb containing ``tables`` (name -> (layout,
    rows)). Readable by Jet2File; see the honesty note above."""
    # layout: p0 header, p1 (type 0x07, as in real files), p2 spare,
    # p3 catalog TDEF, p4 catalog data, then per table TDEF + data
    catalog_rows = []
    table_pages: list[bytes] = []
    next_page = 5
    for name, (schema, rows) in tables.items():
        tdef_page = next_page
        encoded = [_encode_row(schema, r) for r in rows]
        data_pages = _pack_data_pages(tdef_page, encoded)
        next_page += 1 + len(data_pages)
        tdef = bytearray(PAGE_SIZE)
        tdef[0] = 0x05
        struct.pack_into("<I", tdef, 4, tdef_page)
        if data_pages:
            struct.pack_into("<I", tdef, 12, tdef_page + 1)
        table_pages.append(bytes(tdef))
        table_pages.extend(data_pages)
        catalog_rows.append({"Id": tdef_page, "Name": name})
    cat_encoded = [_encode_row(_CATALOG_SCHEMA, r) for r in catalog_rows]
    cat_pages = _pack_data_pages(CATALOG_TDEF, cat_encoded)
    if len(cat_pages) != 1:
        raise ValueError("catalog exceeds one page (too many tables)")
    pages = []
    p0 = bytearray(PAGE_SIZE)
    p0[0] = 0x01
    pages.append(bytes(p0))
    p1 = bytearray(PAGE_SIZE)
    p1[0] = 0x07
    pages.append(bytes(p1))
    pages.append(bytes(PAGE_SIZE))  # p2 spare
    cat_tdef = bytearray(PAGE_SIZE)
    cat_tdef[0] = 0x05
    struct.pack_into("<I", cat_tdef, 4, CATALOG_TDEF)
    struct.pack_into("<I", cat_tdef, 12, 4)
    pages.append(bytes(cat_tdef))
    pages.append(cat_pages[0])
    pages.extend(table_pages)
    with open(path, "wb") as fh:
        fh.write(b"".join(pages))


def jet2_write_table(df, path: str, table: str) -> int:
    """Spark DataFrame -> one-table .mdb via the registered HHEK layout
    (driver-side materialization — same ingest-edge envelope as
    jet2_table). Returns rows written."""
    schema = HHEK_SCHEMAS.get(table)
    if schema is None:
        raise ValueError(f"no verified physical layout for table {table!r}")
    rows = [r.asDict() for r in df.collect()]
    write_jet2(path, {table: (schema, rows)})
    return len(rows)


def jet2_write_database(tables: dict, path: str) -> dict:
    """{name: DataFrame} -> one multi-table .mdb (the reverse half of
    the reference's ``konvertera -backa``). Money columns must arrive as
    exact Decimals (the SQLite reader re-quantizes; parquet carries
    DecimalType natively). Returns {name: rows written}."""
    payload = {}
    counts = {}
    for name, df in tables.items():
        schema = HHEK_SCHEMAS.get(name)
        if schema is None:
            raise ValueError(f"no verified physical layout for table {name!r}")
        rows = [r.asDict() for r in df.collect()]
        payload[name] = (schema, rows)
        counts[name] = len(rows)
    write_jet2(path, payload)
    return counts
