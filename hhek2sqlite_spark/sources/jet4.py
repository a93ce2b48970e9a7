"""Pure-Python reader for Jet 4 (Access 2000–2003) .mdb files.

Completes the native read matrix: the wild's most common `.mdb`
vintage is Jet 4 (VERDICT r11: "real-world .mdb files in the wild are
overwhelmingly Jet 4/ACE"), which sources/jet2.py and sources/jet3.py
refuse by name. Format source: the PUBLIC mdbtools documentation of
the Jet 4 on-disk format — the same text the Jet 3 module follows,
with Jet 4's parameter changes:

- 4096-byte pages (Jet 3: 2048); version byte 0x01 at offset 0x14.
- Data page header grows 4 bytes: free space u16@2, owning TDEF
  u32@4, 4 unknown bytes @8, row count u16@0x0C, offset map from
  0x0E (flags 0x8000 deleted / 0x4000 lookup, offset mask 0x1FFF).
- Rows: u16 TOTAL column count (Jet 3: u8); trailer read backward is
  null bitmap over all columns, u16 var-column count, then var_len+1
  u16 row-relative offset bounds — FULL-WIDTH offsets, so Jet 4 has
  NO jump tables (the Jet 3 modulo-256 scheme exists only because its
  offsets were single bytes).
- TDEF header: num_rows u32@0x10, num_var_cols u16@0x2B, num_cols
  u16@0x2D, num_real_idx u32@0x33; real-index records are 12 bytes
  (Jet 3: 8); column definitions are 25 bytes each — col_type u8@0,
  col_num u16@5, offset_V u16@7, flags u8@15, offset_F u16@21,
  length u16@23; column names carry a u16 length prefix and UCS-2
  (UTF-16-LE) bytes (Jet 3: u8 + cp1252).
- Text values are UCS-2, optionally "compressed": a 0xFF 0xFE prefix
  marks a string whose remaining bytes are single-byte cp1252 chars;
  the public description allows 0x00 bytes to TOGGLE back to UCS-2
  mid-string — this reader refuses that rare variant loudly rather
  than risk decoding garbage (no fixture exists to verify the toggle
  semantics against).
- MEMO columns reuse the same 12-byte inline/LVAL/chain header as
  Jet 3 (jet2._decode_memo), with the payload decoded as Jet 4 text.

Validation honesty (JET_VALIDATION.md): same class as the Jet 3
module — no real Access-2000-written file exists here, so the reader
is cross-checked against an independently-built synthetic fixture
(tests/jet4_fixture.py) carrying checkDB1-style content. A real Jet 4
file remains the true test; structural inconsistencies raise loudly.

Scale note: an INGEST EDGE like the other .mdb paths — single-file
desktop format, materialized driver-side once.
"""

from __future__ import annotations

import struct

from hhek2sqlite_spark.sources.jet2 import (
    _ACE_MAGIC,
    _JET3_MAGIC,
    LVAL_TAG,
)
from hhek2sqlite_spark.sources.jet3 import (
    COL_BOOL,
    COL_MEMO,
    COL_TEXT,
    Jet3Column,
    Jet3Table,
    _FIXED_WIDTHS,
    _decode_value as _decode_scalar_value,
)

PAGE_SIZE = 4096
CATALOG_TDEF = 2

_PG_DATA = 0x01
_PG_TDEF = 0x02

_OFFSET_MASK = 0x1FFF
_FLAG_DELETED = 0x8000
_FLAG_LOOKUP = 0x4000

_COLDEF_LEN = 25  # Jet 4 column definition record size
_IDX_REC_LEN = 12  # Jet 4 real-index record size (Jet 3: 8)


def decode_jet4_text(raw: bytes) -> str:
    """Jet 4 string decode: 0xFF 0xFE prefix = compressed (single-byte
    cp1252 chars), else plain UTF-16-LE. The documented mid-string
    0x00 mode toggle inside compressed strings is refused loudly."""
    if raw[:2] == b"\xff\xfe":
        body = raw[2:]
        if b"\x00" in body:
            raise ValueError(
                "compressed Jet 4 string contains a 0x00 mode toggle — "
                "the mixed-mode variant is not decodable without a "
                "fixture to verify the toggle semantics against"
            )
        return body.decode("cp1252")
    if len(raw) % 2:
        raise ValueError(
            f"uncompressed Jet 4 string has odd byte length {len(raw)}"
        )
    return raw.decode("utf-16-le")


def _decode_memo4(slot: bytes, lval_fetch) -> str:
    """Jet 4 memo: same 12-byte header/LVAL/chain machinery as Jet 3
    (jet2._decode_memo) but the assembled payload is Jet 4 text, not
    cp1252."""
    from hhek2sqlite_spark.sources import jet2

    if not slot:
        return ""
    # jet2._decode_memo decodes cp1252 at the very end; re-encoding
    # that to recover raw bytes would corrupt UCS-2 payloads, so the
    # header/LVAL/chain dispatch is replicated here on raw bytes with
    # the Jet 4 text decode at the boundary.
    if len(slot) < 12:
        raise ValueError(
            f"memo slot is {len(slot)} bytes; expected empty or >=12-byte "
            "memo header"
        )
    hdr, dp = struct.unpack_from("<II", slot, 0)
    flags = hdr & ~jet2._MEMO_LEN_MASK
    length = hdr & jet2._MEMO_LEN_MASK
    if flags == jet2._MEMO_INLINE:
        raw = slot[12 : 12 + length]
        if len(raw) != length:
            raise ValueError(
                f"inline memo header claims {length} bytes but slot holds "
                f"{len(raw)}"
            )
        return decode_jet4_text(raw)
    if flags == jet2._MEMO_LVAL:
        raw = lval_fetch(dp >> 8, dp & 0xFF)
        if len(raw) != length:
            raise ValueError(
                f"LVAL memo header claims {length} bytes but page row holds "
                f"{len(raw)}"
            )
        return decode_jet4_text(raw)
    if flags == 0:
        parts = []
        seen = 0
        while dp:
            if seen >= jet2._MEMO_MAX_CHUNKS:
                raise ValueError("LVAL chain exceeds the chunk guard (cycle?)")
            chunk = lval_fetch(dp >> 8, dp & 0xFF)
            if len(chunk) < 4:
                raise ValueError("LVAL chain chunk shorter than its next pointer")
            dp = struct.unpack_from("<I", chunk, 0)[0]
            parts.append(chunk[4:])
            seen += 1
        raw = b"".join(parts)
        if len(raw) != length:
            raise ValueError(
                f"LVAL chain header claims {length} bytes but the chain "
                f"holds {len(raw)}"
            )
        return decode_jet4_text(raw)
    raise ValueError(f"memo header flags 0x{flags:08x} unknown")


def _parse_tdef4(page: int, page_of) -> list[Jet3Column]:
    pg = page_of(page)
    if pg[0] != _PG_TDEF:
        raise ValueError(f"page {page} is not a Jet 4 TDEF (type 0x02)")
    buf = bytearray(pg)
    next_pg = struct.unpack_from("<I", pg, 4)[0]
    seen = {page}
    while next_pg:
        if next_pg in seen:
            raise ValueError(f"TDEF page chain cycles at page {next_pg}")
        seen.add(next_pg)
        cont = page_of(next_pg)
        if cont[0] != _PG_TDEF:
            raise ValueError(
                f"TDEF continuation page {next_pg} has type "
                f"0x{cont[0]:02x}, expected 0x02"
            )
        buf += cont[8:]
        next_pg = struct.unpack_from("<I", cont, 4)[0]
    num_var_cols = struct.unpack_from("<H", buf, 0x2B)[0]
    num_cols = struct.unpack_from("<H", buf, 0x2D)[0]
    num_real_idx = struct.unpack_from("<I", buf, 0x33)[0]
    pos = 0x3F + _IDX_REC_LEN * num_real_idx
    raw = []
    for _ in range(num_cols):
        (col_type,) = struct.unpack_from("<B", buf, pos)
        col_num = struct.unpack_from("<H", buf, pos + 5)[0]
        offset_v = struct.unpack_from("<H", buf, pos + 7)[0]
        flags = buf[pos + 15]
        offset_f = struct.unpack_from("<H", buf, pos + 21)[0]
        length = struct.unpack_from("<H", buf, pos + 23)[0]
        raw.append((col_type, col_num, offset_v, bool(flags & 0x01),
                    offset_f, length))
        pos += _COLDEF_LEN
    cols = []
    for col_type, col_num, offset_v, is_fixed, offset_f, length in raw:
        nlen = struct.unpack_from("<H", buf, pos)[0]
        name = bytes(buf[pos + 2 : pos + 2 + nlen]).decode("utf-16-le")
        pos += 2 + nlen
        if col_type not in _FIXED_WIDTHS and col_type not in (
            COL_TEXT,
            COL_MEMO,
        ):
            raise ValueError(
                f"column {name!r} has Jet type 0x{col_type:02x} "
                "(binary/OLE/GUID are not decodable without a fixture)"
            )
        cols.append(
            Jet3Column(name, col_type, col_num, offset_v, offset_f,
                       length, is_fixed)
        )
    if sum(1 for c in cols if not c.is_fixed) != num_var_cols:
        raise ValueError(
            f"TDEF page {page}: var-column count field {num_var_cols} "
            "disagrees with the column records"
        )
    return cols


def _decode_row4(buf: bytes, table: Jet3Table, lval_fetch):
    """Decode one Jet 4 row (u16 column count, u16 var trailer — no
    jump tables)."""
    num_cols = struct.unpack_from("<H", buf, 0)[0]
    if num_cols != len(table.columns):
        raise ValueError(
            f"row declares {num_cols} columns, TDEF has "
            f"{len(table.columns)} — schema-evolution rows are not "
            "decodable without a fixture"
        )
    end = len(buf)
    mask_len = (num_cols + 7) // 8
    mask_bytes = buf[end - mask_len : end]
    end -= mask_len
    var_cols = table.var_columns
    bounds = None
    n_var = 0
    if var_cols:
        n_var = struct.unpack_from("<H", buf, end - 2)[0]
        if n_var != len(var_cols):
            raise ValueError(
                f"row trailer var count {n_var} != TDEF's {len(var_cols)}"
            )
        end -= 2
        bounds = [
            struct.unpack_from("<H", buf, end - 2 * (i + 1))[0]
            for i in range(n_var + 1)
        ]
        end -= 2 * (n_var + 1)
        if bounds[-1] != end or any(
            bounds[i] > bounds[i + 1] for i in range(n_var)
        ):
            raise ValueError(
                "row var-offset table inconsistent with trailer "
                "position — unknown Jet 4 row variant"
            )
    out = {}
    for col in table.columns:
        present = bool(mask_bytes[col.col_num // 8] >> (col.col_num % 8) & 1)
        if col.col_type == COL_BOOL:
            out[col.name] = present
            continue
        if col.is_fixed:
            start = 2 + col.offset_f
            raw = buf[start : start + col.length]
            if len(raw) != col.length:
                raise ValueError(
                    f"fixed column {col.name!r} extends past the row"
                )
        else:
            v = col.offset_v
            if v >= n_var:
                raise ValueError(
                    f"var column {col.name!r} offset index {v} out of "
                    f"range ({n_var} var slots)"
                )
            raw = buf[bounds[v] : bounds[v + 1]]
        if not present:
            out[col.name] = None
            continue
        if col.col_type == COL_TEXT:
            out[col.name] = decode_jet4_text(raw)
        elif col.col_type == COL_MEMO:
            out[col.name] = _decode_memo4(raw, lval_fetch)
        else:
            out[col.name] = _decode_scalar_value(col, raw, lval_fetch)
    return out


class Jet4File:
    """One parsed Jet 4 .mdb: self-describing catalog + typed tables."""

    def __init__(self, path: str):
        with open(path, "rb") as fh:
            self._data = fh.read()
        magic = self._data[4:20]
        ver = self._data[0x14] if len(self._data) > 0x14 else -1
        # ACE (Access 2007+): the PUBLIC mdbtools dispatch maps every
        # ACCDB version onto the SAME Jet-4 format constants (page
        # size, offset maps, TDEF layout, row trailers), so the shared
        # structure is parsed here (r13); ACE-only features (complex/
        # attachment column types, encryption) have no fixture in this
        # environment and refuse loudly at the point of use — an
        # unknown column-type byte raises in the TDEF parse, never
        # decodes garbage. _ACE_VERSIONS: 0x02=2007, 0x03=2010,
        # 0x04=2013, 0x05=2016, 0x06=2019.
        is_ace = (magic == _ACE_MAGIC and 0x02 <= ver <= 0x06) or (
            magic == _JET3_MAGIC and 0x02 <= ver <= 0x06
        )
        if not is_ace and (magic != _JET3_MAGIC or ver != 0x01):
            raise ValueError(
                f"{path}: not a Jet 4 (Access 2000-2003) or ACE "
                "(Access 2007+) file — version dispatch lives in "
                "sources.mdb.open_mdb"
            )
        self.vintage = "ace" if is_ace else "jet4"
        self.version_byte = ver
        if len(self._data) % PAGE_SIZE:
            raise ValueError(
                f"{path}: not a whole number of {PAGE_SIZE}B pages"
            )
        self._pages_by_tdef: dict[int, list[int]] = {}
        for p in range(len(self._data) // PAGE_SIZE):
            pg = self._page(p)
            if pg[0] == _PG_DATA:
                owner = struct.unpack_from("<I", pg, 4)[0]
                self._pages_by_tdef.setdefault(owner, []).append(p)
        cat_cols = _parse_tdef4(CATALOG_TDEF, self._page)
        catalog = Jet3Table("MSysObjects", CATALOG_TDEF, cat_cols)
        have = {c.name for c in cat_cols}
        for need in ("Id", "Name", "Type"):
            if need not in have:
                raise ValueError(
                    f"MSysObjects TDEF lacks column {need!r} — not a "
                    "catalog this reader understands"
                )
        self.tables: dict[str, Jet3Table] = {}
        for row in self._rows_of(catalog):
            name = row.get("Name")
            obj_type = (row.get("Type") or 0) & 0x7F
            obj_id = row.get("Id") or 0
            if obj_type != 1 or name is None or name.startswith("MSys"):
                continue
            tdef_page = obj_id & 0x00FFFFFF
            self.tables[name] = Jet3Table(
                name, tdef_page, _parse_tdef4(tdef_page, self._page)
            )

    def _page(self, p: int) -> bytes:
        if p >= len(self._data) // PAGE_SIZE:
            raise ValueError(f"page {p} beyond file end")
        return self._data[p * PAGE_SIZE : (p + 1) * PAGE_SIZE]

    def _slot_entries(self, pg: bytes):
        """Yield (raw_off, start, end) for EVERY offset-map slot on a
        data page (Jet 4: row count at 0x0C, map at 0x0E); liveness and
        flag handling belong to the caller."""
        n = struct.unpack_from("<H", pg, 0x0C)[0]
        prev = PAGE_SIZE
        for i in range(n):
            raw_off = struct.unpack_from("<H", pg, 0x0E + 2 * i)[0]
            off = raw_off & _OFFSET_MASK
            end = prev
            prev = off if off else prev
            yield raw_off, off, end

    def _row_payloads(self, table: Jet3Table):
        """Yield raw payload bytes for every live row of ``table``,
        following 0x4000 lookup (overflow-pointer) slots — 4-byte LE
        ``(page << 8) | row`` per the public mdbtools description —
        and excluding pointed-at rows from the sequential scan so a
        row is never yielded twice. Same scheme as jet3.py; see its
        _row_payloads docstring."""
        pages = list(self._pages_by_tdef.get(table.tdef_page, ()))
        pointed: set = set()
        for p in pages:
            pg = self._page(p)
            for raw_off, off, end in self._slot_entries(pg):
                if (raw_off & _FLAG_LOOKUP and not raw_off & _FLAG_DELETED
                        and off and end - off >= 4):
                    ptr = struct.unpack_from("<I", pg, off)[0]
                    pointed.add((ptr >> 8, ptr & 0xFF))
        for p in pages:
            pg = self._page(p)
            for i, (raw_off, off, end) in enumerate(self._slot_entries(pg)):
                if raw_off & _FLAG_DELETED or off == 0:
                    continue
                if off >= end:
                    raise ValueError(
                        "row offsets not descending — corrupt page or an "
                        "offset-map variant this reader does not support"
                    )
                if raw_off & _FLAG_LOOKUP:
                    yield self._overflow_row(pg, off, end)
                elif (p, i) not in pointed:
                    yield pg[off:end]

    def _overflow_row(self, pg: bytes, off: int, end: int) -> bytes:
        """Resolve a 0x4000 lookup slot to the row bytes it points at."""
        if end - off < 4:
            raise ValueError("lookup row shorter than its 4-byte pointer")
        ptr = struct.unpack_from("<I", pg, off)[0]
        tgt_page, tgt_row = ptr >> 8, ptr & 0xFF
        tpg = self._page(tgt_page)
        if tpg[0] != _PG_DATA:
            raise ValueError(
                f"overflow pointer targets page {tgt_page}, not a data page"
            )
        for i, (raw_off, o, e) in enumerate(self._slot_entries(tpg)):
            if i != tgt_row:
                continue
            if raw_off & _FLAG_DELETED or o == 0:
                raise ValueError(
                    f"overflow row {tgt_row} on page {tgt_page} is deleted"
                )
            if raw_off & _FLAG_LOOKUP:
                raise ValueError(
                    "chained overflow pointers unsupported — no public "
                    "fixture documents the chain shape"
                )
            return tpg[o:e]
        raise ValueError(f"overflow row {tgt_row} beyond page {tgt_page}")

    def _lval_fetch(self, page: int, row: int) -> bytes:
        pg = self._page(page)
        if pg[0] != _PG_DATA or struct.unpack_from("<I", pg, 4)[0] != LVAL_TAG:
            raise ValueError(f"page {page} is not an LVAL page")
        for i, (raw_off, off, end) in enumerate(self._slot_entries(pg)):
            if i == row:
                if raw_off & _FLAG_DELETED or off == 0:
                    raise ValueError(
                        f"LVAL row {row} on page {page} is deleted"
                    )
                return pg[off:end]
        raise ValueError(f"LVAL row {row} not found on page {page}")

    def _rows_of(self, table: Jet3Table):
        for payload in self._row_payloads(table):
            yield _decode_row4(payload, table, self._lval_fetch)

    def read_rows(self, table: str):
        return list(self._rows_of(self.tables[table]))

    def row_count(self, table: str) -> int:
        return sum(1 for _ in self._row_payloads(self.tables[table]))


def jet4_table(spark, path: str, table: str):
    f = Jet4File(path)
    return _table_df(spark, f, table)


def _table_df(spark, f: Jet4File, table: str):
    from hhek2sqlite_spark.sources.jet3 import _spark_schema_for

    t = f.tables[table]
    st = _spark_schema_for(t)
    rows = f.read_rows(table)
    ordered = [tuple(r[fld.name] for fld in st.fields) for r in rows]
    return spark.createDataFrame(ordered, st)


def jet4_read_database(spark, path: str):
    """Read EVERY user table from a Jet 4 .mdb (self-describing TDEFs)."""
    f = Jet4File(path)
    return {name: _table_df(spark, f, name) for name in f.tables}
