"""Jet 2.0 secondary-index pages (type 0x04 leaves) — the S5 reverse
half: the reference's 28 CREATE INDEX statements (dbinfo.txt, e.g.
:122-160; the Go tool re-creates 15 of them, hhek2sqlite.go:92-1027)
materialized as real index pages in ``write_jet2`` output.

Everything here is reverse-engineered from GOTEST1.MDB's 39 live index
pages (round 10) — REAL Access-written bytes, not the Go tool's (the
fixture carries dbinfo's index set, e.g. Transaktioner idxDatum/
idxFrånKonto/idxTillKonto singles, not the Go tool's compound
idxFrånKontoTillKonto), so exact-byte agreement with these pages is
agreement with the Jet engine itself. Observed structure:

- Leaf page (type 0x04): u8 0x04, u8 0, u16 checksum-ish (unparsed),
  u32 owning TDEF page @4, u16 index slot number @8, u16 entry count
  @10, u16 free-space pointer @12 (lowest packed byte), u16 available
  bytes @14 (= free_ptr - 24 - 2*count), u32 next-leaf page @16, u32
  prev-leaf page @20 (0 = none; verified on the catalog index chain
  26 -> 27 -> 53). Offset array of u16 from @24 in KEY ORDER; low 12
  bits = entry offset, 0x1000 flag = duplicate-key entry. Entries pack
  downward from the page end.
- Entry: u8 len, then ``len`` key-image bytes, then the pointer block.
  Key image per column: 0x7f + encoded bytes (+ 0x00 terminator for
  text), or a bare 0x00 for NULL (verified: Budget idxKontrollnr,
  page 48, all 34 rows NULL -> single entry ``01 00`` + 34 pointers).
  Compound indexes concatenate per-column units (Budget idxInkomstTyp,
  page 47). Pointer block: u32 LE (data_page << 8 | row) for a unique
  key; for a 0x1000-flagged entry, u8 pointer count then count u32
  pointers ascending (verified: idxDatum '2020-12-24' x3, idxInkomst
  'j' x12 / 'n' x22).
- LONG keys: 4 bytes big-endian with the sign bit flipped (ascending
  order-preserving; verified Löpnr 1..34 -> ``80 00 00 01``...).
- TEXT keys: caseless Swedish collation byte map (verified against
  every live text entry in the fixture): space->0x11, '-'->0x1e,
  '.'->0x1f, digits d->0x56+d, a-d -> 0x60..0x63, e-z identity
  (0x64 is observed-unused), å->0x7c ä->0x7d ö->0x7e; uppercase maps
  like lowercase. Characters outside the observed repertoire raise —
  extrapolating an unverified collation would write silently-wrong
  sort keys.

Index slot numbering inside a table is Access-internal and not
reproducible from the DDL (Budget's observed order Inkomst, Typ,
Löpnr, InkomstTyp, Kontrollnr matches neither creation nor name
order); REFERENCE_INDEXES pins the OBSERVED slot order for the seven
tables with live fixture entries and dbinfo order for the three empty
ones. Interior nodes (type 0x03) are NOT emitted: every user index in
the fixture is single-leaf, multi-leaf output chains leaves via the
next/prev links, and the one observed 0x03 page (catalog index) leaves
its subtree-key convention ambiguous — emitting a guessed root would
be silent corruption, a missing one is honestly detectable.
"""

from __future__ import annotations

import struct

PAGE_SIZE = 2048

# ---------------------------------------------------------------- keys

# ASCII 0x20-0x2F (space !"#$%&'()*+,-./) map uniformly to ch - 0x0F:
# verified directly for space (0x11), ',' (0x1d, Budget idxTyp entry
# "dagstidning, tel, ..."), '-' (0x1e), '.' (0x1f, DtbVer "3.01"),
# '/' (0x20, "bostad/hyra ..."), i.e. five probes across the block;
# the intervening five are the same affine pattern.
_TEXT_MAP: dict[str, int] = {chr(c): c - 0x0F for c in range(0x20, 0x30)}
for _d in "0123456789":
    _TEXT_MAP[_d] = 0x56 + int(_d)
for _c in "abcd":
    _TEXT_MAP[_c] = 0x60 + ord(_c) - ord("a")
for _c in "efghijklmnopqrstuvwxyz":
    _TEXT_MAP[_c] = ord(_c)
_TEXT_MAP["å"] = 0x7C
_TEXT_MAP["ä"] = 0x7D
_TEXT_MAP["ö"] = 0x7E


def text_sortkey(value: str) -> bytes:
    """Collation byte map above; caseless. Raises on characters the
    fixture never exhibits (see module docstring)."""
    out = bytearray()
    for ch in value.lower():
        b = _TEXT_MAP.get(ch)
        if b is None:
            raise ValueError(
                f"character {ch!r} has no verified Jet 2.0 collation byte "
                "(GOTEST1.MDB exhibits only [a-zA-Z0-9 .\\-åäöÅÄÖ]); "
                "refusing to guess a sort key"
            )
        out.append(b)
    return bytes(out)


def encode_key(kind: str, value) -> bytes:
    """One column's key-image unit: 0x7f + payload (+ 0x00 for text),
    or bare 0x00 for NULL."""
    if value is None:
        return b"\x00"
    if kind == "long":
        return b"\x7f" + struct.pack(">i", int(value) ^ -(2**31))
    if kind in ("text", "var", "memo"):
        return b"\x7f" + text_sortkey(str(value)) + b"\x00"
    raise ValueError(
        f"no verified Jet 2.0 index key encoding for column kind {kind!r} "
        "(the reference's 28 indexes cover LONG and TEXT only)"
    )


# ------------------------------------------------- reference index set

# {table: [(index_name, (column, ...)), ...]} in SLOT order — observed
# from GOTEST1's live pages where the table has rows (Personer,
# Transaktioner, Konton, Platser, DtbVer, Budget, BetalKonton), dbinfo
# DDL order (secondaries first, PK last, matching every observed
# 2-index table) for the empty three. Source: dbinfo.txt CREATE INDEX
# statements.
REFERENCE_INDEXES: dict[str, list[tuple[str, tuple[str, ...]]]] = {
    "Personer": [("idxNamn", ("Namn",)), ("idxLöpnr", ("Löpnr",))],
    "Platser": [("idxNamn", ("Namn",)), ("idxLöpnr", ("Löpnr",))],
    "BetalKonton": [("idxKonto", ("Konto",)), ("idxLöpnr", ("Löpnr",))],
    "DtbVer": [("idxVerNum", ("VerNum",))],
    "Konton": [("idxBenämning", ("Benämning",)), ("idxLöpnr", ("Löpnr",))],
    "Transaktioner": [
        ("idxDatum", ("Datum",)),
        ("idxFrånKonto", ("FrånKonto",)),
        ("idxTillKonto", ("TillKonto",)),
        ("idxLöpnr", ("Löpnr",)),
    ],
    "Budget": [
        ("idxInkomst", ("Inkomst",)),
        ("idxTyp", ("Typ",)),
        ("idxLöpnr", ("Löpnr",)),
        ("idxInkomstTyp", ("Inkomst", "Typ")),
        ("idxKontrollnr", ("Kontrollnr",)),
    ],
    "Betalningar": [
        ("idxDatum", ("Datum",)),
        ("idxFrånKonto", ("FrånKonto",)),
        ("idxLanLopnr", ("LanLopnr",)),
        ("idxTillPlats", ("TillPlats",)),
        ("idxLöpnr", ("Löpnr",)),
    ],
    "Överföringar": [
        ("idxDatum", ("Datum",)),
        ("idxFrånKontoTillKonto", ("FrånKonto", "TillKonto")),
        ("idxLöpnr", ("Löpnr",)),
    ],
    "LÅN": [("idxLangiv", ("Langivare",)), ("idxLöpnr", ("Löpnr",))],
}


def _column_kind(schema, column: str) -> str:
    for name, kind in schema.fixed:
        if name == column:
            return kind
    if column in schema.var:
        return "memo" if column in schema.memo else "text"
    raise ValueError(f"index column {column!r} not in table layout")


# -------------------------------------------------------------- build


def build_index_entries(schema, columns, rows, locs):
    """(sorted) [(key_image, [ptr, ...])] for one index over ``rows``
    whose data locations are ``locs`` (from _pack_data_pages)."""
    kinds = [_column_kind(schema, c) for c in columns]
    groups: dict[bytes, list[int]] = {}
    for row, (page, rowno) in zip(rows, locs):
        key = b"".join(
            encode_key(kind, row.get(col)) for col, kind in zip(columns, kinds)
        )
        if len(key) > 253:
            raise ValueError(
                f"index key image is {len(key)} bytes; the u8 entry length "
                "caps keys at 253 bytes"
            )
        groups.setdefault(key, []).append((page << 8) | rowno)
    return [(key, sorted(ptrs)) for key, ptrs in sorted(groups.items())]


def _encode_entry(key: bytes, ptrs: list[int]) -> tuple[bytes, bool]:
    """Entry bytes + whether the offset needs the 0x1000 dup flag."""
    body = bytes([len(key)]) + key
    if len(ptrs) == 1:
        return body + struct.pack("<I", ptrs[0]), False
    if len(ptrs) > 255:
        raise ValueError(
            f"{len(ptrs)} duplicate pointers exceed the u8 count field"
        )
    return (
        body + bytes([len(ptrs)]) + b"".join(struct.pack("<I", p) for p in ptrs),
        True,
    )


def pack_index_pages(tdef_page: int, slot: int, entries, base_page: int):
    """Pack one index's entries into chained 0x04 leaf pages (header
    layout per module docstring). ``base_page`` is the absolute page
    number of the first emitted page (for the next/prev chain)."""
    encoded = [_encode_entry(k, p) for k, p in entries]
    pages: list[bytearray] = []
    cur: list[tuple[bytes, bool]] = []

    def flush():
        pg = bytearray(PAGE_SIZE)
        pg[0] = 0x04
        struct.pack_into("<I", pg, 4, tdef_page)
        struct.pack_into("<H", pg, 8, slot)
        struct.pack_into("<H", pg, 10, len(cur))
        pos = PAGE_SIZE
        for i, (eb, dup) in enumerate(cur):
            pos -= len(eb)
            pg[pos : pos + len(eb)] = eb
            struct.pack_into("<H", pg, 24 + 2 * i, pos | (0x1000 if dup else 0))
        struct.pack_into("<H", pg, 12, pos)
        struct.pack_into("<H", pg, 14, pos - 24 - 2 * len(cur))
        pages.append(pg)
        cur.clear()

    for eb, dup in encoded:
        if 26 + len(eb) > PAGE_SIZE:
            raise ValueError(
                f"index entry of {len(eb)} bytes cannot fit a leaf page"
            )
        used = sum(len(e) for e, _ in cur)
        slots_bytes = 24 + 2 * (len(cur) + 1)
        if cur and slots_bytes + used + len(eb) > PAGE_SIZE:
            flush()
        cur.append((eb, dup))
    if cur or not pages:
        flush()  # an empty index still gets one empty leaf, as observed
    for i, pg in enumerate(pages):
        if i + 1 < len(pages):
            struct.pack_into("<I", pg, 16, base_page + i + 1)
        if i > 0:
            struct.pack_into("<I", pg, 20, base_page + i - 1)
    return [bytes(pg) for pg in pages]


def build_table_indexes(schema, table, rows, locs, tdef_page, next_page, indexes=None):
    """All index leaf pages for one table (one chained run per spec, in
    slot order), starting at absolute page ``next_page``."""
    specs = REFERENCE_INDEXES.get(table, []) if indexes is None else indexes
    pages: list[bytes] = []
    for slot, (_name, columns) in enumerate(specs):
        entries = build_index_entries(schema, columns, rows, locs)
        pages.extend(
            pack_index_pages(tdef_page, slot, entries, next_page + len(pages))
        )
    return pages


# -------------------------------------------------------------- decode


def decode_index_page(pg: bytes):
    """[(key_image, [(page, row), ...])] for one 0x04 leaf, in the
    offset array's (key) order."""
    if pg[0] != 0x04:
        raise ValueError("not an index leaf page")
    cnt = struct.unpack_from("<H", pg, 10)[0]
    out = []
    for i in range(cnt):
        raw = struct.unpack_from("<H", pg, 24 + 2 * i)[0]
        off = raw & 0x0FFF
        klen = pg[off]
        key = pg[off + 1 : off + 1 + klen]
        p = off + 1 + klen
        if raw & 0x1000:
            n = pg[p]
            ptrs = [
                struct.unpack_from("<I", pg, p + 1 + 4 * j)[0] for j in range(n)
            ]
        else:
            ptrs = [struct.unpack_from("<I", pg, p)[0]]
        out.append((key, [(d >> 8, d & 0xFF) for d in ptrs]))
    return out
