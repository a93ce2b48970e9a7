"""Jet 2.0 secondary-index pages (round 10, VERDICT r9 task 10 / S5
reverse half).

The strongest validation available without a live Jet engine: GOTEST1's
index pages were written by REAL Access (the fixture carries dbinfo's
index set — e.g. Transaktioner's three text singles — not the Go
tool's compound variant), so re-encoding every live entry from the
decoded table rows and requiring EXACT byte equality with the
fixture's entry bytes tests our encoder against the engine itself:
collation map, sign-flipped longs, NULL keys, duplicate-key compression
and pointer order all participate.
"""

from __future__ import annotations

import struct

import pytest

from hhek2sqlite_spark.sources.jet2 import (
    HHEK_SCHEMAS,
    PAGE_SIZE,
    Jet2File,
    default_mdb_path,
    write_jet2,
)
from hhek2sqlite_spark.sources.jet2_index import (
    REFERENCE_INDEXES,
    _column_kind,
    _encode_entry,
    build_index_entries,
    decode_index_page,
    encode_key,
    text_sortkey,
)

MDB = default_mdb_path()


@pytest.fixture(scope="module")
def mdb():
    if MDB is None:
        pytest.skip("GOTEST1.MDB fixture absent")
    return Jet2File(MDB)


# -------------------------------------------------------- sortkey unit


def test_text_sortkey_observed_bytes():
    # every mapping class, pinned to bytes read off the fixture pages
    assert text_sortkey("Gemensamt") == bytes.fromhex("67 65 6d 65 6e 73 60 6d 74".replace(" ", ""))
    assert text_sortkey("Person Två") == bytes.fromhex("70 65 72 73 6f 6e 11 74 76 7c".replace(" ", ""))
    assert text_sortkey("2020-12-24") == bytes.fromhex("58 56 58 56 1e 57 58 1e 58 5a".replace(" ", ""))
    assert text_sortkey("3.01") == bytes.fromhex("59 1f 56 57".replace(" ", ""))
    assert text_sortkey("barnbidrag") == bytes.fromhex("61 60 72 6e 61 69 63 72 60 67".replace(" ", ""))
    assert text_sortkey("arbetslöshetsersättning").endswith(b"\x7d\x74\x74\x6e\x69\x6e\x67")


def test_text_sortkey_punctuation_block():
    # ch - 0x0F over ASCII 0x20-0x2F; ',' and '/' are fixture-verified
    assert text_sortkey("a,b/c") == bytes([0x60, 0x1D, 0x61, 0x20, 0x62])


def test_text_sortkey_rejects_unverified_chars():
    with pytest.raises(ValueError, match="no verified"):
        text_sortkey("café")
    with pytest.raises(ValueError, match="no verified"):
        text_sortkey("a:b")


def test_long_key_sign_flip_orders():
    ks = [encode_key("long", v) for v in (-2, -1, 0, 1, 2, 10**6)]
    assert ks == sorted(ks)
    assert encode_key("long", 1) == b"\x7f\x80\x00\x00\x01"
    assert encode_key("long", None) == b"\x00"


# ----------------------------------------- fixture byte-exact parity


def _expected_entry_bytes(f, table, columns):
    schema = HHEK_SCHEMAS[table]
    located = f.read_rows_located(table)
    rows = [r for _, _, r in located]
    locs = [(p, i) for p, i, _ in located]
    entries = build_index_entries(schema, columns, rows, locs)
    return [_encode_entry(k, p) for k, p in entries]


def _live_entry_bytes(f, table, slot):
    out = []
    for p in f.index_pages(table)[slot]:
        pg = f._page(p)
        cnt = struct.unpack_from("<H", pg, 10)[0]
        for i in range(cnt):
            raw = struct.unpack_from("<H", pg, 24 + 2 * i)[0]
            off = raw & 0x0FFF
            klen = pg[off]
            end = off + 1 + klen
            if raw & 0x1000:
                end += 1 + 4 * pg[end]
            else:
                end += 4
            out.append((pg[off:end], bool(raw & 0x1000)))
    return out


LIVE_TABLES = [
    "Personer",
    "Platser",
    "Konton",
    "DtbVer",
    "Transaktioner",
    "Budget",
]


@pytest.mark.parametrize("table", LIVE_TABLES)
def test_fixture_index_entries_reencode_byte_exact(mdb, table):
    specs = REFERENCE_INDEXES[table]
    slots = mdb.index_pages(table)
    assert set(slots) == set(range(len(specs))), (
        f"{table}: fixture has slots {sorted(slots)}, specs claim {len(specs)}"
    )
    for slot, (_name, columns) in enumerate(specs):
        got = _live_entry_bytes(mdb, table, slot)
        want = _expected_entry_bytes(mdb, table, columns)
        assert got == want, f"{table} slot {slot} ({_name})"


def test_fixture_index_pointers_resolve(mdb):
    """Every pointer in every live index lands on a decodable row whose
    indexed value re-encodes to the entry's key image."""
    for table in LIVE_TABLES:
        located = {
            (p, i): r for p, i, r in mdb.read_rows_located(table)
        }
        for slot, (_name, columns) in enumerate(REFERENCE_INDEXES[table]):
            schema = HHEK_SCHEMAS[table]
            for key, ptrs in mdb.read_index(table, slot):
                for ptr in ptrs:
                    row = located[ptr]
                    # kind must be computed PER COLUMN — a single any()
                    # over the compound would re-encode every column of
                    # a mixed long+text index as long
                    rek = b"".join(
                        encode_key(_column_kind(schema, c), row.get(c))
                        for c in columns
                    )
                    assert rek == key, f"{table} slot {slot} ptr {ptr}"


def test_empty_table_indexes_have_empty_leaves(mdb):
    for table in ("Betalningar", "Överföringar", "LÅN", "BetalKonton"):
        slots = mdb.index_pages(table)
        assert set(slots) == set(range(len(REFERENCE_INDEXES[table]))), table
        for slot in slots:
            assert mdb.read_index(table, slot) == []


# ---------------------------------------------------------- roundtrip


def test_write_jet2_emits_reference_indexes(tmp_path, mdb):
    """Writer output now carries index pages; reading them back gives
    sorted, dedup-grouped, pointer-correct entries for real data."""
    rows = mdb.read_rows("Transaktioner")
    out = str(tmp_path / "with_idx.mdb")
    write_jet2(out, {"Transaktioner": (HHEK_SCHEMAS["Transaktioner"], rows)})
    g = Jet2File(out)
    specs = REFERENCE_INDEXES["Transaktioner"]
    assert set(g.index_pages("Transaktioner")) == set(range(len(specs)))
    located = {(p, i): r for p, i, r in g.read_rows_located("Transaktioner")}
    # idxDatum: all three rows share 2020-12-24 -> ONE dup-compressed entry
    datum = g.read_index("Transaktioner", 0)
    assert len(datum) == 1 and len(datum[0][1]) == 3
    # idxLöpnr (slot 3): unique, ascending
    lopnr = g.read_index("Transaktioner", 3)
    assert [k for k, _ in lopnr] == sorted(k for k, _ in lopnr)
    assert [located[ps[0]]["Löpnr"] for _, ps in lopnr] == [1, 2, 3]


def test_write_jet2_indexes_match_fixture_bytes(mdb, tmp_path):
    """End-to-end S5 parity: rewrite Personer + Budget from decoded
    fixture rows and require the EMITTED entry bytes to equal the
    fixture's Access-written ones, index by index."""
    for table in ("Personer", "Budget"):
        rows = mdb.read_rows(table)
        out = str(tmp_path / f"{table}.mdb")
        write_jet2(out, {table: (HHEK_SCHEMAS[table], rows)})
        g = Jet2File(out)
        # page numbers and rows-per-page packing differ between files,
        # so compare each pointer by the ROW IDENTITY (Löpnr) it lands
        # on, plus exact key images and entry order
        ours = {(p, i): r["Löpnr"] for p, i, r in g.read_rows_located(table)}
        ref = {(p, i): r["Löpnr"] for p, i, r in mdb.read_rows_located(table)}
        for slot in range(len(REFERENCE_INDEXES[table])):
            got = [
                (k, [ours[ptr] for ptr in ptrs])
                for k, ptrs in g.read_index(table, slot)
            ]
            want = [
                (k, [ref[ptr] for ptr in ptrs])
                for k, ptrs in mdb.read_index(table, slot)
            ]
            assert got == want, f"{table} slot {slot}"


def test_indexes_suppressed_with_empty_dict(tmp_path, mdb):
    rows = mdb.read_rows("Personer")
    out = str(tmp_path / "noidx.mdb")
    write_jet2(out, {"Personer": (HHEK_SCHEMAS["Personer"], rows)}, indexes={})
    assert Jet2File(out).index_pages("Personer") == {}


def test_multi_leaf_chain_links(tmp_path):
    """Enough entries to overflow one leaf: pages chain via next/prev
    and the concatenated read returns every key in order."""
    from hhek2sqlite_spark.sources.jet2 import TableSchema

    schema = TableSchema([("Id", "long")], ["Namn"])
    rows = [{"Id": i, "Namn": f"namn nummer {i:05d}"} for i in range(400)]
    out = str(tmp_path / "big.mdb")
    write_jet2(
        out,
        {"T": (schema, rows)},
        indexes={"T": [("idxNamn", ("Namn",)), ("idxId", ("Id",))]},
    )
    g = Jet2File(out)
    pages = g.index_pages("T")
    assert len(pages[0]) > 1  # text index overflows one 2 KB leaf
    # chain integrity
    for run in pages.values():
        for a, b in zip(run, run[1:]):
            pga, pgb = g._page(a), g._page(b)
            assert struct.unpack_from("<I", pga, 16)[0] == b
            assert struct.unpack_from("<I", pgb, 20)[0] == a
    ks = [k for k, _ in g.read_index("T", 0)]
    assert ks == sorted(ks) and len(ks) == 400
    id_keys = [k for k, _ in g.read_index("T", 1)]
    assert len(id_keys) == 400 and id_keys == sorted(id_keys)


def test_null_key_encoding_roundtrip(tmp_path):
    from hhek2sqlite_spark.sources.jet2 import TableSchema

    schema = TableSchema([("Id", "long"), ("K", "long")], ["Namn"])
    rows = [
        {"Id": 1, "K": None, "Namn": "a"},
        {"Id": 2, "K": None, "Namn": "b"},
        {"Id": 3, "K": 7, "Namn": "c"},
    ]
    out = str(tmp_path / "nulls.mdb")
    write_jet2(out, {"T": (schema, rows)}, indexes={"T": [("idxK", ("K",))]})
    entries = Jet2File(out).read_index("T", 0)
    # NULL group first (0x00 < 0x7f), dup-compressed, then the value
    assert entries[0][0] == b"\x00" and len(entries[0][1]) == 2
    assert entries[1][0] == b"\x7f\x80\x00\x00\x07"
