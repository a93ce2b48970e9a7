"""Round-11 regression tests for the advisor's Jet-layer findings.

1. `_pack_data_pages` must never assign a row slot above 0xFF: data
   locations are later encoded as ``(page << 8) | row`` with 8 bits for
   the slot (index entries, LVAL pointers). NOTE the arithmetic: a real
   encoded row is at least 6 B (2 len + 2 counts + 1 bound + 1 n_var)
   plus a 2 B offset slot, so a 2048 B page holds at most
   (2048 - 22) // 8 = 253 rows of the smallest possible layout — the
   cap is unreachable through `_encode_row` today. It is still enforced
   at the packer level (raw-bytes callers, or any future PAGE_SIZE /
   framing change), and that level is what these tests exercise.
2. `_encode_row`/`_decode_row` must refuse 255 var columns: 0xFF is the
   long-row jump-table pad byte, "never a bound index" only while bound
   indexes stay below 255.
"""

from __future__ import annotations

import pytest

from hhek2sqlite_spark.sources.jet2 import (
    Jet2File,
    TableSchema,
    _decode_row,
    _encode_row,
    _pack_data_pages,
    write_jet2,
)

TINY = TableSchema(fixed=[("N", "byte")], var=[])


def test_pack_data_pages_caps_row_slot_at_255():
    # 1-byte raw rows (3 B framed) would pack ~675 to a page without
    # the slot cap; the cap must flush at 256 rows
    pages, locs = _pack_data_pages(2, [b"\x01"] * 600, base_page=10)
    assert len(locs) == 600
    assert max(slot for _pg, slot in locs) == 0xFF
    assert len(pages) == 3  # 256 + 256 + 88
    assert len(set(locs)) == 600


def test_smallest_real_row_cannot_reach_the_cap():
    # the documented premise: min encoded row is 6 B, so <=253 fit a page
    empty = TableSchema(fixed=[], var=[])
    rb = _encode_row(empty, {})
    assert len(rb) == 6
    pages, locs = _pack_data_pages(2, [rb] * 600)
    per_page = {}
    for pg, slot in locs:
        per_page[pg] = max(per_page.get(pg, 0), slot)
    assert max(per_page.values()) == 252  # 253 rows -> slots 0..252


def test_tiny_rows_roundtrip_through_writer(tmp_path):
    rows = [{"N": i & 0xFF} for i in range(600)]
    p = str(tmp_path / "tiny.mdb")
    write_jet2(p, {"Tiny": (TINY, rows)}, indexes={})
    got = Jet2File(p).read_rows("Tiny", schema=TINY)
    assert [r["N"] for r in got] == [r["N"] for r in rows]


def test_encode_row_rejects_255_var_columns():
    schema = TableSchema(fixed=[], var=[f"c{i}" for i in range(255)])
    with pytest.raises(ValueError, match="0xFF as padding"):
        _encode_row(schema, {})


def test_decode_row_rejects_255_var_columns():
    buf = bytes([0, 0, 0, 0xFF]) + bytes(32)
    with pytest.raises(ValueError, match="0xFF as padding"):
        _decode_row(buf, None)


def test_254_var_columns_still_encode_and_decode():
    schema = TableSchema(fixed=[], var=[f"c{i}" for i in range(254)])
    row = {f"c{i}": ("x" if i % 7 == 0 else "") for i in range(254)}
    buf = _encode_row(schema, row)
    back = _decode_row(buf, schema)
    assert sum(1 for v in back.values() if v == "x") == sum(
        1 for v in row.values() if v == "x"
    )
