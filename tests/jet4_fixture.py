"""Synthetic Jet 4 (Access 2000) .mdb fixture builder — the Jet 4
counterpart of tests/jet3_fixture.py, built INDEPENDENTLY of the reader
in hhek2sqlite_spark/sources/jet4.py (raw struct.pack, no shared
helpers). Same checkDB1-style content; Jet 4 parameter changes:
4096-byte pages, u16 row column counts and var trailers (no jump
tables), 25-byte TDEF column records with UCS-2 names, and both Jet 4
text encodings (compressed 0xFF 0xFE + cp1252, and plain UTF-16-LE).
"""

from __future__ import annotations

import struct
from decimal import Decimal

PAGE = 4096
LVAL_TAG = int.from_bytes(b"LVAL", "little")

BOOL, BYTE, INT, LONG, MONEY, FLOAT, DOUBLE, DATETIME, TEXT, MEMO = (
    0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x0A, 0x0C,
)
_W = {BYTE: 1, INT: 2, LONG: 4, MONEY: 8, FLOAT: 4, DOUBLE: 8, DATETIME: 8}


def _t_comp(txt: str) -> bytes:
    """Compressed Jet 4 text (all chars single-byte cp1252)."""
    return b"\xff\xfe" + txt.encode("cp1252")


def _t_ucs2(txt: str) -> bytes:
    """Plain UTF-16-LE Jet 4 text."""
    return txt.encode("utf-16-le")


def _tdef(cols):
    buf = bytearray(PAGE)
    buf[0] = 0x02
    buf[1] = 0x01
    n_var = sum(1 for _, _, f in cols if not f)
    struct.pack_into("<H", buf, 0x2B, n_var)
    struct.pack_into("<H", buf, 0x2D, len(cols))
    # num_real_idx @0x33 stays 0 -> column records start at 0x3F
    pos = 0x3F
    off_f = 0
    off_v = 0
    for num, (name, typ, fixed) in enumerate(cols):
        buf[pos] = typ
        struct.pack_into("<H", buf, pos + 5, num)
        struct.pack_into("<H", buf, pos + 7, off_v if not fixed else 0)
        buf[pos + 15] = 0x01 if fixed else 0x00
        length = _W.get(typ, 0) if fixed else 0
        struct.pack_into("<H", buf, pos + 21, off_f if fixed else 0)
        struct.pack_into("<H", buf, pos + 23, length)
        if fixed:
            off_f += length
        else:
            off_v += 1
        pos += 25
    for name, _, _ in cols:
        raw = name.encode("utf-16-le")
        struct.pack_into("<H", buf, pos, len(raw))
        buf[pos + 2 : pos + 2 + len(raw)] = raw
        pos += 2 + len(raw)
    return bytes(buf)


def _enc_fixed(typ, val):
    if typ == BYTE:
        return bytes([val or 0])
    if typ == INT:
        return struct.pack("<h", val or 0)
    if typ == LONG:
        return struct.pack("<i", val or 0)
    if typ == MONEY:
        return struct.pack("<q", int((val or Decimal(0)) * 10000))
    if typ == FLOAT:
        return struct.pack("<f", val or 0.0)
    if typ == DOUBLE:
        return struct.pack("<d", val or 0.0)
    if typ == DATETIME:
        return struct.pack("<d", val or 0.0)
    raise AssertionError(typ)


def _row(cols, values):
    ncols = len(cols)
    fixed = b""
    mask = bytearray((ncols + 7) // 8)
    var_payloads = []
    for num, (name, typ, is_fixed) in enumerate(cols):
        v = values.get(name)
        present = v is not None and (typ != BOOL or bool(v))
        if present:
            mask[num // 8] |= 1 << (num % 8)
        if typ == BOOL:
            continue
        if is_fixed:
            fixed += _enc_fixed(typ, v if v is not None else None)
        else:
            var_payloads.append(v if v is not None else b"")
    n_var = len(var_payloads)
    body = struct.pack("<H", ncols) + fixed + b"".join(var_payloads)
    if n_var == 0:
        return body + bytes(mask)
    bounds = []
    cur = 2 + len(fixed)
    for p in var_payloads:
        bounds.append(cur)
        cur += len(p)
    bounds.append(cur)  # eod
    trailer = b"".join(
        struct.pack("<H", b) for b in reversed(bounds)
    ) + struct.pack("<H", n_var) + bytes(mask)
    return body + trailer


def _data_page(tdef_pg, rows, deleted=(), lookups=None):
    """``lookups`` maps slot index -> (page, row): that slot becomes a
    0x4000 overflow-pointer whose payload is the 4-byte little-endian
    (page << 8) | row reference (the rows[i] content is ignored)."""
    lookups = lookups or {}
    buf = bytearray(PAGE)
    buf[0] = 0x01
    buf[1] = 0x01
    struct.pack_into("<I", buf, 4, tdef_pg)
    struct.pack_into("<H", buf, 0x0C, len(rows))
    end = PAGE
    for i, row in enumerate(rows):
        flag = 0
        if i in deleted:
            flag = 0x8000
        if i in lookups:
            pg_no, row_no = lookups[i]
            row = struct.pack("<I", (pg_no << 8) | row_no)
            flag |= 0x4000
        start = end - len(row)
        buf[start:end] = row
        struct.pack_into("<H", buf, 0x0E + 2 * i, start | flag)
        end = start
    struct.pack_into("<H", buf, 2, end - (0x0E + 2 * len(rows)))
    return bytes(buf)


def _memo_inline(raw: bytes) -> bytes:
    return struct.pack("<III", 0x80000000 | len(raw), 0, 0) + raw


def _memo_lval(length, page, row):
    return struct.pack("<III", 0x40000000 | length, (page << 8) | row, 0)


def _access_days(y, m, d):
    from datetime import datetime

    return (datetime(y, m, d) - datetime(1899, 12, 30)).days * 1.0


MSYS_COLS = [
    ("Id", LONG, True),
    ("Type", INT, True),
    ("Flags", LONG, True),
    ("Name", TEXT, False),
]
PERSONER = [
    ("Löpnr", LONG, True),
    ("Född", INT, True),
    ("Namn", TEXT, False),
    ("Kön", TEXT, False),
]
KONTON = [
    ("Saldo", MONEY, True),
    ("StartSaldo", MONEY, True),
    ("Löpnr", LONG, True),
    ("Benämning", TEXT, False),
]
TRANSAKTIONER = [
    ("Belopp", MONEY, True),
    ("Löpnr", LONG, True),
    ("Saldo", MONEY, True),
    ("Fastöverföring", BOOL, True),
    ("FrånKonto", TEXT, False),
    ("TillKonto", TEXT, False),
    ("Typ", TEXT, False),
    ("Datum", TEXT, False),
    ("Vem", TEXT, False),
    ("Text", TEXT, False),
]
TYPER = [
    ("Id", LONG, True),
    ("D", DOUBLE, True),
    ("När", DATETIME, True),
    ("Aktiv", BOOL, True),
    ("Note", MEMO, False),
]

PG_MSYS_TDEF, PG_MSYS_DATA = 2, 3
PG_PERS_TDEF, PG_PERS_DATA = 4, 5
PG_KONT_TDEF, PG_KONT_DATA = 6, 7
PG_TRAN_TDEF, PG_TRAN_DATA = 8, 9
PG_TYP_TDEF, PG_TYP_DATA = 10, 11
PG_LVAL = 12
PG_OVF = 13  # overflow page holding Typer row Id=3 (reached via 0x4000)

# UCS-2 payload on the LVAL page (non-cp1252 char forces the wide path)
LVAL_TEXT = "längre anteckning ☃ " + "x" * 200


def build_jet4(path: str, *, ace_version: int | None = None) -> None:
    """``ace_version`` (0x02..0x06) stamps an ACE header (``Standard
    ACE DB`` magic + that version byte) around the SAME page content —
    the shared-structure read path the public mdbtools dispatch
    documents (every ACCDB version maps onto the Jet-4 format)."""
    pages = {}
    hdr = bytearray(PAGE)
    hdr[0:2] = b"\x00\x01"
    if ace_version is None:
        hdr[4:20] = b"Standard Jet DB\x00"
        hdr[0x14] = 0x01
    else:
        hdr[4:20] = b"Standard ACE DB\x00"
        hdr[0x14] = ace_version
    pages[0] = bytes(hdr)
    um = bytearray(PAGE)
    um[0] = 0x05
    pages[1] = bytes(um)

    pages[PG_MSYS_TDEF] = _tdef(MSYS_COLS)
    pages[PG_MSYS_DATA] = _data_page(PG_MSYS_TDEF, [
        _row(MSYS_COLS, {"Id": PG_MSYS_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t_comp("MSysObjects")}),
        _row(MSYS_COLS, {"Id": 0x02000000 | PG_PERS_TDEF, "Type": 1,
                         "Flags": 0, "Name": _t_comp("Personer")}),
        _row(MSYS_COLS, {"Id": PG_KONT_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t_ucs2("Konton")}),
        _row(MSYS_COLS, {"Id": PG_TRAN_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t_comp("Transaktioner")}),
        _row(MSYS_COLS, {"Id": PG_TYP_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t_comp("Typer")}),
        _row(MSYS_COLS, {"Id": 900, "Type": 5, "Flags": 0,
                         "Name": _t_comp("AQuery")}),
    ])

    pages[PG_PERS_TDEF] = _tdef(PERSONER)
    pages[PG_PERS_DATA] = _data_page(PG_PERS_TDEF, [
        _row(PERSONER, {"Löpnr": 1, "Född": 0, "Namn": _t_comp("Gemensamt"),
                        "Kön": _t_comp("Gemensamt")}),
        _row(PERSONER, {"Löpnr": 2, "Född": 1999,
                        "Namn": _t_ucs2("Person Ett"), "Kön": _t_comp("Man")}),
        _row(PERSONER, {"Löpnr": 3, "Född": 2001,
                        "Namn": _t_comp("Person Två"),
                        "Kön": _t_comp("Kvinna")}),
        _row(PERSONER, {"Löpnr": 99, "Född": 1900,
                        "Namn": _t_comp("Borttagen"), "Kön": _t_comp("?")}),
    ], deleted={3})

    pages[PG_KONT_TDEF] = _tdef(KONTON)
    pages[PG_KONT_DATA] = _data_page(PG_KONT_TDEF, [
        _row(KONTON, {"Saldo": Decimal("0.9000"),
                      "StartSaldo": Decimal("0.0000"), "Löpnr": 1,
                      "Benämning": _t_comp("Plånboken")}),
    ])

    pages[PG_TRAN_TDEF] = _tdef(TRANSAKTIONER)
    base = {"Typ": _t_comp("Inköp"), "Datum": _t_comp("2020-12-24")}
    pages[PG_TRAN_DATA] = _data_page(PG_TRAN_TDEF, [
        _row(TRANSAKTIONER, {"Belopp": Decimal("1.1000"), "Löpnr": 1,
                             "Saldo": None, "Fastöverföring": False,
                             "FrånKonto": _t_comp("---"),
                             "TillKonto": _t_comp("Plånboken"),
                             "Typ": _t_comp("Insättning"),
                             "Datum": _t_comp("2020-12-24"),
                             "Vem": _t_comp("Gemensamt"),
                             "Text": _t_comp("En transaktion")}),
        _row(TRANSAKTIONER, dict(base, Belopp=Decimal("0.1000"), Löpnr=2,
                                 Saldo=None, Fastöverföring=False,
                                 FrånKonto=_t_comp("Plånboken"),
                                 TillKonto=_t_comp("Plats Ett"),
                                 Vem=_t_comp("Person Ett"),
                                 Text=_t_comp("Tom € räksmörgås"))),
        _row(TRANSAKTIONER, dict(base, Belopp=Decimal("0.1000"), Löpnr=3,
                                 Saldo=None, Fastöverföring=True,
                                 FrånKonto=_t_comp("Plånboken"),
                                 TillKonto=_t_comp("Plats Ett"),
                                 Vem=_t_comp("Person Två"),
                                 # snowman is not cp1252 -> UCS-2 path
                                 Text=_t_ucs2("Tom ☃ RÄKSMÖRGÅS"))),
    ])

    pages[PG_TYP_TDEF] = _tdef(TYPER)
    lval_payload = _t_ucs2(LVAL_TEXT)
    pages[PG_TYP_DATA] = _data_page(PG_TYP_TDEF, [
        _row(TYPER, {"Id": 1, "D": 2.25,
                     "När": _access_days(2020, 12, 24), "Aktiv": True,
                     "Note": _memo_inline(_t_comp("kort anteckning"))}),
        _row(TYPER, {"Id": 2, "D": None, "När": None, "Aktiv": False,
                     "Note": _memo_lval(len(lval_payload), PG_LVAL, 0)}),
        # slot 2 is a 0x4000 overflow pointer: the Id=3 row lives on
        # PG_OVF row 1 (same-TDEF overflow page; deleted decoy at 0)
        b"",
    ], lookups={2: (PG_OVF, 1)})
    pages[PG_OVF] = _data_page(PG_TYP_TDEF, [
        _row(TYPER, {"Id": 666, "D": 6.0, "När": None, "Aktiv": False,
                     "Note": None}),
        _row(TYPER, {"Id": 3, "D": 0.5, "När": _access_days(2024, 2, 29),
                     "Aktiv": True, "Note": None}),
    ], deleted={0})
    pages[PG_LVAL] = _data_page(LVAL_TAG, [lval_payload])

    n_pages = max(pages) + 1
    blob = b"".join(pages.get(i, bytes(PAGE)) for i in range(n_pages))
    with open(path, "wb") as fh:
        fh.write(blob)
