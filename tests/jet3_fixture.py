"""Synthetic Jet 3 (Access 97) .mdb fixture builder.

Byte-level page construction following the PUBLIC mdbtools description
of the Jet 3 on-disk format, written INDEPENDENTLY of the reader in
hhek2sqlite_spark/sources/jet3.py (raw struct.pack here, no shared
helpers) so the pair is a two-implementation cross-check of the same
public spec. A real Access-97-written file remains the true test
(JET_VALIDATION.md) — none exists in this container and installs are
banned.

Content mirrors the reference's checkDB1 recipe
(/root/reference/db_test.go:142-171): 3 Personer / 1 Plats /
3 Transaktioner (deposit 1.10, two 0.10 purchases), Konton saldo 0.90,
including the cp1252 probes ('Tom € räksmörgås' vs upper-case). A
sixth non-HHEK table ("Typer") exercises byte/float/double/datetime/
memo (inline + single-page LVAL + multi-page chain) and a >255-byte
long row with a jump table.
"""

from __future__ import annotations

import struct
from decimal import Decimal

PAGE = 2048
LVAL_TAG = int.from_bytes(b"LVAL", "little")

# Jet column types
BOOL, BYTE, INT, LONG, MONEY, FLOAT, DOUBLE, DATETIME, TEXT, MEMO = (
    0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07, 0x08, 0x0A, 0x0C,
)
_W = {BYTE: 1, INT: 2, LONG: 4, MONEY: 8, FLOAT: 4, DOUBLE: 8, DATETIME: 8}


def _tdef(cols):
    """TDEF page bytes. cols = [(name, type, fixed?)] in column-number
    order; fixed offsets assigned in listing order, var offset indexes
    in listing order of the var columns."""
    buf = bytearray(PAGE)
    buf[0] = 0x02
    buf[1] = 0x01
    struct.pack_into("<H", buf, 2, 0x4356)  # 'VC'
    n_var = sum(1 for _, _, f in cols if not f)
    buf[0x14] = 0x4E  # user table
    struct.pack_into("<H", buf, 0x15, len(cols))  # max_cols
    struct.pack_into("<H", buf, 0x17, n_var)
    struct.pack_into("<H", buf, 0x19, len(cols))
    # num_idx / num_real_idx stay 0
    pos = 0x2B
    off_f = 0
    off_v = 0
    for num, (name, typ, fixed) in enumerate(cols):
        buf[pos] = typ
        struct.pack_into("<H", buf, pos + 1, num)
        struct.pack_into("<H", buf, pos + 3, off_v if not fixed else 0)
        struct.pack_into("<H", buf, pos + 5, num)
        buf[pos + 13] = 0x01 if fixed else 0x00
        length = _W.get(typ, 0) if fixed else 0
        struct.pack_into("<H", buf, pos + 14, off_f if fixed else 0)
        struct.pack_into("<H", buf, pos + 16, length)
        if fixed:
            off_f += length
        else:
            off_v += 1
        pos += 18
    for name, _, _ in cols:
        raw = name.encode("cp1252")
        buf[pos] = len(raw)
        buf[pos + 1 : pos + 1 + len(raw)] = raw
        pos += 1 + len(raw)
    return bytes(buf)


def _enc_fixed(typ, val):
    if typ == BYTE:
        return bytes([val or 0])
    if typ == INT:
        return struct.pack("<h", val or 0)
    if typ == LONG:
        return struct.pack("<i", val or 0)
    if typ == MONEY:
        q = int((val or Decimal(0)) * 10000)
        return struct.pack("<q", q)
    if typ == FLOAT:
        return struct.pack("<f", val or 0.0)
    if typ == DOUBLE:
        return struct.pack("<d", val or 0.0)
    if typ == DATETIME:
        return struct.pack("<d", val or 0.0)  # pre-encoded Access days
    raise AssertionError(typ)


def _row(cols, values):
    """Encode one Jet 3 row. values maps name -> python value; None =
    NULL; bools are mask-only; var values are pre-encoded bytes for
    TEXT (cp1252) and MEMO (12-byte header + payload)."""
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
    body = bytes([ncols]) + fixed + b"".join(var_payloads)
    if n_var == 0:
        return body + bytes(mask)
    # bounds: row-relative start of each var value + eod
    bounds = []
    cur = 1 + len(fixed)
    for p in var_payloads:
        bounds.append(cur)
        cur += len(p)
    bounds.append(cur)  # eod
    # jump table sized by TOTAL row length — fixed-point iterate
    num_jumps = 0
    while True:
        row_len = len(body) + (n_var + 1) + num_jumps + 1 + len(mask)
        need = (row_len - 1) // 256
        if need == num_jumps:
            break
        num_jumps = need
    jumps = []
    window = 1
    for i, b in enumerate(bounds):
        while b >= 256 * window and len(jumps) < num_jumps:
            jumps.append(i)
            window += 1
    while len(jumps) < num_jumps:
        jumps.append(0xFF)  # pad entries never matched by a bound index
    trailer = (
        bytes(reversed([b % 256 for b in bounds]))
        + bytes(reversed(jumps))
        + bytes([n_var])
        + bytes(mask)
    )
    return body + trailer


def _data_page(tdef_pg, rows, deleted=(), lookups=None):
    """Data page with rows packed from the page end downward; indices
    in ``deleted`` get the 0x8000 delflag set on their offset entry.
    ``lookups`` maps a slot index -> (page, row): that slot becomes a
    0x4000 overflow-pointer whose payload is the 4-byte little-endian
    (page << 8) | row reference (the rows[i] content is ignored)."""
    lookups = lookups or {}
    buf = bytearray(PAGE)
    buf[0] = 0x01
    buf[1] = 0x01
    struct.pack_into("<I", buf, 4, tdef_pg)
    struct.pack_into("<H", buf, 8, len(rows))
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
        struct.pack_into("<H", buf, 0x0A + 2 * i, start | flag)
        end = start
    struct.pack_into("<H", buf, 2, end - (0x0A + 2 * len(rows)))  # free
    return bytes(buf)


def _memo_inline(text):
    raw = text.encode("cp1252")
    return struct.pack("<III", 0x80000000 | len(raw), 0, 0) + raw


def _memo_lval(length, page, row):
    return struct.pack("<III", 0x40000000 | length, (page << 8) | row, 0)


def _memo_chain(length, page, row):
    return struct.pack("<III", length, (page << 8) | row, 0)


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
PLATSER = [
    ("Löpnr", LONG, True),
    ("Namn", TEXT, False),
    ("Gironummer", TEXT, False),
    ("Typ", TEXT, False),
    ("RefKonto", TEXT, False),
]
KONTON = [
    ("Saldo", MONEY, True),
    ("StartSaldo", MONEY, True),
    ("Löpnr", LONG, True),
    ("KontoNummer", TEXT, False),
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
    ("Vad", TEXT, False),
    ("Vem", TEXT, False),
    ("Text", TEXT, False),
]
TYPER = [
    ("Id", LONG, True),
    ("B", BYTE, True),
    ("F", FLOAT, True),
    ("D", DOUBLE, True),
    ("När", DATETIME, True),
    ("Aktiv", BOOL, True),
    ("Note", MEMO, False),
    ("Pad", TEXT, False),
]

# page map
PG_MSYS_TDEF, PG_MSYS_DATA = 2, 3
PG_PERS_TDEF, PG_PERS_DATA = 4, 5
PG_PLAT_TDEF, PG_PLAT_DATA = 6, 7
PG_KONT_TDEF, PG_KONT_DATA = 8, 9
PG_TRAN_TDEF, PG_TRAN_DATA = 10, 11
PG_TYP_TDEF, PG_TYP_DATA = 12, 13
PG_LVAL = 14
PG_OVF = 15  # overflow page holding Typer row Id=4 (reached via 0x4000)

# LVAL payloads: row 0 = single-page value; rows 1,2 = a 2-chunk chain
LVAL_SINGLE = ("S" * 300).encode("cp1252")
CHAIN_PART1 = ("A" * 200).encode("cp1252")
CHAIN_PART2 = ("B" * 150).encode("cp1252")
CHAIN_TEXT = (CHAIN_PART1 + CHAIN_PART2).decode("cp1252")
LONG_PAD = "p" * 400  # forces a >255-byte row -> jump table


def _t(txt):
    return txt.encode("cp1252")


def build_jet3(path: str) -> None:
    pages = {}
    # header page: 0x00 0x01, magic at 4, version 0x00 at 0x14
    hdr = bytearray(PAGE)
    hdr[0:2] = b"\x00\x01"
    hdr[4:20] = b"Standard Jet DB\x00"
    hdr[0x14] = 0x00
    pages[0] = bytes(hdr)
    um = bytearray(PAGE)
    um[0] = 0x05  # usage-map placeholder
    pages[1] = bytes(um)

    pages[PG_MSYS_TDEF] = _tdef(MSYS_COLS)
    cat_rows = [
        _row(MSYS_COLS, {"Id": PG_MSYS_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t("MSysObjects")}),
        # high Id byte set: reader must mask to the low 3 bytes
        _row(MSYS_COLS, {"Id": 0x01000000 | PG_PERS_TDEF, "Type": 1,
                         "Flags": 0, "Name": _t("Personer")}),
        _row(MSYS_COLS, {"Id": PG_PLAT_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t("Platser")}),
        _row(MSYS_COLS, {"Id": PG_KONT_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t("Konton")}),
        _row(MSYS_COLS, {"Id": PG_TRAN_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t("Transaktioner")}),
        _row(MSYS_COLS, {"Id": PG_TYP_TDEF, "Type": 1, "Flags": 0,
                         "Name": _t("Typer")}),
        # a saved query: type 5, must be ignored by the catalog walk
        _row(MSYS_COLS, {"Id": 999, "Type": 5, "Flags": 0,
                         "Name": _t("SomeQuery")}),
    ]
    pages[PG_MSYS_DATA] = _data_page(PG_MSYS_TDEF, cat_rows)

    pages[PG_PERS_TDEF] = _tdef(PERSONER)
    pers_rows = [
        _row(PERSONER, {"Löpnr": 1, "Född": 0, "Namn": _t("Gemensamt"),
                        "Kön": _t("Gemensamt")}),
        _row(PERSONER, {"Löpnr": 2, "Född": 1999, "Namn": _t("Person Ett"),
                        "Kön": _t("Man")}),
        _row(PERSONER, {"Löpnr": 3, "Född": 2001, "Namn": _t("Person Två"),
                        "Kön": _t("Kvinna")}),
        # deleted row: must NOT appear in reads
        _row(PERSONER, {"Löpnr": 99, "Född": 1900, "Namn": _t("Borttagen"),
                        "Kön": _t("?")}),
    ]
    pages[PG_PERS_DATA] = _data_page(PG_PERS_TDEF, pers_rows, deleted={3})

    pages[PG_PLAT_TDEF] = _tdef(PLATSER)
    pages[PG_PLAT_DATA] = _data_page(PG_PLAT_TDEF, [
        _row(PLATSER, {"Löpnr": 1, "Namn": _t("Plats Ett"),
                       "Gironummer": _t(""), "Typ": _t(""),
                       "RefKonto": _t("")}),
    ])

    pages[PG_KONT_TDEF] = _tdef(KONTON)
    pages[PG_KONT_DATA] = _data_page(PG_KONT_TDEF, [
        _row(KONTON, {"Saldo": Decimal("0.9000"),
                      "StartSaldo": Decimal("0.0000"), "Löpnr": 1,
                      "KontoNummer": _t(""), "Benämning": _t("Plånboken")}),
    ])

    pages[PG_TRAN_TDEF] = _tdef(TRANSAKTIONER)
    base = {"Typ": _t("Inköp"), "Datum": _t("2020-12-24"),
            "Vad": _t("Livsmedel")}
    pages[PG_TRAN_DATA] = _data_page(PG_TRAN_TDEF, [
        _row(TRANSAKTIONER, {"Belopp": Decimal("1.1000"), "Löpnr": 1,
                             "Saldo": None, "Fastöverföring": False,
                             "FrånKonto": _t("---"),
                             "TillKonto": _t("Plånboken"),
                             "Typ": _t("Insättning"),
                             "Datum": _t("2020-12-24"),
                             "Vad": _t("Studiestöd"),
                             "Vem": _t("Gemensamt"),
                             "Text": _t("En transaktion")}),
        _row(TRANSAKTIONER, dict(base, Belopp=Decimal("0.1000"), Löpnr=2,
                                 Saldo=None, Fastöverföring=False,
                                 FrånKonto=_t("Plånboken"),
                                 TillKonto=_t("Plats Ett"),
                                 Vem=_t("Person Ett"),
                                 Text=_t("Tom € räksmörgås"))),
        _row(TRANSAKTIONER, dict(base, Belopp=Decimal("0.1000"), Löpnr=3,
                                 Saldo=None, Fastöverföring=True,
                                 FrånKonto=_t("Plånboken"),
                                 TillKonto=_t("Plats Ett"),
                                 Vem=_t("Person Två"),
                                 Text=_t("Tom € RÄKSMÖRGÅS"))),
    ])

    pages[PG_TYP_TDEF] = _tdef(TYPER)
    pages[PG_TYP_DATA] = _data_page(PG_TYP_TDEF, [
        _row(TYPER, {"Id": 1, "B": 7, "F": 1.5, "D": 2.25,
                     "När": _access_days(2020, 12, 24), "Aktiv": True,
                     "Note": _memo_inline("kort anteckning"),
                     "Pad": _t("x")}),
        _row(TYPER, {"Id": 2, "B": 0, "F": -1.0, "D": 1e10,
                     "När": _access_days(1999, 1, 1), "Aktiv": False,
                     "Note": _memo_lval(len(LVAL_SINGLE), PG_LVAL, 0),
                     "Pad": _t(LONG_PAD)}),  # long row: jump table
        _row(TYPER, {"Id": 3, "B": None, "F": None, "D": None,
                     "När": None, "Aktiv": True,
                     "Note": _memo_chain(len(CHAIN_PART1) + len(CHAIN_PART2),
                                         PG_LVAL, 1),
                     "Pad": _t("y")}),
        # slot 3 is a 0x4000 overflow pointer: the Id=4 row was
        # "updated past its page" and lives on PG_OVF row 1
        b"",
    ], lookups={3: (PG_OVF, 1)})
    # The overflow page is owned by the SAME TDEF, so it appears in the
    # reader's page list — the sequential scan must NOT double-read the
    # pointed-at row. Slot 0 is a deleted decoy so the pointer's row
    # index (1) is actually exercised.
    pages[PG_OVF] = _data_page(PG_TYP_TDEF, [
        _row(TYPER, {"Id": 666, "B": 6, "F": 6.0, "D": 6.0,
                     "När": None, "Aktiv": False,
                     "Note": None, "Pad": _t("deleted decoy")}),
        _row(TYPER, {"Id": 4, "B": 1, "F": 0.5, "D": 0.25,
                     "När": _access_days(2024, 2, 29), "Aktiv": False,
                     "Note": None, "Pad": _t("z")}),
    ], deleted={0})

    # LVAL page: row 0 single value; rows 1->2 a chain (row 1 points at
    # row 2, row 2 terminates with next=0)
    lval_rows = [
        LVAL_SINGLE,
        struct.pack("<I", (PG_LVAL << 8) | 2) + CHAIN_PART1,
        struct.pack("<I", 0) + CHAIN_PART2,
    ]
    pages[PG_LVAL] = _data_page(LVAL_TAG, lval_rows)

    n_pages = max(pages) + 1
    blob = b"".join(pages.get(i, bytes(PAGE)) for i in range(n_pages))
    with open(path, "wb") as fh:
        fh.write(blob)


def build_jet4_header(path: str) -> None:
    """A Jet 4 header page (version byte 0x01) for refusal tests."""
    hdr = bytearray(4096)
    hdr[0:2] = b"\x00\x01"
    hdr[4:20] = b"Standard Jet DB\x00"
    hdr[0x14] = 0x01
    with open(path, "wb") as fh:
        fh.write(bytes(hdr))
