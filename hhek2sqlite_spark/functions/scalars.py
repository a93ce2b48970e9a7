"""The reference's per-value operator set (SURVEY.md section 2.8) as
native Spark column expressions — zero Python UDFs, so every transform
stays inside whole-stage codegen and vectorized execution.

Reference parity:
- F1 toUtf8 charset transcode  (/root/reference/hhek2sqlite.go:60-67)
- F2 SQL-escape                (:69-72) — intentionally NOT replicated:
  parameterized writes make escaping unnecessary; the semantic content
  ("never corrupt quotes in data") is covered by roundtrip tests.
- F3 comma2point decimal locale (:161-167), both directions
- F8/P3 empty-bytes -> NULL    (:639-643, :1118-1122)
- F9/F12 ISO date parse/format (db_test.go:466-468, :252)
- F10 year string -> int       (db_test.go:429)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY_TYPE = "decimal(19,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# windows-1252 differs from iso-8859-1 only on bytes 0x80-0x9F (the euro
# is 0x80 there). Spark 4 whitelists decode/encode charsets without
# windows-1252, so the transcode is decode(iso-8859-1) + one single-pass
# translate over those 32 code points — exact, built-in, conf-free.
# Undefined cp1252 bytes (0x81,8D,8F,90,9D) map to themselves.
def _cp1252_maps() -> tuple[str, str]:
    src, dst = [], []
    for b in range(0x80, 0xA0):
        src.append(chr(b))
        try:
            dst.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            dst.append(chr(b))
    return "".join(src), "".join(dst)


_CP1252_SRC, _CP1252_DST = _cp1252_maps()


def decode_cp1252(c: Column | str) -> Column:
    """F1 forward: windows-1252 bytes -> string (the MDB side's charset)."""
    return F.translate(F.decode(_col(c), "iso-8859-1"), _CP1252_SRC, _CP1252_DST)


def encode_cp1252(c: Column | str) -> Column:
    """F1 reverse: string -> windows-1252 bytes."""
    return F.encode(F.translate(_col(c), _CP1252_DST, _CP1252_SRC), "iso-8859-1")


def comma2point(c: Column | str) -> Column:
    """F3 forward: sv_SE decimal comma -> point ('1,10' -> '1.10').
    translate is a single-pass char map (cheaper than regexp)."""
    return F.translate(_col(c), ",", ".")


def point2comma(c: Column | str) -> Column:
    """F3 reverse: point -> comma (Jet Currency literals in sv_SE)."""
    return F.translate(_col(c), ".", ",")


def money_from_locale_string(c: Column | str) -> Column:
    """Locale money string ('1,10' or '1.10', empty -> NULL) -> exact
    DecimalType(19,4)."""
    return empty_to_null(comma2point(_col(c))).cast(MONEY_TYPE)


def money_to_locale_string(c: Column | str, *, comma: bool = True) -> Column:
    """DecimalType(19,4) -> locale string; comma=True renders the Jet/sv_SE
    form, False the SQLite/point form. NULL stays NULL."""
    s = _col(c).cast("string")
    return point2comma(s) if comma else s


def empty_to_null(c: Column | str) -> Column:
    """F8/P3: zero-length (after nothing else — the reference checks raw
    byte length) routes to NULL."""
    return F.nullif(_col(c), F.lit(""))


def blank_to_null(c: Column | str) -> Column:
    """Stricter variant: whitespace-only also routes to NULL (used by the
    ingest normalizer where trailing pad bytes appear)."""
    return F.nullif(F.trim(_col(c)), F.lit(""))


def iso_date(c: Column | str) -> Column:
    """F9: the model's 'yyyy-MM-dd' date *strings* -> DateType for the
    query layer (storage keeps strings for fidelity, SURVEY.md 1.3)."""
    return F.to_date(_col(c), "yyyy-MM-dd")


def iso_format(c: Column | str) -> Column:
    """F12: DateType -> 'yyyy-MM-dd' string at the sink boundary."""
    return F.date_format(_col(c), "yyyy-MM-dd")


def year_int(c: Column | str) -> Column:
    """F10: TEXT(4) year -> IntegerType (the Personer.Född dialect
    coercion, /root/reference/hhek2sqlite.go:84 vs :106)."""
    return empty_to_null(_col(c)).cast("int")
