"""Version-dispatching .mdb entry point.

The reference's read side is an ODBC handle that accepts any Jet
vintage the installed driver knows (/root/reference/hhek2sqlite.go:
1265-1275). This module reproduces that user experience for the two
formats this repo can read natively, and refuses the rest BY NAME:

- no magic header, page-0 type 0x01  -> Jet 2.0 (sources/jet2.py)
- ``Standard Jet DB`` + version 0x00 -> Jet 3  (sources/jet3.py)
- ``Standard Jet DB`` + version 0x01 -> Jet 4  (sources/jet4.py, r12)
- version >= 0x02 / ``Standard ACE DB`` -> ACE (Access 2007+): loud
  refusal with the documented jdbc:ucanaccess:// envelope
  (sources/jdbc_io.py) — ACE adds format features with no fixture in
  this environment to validate a reader against (JET_VALIDATION.md).
"""

from __future__ import annotations

from hhek2sqlite_spark.sources.jet2 import _ACE_MAGIC, _JET3_MAGIC


def sniff_mdb_version(path: str) -> str:
    """'jet2' | 'jet3' | 'jet4' | 'ace'."""
    with open(path, "rb") as fh:
        head = fh.read(32)
    magic = head[4:20]
    if magic == _JET3_MAGIC:
        ver = head[0x14] if len(head) > 0x14 else -1
        return {0x00: "jet3", 0x01: "jet4"}.get(ver, "ace")
    if magic == _ACE_MAGIC:
        return "ace"
    return "jet2"


def open_mdb(path: str):
    """Parsed file object for any natively supported .mdb version."""
    ver = sniff_mdb_version(path)
    if ver == "jet2":
        from hhek2sqlite_spark.sources.jet2 import Jet2File

        return Jet2File(path)
    if ver == "jet3":
        from hhek2sqlite_spark.sources.jet3 import Jet3File

        return Jet3File(path)
    if ver == "jet4":
        from hhek2sqlite_spark.sources.jet4 import Jet4File

        return Jet4File(path)
    raise ValueError(
        f"{path}: ACE (Access 2007+) databases add format features "
        "with no fixture here to validate a reader against; use the "
        "documented jdbc:ucanaccess:// envelope (sources/jdbc_io.py) "
        "or convert to Jet 4 / Jet 3 / Access 2.0 first."
    )


def mdb_read_database(spark, path: str):
    """{table: DataFrame} for any natively supported .mdb version."""
    ver = sniff_mdb_version(path)
    if ver == "jet2":
        from hhek2sqlite_spark.sources.jet2 import jet2_read_database

        return jet2_read_database(spark, path)
    if ver == "jet3":
        from hhek2sqlite_spark.sources.jet3 import jet3_read_database

        return jet3_read_database(spark, path)
    if ver == "jet4":
        from hhek2sqlite_spark.sources.jet4 import jet4_read_database

        return jet4_read_database(spark, path)
    open_mdb(path)  # raises the version-specific refusal
    raise AssertionError("unreachable")
