"""SQLite ingest/egress — the reference's container format, direction as
a parameter (SURVEY.md S1-S9, 3.1-3.2).

The reference copies MDB<->SQLite row-at-a-time with string-built INSERTs
(/root/reference/hhek2sqlite.go:249-262). Here:

- The *pipeline* is Spark: normalization, validation, joins and every
  query run on DataFrames; Parquet is the at-scale storage.
- The *SQLite file* is a single-node interchange container by nature
  (one file, one writer). I/O therefore runs driver-side over the stdlib
  ``sqlite3`` module, streamed via ``toLocalIterator`` (bounded memory)
  with parameterized batched INSERTs inside one transaction per table
  (the reference's T1 shape; its per-row-transaction T2 on Transaktioner
  is a documented anti-pattern we do not replicate, SURVEY.md 2.11).
  On a cluster with a JDBC SQLite driver on the classpath the same
  DataFrames go through ``df.write.jdbc`` unchanged; the hhek tables are
  dimension-sized, so driver-side I/O is not a scale bottleneck — the
  100 TB path is Parquet.
- Escaping (the reference's toUtf8 quote-doubling, F2) disappears:
  parameter binding cannot corrupt quotes. Its *semantic* — data with
  quotes/non-ASCII survives — is asserted by roundtrip tests.

Fidelity notes: money binds as TEXT-formatted decimals, but the target
column is DECIMAL(19,4) = NUMERIC affinity (format parity with the
reference, /root/reference/hhek2sqlite.go:197), so SQLite converts the
bound text to INTEGER/REAL storage whenever the first 15 significant
digits survive — i.e. exactness is DOUBLE-LIMITED, same as the
reference's own Currency -> text -> NUMERIC pipeline. Every Jet
Currency value a real hhek file contains (4 decimal places, household
magnitudes) roundtrips exactly; amounts beyond ~15 significant digits
would not (tested in test_sqlite_roundtrip.py). ``read_table``
re-quantizes to DecimalType(19,4) on the way back in. If exactness past
double precision ever matters, store scaled-integer minor units or a
TEXT-affinity column — deliberately NOT done here, to keep the file
format byte-compatible with the reference's. Booleans travel as 0/1;
NULLs as NULL (empty-string routing is the ingest normalizer's job,
functions.scalars.empty_to_null).
"""

from __future__ import annotations

import os
import sqlite3
from datetime import datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BooleanType, DecimalType

from hhek2sqlite_spark.schema.registry import (
    COPY_ORDER,
    HHEK_TABLES,
    render_create_index,
    render_create_table,
)

_Q4 = Decimal("0.0001")


def _to_sqlite_value(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return format(v, "f")
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    return v


# generic Spark-dtype -> SQLite storage-class map for tables OUTSIDE the
# HHEK registry (a Jet 3 source is self-describing and can carry any
# schema; the registry's dual-dialect DDL still wins for HHEK tables)
_GENERIC_DDL = {
    "string": "TEXT",
    "boolean": "INTEGER",
    "tinyint": "INTEGER",
    "smallint": "INTEGER",
    "int": "INTEGER",
    "bigint": "INTEGER",
    "float": "REAL",
    "double": "REAL",
    "timestamp": "TEXT",
    "date": "TEXT",
}


def _generic_create_table(df: DataFrame, table: str) -> str:
    cols = []
    for name, dtype in df.dtypes:
        sql_t = "NUMERIC" if dtype.startswith("decimal") else _GENERIC_DDL.get(dtype)
        if sql_t is None:
            raise ValueError(
                f"cannot derive SQLite DDL for column {name!r} of Spark "
                f"type {dtype} in non-registry table {table!r}"
            )
        cols.append(f'"{name}" {sql_t}')
    return f'CREATE TABLE "{table}" ({", ".join(cols)})'


def _from_sqlite_value(v, dtype):
    if v is None:
        return None
    if isinstance(dtype, DecimalType):
        return Decimal(str(v)).quantize(_Q4)
    if isinstance(dtype, BooleanType):
        return bool(v)
    return v


def write_table(df: DataFrame, db_path: str, table: str, *, batch_size: int = 10_000) -> int:
    """CREATE (dialect DDL from the registry) + truncate-before-load (S6)
    + batched parameterized inserts in one transaction (T1). Returns the
    row count written."""
    spec = HHEK_TABLES.get(table)
    # registry DDL requires EXACTLY the registry's column set; a table
    # from a self-describing source (Jet 3/4) that lacks columns — or
    # isn't an HHEK table at all — gets DDL derived from its own Spark
    # schema. A SUPERSET (HHEK name + extra columns, possible from a
    # self-describing source) must not silently truncate to the
    # registry spec (ADVICE r12): fall through to the generic DDL so
    # every column the source carries is written.
    if spec is not None and set(c.name for c in spec.columns) == set(df.columns):
        cols = [c.name for c in spec.columns]
        ddl = render_create_table(table, "sqlite")
    else:
        cols = list(df.columns)
        ddl = _generic_create_table(df, table)
    con = sqlite3.connect(db_path)
    try:
        con.execute(ddl.replace("CREATE TABLE", "CREATE TABLE IF NOT EXISTS"))
        con.execute(f'DELETE FROM "{table}"')
        placeholders = ", ".join("?" for _ in cols)
        collist = ", ".join(f'"{c}"' for c in cols)
        sql = f'INSERT INTO "{table}" ({collist}) VALUES ({placeholders})'
        n = 0
        batch: list[tuple] = []
        # stream partitions through the driver — bounded memory, no collect()
        for row in df.select(*cols).toLocalIterator(prefetchPartitions=True):
            batch.append(tuple(_to_sqlite_value(v) for v in row))
            if len(batch) >= batch_size:
                con.executemany(sql, batch)
                n += len(batch)
                batch.clear()
        if batch:
            con.executemany(sql, batch)
            n += len(batch)
        con.commit()
        return n
    except Exception:
        con.rollback()  # T4 fail-fast: whole table or nothing
        raise
    finally:
        con.close()


def read_table(spark: SparkSession, db_path: str, table: str) -> DataFrame:
    """Read one hhek table back into a typed DataFrame (registry schema,
    exact decimals restored)."""
    spec = HHEK_TABLES[table]
    schema = spec.spark_schema()
    cols = [c.name for c in spec.columns]
    con = sqlite3.connect(db_path)
    try:
        collist = ", ".join(f'"{c}"' for c in cols)
        raw = con.execute(f'SELECT {collist} FROM "{table}"').fetchall()
    finally:
        con.close()
    dtypes = [f.dataType for f in schema.fields]
    rows = [tuple(_from_sqlite_value(v, t) for v, t in zip(r, dtypes)) for r in raw]
    return spark.createDataFrame(rows, schema)


def write_database(
    tables: dict[str, DataFrame],
    db_path: str,
    *,
    overwrite: bool = True,
    create_indexes: bool = False,
) -> dict[str, int]:
    """Write a full hhek database in the reference's fixed copy order
    (/root/reference/hhek2sqlite.go:1287-1296). ``overwrite`` is the S7
    destination reset; ``create_indexes`` mirrors the reverse-direction
    secondary-index DDL (forward creates none, SURVEY.md 2.12)."""
    if overwrite and os.path.exists(db_path):
        os.remove(db_path)
    counts = {}
    extras = sorted(n for n in tables if n not in COPY_ORDER)
    for name in [*COPY_ORDER, *extras]:
        if name in tables:
            counts[name] = write_table(tables[name], db_path, name)
    if create_indexes:
        con = sqlite3.connect(db_path)
        try:
            for name in COPY_ORDER:
                if name in tables:
                    for stmt in render_create_index(name, "sqlite"):
                        con.execute(stmt)
            con.commit()
        finally:
            con.close()
    return counts


def read_database(spark: SparkSession, db_path: str) -> dict[str, DataFrame]:
    con = sqlite3.connect(db_path)
    try:
        present = {
            r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='table'")
        }
    finally:
        con.close()
    return {name: read_table(spark, db_path, name) for name in COPY_ORDER if name in present}


def convert(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    create_indexes: bool = False,
) -> dict[str, int]:
    """Direction-reversible conversion, the reference's ``konvertera``
    reimagined (/root/reference/hhek2sqlite.go:1230-1299): direction is
    inferred from the endpoints instead of a ``-backa`` flag.

    - ``.mdb -> .db`` : Jet 2.0 MDB -> SQLite (the reference's actual
      program, hhek2sqlite.go:1205,1230,1287-1296)
    - ``.db -> .mdb`` : the reverse (``-backa``), via the Jet writer
    - ``.db -> dir``  : SQLite -> Parquet (one subdir per table)
    - ``dir -> .db``  : Parquet -> SQLite
    - any combination of the three endpoint kinds works the same way
    """
    from hhek2sqlite_spark.sources.jet2 import jet2_write_database
    from hhek2sqlite_spark.sources.mdb import mdb_read_database

    def _kind(p: str) -> str:
        low = p.lower()
        if low.endswith(".mdb"):
            return "mdb"
        if low.endswith(".db") or low.endswith(".sqlite"):
            return "sqlite"
        return "parquet"

    src_kind, dst_kind = _kind(src), _kind(dst)
    if src_kind == "mdb":
        tables = mdb_read_database(spark, src)
    elif src_kind == "sqlite":
        tables = read_database(spark, src)
    else:
        tables = {
            name: spark.read.parquet(os.path.join(src, name))
            for name in COPY_ORDER
            if os.path.exists(os.path.join(src, name))
        }
    # stable reference copy order for the write side; tables outside
    # the HHEK set (possible from a self-describing Jet 3 source)
    # follow alphabetically rather than being dropped
    extras = sorted(name for name in tables if name not in COPY_ORDER)
    tables = {
        name: tables[name]
        for name in [*COPY_ORDER, *extras]
        if name in tables
    }
    if dst_kind == "mdb":
        return jet2_write_database(tables, dst)
    if dst_kind == "sqlite":
        return write_database(tables, dst, create_indexes=create_indexes)
    counts = {}
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(dst, name))
        counts[name] = df.count()
    return counts
