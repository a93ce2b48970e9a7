"""hhek2sqlite_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference ``jonasgit/hhek2sqlite``
(a Go MDB<->SQLite schema-preserving ETL tool), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, shuffle partitions, Arrow)
- ``schema``     : the reference's 10-table relational model as StructTypes,
                   dialect DDL rendering (SQLite / Jet), golden fixtures
- ``sources``    : parquet loaders for the driver testdata; SQLite ingest/egress
- ``functions``  : the reference's scalar transforms as native column exprs
- ``plans``      : reference-fidelity queries (counts, lookups, joins,
                   balance reconciliation, running balance, pivot)
- ``operators``  : scale-out extension operators (dedup, similarity search,
                   text analysis, multimodal plumbing, table compare)
- ``streaming``  : event-time windowing (batch + Structured Streaming)

Design stance (SURVEY.md section 7): declare logical plans with the
DataFrame/SQL API and let Catalyst/Tungsten/AQE choose physical strategy;
zero row-at-a-time Python UDFs in the core; broadcast small dimensions;
money is DecimalType end-to-end (exactness is the reference's test bar,
/root/reference/db_test.go:262-267).
"""

__version__ = "0.1.0"
