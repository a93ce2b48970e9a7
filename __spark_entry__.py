"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship balance-reconciliation query (the
reference's one derived aggregate, /root/reference/db_test.go:381-386) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md section 2 plus the extension operators; the
driver hash-compares each pair against DuckDB at sf=0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hhek2sqlite_spark.plans import ORACLE_SQL, QUERIES  # noqa: E402
from hhek2sqlite_spark.session import tune_existing  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    return QUERIES["balance_reconciliation"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""

    def _tuned(fn):
        def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: _tuned(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return dict(ORACLE_SQL)
