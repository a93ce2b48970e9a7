from hhek2sqlite_spark.plans.extensions import EXT_ORACLE_SQL, EXT_QUERIES
from hhek2sqlite_spark.plans.reference import ORACLE_SQL as _REF_ORACLE
from hhek2sqlite_spark.plans.reference import QUERIES as _REF_QUERIES

QUERIES = {**_REF_QUERIES, **EXT_QUERIES}
ORACLE_SQL = {**_REF_ORACLE, **EXT_ORACLE_SQL}

__all__ = ["QUERIES", "ORACLE_SQL"]
