from hhek2sqlite_spark.plans.reference import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
