from hhek2sqlite_spark.schema.registry import (
    HHEK_TABLES,
    TableSpec,
    render_create_index,
    render_create_table,
    spark_schema,
)

__all__ = [
    "HHEK_TABLES",
    "TableSpec",
    "render_create_index",
    "render_create_table",
    "spark_schema",
]
