"""information_schema emulation — SURVEY.md §7.5.

The reference enables DataFusion's information_schema
(src/core.rs:62): `information_schema.{tables,columns,views,
df_settings}` plus SHOW statements. Spark has no information_schema in
the default (in-memory) catalog, so we synthesize the two relations
queries actually use from ``spark.catalog``, matching DataFusion's
column layout (table_catalog / table_schema / table_name / ...).

These are driver-side catalog lookups over a handful of entries —
metadata, not data; scale is irrelevant by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TABLES_SCHEMA = "table_catalog string, table_schema string, table_name string, table_type string"
_COLUMNS_SCHEMA = (
    "table_catalog string, table_schema string, table_name string, "
    "column_name string, ordinal_position int, is_nullable string, data_type string"
)


def information_schema_tables(spark: SparkSession) -> DataFrame:
    """information_schema.tables over the session catalog.

    table_type mirrors DataFusion: 'BASE TABLE' for tables, 'VIEW' for
    (temp) views.
    """
    rows = []
    for t in spark.catalog.listTables():
        ttype = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "BASE TABLE"
        rows.append(("spark_catalog", t.namespace[0] if t.namespace else "default", t.name, ttype))
    return spark.createDataFrame(rows, _TABLES_SCHEMA)


def information_schema_columns(spark: SparkSession, table: str | None = None) -> DataFrame:
    rows = []
    tables = [table] if table else [t.name for t in spark.catalog.listTables()]
    for name in tables:
        try:
            cols = spark.catalog.listColumns(name)
        except Exception:  # noqa: BLE001 - table may have vanished
            continue
        for i, c in enumerate(cols, start=1):
            rows.append(
                (
                    "spark_catalog",
                    "default",
                    name,
                    c.name,
                    i,
                    "YES" if c.nullable else "NO",
                    c.dataType,
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
