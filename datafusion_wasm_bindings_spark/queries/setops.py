"""Set operations / DISTINCT — SURVEY.md §2.7.

Reference: UnionExec + optimizer rewrites of INTERSECT/EXCEPT to
semi/anti-join semantics, DISTINCT → GROUP BY (§4.1). Spark: identical
rewrites exist natively (ReplaceDistinctWithAggregate, etc.).

DISTINCT ON is a Postgres extension DuckDB supports and Spark lacks →
SURVEY §7.4 rewrite as row_number()=1, value-checked against DuckDB's
native DISTINCT ON.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query

sql_query(
    "q_union_all",
    """
    SELECT n_nationkey AS k, n_name AS name FROM nation
    UNION ALL
    SELECT r_regionkey AS k, r_name AS name FROM region
    """,
    tags=("setop",),
)

sql_query(
    "q_union_distinct",
    """
    SELECT n_regionkey AS k FROM nation
    UNION
    SELECT r_regionkey AS k FROM region
    """,
    tags=("setop",),
)

sql_query(
    "q_intersect",
    """
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    INTERSECT
    SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
    """,
    tags=("setop",),
)

sql_query(
    "q_except",
    """
    SELECT c_custkey AS k FROM customer
    EXCEPT
    SELECT o_custkey AS k FROM orders
    """,
    tags=("setop",),
)

sql_query(
    "q_intersect_all",
    """
    SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("setop",),
)

sql_query(
    "q_except_all",
    """
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'
    """,
    tags=("setop",),
)

sql_query(
    "q_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("setop",),
)

# --- DISTINCT ON (Postgres extension): first row per key by sort order --
sql_query(
    "q_distinct_on",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
    oracle="""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey ASC
    """,
    tags=("setop", "compat"),
)
