"""Projection / filter / predicates / CASE / CAST / subqueries —
SURVEY.md §2.2.

The reference inherits these from DataFusion's sql planner +
ProjectionExec/FilterExec (Cargo.lock:978,1010); in Spark they are
`df.select/filter` resp. plain Spark SQL, and Catalyst handles pushdown
and three-valued NULL logic identically (§4.1: PushDownFilter ≈
PushDownPredicates, etc.).

Shared-dialect SQL is used wherever Spark SQL and DuckDB agree, so the
exact same text runs on both engines; divergences get an explicit
oracle string.

Scale notes: every query here is a narrow scan + stateless map — no
shuffle at any input size; filters and projections reach the parquet
reader (PushedFilters / ReadSchema in .explain).
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query

# --- q_project: expressions, aliases, qualified star ----------------
sql_query(
    "q_project",
    """
    SELECT c.c_custkey,
           c.c_name AS customer_name,
           c_acctbal * 1.1 AS boosted_bal,
           upper(c_mktsegment) AS segment
    FROM customer c
    WHERE c_custkey <= 100
    """,
    tags=("projection",),
)

# --- q_filter: boolean exprs, 3-valued NULL logic --------------------
sql_query(
    "q_filter",
    """
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE (o_totalprice > 50000 AND o_orderstatus = 'O')
       OR (o_totalprice <= 1000 AND NOT o_orderstatus = 'F')
    """,
    tags=("filter",),
)

# --- q_predicates: BETWEEN / IN / IS NULL / IS DISTINCT FROM ---------
# Spark spells null-safe equality `<=>`; DuckDB `IS NOT DISTINCT FROM`.
_PRED_ORACLE = """
SELECT p_partkey, p_size,
       p_size BETWEEN 10 AND 20 AS in_range,
       p_brand IN ('Brand#1', 'Brand#2') AS brand_hit,
       p_name IS NULL AS name_null,
       NOT (p_type IS DISTINCT FROM 'STANDARD') AS type_same
FROM part
WHERE p_partkey <= 150
"""
sql_query(
    "q_predicates",
    """
    SELECT p_partkey, p_size,
           p_size BETWEEN 10 AND 20 AS in_range,
           p_brand IN ('Brand#1', 'Brand#2') AS brand_hit,
           p_name IS NULL AS name_null,
           p_type <=> 'STANDARD' AS type_same
    FROM part
    WHERE p_partkey <= 150
    """,
    oracle=_PRED_ORACLE,
    tags=("predicates",),
)

# --- q_like_ilike ----------------------------------------------------
sql_query(
    "q_like_ilike",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_name LIKE 'Customer%1%' OR c_mktsegment ILIKE 'bui%'
    """,
    tags=("predicates",),
)

# --- q_case: searched + simple CASE ----------------------------------
sql_query(
    "q_case",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 100000 THEN 'big'
                WHEN o_totalprice > 10000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END AS status_code
    FROM orders
    WHERE o_orderkey <= 500
    """,
    tags=("case",),
)

# --- q_cast / TRY_CAST / :: ------------------------------------------
# arrow_cast(x, 'Int64') in the reference is plain CAST here (§2.8).
# Dialect trap: Spark (like arrow-rs in the reference) TRUNCATES on
# float→int cast, DuckDB ROUNDS — the oracle spells the truncation out.
sql_query(
    "q_cast",
    """
    SELECT o_orderkey,
           CAST(o_totalprice AS BIGINT) AS price_int,
           CAST(o_orderkey AS STRING) AS key_str,
           CAST(o_orderdate AS DATE) AS order_day,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast_null,
           CAST(o_orderkey AS DOUBLE) / 2 AS halved
    FROM orders
    WHERE o_orderkey <= 300
    """,
    oracle="""
    SELECT o_orderkey,
           CAST(TRUNC(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS STRING) AS key_str,
           CAST(o_orderdate AS DATE) AS order_day,
           TRY_CAST(o_orderpriority AS INT) AS bad_cast_null,
           CAST(o_orderkey AS DOUBLE) / 2 AS halved
    FROM orders
    WHERE o_orderkey <= 300
    """,
    tags=("cast",),
)

# --- q_scalar_subquery: correlated + uncorrelated --------------------
sql_query(
    "q_scalar_subquery",
    """
    SELECT o_orderkey,
           (SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
              FROM lineitem WHERE l_orderkey = o_orderkey) AS order_qty,
           (SELECT COUNT(*) FROM nation) AS n_nations
    FROM orders
    WHERE o_orderkey <= 200
    """,
    tags=("subquery",),
)

# --- q_exists_in: EXISTS / NOT EXISTS / IN / NOT IN -------------------
sql_query(
    "q_exists_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000)
      AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey <= 2)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    tags=("subquery", "semijoin"),
)
