"""Joins — SURVEY.md §2.3.

The reference (at target_partitions=1, src/core.rs:61) always runs
CollectLeft hash joins ≈ Spark broadcast joins. Join *types* are the
semantic contract; Spark picks the physical algorithm (broadcast / SHJ
/ SMJ via AQE). The DataFrame side deliberately leans on Catalyst:
equi-key extraction from mixed predicates (ExtractEquijoinPredicate ≈
ExtractEquiJoinKeys) and NOT IN null-awareness are built in.

Scale notes:
- nation/region/supplier are tiny dims → Spark auto-broadcasts them
  (checked in tests/test_plans.py); the big fact side never shuffles
  for those joins.
- customer⋈orders is key-partitioned; at 100 TB both sides shuffle on
  the join key once — no avoidable exchange in these plans.
- the cross/theta joins are constrained to small inputs by
  construction (25×5 rows), the only place nested-loop is sane.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query

# --- q_join_inner: equi inner join, dim side broadcastable ----------
sql_query(
    "q_join_inner",
    """
    SELECT c.c_custkey, c.c_name, n.n_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_custkey <= 200
    """,
    tags=("join",),
    headline=True,
)

# --- outer joins ------------------------------------------------------
sql_query(
    "q_join_left",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    WHERE c.c_custkey <= 100
    """,
    tags=("join",),
)

sql_query(
    "q_join_right",
    """
    SELECT s.s_suppkey, n.n_nationkey, n.n_name
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    tags=("join",),
)

sql_query(
    "q_join_full",
    """
    SELECT a.o_orderkey AS big_key, b.o_orderkey AS open_key
    FROM (SELECT o_orderkey FROM orders WHERE o_totalprice > 150000) a
    FULL OUTER JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
                     AND o_orderkey <= 400) b
      ON a.o_orderkey = b.o_orderkey
    """,
    tags=("join",),
)

# --- semi / anti ------------------------------------------------------
# LEFT SEMI JOIN syntax is Spark-specific sugar; the oracle spells the
# same relation as EXISTS (which is exactly how both engines plan it).
sql_query(
    "q_join_semi",
    """
    SELECT c_custkey, c_name FROM customer
    LEFT SEMI JOIN orders ON o_custkey = c_custkey AND o_totalprice > 100000
    """,
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
    tags=("join",),
)

sql_query(
    "q_join_anti",
    """
    SELECT c_custkey, c_name FROM customer
    LEFT ANTI JOIN orders ON o_custkey = c_custkey
    """,
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join",),
)

# --- cross ------------------------------------------------------------
sql_query(
    "q_join_cross",
    """
    SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    tags=("join",),
)

# --- theta (non-equi) → nested loop ----------------------------------
sql_query(
    "q_join_theta",
    """
    SELECT n.n_nationkey, r.r_regionkey
    FROM nation n JOIN region r ON n.n_regionkey < r.r_regionkey
    """,
    tags=("join",),
)

# --- equi + residual filter ------------------------------------------
sql_query(
    "q_join_residual",
    """
    SELECT o.o_orderkey, l.l_linenumber
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    WHERE o.o_orderkey <= 1000
    """,
    tags=("join",),
)

# --- USING sugar ------------------------------------------------------
sql_query(
    "q_join_using",
    """
    SELECT n_nationkey, n_name, r_name
    FROM (SELECT n_nationkey, n_name, n_regionkey AS r_regionkey FROM nation) n
    JOIN region USING (r_regionkey)
    """,
    tags=("join",),
)
