"""Window functions — SURVEY.md §2.5.

Reference: WindowAggExec/BoundedWindowAggExec + datafusion-functions-
window (Cargo.lock:978,861). Spark: Window specs over a single
partition-by shuffle; all ranking/value functions are built-ins.

Default-frame semantics match between the engines (RANGE UNBOUNDED
PRECEDING..CURRENT ROW when ORDER BY is present) — but every ORDER BY
below is made unique so peer-row ambiguity can't corrupt the hash.

GROUPS frames (q_win_groups_frame) don't exist in Spark; rewritten
exactly as dense_rank precompute + RANGE frame on the rank
(SURVEY §7.4) — the oracle runs the real GROUPS frame in DuckDB, so
the rewrite is value-checked, not rows-only.

Scale notes: one shuffle per distinct partitionBy key set; suppkey
partitions are plentiful and balanced. A 100 TB window over a skewed
key would need salting — these keys aren't skewed.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query

# --- ranking family ----------------------------------------------------
sql_query(
    "q_win_ranking",
    """
    SELECT s_suppkey, s_nationkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CAST(CAST(PERCENT_RANK() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS pct_rank,
           CAST(CAST(CUME_DIST() OVER w AS DECIMAL(18,6)) AS DOUBLE) AS cume
    FROM supplier
    -- explicit NULLS LAST on EVERY key: Spark ASC defaults NULLS
    -- FIRST, DuckDB NULLS LAST — invisible at sf0.001 (the 10-row
    -- supplier table drew no NULL keys) and divergent at sf0.01
    -- mutations (adversarial replay at SPARK_GRAFT_ADV_SRC=sf0.01, r6)
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY s_acctbal ASC NULLS LAST, s_suppkey ASC NULLS LAST)
    """,
    tags=("window",),
)

# --- lag / lead --------------------------------------------------------
sql_query(
    "q_win_lag_lead",
    """
    SELECT o_orderkey,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WHERE o_orderkey <= 500
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
    """,
    tags=("window",),
)

# --- first/last/nth over explicit frames -------------------------------
sql_query(
    "q_win_value_fns",
    """
    SELECT s_suppkey,
           FIRST_VALUE(s_name) OVER w AS first_name,
           LAST_VALUE(s_name) OVER w AS last_name,
           NTH_VALUE(s_name, 2) OVER w AS second_name
    FROM supplier
    -- explicit NULLS LAST + s_name tie-break: NULL-injected suppkeys
    -- otherwise sort engine-differently AND leave first/last/nth
    -- unspecified between two NULL-key peers (r6 sf0.01 replay)
    WINDOW w AS (PARTITION BY s_nationkey
                 ORDER BY s_suppkey ASC NULLS LAST, s_name ASC NULLS LAST
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window",),
)

# --- any aggregate as window fn ----------------------------------------
sql_query(
    "q_win_agg_over",
    """
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_total,
           COUNT(*) OVER w AS running_n,
           CAST(MIN(o_totalprice) OVER w AS DOUBLE) AS running_min
    FROM orders
    WHERE o_orderkey <= 800
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
    """,
    tags=("window",),
)

# --- ROWS frame ---------------------------------------------------------
# A ROWS frame consumes peers POSITIONALLY, so the ordering must be
# total over every column the frame READS (r5 replay convention (a),
# extended by the r8 skew campaign): under a hot-key point mass half
# of lineitem shares one l_orderkey and l_linenumber tie groups are
# huge — ordering by l_linenumber alone left qty_3row
# engine-unspecified. Adding l_quantity (the one consumed value) with
# explicit null ordering makes tied rows interchangeable: peers equal
# in (linenumber, quantity) contribute identically in any order.
sql_query(
    "q_win_rows_frame",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                OVER (PARTITION BY l_orderkey
                      ORDER BY l_linenumber ASC NULLS LAST,
                               l_quantity ASC NULLS LAST
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS qty_3row
    FROM lineitem
    WHERE l_orderkey <= 500
    """,
    tags=("window",),
)

# --- RANGE frame with numeric offsets ------------------------------------
sql_query(
    "q_win_range_frame",
    """
    SELECT p_partkey, p_size,
           COUNT(*) OVER (ORDER BY p_size ASC
                          RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS peers_pm2
    FROM part
    WHERE p_partkey <= 300
    """,
    tags=("window",),
)

# --- GROUPS frame: Spark rewrite vs DuckDB native GROUPS -----------------
# GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING over ORDER BY s_acctbal
# == RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING over dense_rank(acctbal).
sql_query(
    "q_win_groups_frame",
    """
    WITH ranked AS (
      SELECT s_suppkey, s_nationkey, s_acctbal,
             DENSE_RANK() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal ASC NULLS LAST) AS dr
      FROM supplier
    )
    SELECT s_suppkey,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6)))
                OVER (PARTITION BY s_nationkey ORDER BY dr ASC
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
    FROM ranked
    """,
    # DuckDB hasn't implemented GROUPS frames either ("not implemented
    # yet" parser error), so the oracle runs the same dense_rank+RANGE
    # rewrite — cross-checking the rewrite, not DuckDB's GROUPS.
    oracle="""
    WITH ranked AS (
      SELECT s_suppkey, s_nationkey, s_acctbal,
             DENSE_RANK() OVER (PARTITION BY s_nationkey
                                ORDER BY s_acctbal ASC NULLS LAST) AS dr
      FROM supplier
    )
    SELECT s_suppkey,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,6)))
                OVER (PARTITION BY s_nationkey ORDER BY dr ASC
                      RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS grp_sum
    FROM ranked
    """,
    tags=("window", "compat"),
)


# --- named windows: WINDOW w AS (…) sugar (SURVEY §2.5 last row) -------
# Native in both Spark 4 and DuckDB: one definition, several OVER w
# consumers — the planner expands it inline, so the physical plan is
# identical to spelling the spec out per function.
sql_query(
    "q_win_named",
    """
    SELECT c_custkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rk,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) OVER w AS DOUBLE) AS run_bal
    FROM customer
    WHERE c_custkey <= 500
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey ASC)
    """,
    tags=("window",),
)
