"""Aggregation — SURVEY.md §2.4 (plan shapes; function catalog lives in
functions_agg.py).

Reference engine: single AggregateExec with Partial/Final modes and
hash grouping (Cargo.lock:978). Spark: identical model —
partial (map-side) + final hash aggregation with a shuffle only on the
group keys, which is what every query below compiles to.

Scale notes: group keys here are low-cardinality (returnflag ×
linestatus, mktsegment, priority) so the post-partial shuffle is tiny
at any input size. DISTINCT aggregates add an expand+regroup — noted
per query.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query
from datafusion_wasm_bindings_spark.queries._util import davg_sql, dsum_sql

# --- q_agg_groupby: multi-key + expression keys ----------------------
sql_query(
    "q_agg_groupby",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(l_quantity > 25 AS STRING) AS qty_band,
           COUNT(*) AS n,
           {dsum_sql("l_extendedprice", "total_price")}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus, CAST(l_quantity > 25 AS STRING)
    """,
    tags=("agg",),
)

# --- q_agg_global: ungrouped aggregate --------------------------------
sql_query(
    "q_agg_global",
    f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {dsum_sql("l_extendedprice", "total")},
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    """,
    tags=("agg",),
)

# --- q_agg_having ------------------------------------------------------
sql_query(
    "q_agg_having",
    f"""
    SELECT o_custkey, COUNT(*) AS n_orders, {dsum_sql("o_totalprice", "spend")}
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 12
    """,
    tags=("agg",),
)

# --- q_agg_distinct: multiple DISTINCT aggregates ---------------------
# Spark plans multi-distinct via Expand (RewriteDistinctAggregates);
# DataFusion via its own distinct rewrite — same semantics.
sql_query(
    "q_agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)

# --- grouping sets / rollup / cube + grouping() -----------------------
sql_query(
    "q_agg_grouping_sets",
    f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status,
           COUNT(*) AS n, {dsum_sql("l_quantity", "qty")}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    tags=("agg", "groupingsets"),
)

sql_query(
    "q_agg_rollup",
    f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {dsum_sql("o_totalprice", "total")}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "groupingsets"),
)

sql_query(
    "q_agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {davg_sql("l_discount", "avg_disc")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg", "groupingsets"),
)

# --- q_agg_filter_clause: FILTER (WHERE ...) per aggregate -------------
# Supported natively by Spark SQL (3.0+) and DuckDB — shared text.
sql_query(
    "q_agg_filter_clause",
    f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_heavy,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           {dsum_sql("l_extendedprice", "total")}
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg",),
)

# --- q_agg_order_within: ORDER BY inside an aggregate ------------------
# DataFusion/DuckDB: array_agg(x ORDER BY y). Spark has no ordered
# array_agg → SURVEY §7.4 rewrite: sort_array(collect_list(struct))
# then extract. The struct sort is TOTAL (key, then name), so the
# oracle must spell the same name tie-break explicitly: with duplicate
# or NULL-injected keys, `ORDER BY n_nationkey` alone leaves peers in
# engine-unspecified order (adversarial dupes replay, r6).
# Surfaced as a joined STRING, not array<string>: the driver's row
# canonicalizer can't hash list cells (CORRECTNESS_r01 driver err).
sql_query(
    "q_agg_order_within",
    """
    SELECT n_regionkey,
           concat_ws(',', transform(array_sort(collect_list(struct(n_nationkey, n_name))),
                                    s -> s.n_name)) AS nations_by_key
    FROM nation
    GROUP BY n_regionkey
    """,
    oracle="""
    SELECT n_regionkey,
           -- NULLS FIRST matches Spark's struct array_sort (NULL
           -- fields smallest); DuckDB defaults NULLS LAST
           -- (adversarial NULL replay, r5)
           -- a group whose every name is NULL: Spark concat_ws → '',
           -- DuckDB string_agg → NULL (r3 pitfall b; surfaced live by
           -- the r6 dupes replay)
           COALESCE(string_agg(n_name, ',' ORDER BY n_nationkey ASC NULLS FIRST,
                                              n_name ASC NULLS FIRST), '')
             AS nations_by_key
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg",),
)
