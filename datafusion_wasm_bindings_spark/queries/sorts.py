"""Sorts / limits / top-k — SURVEY.md §2.6.

Reference: SortExec (memory-only — disk disabled, src/core.rs:55),
GlobalLimitExec, and a physical TopK rewrite for ORDER BY+LIMIT.
Spark: orderBy → range-partitioned sort (spills natively);
orderBy+limit → TakeOrderedAndProject (heap top-k per partition +
driver merge) — verified in tests/test_plans.py.

Determinism: every ORDER BY that feeds a LIMIT carries a unique
tiebreaker and explicit NULLS FIRST/LAST (FIXTURES.md rules), since
DataFusion/DuckDB and Spark disagree on default null placement
(SURVEY §1.1).
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import sql_query

# --- multi-key sort with explicit null ordering ----------------------
sql_query(
    "q_sort",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderkey <= 500
    ORDER BY o_orderstatus ASC NULLS LAST,
             o_totalprice DESC NULLS FIRST,
             o_orderkey ASC
    """,
    tags=("sort",),
)

# --- LIMIT / OFFSET ----------------------------------------------------
sql_query(
    "q_limit_offset",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey ASC NULLS LAST
    LIMIT 20 OFFSET 10
    """,
    tags=("limit",),
)

# --- Top-K (ORDER BY + LIMIT fused) -------------------------------------
sql_query(
    "q_topk",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
    LIMIT 15
    """,
    headline=True,
    tags=("sort", "topk"),
)
