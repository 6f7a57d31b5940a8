"""Physical-plan shape assertions — the 100 TB posture checks
(SURVEY.md §7.6 'Scale posture', task brief 'Optimize for scale').

Catches regressions where a plan silently stops broadcasting a dim
table, loses parquet filter/projection pushdown, or drops the top-k
fusion. These mirror the physical properties the reference gets from
its own optimizer (SURVEY §4.2) — broadcast ≈ CollectLeft, pushdown ≈
row-group pruning, TakeOrdered ≈ the TopK rewrite.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import load_all
from datafusion_wasm_bindings_spark.sources.catalog import table

REGISTRY = load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_join_broadcasts(spark, sf_dir):
    df = REGISTRY["q_join_inner"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    df = li.filter("l_quantity > 45").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan, plan


def test_column_pruning_reaches_parquet(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema must contain only the projected columns
    read = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_comment" not in read, read


def test_topk_fuses_to_take_ordered(spark, sf_dir):
    df = REGISTRY["q_topk"].spark_fn(spark, sf_dir)
    assert "TakeOrderedAndProject" in _plan(df)


def test_flagship_partial_aggregation(spark, sf_dir):
    df = REGISTRY["q_flagship_pricing_summary"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    # map-side partial agg before the exchange: two HashAggregate levels
    # (AQE's pre-execution string omits WholeStageCodegen wrappers, so
    # codegen presence isn't asserted here)
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_sum" in plan, plan
    # the only pre-sort exchange is on the tiny group-key space
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q3_broadcasts_customer_and_pushes_filters(spark, sf_dir):
    df = REGISTRY["q_flagship_shipping_priority"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan
    # segment + date predicates reach the parquet scans
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan, plan
    assert "LessThan(o_orderdate" in plan and "GreaterThan(l_shipdate" in plan, plan
    # the orders⋈lineitem join shuffles each side at most once
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_similarity_broadcasts_queries(spark, sf_dir):
    df = REGISTRY["q_sim_topk"].spark_fn(spark, sf_dir)
    assert "BroadcastExchange" in _plan(df)
