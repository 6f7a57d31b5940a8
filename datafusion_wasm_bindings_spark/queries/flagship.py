"""Flagship query: TPC-H-Q1-style pricing summary over lineitem.

One query exercising the reference's whole hot path (SURVEY.md §7.1):
parquet scan with predicate pushdown (§2.1) → filter (§2.2) →
hash aggregation with 8 aggregates (§2.4) → sort (§2.6). The reference
runs this class of query through FilterExec/AggregateExec/SortExec
(inherited DataFusion 45 operators, Cargo.lock:978); Spark runs it as
one whole-stage-codegen'd scan + partial-agg stage, a single shuffle on
the 6-row group-key space, and a final agg + sort.

Scale posture: the only shuffle is on (l_returnflag, l_linestatus) —
~6 groups — after map-side partial aggregation, so bytes shuffled are
O(partitions × groups), independent of input rows. The shipdate filter
pushes into the parquet scan (PushedFilters). This plan survives
100 TB unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.queries import query
from datafusion_wasm_bindings_spark.queries._util import davg, davg_sql, dsum, dsum_sql
from datafusion_wasm_bindings_spark.sources.catalog import table


def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallel=True: 5 decimal-sum aggregates per row are the heavy
    # map work this plan pays; a row-group-starved scan (one task owns
    # the whole file) serializes it, so widen behind the scan when the
    # layout under-splits (guide §2.5; no-op at production layouts).
    # Measured r12: 1.17→0.81 s at sf0.1, rows bit-identical.
    li = table(spark, sf_dir, "lineitem", parallel=True)
    price = F.col("l_extendedprice")
    disc_price = price * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(price, "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(price, "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy(F.col("l_returnflag").asc_nulls_last(), F.col("l_linestatus").asc_nulls_last())
    )


_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql("l_quantity", "sum_qty")},
  {dsum_sql("l_extendedprice", "sum_base_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {davg_sql("l_quantity", "avg_qty")},
  {davg_sql("l_extendedprice", "avg_price")},
  {davg_sql("l_discount", "avg_disc")},
  COUNT(1) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST
"""

query("q_flagship_pricing_summary", _Q1_ORACLE, headline=True, tags=("flagship", "agg"))(_q1)


def _q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style shipping priority: the multi-join hot path.

    Scale posture: customer (smallest side after the segment filter) is
    explicitly broadcast — zero shuffle for that join; orders⋈lineitem
    shuffles once on orderkey; AQE can convert it too when the filtered
    orders side fits the broadcast threshold. All three date/segment
    filters push into the parquet scans (PushedFilters), so at 100 TB
    the shuffle carries only the ~1/5 segment × date-window slice.
    """
    cust = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    cutoff = F.lit("1998-06-01").cast("timestamp")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("l_orderkey").asc_nulls_last())
        .limit(10)
    )


_Q3_ORACLE = f"""
SELECT
  l_orderkey,
  CAST(o_orderdate AS DATE) AS orderdate,
  o_orderpriority,
  {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC NULLS LAST, l_orderkey ASC NULLS LAST
LIMIT 10
"""

query("q_flagship_shipping_priority", _Q3_ORACLE, headline=True, tags=("flagship", "join", "agg"))(
    _q3
)


def _q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style local-supplier revenue: the deep star-join path —
    six tables, two independent dimension chains meeting at the fact.

    Scale posture: region→nation→(customer, supplier) are all tiny and
    broadcast explicitly — four joins with zero shuffle; the only wide
    exchanges are orders⋈lineitem on orderkey and the final ~25-group
    rollup after map-side partial aggregation. The date filter pushes
    into the orders scan, the region filter prunes at the broadcast
    build. This is the plan shape a 100 TB star schema wants: one
    fact-sized shuffle, everything else broadcast.
    """
    cutoff_lo = F.lit("1996-01-01").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01").cast("timestamp")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = table(spark, sf_dir, "nation")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = table(spark, sf_dir, "lineitem")
    asian_nations = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asian_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc_nulls_last(), F.col("n_name").asc_nulls_last())
    )


_Q5_ORACLE = f"""
SELECT
  n_name,
  {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC NULLS LAST, n_name ASC NULLS LAST
"""

query("q_flagship_local_supplier", _Q5_ORACLE, headline=True, tags=("flagship", "join", "agg"))(
    _q5
)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entry point used by __spark_entry__.entry (driver smoke check)."""
    from datafusion_wasm_bindings_spark.sources.catalog import register_tables

    register_tables(spark, sf_dir)
    return _q1(spark, sf_dir)
