"""Aggregate function catalog — SURVEY.md §2.4 function table
(datafusion-functions-aggregate 45, Cargo.lock:809).

Float-stat caveat: variance/corr/regr merge partial states across
partitions in Spark while DuckDB scans sequentially — results agree
only to ~1e-12 relative. Checked queries therefore (a) use
small-magnitude columns (discount/tax ∈ [0, 0.1]) so the absolute
error is tiny and (b) round on both sides (FIXTURES.md rules).

Approx sketches (HLL / t-digest) differ by construction between
engines → oracle=None (driver records rows-only), with bounded-error
assertions in tests/test_approx.py instead.
"""

from __future__ import annotations

from datafusion_wasm_bindings_spark.queries import query, sql_query
from datafusion_wasm_bindings_spark.queries._util import davg_sql, dsum_sql

sql_query(
    "q_fn_count",
    """
    SELECT l_returnflag,
           COUNT(*) AS n_star,
           COUNT(1) AS n_one,
           COUNT(l_orderkey) AS n_col,
           COUNT(DISTINCT l_suppkey) AS n_distinct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn",),
)

sql_query(
    "q_fn_sum_avg_min_max",
    f"""
    SELECT o_orderstatus,
           {dsum_sql("o_totalprice", "total")},
           {davg_sql("o_totalprice", "mean_price")},
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(MIN(o_orderdate) AS DATE) AS first_date,
           CAST(MAX(o_orderdate) AS DATE) AS last_date
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg_fn",),
)

# median: exact interpolating median in both engines
sql_query(
    "q_fn_median",
    """
    SELECT l_returnflag,
           round(median(l_quantity), 6) AS med_qty,
           round(median(l_discount), 6) AS med_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn",),
)

# --- approx sketches -------------------------------------------------
# HLL / GK sketches differ by construction between engines, so the
# approx VALUE can never hash-match an oracle. Instead each query
# outputs (a) the exact value — deterministic, hash-checked — and
# (b) a boolean asserting the sketch landed within its documented
# error bound; the oracle returns the exact value and TRUE. The full
# value check then verifies BOTH the exact path and the sketch's
# accuracy contract. (Looser bounds than the sketch guarantees: HLL
# rsd defaults to 5% → checked at 10%; percentile_approx rank error
# n/accuracy ≈ 0.01% of ranks → checked at 2% of value.)
sql_query(
    "q_fn_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           abs(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
             <= 0.1 * COUNT(DISTINCT l_partkey) AS hll_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS hll_within_10pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn", "approx"),
)

# RANK-error contract, not value error (adversarial extremes replay,
# r6): a 2%-of-value band collapses to an always-false NEGATIVE
# tolerance once hostile values drive the exact quantile negative, and
# no value-space band is honest anyway — GK/KLL-family sketches
# guarantee rank epsilon only. The assertion is the textbook
# ε-approximate-quantile definition: rank(approx) ∈ [q−ε, q+ε] via
# count(x < a) ≤ (q+ε)·n AND count(x ≤ a) ≥ (q−ε)·n — robust to point
# masses and any sign. The join-back is NULL-SAFE (<=>) so the NULL
# group key survives (CLAUDE.md r5 window-only-oracle rule: the oracle
# GROUP BY keeps its NULL group).
def _fn_approx_median(spark, sf_dir):
    """DataFrame twin of the former SQL text (r12): same expressions
    via F.expr fragments — the decimal literals 0.52/0.48 and the CASE
    arithmetic parse identically — but the scan comes from
    ``table(parallel=True)`` so the exact-percentile value buffering
    and the sketch updates run wide behind a row-group-starved layout
    (guide §2.5). Partition-robust by construction: exact percentile is
    partitioning-invariant, and the sketch VALUE (merge-order-
    sensitive) feeds only the ±2 %-band boolean while the sketch's own
    rank error is 1e-4 (default accuracy 10000). F.broadcast(a) keeps
    the |groups|-row sketch frame the build side by contract (the old
    /*+ BROADCAST(a) */)."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.sources.catalog import table

    li = table(spark, sf_dir, "lineitem", parallel=True)
    a = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_approx(l_extendedprice, 0.5)").alias("amed"),
            F.expr("round(percentile(l_extendedprice, 0.5), 3)").alias("exact_med"),
        )
        .alias("a")
    )
    j = li.alias("l").join(
        F.broadcast(a), F.expr("l.l_returnflag <=> a.l_returnflag")
    )
    return (
        j.groupBy(F.col("a.l_returnflag").alias("l_returnflag"), F.col("a.exact_med").alias("exact_med"))
        .agg(
            F.expr(
                "SUM(CASE WHEN l.l_extendedprice < a.amed THEN 1 ELSE 0 END)"
                " <= 0.52 * COUNT(l.l_extendedprice)"
                " AND SUM(CASE WHEN l.l_extendedprice <= a.amed THEN 1 ELSE 0 END)"
                " >= 0.48 * COUNT(l.l_extendedprice)"
            ).alias("sketch_within_2pct")
        )
    )


query(
    "q_fn_approx_median",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 3) AS exact_med,
           TRUE AS sketch_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn", "approx"),
)(_fn_approx_median)

# same rank-epsilon contract as q_fn_approx_median (see its header);
# F.broadcast(a) keeps the |groups|-row sketch frame the build side by
# CONTRACT — the static planner otherwise picks whichever side's size
# estimate is smaller, which at fixture scale is the raw FACT scan
# (broadcasting the fact is exactly wrong at 100 TB)
def _fn_approx_percentile(spark, sf_dir):
    """DataFrame twin with a parallel scan — see _fn_approx_median."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.sources.catalog import table

    li = table(spark, sf_dir, "lineitem", parallel=True)
    a = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile_approx(l_extendedprice, 0.1)").alias("a10"),
            F.expr("percentile_approx(l_extendedprice, 0.9)").alias("a90"),
            F.expr("round(percentile(l_extendedprice, 0.1), 3)").alias("p10_exact"),
            F.expr("round(percentile(l_extendedprice, 0.9), 3)").alias("p90_exact"),
        )
        .alias("a")
    )
    j = li.alias("l").join(
        F.broadcast(a), F.expr("l.l_returnflag <=> a.l_returnflag")
    )
    return (
        j.groupBy(
            F.col("a.l_returnflag").alias("l_returnflag"),
            F.col("a.p10_exact").alias("p10_exact"),
            F.col("a.p90_exact").alias("p90_exact"),
        )
        .agg(
            F.expr(
                "SUM(CASE WHEN l.l_extendedprice < a.a10 THEN 1 ELSE 0 END)"
                " <= 0.12 * COUNT(l.l_extendedprice)"
                " AND SUM(CASE WHEN l.l_extendedprice <= a.a10 THEN 1 ELSE 0 END)"
                " >= 0.08 * COUNT(l.l_extendedprice)"
            ).alias("p10_within_2pct"),
            F.expr(
                "SUM(CASE WHEN l.l_extendedprice < a.a90 THEN 1 ELSE 0 END)"
                " <= 0.92 * COUNT(l.l_extendedprice)"
                " AND SUM(CASE WHEN l.l_extendedprice <= a.a90 THEN 1 ELSE 0 END)"
                " >= 0.88 * COUNT(l.l_extendedprice)"
            ).alias("p90_within_2pct"),
        )
    )


query(
    "q_fn_approx_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.1), 3) AS p10_exact,
           round(quantile_cont(l_extendedprice, 0.9), 3) AS p90_exact,
           TRUE AS p10_within_2pct,
           TRUE AS p90_within_2pct
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn", "approx"),
)(_fn_approx_percentile)

# weighted percentile — DataFusion's approx_percentile_cont_with_weight
# capability (SURVEY §2.4 "— (extension)"), computed EXACTLY: the p-th
# weighted percentile is the least v whose cumulative weight (ties all
# included → deterministic) reaches p × total.
#
# Scale shape (r01 verdict fix): a bare `SUM(wt) OVER (ORDER BY v)`
# plans a single-partition global window — the whole relation through
# one task at 100 TB. Two-pass rewrite instead: (1) range-bucket v and
# partial-sum each bucket (map-side combinable shuffle on bkt); (2) the
# bucket-prefix table is |buckets| rows, so its running sum is
# driver-trivial and broadcast back; (3) the per-row cumulative runs in
# a window PARTITIONED by bkt — parallel across buckets — plus the
# broadcast prefix. Plan shape asserted in tests/test_plans.py. On a
# skewed value distribution the fixed-width buckets would be sized from
# a quantile sketch instead; semantics unchanged.
#
# The oracle intentionally stays the ORIGINAL one-window formulation,
# so DuckDB independently proves the distributed rewrite preserves the
# single-scan semantics.
sql_query(
    "q_fn_weighted_percentile",
    """
    WITH w AS (
      SELECT p_size AS v, CAST(p_retailprice AS DECIMAL(18,2)) AS wt
      FROM part
      WHERE p_partkey <= 1000
        AND p_size IS NOT NULL AND p_retailprice IS NOT NULL
    ),
    b AS (SELECT v, wt, CAST(floor(v / 5.0) AS INT) AS bkt FROM w),
    bs AS (SELECT bkt, SUM(wt) AS bsum FROM b GROUP BY bkt),
    bp AS (
      SELECT bkt,
             SUM(bsum) OVER (ORDER BY bkt ASC) - bsum AS prefix,
             SUM(bsum) OVER () AS tot
      FROM bs
    ),
    c AS (
      SELECT b.v,
             bp.prefix + SUM(b.wt) OVER (PARTITION BY b.bkt ORDER BY b.v ASC) AS cum,
             bp.tot AS tot
      FROM b JOIN bp ON b.bkt = bp.bkt
    )
    SELECT MIN(CASE WHEN cum >= 0.25 * tot THEN v END) AS wp25,
           MIN(CASE WHEN cum >= 0.50 * tot THEN v END) AS wp50,
           MIN(CASE WHEN cum >= 0.90 * tot THEN v END) AS wp90
    FROM c
    """,
    # the population is NON-NULL (v, wt) pairs on both sides: a NULL
    # value has no rank position and a NULL weight no mass — without
    # the filter the engines also disagree on where NULL v sorts
    # (adversarial NULL replay, r5)
    oracle="""
    WITH w AS (
      SELECT p_size AS v, CAST(p_retailprice AS DECIMAL(18,2)) AS wt
      FROM part
      WHERE p_partkey <= 1000
        AND p_size IS NOT NULL AND p_retailprice IS NOT NULL
    ), c AS (
      SELECT v,
             SUM(wt) OVER (ORDER BY v ASC) AS cum,
             SUM(wt) OVER () AS tot
      FROM w
    )
    SELECT MIN(CASE WHEN cum >= 0.25 * tot THEN v END) AS wp25,
           MIN(CASE WHEN cum >= 0.50 * tot THEN v END) AS wp50,
           MIN(CASE WHEN cum >= 0.90 * tot THEN v END) AS wp90
    FROM c
    """,
    tags=("agg_fn", "percentile"),
)

# array_agg: order-normalized via sort (plain array_agg is order-
# nondeterministic in a parallel engine — SURVEY §5 determinism rules).
# Arrays are surfaced as ','-joined STRINGs: the driver's canonicalizer
# can't hash list cells (CORRECTNESS_r01 q_agg_order_within driver err).
# 100 TB caveat (applies to string_agg below too, and to the reference's
# own array_agg/string_agg identically): the per-group payload grows
# with group size, so these are semantically-unbounded-row functions —
# run them over bounded key spaces (here: 25 nations / 5 regions) or
# cap with slice(); the engine parity is the point, not a scale claim.
sql_query(
    "q_fn_array_agg",
    """
    SELECT n_regionkey,
           concat_ws(',', array_sort(collect_list(n_nationkey))) AS keys_sorted,
           concat_ws(',', array_sort(collect_set(n_name))) AS names_distinct
    FROM nation GROUP BY n_regionkey
    """,
    oracle="""
    SELECT n_regionkey,
           -- COALESCE: DuckDB stringifies the all-NULL/empty list to
           -- NULL where Spark's concat_ws yields '' (r3 pitfall (b))
           COALESCE(array_to_string(list_sort(array_agg(n_nationkey)), ','), '')
             AS keys_sorted,
           COALESCE(array_to_string(list_sort(list_distinct(array_agg(n_name))), ','),
                    '') AS names_distinct
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg_fn",),
)

# string_agg(x, sep ORDER BY y) → Spark: ordered-struct-sort rewrite.
# Spark's array_sort on structs compares NULL fields FIRST, DuckDB's
# ORDER BY default is NULLS LAST — explicit NULLS FIRST keeps a NULL
# sort key deterministic across engines (adversarial NULL replay, r5);
# and the struct sort tie-breaks by name, so the oracle carries the
# same second key — duplicate/NULL keys otherwise leave peers in
# engine-unspecified order (adversarial dupes replay, r6).
sql_query(
    "q_fn_string_agg",
    """
    SELECT n_regionkey,
           concat_ws(',', transform(array_sort(collect_list(struct(n_nationkey, n_name))),
                                    s -> s.n_name)) AS names_csv
    FROM nation GROUP BY n_regionkey
    """,
    oracle="""
    SELECT n_regionkey,
           -- all-NULL-name group: concat_ws '' vs string_agg NULL
           -- (r3 pitfall b; r6 dupes replay)
           COALESCE(string_agg(n_name, ',' ORDER BY n_nationkey ASC NULLS FIRST,
                                              n_name ASC NULLS FIRST), '') AS names_csv
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg_fn",),
)

# first_value(x ORDER BY y) / last_value → min_by / max_by (both
# engines). Hardened by the adversarial replay (r5): the FILTER pins
# DuckDB arg_max's NULL-arg skip (and excludes NULL prices, whose
# position inside a composite ordering differs per engine), and the
# COMPOSITE ordering value (price, key) makes the pick deterministic
# under price ties — Spark compares the struct, DuckDB the same pair
# as a list (key cast to DOUBLE; keys ≪ 2^53 so the cast is exact).
sql_query(
    "q_fn_first_last_value",
    """
    SELECT o_orderstatus,
           min_by(o_orderkey, struct(o_totalprice, o_orderkey))
             FILTER (WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL)
             AS cheapest_order,
           max_by(o_orderkey, struct(o_totalprice, o_orderkey))
             FILTER (WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL)
             AS priciest_order
    FROM orders GROUP BY o_orderstatus
    """,
    # arg_min/arg_max don't bind LIST ordering values in DuckDB —
    # min/max over the lexicographically-compared [price, key] list
    # carry the key in slot 2 instead
    oracle="""
    SELECT o_orderstatus,
           CAST(min([o_totalprice, CAST(o_orderkey AS DOUBLE)])
                  FILTER (WHERE o_orderkey IS NOT NULL
                          AND o_totalprice IS NOT NULL)[2] AS BIGINT)
             AS cheapest_order,
           CAST(max([o_totalprice, CAST(o_orderkey AS DOUBLE)])
                  FILTER (WHERE o_orderkey IS NOT NULL
                          AND o_totalprice IS NOT NULL)[2] AS BIGINT)
             AS priciest_order
    FROM orders GROUP BY o_orderstatus
    """,
    tags=("agg_fn",),
)

sql_query(
    "q_fn_bool_and_or",
    """
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_big_discount,
           every(l_tax >= 0) AS every_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_big_discount,
           bool_and(l_tax >= 0) AS every_taxed
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg_fn",),
)

sql_query(
    "q_fn_bit_agg",
    """
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS band,
           bit_or(o_orderkey) AS bor,
           bit_xor(o_orderkey) AS bxor
    FROM orders WHERE o_orderkey <= 1000 GROUP BY o_orderstatus
    """,
    tags=("agg_fn",),
)

# variance family on small-magnitude columns, rounded (module doc)
sql_query(
    "q_fn_stddev_var",
    # Exact decimal-moment identity on BOTH sides (r9): the builtin
    # stddev/variance accumulations are summation-ORDER-dependent
    # across engines (r3 pitfall e) — the old round(builtin, 8) twin
    # was one hostile draw away from a rounding-boundary flip (its
    # corr/regr siblings flipped live at the r9 extremes re-cert).
    # One shared SQL string => identical IEEE expression trees on
    # identical exact DECIMAL sums => bit-identical doubles. The
    # builtin functions stay exercised by
    # tests/test_operators.py::test_builtin_moment_aggs_match_identities.
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(l_discount) AS BIGINT) AS n,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sxx
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           -- greatest(,0): an exact-zero-variance group's identity can
           -- float to -eps where DuckDB's sqrt ERRORS and Spark is NaN
           -- (r6 extremes convention a); the clamp is the same double
           -- on both sides
           CASE WHEN n > 1
                THEN sqrt(greatest((n * sxx - sx * sx) / n / (n - 1), 0.0)) END AS sd,
           CASE WHEN n > 0
                THEN sqrt(greatest((n * sxx - sx * sx) / n / n, 0.0)) END AS sd_pop,
           CASE WHEN n > 1 THEN (n * sxx - sx * sx) / n / (n - 1) END AS va,
           CASE WHEN n > 0 THEN (n * sxx - sx * sx) / n / n END AS va_pop
    FROM m
    """,
    # parallel_tables measured FLAT here (0.90→0.96 s): one column's
    # 2 decimal sums don't amortize the exchange — only the 6-sum
    # two-column siblings below widen (r12)
    tags=("agg_fn", "stats"),
)

sql_query(
    "q_fn_corr_covar",
    # same exact-moment treatment as q_fn_stddev_var (r9): the builtin
    # corr/covar flipped a rounding boundary live at the extremes
    # re-cert (cv_p 10th decimal). Pairwise-complete population filter
    # spelled explicitly — corr/covar ignore rows where EITHER side is
    # NULL.
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount * l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_tax * l_tax AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN n > 0 AND (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                THEN (n * sxy - sx * sy)
                     / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS c,
           CASE WHEN n > 1 THEN (n * sxy - sx * sy) / n / (n - 1) END AS cv_s,
           CASE WHEN n > 0 THEN (n * sxy - sx * sy) / n / n END AS cv_p
    FROM m
    """,
    tags=("agg_fn", "stats"),
    parallel_tables=("lineitem",),
)

sql_query(
    "q_fn_regr",
    # same exact-moment treatment (r9): builtin regr_sxy flipped the
    # 6th-decimal rounding boundary live at the extremes re-cert.
    # Identities follow the SQL-standard regr_* definitions over the
    # pairwise-complete population (y = l_tax regressed on
    # x = l_discount); r2 spells the standard's 3-case contract
    # explicitly so engine edge semantics never enter.
    """
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(l_discount * l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(l_tax * l_tax AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM lineitem
      WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN n > 0 AND (n * sxx - sx * sx) > 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
           CASE WHEN n > 0 AND (n * sxx - sx * sx) > 0
                THEN (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                END AS icept,
           CASE WHEN n = 0 OR (n * sxx - sx * sx) <= 0 THEN NULL
                WHEN (n * syy - sy * sy) <= 0 THEN 1.0
                ELSE (n * sxy - sx * sy) * (n * sxy - sx * sy)
                     / ((n * sxx - sx * sx) * (n * syy - sy * sy)) END AS r2,
           n,
           CASE WHEN n > 0 THEN sx / n END AS ax,
           CASE WHEN n > 0 THEN sy / n END AS ay,
           CASE WHEN n > 0 THEN (n * sxx - sx * sx) / n END AS sxx,
           CASE WHEN n > 0 THEN (n * syy - sy * sy) / n END AS syy,
           CASE WHEN n > 0 THEN (n * sxy - sx * sy) / n END AS sxy
    FROM m
    """,
    tags=("agg_fn", "stats"),
    parallel_tables=("lineitem",),
)

# --- bitmap aggregates: exact mergeable distinct -----------------------------------
# Spark 3.5 bitmap functions: keys bucket into 32k-bit bitmaps
# (bitmap_bucket_number / bitmap_bit_position), each bucket's bitmap is
# a fixed-width mergeable partial state (bitmap_construct_agg /
# bitmap_or_agg), and popcount (bitmap_count) sums to the EXACT distinct
# count — the 100 TB alternative to count(DISTINCT)'s Expand rewrite
# when exactness is required and HLL error is not acceptable: shards
# aggregate independently and OR-merge, like q_scale_hll_shards but
# exact. The oracle answers with a plain COUNT(DISTINCT).
sql_query(
    "q_fn_bitmap_distinct",
    """
    SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_distinct_parts,
           CAST(COALESCE(SUM(nb), 0) AS BIGINT) AS n_rows
    FROM (
      SELECT bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey))) AS cnt,
             COUNT(*) AS nb
      FROM lineitem GROUP BY bitmap_bucket_number(l_partkey)
    )
    -- COALESCE: the bucket subquery has ZERO groups on an empty table,
    -- so the outer SUMs are NULL where the oracle's COUNTs are 0
    -- (empty-mode replay r7)
    """,
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
    tags=("agg_fn", "scale"),
)

# --- argmax/argmin + conditional count ---------------------------------------------
# max_by/min_by (DuckDB arg_max/arg_min) are deterministic only when
# the ordering expression is UNIQUE within each group — here c_custkey,
# the table key. A non-unique ordering column would tie-break
# engine-arbitrarily and can never sit behind a value-hash oracle.
sql_query(
    "q_fn_argminmax",
    """
    SELECT c_nationkey,
           CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_pos,
           max_by(c_name, c_custkey) FILTER (WHERE c_name IS NOT NULL) AS name_last,
           min_by(c_name, c_custkey) FILTER (WHERE c_name IS NOT NULL) AS name_first,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey
    """,
    # FILTER on both sides: DuckDB's arg_max silently ignores rows
    # whose ARG is NULL, Spark's max_by returns that NULL — the
    # explicit filter pins one semantics (adversarial NULL replay, r5)
    oracle="""
    SELECT c_nationkey,
           CAST(count_if(c_acctbal > 0) AS BIGINT) AS n_pos,
           arg_max(c_name, c_custkey) FILTER (WHERE c_name IS NOT NULL) AS name_last,
           arg_min(c_name, c_custkey) FILTER (WHERE c_name IS NOT NULL) AS name_first,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY c_nationkey
    """,
    tags=("agg_fn",),
)

# --- grouped-aggregate pandas UDF (UDAF surface) -----------------------------------
# The deliberate Python-aggregation demo (SURVEY §2.11: the reference
# exposes no UDF surface at all; PySpark's is pandas_udf). Geometric
# mean of document length per source, computed as an Arrow-batched
# grouped aggregate. Determinism recipe: each ln() is one libm call on
# identical doubles; the per-row result is quantized HALF_UP to 6
# decimals as a scaled int64 BEFORE the sum (the dsum recipe, executed
# in numpy), so the aggregate is exact and order-independent; the
# final exp(qsum/1e6/n) is pure double arithmetic on identical inputs.
def _fn_pandas_udaf(spark, sf_dir):
    import pandas as pd
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.sources.catalog import table

    # module-wide `from __future__ import annotations` stringifies type
    # hints, so Spark's signature inference can't see pd.Series — pass
    # the eval type explicitly instead
    @F.pandas_udf("double", F.PandasUDFType.GROUPED_AGG)
    def qlogsum(v: pd.Series) -> float:
        import numpy as np

        # dropna FIRST: SQL aggregates skip NULLs implicitly; a pandas
        # UDAF receives them as NaN and must skip them itself, or the
        # int64 cast of NaN poisons the whole group sum (adversarial
        # NULL replay, r5)
        x = np.log(v.dropna().to_numpy(dtype="float64"))
        # scaled int64 sum stays exactly representable as a double
        # (≤ ~7e11 ≪ 2^53), so surfacing it as DOUBLE loses nothing
        return float(np.floor(x * 1e6 + 0.5).astype("int64").sum())

    # a GROUPED_AGG pandas UDF cannot share an agg with builtin
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — the row count is a
    # second pandas aggregate in the same (single-shuffle) groupBy;
    # .count() (non-null), not len(): it pairs with qlogsum's dropna
    # the way COUNT(x) pairs with SUM(x)
    @F.pandas_udf("long", F.PandasUDFType.GROUPED_AGG)
    def ncount(v: pd.Series) -> int:
        return int(v.count())

    # domain contract: the geometric mean is defined over POSITIVE
    # lengths only — ln(0) is -inf in numpy but an ERROR in DuckDB,
    # and a hostile n_chars <= 0 must not poison the group sum; the
    # when() maps them to NULL, which qlogsum's dropna and ncount's
    # .count() both skip, mirroring the oracle's CASE-guarded SUM /
    # COUNT (adversarial extremes replay, r6)
    d = table(spark, sf_dir, "documents").select(
        "source", F.when(F.col("n_chars") > 0, F.col("n_chars")).alias("n_chars")
    )
    g = d.groupBy("source").agg(
        qlogsum(F.col("n_chars")).alias("qsum"),
        ncount(F.col("n_chars")).alias("n_docs"),
    )
    return g.select(
        "source",
        "n_docs",
        # Java Math.exp and libm exp can differ in the last ulp —
        # quantize the surfaced double through DECIMAL(18,6) (dsum
        # recipe, step 2) so both engines emit identical bits
        # try_divide: a group with NO positive lengths has n_docs = 0
        # (oracle: NULL sum / 0 count → NULL) — NULL, never ANSI abort
        F.exp(F.try_divide(F.col("qsum") / F.lit(1e6), F.col("n_docs")))
        .cast("decimal(18,6)")
        .cast("double")
        .alias("geo_mean_chars"),
    )


from datafusion_wasm_bindings_spark.queries import query as _query  # noqa: E402

_query(
    "q_fn_pandas_udaf",
    """
    -- CASE n_chars > 0: geometric-mean domain — ln(0)/ln(neg) ERROR in
    -- DuckDB, -inf/NaN in numpy; both sides skip non-positive lengths
    -- (adversarial extremes replay, r6)
    SELECT source,
           CAST(COUNT(CASE WHEN n_chars > 0 THEN n_chars END) AS BIGINT) AS n_docs,
           CAST(CAST(exp(CAST(SUM(CASE WHEN n_chars > 0 THEN
                     CAST(floor(ln(n_chars) * 1000000 + 0.5) AS BIGINT) END) AS DOUBLE)
               / 1e6 / COUNT(CASE WHEN n_chars > 0 THEN n_chars END))
             AS DECIMAL(18,6)) AS DOUBLE) AS geo_mean_chars
    FROM documents GROUP BY source
    """,
    tags=("agg_fn", "udf", "python"),
)(_fn_pandas_udaf)
