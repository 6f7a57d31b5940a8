"""Property tests for the repo's core determinism primitive — the
``dsum``/``davg`` DECIMAL(18,6) recipe (queries/_util.py) — on its
actual input domain: money-valued doubles (k/100) and per-row products
of two money values (the flagship's disc_price shape, exact at <= 4
decimals). On this domain the per-row DECIMAL cast is exact in BOTH
engines, so bit-equality is a hard invariant, not a probabilistic one:

1. Spark's dsum must be bit-identical to DuckDB's dsum_sql on the same
   values (the cross-engine half of the contract);
2. dsum must be invariant under row permutation AND partitioning (the
   order-independence half — plain SUM(double) breaks this, which is
   the reason the recipe exists);
3. davg: identical exact sums / identical counts divide to bit-equal
   doubles (pitfall h — the quotient surfaces RAW, never re-quantized).

Every value round-trips Python float -> Spark double and
repr() -> DuckDB double losslessly (shortest-repr parse).
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

# money values: k/100 with |value| <= 1e9; lists include NULLs
_cents = st.integers(min_value=-(10**11), max_value=10**11)
_money = _cents.map(lambda k: k / 100.0)
_money_or_null = st.one_of(st.none(), _money)
_money_lists = st.lists(_money_or_null, min_size=1, max_size=25)
# pair lists for the product shape: price * (1 - discount/100)
_pairs = st.lists(
    st.tuples(_money, st.integers(min_value=0, max_value=100)),
    min_size=1,
    max_size=20,
)


def _spark_vals_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "x double")


def _duck_vals_rel(vals):
    rows = ", ".join(f"({'NULL' if v is None else repr(v)})" for v in vals)
    return f"(VALUES {rows}) AS t(x)"


def _bits(x):
    import struct

    return None if x is None else struct.pack("<d", x)


@settings(max_examples=20, deadline=None)
@given(vals=_money_lists)
def test_dsum_bitwise_matches_duckdb(spark, duck, vals):
    from datafusion_wasm_bindings_spark.queries._util import dsum

    from pyspark.sql import functions as F

    s = _spark_vals_df(spark, vals).agg(dsum(F.col("x"), "s")).collect()[0]["s"]
    d = duck.sql(
        f"SELECT CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s FROM {_duck_vals_rel(vals)}"
    ).fetchone()[0]
    assert _bits(s) == _bits(d), (vals, s, d)


@settings(max_examples=15, deadline=None)
@given(vals=_money_lists, seed=st.integers(min_value=0, max_value=2**31))
def test_dsum_order_and_partitioning_independent(spark, vals, seed):
    import random

    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.queries._util import dsum

    base = _spark_vals_df(spark, vals).agg(dsum(F.col("x"), "s")).collect()[0]["s"]
    shuffled = list(vals)
    random.Random(seed).shuffle(shuffled)
    for n_parts in (1, 3, 7):
        again = (
            _spark_vals_df(spark, shuffled)
            .repartition(n_parts)
            .agg(dsum(F.col("x"), "s"))
            .collect()[0]["s"]
        )
        assert _bits(base) == _bits(again), (vals, n_parts, base, again)


@settings(max_examples=20, deadline=None)
@given(vals=_money_lists)
def test_davg_bitwise_matches_duckdb(spark, duck, vals):
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.queries._util import davg

    s = _spark_vals_df(spark, vals).agg(davg(F.col("x"), "a")).collect()[0]["a"]
    d = duck.sql(
        f"SELECT CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(1) AS a "
        f"FROM {_duck_vals_rel(vals)}"
    ).fetchone()[0]
    # COUNT(1) counts rows (not non-null x) identically on both sides;
    # all-NULL input gives NULL/NaN-free None on both
    if s is None or d is None or (isinstance(d, float) and math.isnan(d)):
        assert (s is None or math.isnan(s)) == (
            d is None or (isinstance(d, float) and math.isnan(d))
        ), (vals, s, d)
    else:
        assert _bits(s) == _bits(d), (vals, s, d)


@settings(max_examples=15, deadline=None)
@given(pairs=_pairs)
def test_dsum_of_product_terms_matches_duckdb(spark, duck, pairs):
    """The flagship shape: per-row price * (1 - discount) in raw double
    arithmetic, then the decimal sum — per-row IEEE products are
    bit-identical cross-engine, and at <= 4 decimals the cast is exact."""
    from pyspark.sql import functions as F

    from datafusion_wasm_bindings_spark.queries._util import dsum

    sdf = spark.createDataFrame(
        [(p, d / 100.0) for p, d in pairs], "price double, disc double"
    )
    s = (
        sdf.agg(dsum(F.col("price") * (F.lit(1) - F.col("disc")), "s"))
        .collect()[0]["s"]
    )
    rows = ", ".join(f"({repr(p)}, {repr(d / 100.0)})" for p, d in pairs)
    dd = duck.sql(
        "SELECT CAST(SUM(CAST(price * (1 - disc) AS DECIMAL(18,6))) AS DOUBLE) AS s "
        f"FROM (VALUES {rows}) AS t(price, disc)"
    ).fetchone()[0]
    assert _bits(s) == _bits(dd), (pairs, s, dd)
