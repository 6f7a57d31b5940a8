"""Property tests pinning the repo's ARRAY oracle-writing conventions
(CLAUDE.md r3 pitfalls) so future oracle authors regress loudly:

- pitfall (b): DuckDB stringifies EMPTY lists to NULL through
  array_to_string(list_filter(...)) — oracles must COALESCE(..., '')
  to match Spark's concat_ws('') on the same empty array;
- HOF transform/filter lambdas over the dialect intersection must
  agree element-for-element (they sit OUTSIDE codegen subexpression
  elimination on the Spark side, so they're also the place where an
  inlined expensive expression silently re-runs — the convention is to
  materialize first; semantics equality is what this fuzz checks);
- sequence()/generate_series() reversed-bounds divergence documented:
  Spark sequence(a, b) with a > b steps DOWNWARD, DuckDB
  generate_series(a, b) is EMPTY — oracles must guard bounds.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

_small_int = st.integers(min_value=-20, max_value=20)
_int_list = st.lists(_small_int, min_size=0, max_size=8)


def _array_sql(xs):
    spark = "array(" + ", ".join(str(x) for x in xs) + ")"
    duck = "[" + ", ".join(str(x) for x in xs) + "]"
    return spark, duck


@settings(max_examples=30, deadline=None)
@given(xs=_int_list, m=st.integers(min_value=1, max_value=5))
def test_filtered_list_stringification_convention(spark, duck, xs, m):
    sarr, darr = _array_sql(xs)
    s = spark.sql(
        f"SELECT concat_ws(',', filter({sarr}, x -> x % {m} = 0)) AS s"
    ).collect()[0]["s"]
    d = duck.sql(
        f"SELECT COALESCE(array_to_string(list_filter({darr}, x -> x % {m} = 0), ','), '') AS s"
    ).fetchone()[0]
    assert s == d, (xs, m, s, d)
    # and WITHOUT the COALESCE, an empty filter result diverges (NULL
    # vs '') — the raw form must stay banned in oracles
    d_raw = duck.sql(
        f"SELECT array_to_string(list_filter({darr}, x -> x % {m} = 0), ',') AS s"
    ).fetchone()[0]
    if not [x for x in xs if x % m == 0]:
        assert d_raw is None and s == "", (xs, m)


@settings(max_examples=30, deadline=None)
@given(xs=_int_list, k=_small_int)
def test_hof_transform_agree(spark, duck, xs, k):
    sarr, darr = _array_sql(xs)
    s = spark.sql(
        f"SELECT concat_ws(',', transform({sarr}, x -> x * {k} + 1)) AS s"
    ).collect()[0]["s"]
    d = duck.sql(
        f"SELECT COALESCE(array_to_string(list_transform({darr}, x -> x * {k} + 1), ','), '') AS s"
    ).fetchone()[0]
    assert s == d, (xs, k, s, d)


@settings(max_examples=30, deadline=None)
@given(xs=st.lists(_small_int, min_size=1, max_size=8))
def test_hof_aggregate_reduce_agree(spark, duck, xs):
    sarr, darr = _array_sql(xs)
    s = spark.sql(
        f"SELECT aggregate({sarr}, 0L, (a, x) -> a + x) AS s"
    ).collect()[0]["s"]
    d = duck.sql(
        f"SELECT list_reduce(list_prepend(CAST(0 AS BIGINT), {darr}), (a, x) -> a + x) AS s"
    ).fetchone()[0]
    assert s == d == sum(xs), (xs, s, d)


@settings(max_examples=25, deadline=None)
@given(a=st.integers(min_value=-5, max_value=5), b=st.integers(min_value=-5, max_value=5))
def test_sequence_reversed_bounds_divergence_documented(spark, duck, a, b):
    s_rows = spark.sql(
        f"SELECT explode(sequence({a}, {b})) AS v"
    ).collect()
    d_rows = duck.sql(f"SELECT unnest(generate_series({a}, {b})) AS v").fetchall()
    if a <= b:
        assert [r["v"] for r in s_rows] == [r[0] for r in d_rows] == list(range(a, b + 1))
    else:
        # Spark steps DOWNWARD, DuckDB returns empty — any oracle pair
        # using sequence over data-driven bounds must pre-guard lo <= hi
        assert [r["v"] for r in s_rows] == list(range(a, b - 1, -1))
        assert d_rows == []
