"""Oracle-differential test over the whole query registry — the local
replica of the driver's t2 gate (row count + schema + order-insensitive
values vs DuckDB on the same parquet), at sf0.001 for speed.

Every SURVEY.md §2 query id that lands in the registry is checked here
automatically; rows-only queries (oracle=None) are smoke-run instead.
"""

from __future__ import annotations

import pytest

from datafusion_wasm_bindings_spark.queries import load_all, resolve_oracle
from tests.conftest import assert_oracle_match

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.spark_fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only: smoke-run, assert deterministic schema and >= 0 rows
        assert df.columns, f"{name}: no columns"
        df.collect()
        return
    rel = duck.sql(resolve_oracle(spec.oracle, sf_dir))
    assert_oracle_match(df, rel, name)
