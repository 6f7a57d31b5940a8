"""Port of the reference's only unit tests (src/result_format.rs:52-98):
the Alice/Bob/Charlie fixture formatted as a pretty table and as JSON.
Assertions replicate result_format.rs:75-85 (table) and :87-97 (JSON).
"""

from __future__ import annotations

import json

import pytest

from datafusion_wasm_bindings_spark.formats import (
    ResultFormat,
    format_json,
    format_result,
    format_table,
)


@pytest.fixture(scope="module")
def fixture_df(spark):
    # reference fixture: id Int32 non-null, name Utf8 non-null
    # (src/result_format.rs:59-73)
    return spark.createDataFrame(
        [(1, "Alice"), (2, "Bob"), (3, "Charlie")], "id int, name string"
    )


def test_table_format(fixture_df):
    out = format_table(fixture_df)
    # result_format.rs:80-84: headers and all three names present
    assert "id" in out and "name" in out
    for val in ("1", "Alice", "2", "Bob", "3", "Charlie"):
        assert val in out
    # arrow-style box borders
    assert out.startswith("+") and out.strip().endswith("+")
    assert out.count("|") >= 8


def test_json_format(fixture_df):
    out = format_json(fixture_df)
    # result_format.rs:92-96: keys and values present
    assert '"id":' in out and '"name":' in out
    for val in ("Alice", "Bob", "Charlie"):
        assert val in out
    rows = json.loads(out)
    assert rows == [
        {"id": 1, "name": "Alice"},
        {"id": 2, "name": "Bob"},
        {"id": 3, "name": "Charlie"},
    ]


def test_format_result_honors_switch(fixture_df):
    # SURVEY.md §0 quirk 1: reference ignores the format switch; we honor it
    assert format_result(fixture_df, ResultFormat.JSON).startswith("[")
    assert format_result(fixture_df, ResultFormat.TABLE).startswith("+")


def test_null_rendering(spark):
    df = spark.createDataFrame([(1, None)], "id int, name string")
    out = format_table(df)
    lines = out.splitlines()
    assert lines[3].startswith("| 1")
