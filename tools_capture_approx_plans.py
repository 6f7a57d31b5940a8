"""One-off: capture plans/r12 before/after explain('formatted') for the
two approx-percentile queries rewritten in 06077d5 (SQL -> DataFrame
over a parallel scan). 'Before' replays the pre-commit SQL text via
spark.sql over the registered views; 'after' runs the current registry
function. Plan-only — nothing is executed."""

import os
import subprocess

from datafusion_wasm_bindings_spark import session
from datafusion_wasm_bindings_spark.queries import load_all
from datafusion_wasm_bindings_spark.sources.catalog import register_tables

REGISTRY = load_all()

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
IDS = ("q_fn_approx_median", "q_fn_approx_percentile")


def old_sql_texts():
    src = subprocess.run(
        ["git", "show", "06077d5^:datafusion_wasm_bindings_spark/queries/functions_agg.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    out = {}
    for qid in IDS:
        i = src.index(f'"{qid}"')
        start = src.index('"""', i) + 3
        end = src.index('"""', start)
        out[qid] = src[start:end]
    return out


def main():
    spark = session.get_spark()
    register_tables(spark, SF_DIR)
    olds = old_sql_texts()
    os.makedirs("plans/r12", exist_ok=True)
    for qid in IDS:
        before = spark.sql(olds[qid])._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        after = REGISTRY[qid].spark_fn(spark, SF_DIR)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(f"plans/r12/{qid}_before.txt", "w") as f:
            f.write(before)
        with open(f"plans/r12/{qid}_after.txt", "w") as f:
            f.write(after)
        print(qid, "captured", len(before), len(after))


if __name__ == "__main__":
    main()
