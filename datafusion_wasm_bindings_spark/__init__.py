"""PySpark-native analytics engine with the query and data-processing
capabilities of ``datafusion-contrib/datafusion-wasm-bindings``.

The reference (read-only at /root/reference) is an 846-line Rust WASM
binding embedding Apache DataFusion 45: a SQL string in, a formatted
result string out, over Parquet/CSV/JSON on S3/HTTP or in-memory
tables (reference: src/core.rs:34-99). This package re-expresses that
whole surface Spark-first:

- :class:`SQLEngine` mirrors ``DataFusionContext`` 1:1
  (``new / execute_sql / set_s3_config / set_result_format / greet``,
  reference src/core.rs:43-98) over a lazily built ``SparkSession``.
- ``queries/`` holds the oracle-checked operator inventory
  (SURVEY.md §2), each expressed with the DataFrame/SQL API so
  Catalyst owns the physical strategy.
- ``operators/`` holds the large-scale-pipeline extensions
  (dedup, similarity search, text analysis, multimodal columns).

Everything uses public PySpark APIs only; no JVM extensions, no custom
Catalyst rules (SURVEY.md §4 net assessment).
"""

from __future__ import annotations

__version__ = "0.1.0"

from datafusion_wasm_bindings_spark.engine import SQLEngine, ResultFormat
from datafusion_wasm_bindings_spark.errors import (
    EngineError,
    ParseError,
    PlanError,
    ExecutionError,
)

__all__ = [
    "SQLEngine",
    "ResultFormat",
    "EngineError",
    "ParseError",
    "PlanError",
    "ExecutionError",
    "__version__",
]
