"""Engine error hierarchy.

Mirrors the reference's error surface (src/error.rs:23-43), where
DataFusion parse/plan/execution errors become a single JS exception
string. We keep the three phases as distinct Python exception types so
callers can discriminate, while ``str(exc)`` stays a single message —
the evident intent of the reference's design.
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class for all engine errors (reference src/error.rs:23)."""


class ParseError(EngineError):
    """SQL text could not be parsed (reference: DataFusionError::SQL)."""


class PlanError(EngineError):
    """Statement parsed but could not be planned — unknown table,
    unresolved column, type mismatch (reference: DataFusionError::Plan)."""


class ExecutionError(EngineError):
    """Runtime failure while executing a plan (reference:
    DataFusionError::Execution / ArrowError)."""


def classify_spark_error(exc: Exception) -> EngineError:
    """Map a raised PySpark exception onto the engine hierarchy."""
    try:
        from pyspark.errors import ParseException, AnalysisException
    except ImportError:  # pragma: no cover - pyspark always present here
        return ExecutionError(str(exc))
    if isinstance(exc, ParseException):
        return ParseError(str(exc))
    if isinstance(exc, AnalysisException):
        return PlanError(str(exc))
    return ExecutionError(str(exc))
