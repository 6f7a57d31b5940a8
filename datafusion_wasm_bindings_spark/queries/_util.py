"""Shared helpers for oracle-checked queries.

Cross-engine float determinism (FIXTURES.md determinism rules):
summing doubles is order-dependent, and Spark's shuffled partial
aggregation will not visit rows in DuckDB's scan order. Convention:

1. compute the per-row expression in pure DOUBLE arithmetic — IEEE 754
   ops on the same inputs produce bit-identical doubles in any engine;
2. cast the per-row double ONCE to DECIMAL(18,6). A double essentially
   never lands on an exact .xxxxxx5 midpoint (decimal midpoints at
   scale >= 1 are not binary fractions), so HALF_UP (Spark) and
   round-to-nearest (DuckDB) agree;
3. SUM the decimals — exact, order-independent in both engines;
4. cast the total back to DOUBLE — correctly-rounded conversion of the
   same decimal value on both sides.

``dsum``/``dsum_sql`` encode this; ``davg``/``davg_sql`` divide the
exact sum by COUNT the same way on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(expr: Column, alias: str) -> Column:
    """Order-independent SUM of a double expression (see module doc)."""
    return F.sum(expr.cast(DEC)).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided as doubles."""
    return (F.sum(expr.cast(DEC)).cast("double") / F.count(F.lit(1))).alias(alias)


def dsum_sql(expr_sql: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr_sql} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def davg_sql(expr_sql: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr_sql} AS DECIMAL(18,6))) AS DOUBLE) / COUNT(1) AS {alias}"


def nsjoin(fact, stats, on: list[str] | str, *, how: str = "inner", broadcast: bool = True):
    """NULL-safe group-stats join-back (ADVICE r4 / the zscore class).

    The window→aggregate+join rewrite family attaches a per-GROUP stat
    table back onto its fact. groupBy and PARTITION BY both keep NULL
    as its own group, but a plain equi-join drops NULL-keyed rows —
    silently diverging from the window oracle the rewrite must match.
    This helper joins with ``eqNullSafe`` on every key, keeps the fact
    side's key columns, and drops the renamed stats-side keys; column
    order is fact columns then stats non-key columns, the same as
    Spark's USING-join layout."""
    keys = [on] if isinstance(on, str) else list(on)
    renamed = stats
    for i, k in enumerate(keys):
        renamed = renamed.withColumnRenamed(k, f"__nsk{i}")
    if broadcast:
        renamed = F.broadcast(renamed)
    cond = None
    for i, k in enumerate(keys):
        c = fact[k].eqNullSafe(F.col(f"__nsk{i}"))
        cond = c if cond is None else (cond & c)
    return fact.join(renamed, cond, how).drop(*[f"__nsk{i}" for i in range(len(keys))])
