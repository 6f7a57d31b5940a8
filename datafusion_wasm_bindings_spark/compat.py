"""SQL dialect compatibility rewrites — SURVEY.md §7.0 `compat.py`.

The reference accepts DataFusion's Postgres-flavored SQL
(sqlparser 0.53 generic dialect, Cargo.lock:2734). Spark SQL covers
almost all of it natively; the residue is handled here as text-level
rewrites applied by ``SQLEngine`` before ``spark.sql``:

- ``expr SIMILAR TO 'pat'``  → ``expr RLIKE '^(pat translated)$'``
  (SQL92 pattern language: % → .*, _ → .; bracket classes and (|)
  pass through, which matches DataFusion's own translation).
- ``arrow_cast(x, 'Int64')`` → ``CAST(x AS BIGINT)`` with the Arrow
  type-name table from SURVEY §1.1.
- ``information_schema.tables/columns`` → the emulated temp views
  (sources/infoschema.py) — Spark temp views cannot live in a dotted
  schema, so the reference's relation names are flattened.

These are regex rewrites over statements our engine dispatches — not
a general SQL parser; patterns inside string literals are protected by
masking literals first.
"""

from __future__ import annotations

import re

# Arrow type name (DataFusion arrow_cast vocabulary) → Spark SQL type.
# Unsigned widths widen per SURVEY §1.1 (UInt64 → DECIMAL(20,0)).
ARROW_TO_SPARK_TYPE = {
    "Boolean": "BOOLEAN",
    "Int8": "TINYINT",
    "Int16": "SMALLINT",
    "Int32": "INT",
    "Int64": "BIGINT",
    "UInt8": "SMALLINT",
    "UInt16": "INT",
    "UInt32": "BIGINT",
    "UInt64": "DECIMAL(20,0)",
    "Float16": "FLOAT",
    "Float32": "FLOAT",
    "Float64": "DOUBLE",
    "Utf8": "STRING",
    "LargeUtf8": "STRING",
    "Utf8View": "STRING",
    "Binary": "BINARY",
    "LargeBinary": "BINARY",
    "Date32": "DATE",
    "Date64": "DATE",
}


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace 'string literals' with placeholders so rewrites never
    touch literal contents."""
    literals: list[str] = []

    def repl(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00L{len(literals) - 1}\x00"

    masked = re.sub(r"'(?:[^']|'')*'", repl, sql)
    return masked, literals


def _unmask(sql: str, literals: list[str]) -> str:
    for i, lit in enumerate(literals):
        sql = sql.replace(f"\x00L{i}\x00", lit)
    return sql


def similar_to_regex(pattern: str) -> str:
    """SQL92 SIMILAR TO pattern → anchored Java regex (DataFusion does
    the same % / _ translation; (), |, [] and quantifiers keep their
    regex meaning in SIMILAR TO by spec)."""
    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(ch)
    return "^(?:" + "".join(out) + ")$"


_SIMILAR_RE = re.compile(
    r"(?P<not>NOT\s+)?SIMILAR\s+TO\s+(?P<lit>\x00L(?P<idx>\d+)\x00)", re.IGNORECASE
)
_ARROW_CAST_RE = re.compile(
    r"arrow_cast\s*\(\s*(?P<expr>[^,()]+(?:\([^()]*\))?[^,()]*)\s*,\s*\x00L(?P<idx>\d+)\x00\s*\)",
    re.IGNORECASE,
)
_INFO_SCHEMA_RE = re.compile(r"\binformation_schema\.(tables|columns)\b", re.IGNORECASE)


def rewrite(sql: str) -> str:
    """Apply all dialect rewrites to one statement."""
    masked, lits = _mask_literals(sql)

    def similar_repl(m: re.Match) -> str:
        idx = int(m.group("idx"))
        pat = lits[idx][1:-1].replace("''", "'")
        lits[idx] = "'" + similar_to_regex(pat).replace("'", "''") + "'"
        op = "NOT RLIKE" if m.group("not") else "RLIKE"
        return f"{op} \x00L{idx}\x00"

    masked = _SIMILAR_RE.sub(similar_repl, masked)

    def cast_repl(m: re.Match) -> str:
        idx = int(m.group("idx"))
        type_name = lits[idx][1:-1]
        spark_type = ARROW_TO_SPARK_TYPE.get(type_name)
        if spark_type is None:
            # Timestamp(Microsecond, None)-style names
            if type_name.startswith("Timestamp"):
                spark_type = "TIMESTAMP"
            elif type_name.startswith("Decimal128"):
                inner = type_name[type_name.index("(") + 1 : type_name.rindex(")")]
                spark_type = f"DECIMAL({inner})"
            else:
                raise ValueError(f"arrow_cast: unsupported Arrow type {type_name!r}")
        lits[idx] = ""  # consumed
        return f"CAST({m.group('expr').strip()} AS {spark_type})"

    masked = _ARROW_CAST_RE.sub(cast_repl, masked)
    # arrow_typeof(x) → Spark's typeof(x). Type *names* differ (Arrow
    # "Int32" vs Spark "int") — documented approximation: the callable
    # works, the spelling is the host engine's, exactly as DataFusion
    # reports its own engine's names.
    masked = re.sub(r"\barrow_typeof\s*\(", "typeof(", masked, flags=re.IGNORECASE)
    masked = _INFO_SCHEMA_RE.sub(lambda m: f"information_schema_{m.group(1).lower()}", masked)
    return _unmask(masked, lits)


def needs_information_schema(sql: str) -> bool:
    return bool(_INFO_SCHEMA_RE.search(_mask_literals(sql)[0]))
