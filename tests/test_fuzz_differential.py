"""Differential expression fuzzing: random scalar-expression trees run
through Spark SQL and DuckDB over the same inline relation must agree.

This mirrors how the reference's engine is itself validated upstream
(sqllogictest corpora, SURVEY.md §5) — generative differential testing
against an independent implementation. The grammar is restricted to
the dialect intersection with identical semantics in both engines:
small-integer arithmetic (no division — dialects differ, SURVEY §1.1),
three-valued boolean logic, comparisons, CASE, COALESCE/NULLIF,
ABS/LEAST/GREATEST. Every generated query exercises Catalyst's
constant folding, predicate simplification, and null propagation.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

# inline fixture: three int columns with NULLs, small values so any
# expression tree of depth <= 3 stays far from 64-bit overflow
VALUES_SQL = (
    "(VALUES (1, 2, 3), (4, NULL, 6), (NULL, NULL, 9), (-7, 8, 0), "
    "(10, -11, NULL), (0, 0, 0)) AS t(a, b, c)"
)

_leaf = st.sampled_from(["a", "b", "c", "0", "1", "-3", "42", "NULL"])


def _int_expr(depth: int):
    if depth <= 0:
        return _leaf
    sub = st.deferred(lambda: _int_expr(depth - 1))
    return st.one_of(
        _leaf,
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"NULLIF({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
        sub.map(lambda e: f"ABS({e})"),
        st.tuples(sub, st.sampled_from(["<", "<=", "=", ">", ">="]), sub, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} {t[1]} {t[2]} THEN {t[3]} ELSE {t[4]} END)"
        ),
    )


def _bool_expr(depth: int):
    num = _int_expr(depth - 1)
    cmp = st.tuples(num, st.sampled_from(["<", "<=", "=", "<>", ">", ">="]), num).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    )
    if depth <= 1:
        return cmp
    sub = st.deferred(lambda: _bool_expr(depth - 1))
    return st.one_of(
        cmp,
        st.tuples(sub, st.sampled_from(["AND", "OR"]), sub).map(
            lambda t: f"({t[0]} {t[1]} {t[2]})"
        ),
        sub.map(lambda e: f"(NOT {e})"),
        _int_expr(depth - 1).map(lambda e: f"({e} IS NULL)"),
    )


def _run_both(spark, duck, select_expr: str, where: str | None = None, relation: str | None = None):
    sql = f"SELECT {select_expr} AS r FROM {relation or VALUES_SQL}"
    if where:
        sql += f" WHERE {where}"
    got = sorted(
        [("NULL" if row.r is None else row.r) for row in spark.sql(sql).collect()], key=str
    )
    want = sorted(
        [("NULL" if v is None else v) for (v,) in duck.sql(sql).fetchall()], key=str
    )
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=40, deadline=None)
@given(expr=_int_expr(3))
def test_scalar_expressions_agree(spark, duck, expr):
    _run_both(spark, duck, expr)


@settings(max_examples=40, deadline=None)
@given(pred=_bool_expr(2))
def test_predicates_agree(spark, duck, pred):
    # as a projected boolean AND as a WHERE filter (three-valued logic:
    # NULL predicate keeps the row out of the filter but shows as NULL
    # in the projection — both engines must agree on both paths)
    _run_both(spark, duck, f"({pred}) IS TRUE")
    _run_both(spark, duck, "1", where=pred)


# --- string expression grammar (dialect-intersection semantics) -------

STR_VALUES_SQL = (
    "(VALUES ('abc', 'x'), ('', 'yz'), (NULL, 'abc'), ('Hello World', NULL), "
    "('aaa', 'a'), ('MiXeD', 'mIxEd')) AS t(s, u)"
)

_str_leaf = st.sampled_from(["s", "u", "''", "'ab'", "'Z'", "NULL"])


def _str_expr(depth: int):
    if depth <= 0:
        return _str_leaf
    sub = st.deferred(lambda: _str_expr(depth - 1))
    return st.one_of(
        _str_leaf,
        # CONCAT is NOT in the dialect intersection bare: Spark
        # null-propagates, DuckDB (Postgres-style, like DataFusion)
        # skips NULL args — so the grammar only emits the COALESCE'd
        # form. The engine-level name shim documents the same gap.
        st.tuples(sub, sub).map(
            lambda t: f"CONCAT(COALESCE({t[0]}, ''), COALESCE({t[1]}, ''))"
        ),
        sub.map(lambda e: f"UPPER({e})"),
        sub.map(lambda e: f"LOWER({e})"),
        sub.map(lambda e: f"TRIM({e})"),
        sub.map(lambda e: f"REVERSE({e})"),
        st.tuples(sub, st.integers(1, 4), st.integers(0, 4)).map(
            lambda t: f"SUBSTR({t[0]}, {t[1]}, {t[2]})"
        ),
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
    )


@settings(max_examples=30, deadline=None)
@given(expr=_str_expr(3))
def test_string_expressions_agree(spark, duck, expr):
    _run_both(spark, duck, expr, relation=STR_VALUES_SQL)


@settings(max_examples=20, deadline=None)
@given(expr=_str_expr(2))
def test_string_lengths_and_predicates_agree(spark, duck, expr):
    _run_both(spark, duck, f"LENGTH({expr})", relation=STR_VALUES_SQL)
    sql = f"SELECT COUNT(1) AS n FROM {STR_VALUES_SQL.replace('t(s, u)', 'q(s, u)')} WHERE {expr} = s"
    got = [r.n for r in spark.sql(sql).collect()]
    want = [v for (v,) in duck.sql(sql).fetchall()]
    assert got == want, sql


@settings(max_examples=20, deadline=None)
@given(expr=_int_expr(2), pred=_bool_expr(2))
def test_aggregates_over_fuzzed_exprs_agree(spark, duck, expr, pred):
    sql = (
        f"SELECT COUNT(*) AS n, SUM({expr}) AS s, MIN({expr}) AS lo, MAX({expr}) AS hi "
        f"FROM {VALUES_SQL} WHERE {pred}"
    )
    got = [tuple(r) for r in spark.sql(sql).collect()]
    want = [tuple(int(v) if v is not None else None for v in r) for r in duck.sql(sql).fetchall()]
    norm = lambda rows: [tuple(None if v is None else int(v) for v in r) for r in rows]
    assert norm(got) == norm(want), sql


# --- datetime expression grammar (dialect-intersection semantics) ------

DT_VALUES_SQL = (
    "(VALUES (DATE '2024-01-31', DATE '2024-03-01'), "
    "(DATE '1999-12-31', NULL), (NULL, DATE '2000-02-29'), "
    "(DATE '2024-02-29', DATE '2024-02-28')) AS t(d, e)"
)

# typed NULL: DuckDB cannot bind EXTRACT/date functions on an untyped
# NULL literal (binder ambiguity, not a semantic difference)
_dt_leaf = st.sampled_from(["d", "e", "DATE '2020-06-15'", "CAST(NULL AS DATE)"])


def _date_expr(depth: int):
    if depth <= 0:
        return _dt_leaf
    sub = st.deferred(lambda: _date_expr(depth - 1))
    return st.one_of(
        _dt_leaf,
        st.tuples(sub, sub).map(lambda t: f"COALESCE({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"LEAST({t[0]}, {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"GREATEST({t[0]}, {t[1]})"),
        sub.map(lambda e: f"LAST_DAY({e})"),
        st.tuples(sub, st.sampled_from(["<", "=", ">"]), sub, sub, sub).map(
            lambda t: f"(CASE WHEN {t[0]} {t[1]} {t[2]} THEN {t[3]} ELSE {t[4]} END)"
        ),
    )


@settings(max_examples=30, deadline=None)
@given(expr=_date_expr(3), part=st.sampled_from(["YEAR", "MONTH", "DAY"]))
def test_datetime_expressions_agree(spark, duck, expr, part):
    # surfaced as an int (EXTRACT) so normalization is engine-neutral
    _run_both(spark, duck, f"EXTRACT({part} FROM {expr})", relation=DT_VALUES_SQL)


@settings(max_examples=20, deadline=None)
@given(expr=_date_expr(2))
def test_datetime_predicates_agree(spark, duck, expr):
    _run_both(
        spark, duck, "1",
        where=f"{expr} >= DATE '2000-01-01'", relation=DT_VALUES_SQL,
    )


# --- join-shape grammar: random join type × random ON predicate --------

JOIN_A_SQL = (
    "(VALUES (1, 10), (2, 20), (3, NULL), (NULL, 40), (5, 50), (2, 21)) AS a(ak, av)"
)
JOIN_B_SQL = (
    "(VALUES (1, 'x'), (2, 'y'), (4, NULL), (NULL, 'z'), (2, 'w')) AS b(bk, bv)"
)

_join_type = st.sampled_from(["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"])
_on_extra = st.sampled_from(
    ["", " AND av > 15", " AND bv IS NOT NULL", " AND ak <> 2", " AND av + ak < 30"]
)


@settings(max_examples=40, deadline=None)
@given(jt=_join_type, extra=_on_extra)
def test_join_shapes_agree(spark, duck, jt, extra):
    # one synthetic value column encodes the full row, so the multiset
    # comparison covers padding-null semantics of every outer side
    sql = (
        "SELECT COALESCE(ak, -1) * 1000 + COALESCE(av, -1) * 10 "
        "+ COALESCE(LENGTH(bv), 5) AS r "
        f"FROM {JOIN_A_SQL} {jt} {JOIN_B_SQL} ON ak = bk{extra}"
    )
    got = sorted([row.r for row in spark.sql(sql).collect()], key=str)
    want = sorted([v for (v,) in duck.sql(sql).fetchall()], key=str)
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=25, deadline=None)
@given(jt=st.sampled_from(["LEFT SEMI JOIN", "LEFT ANTI JOIN"]), extra=_on_extra)
def test_semi_anti_join_shapes_agree(spark, duck, jt, extra):
    spark_sql = (
        f"SELECT COALESCE(ak, -1) * 100 + COALESCE(av, -1) AS r "
        f"FROM {JOIN_A_SQL} {jt} {JOIN_B_SQL} ON ak = bk{extra}"
    )
    # DuckDB spells semi/anti via EXISTS / NOT EXISTS
    exists = "EXISTS" if "SEMI" in jt else "NOT EXISTS"
    duck_sql = (
        f"SELECT COALESCE(ak, -1) * 100 + COALESCE(av, -1) AS r "
        f"FROM {JOIN_A_SQL} WHERE {exists} "
        f"(SELECT 1 FROM {JOIN_B_SQL} WHERE ak = bk{extra})"
    )
    got = sorted(row.r for row in spark.sql(spark_sql).collect())
    want = sorted(v for (v,) in duck.sql(duck_sql).fetchall())
    assert got == want, f"{spark_sql}\n vs {duck_sql}\n spark={got}\n duck={want}"


# --- window-function grammar: frames × functions × partitioning --------

WIN_VALUES_SQL = (
    "(VALUES (1, 1, 10), (2, 1, NULL), (3, 1, 30), (4, 2, 40), "
    "(5, 2, -5), (6, 2, 60), (7, 1, 0), (8, 2, 80)) AS t(id, g, v)"
)

_win_agg = st.sampled_from(["SUM(v)", "COUNT(v)", "MIN(v)", "MAX(v)", "AVG(v * 2)"])
_win_part = st.sampled_from(["", "PARTITION BY g "])
_win_frame = st.sampled_from(
    [
        "",  # default frame: RANGE UNBOUNDED PRECEDING..CURRENT ROW
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ]
)
_win_nav = st.sampled_from(
    ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "LAG(v)", "LEAD(v, 2)", "LAG(v, 1, -99)"]
)


@settings(max_examples=40, deadline=None)
@given(fn=_win_agg, part=_win_part, frame=_win_frame)
def test_window_aggregate_frames_agree(spark, duck, fn, part, frame):
    # ORDER BY the unique id → every frame content is deterministic
    over = f"{part}ORDER BY id ASC {frame}".strip()
    sql = (
        f"SELECT id, CAST({fn} OVER ({over}) AS DOUBLE) AS r "
        f"FROM {WIN_VALUES_SQL} ORDER BY id"
    )
    got = [row.r for row in spark.sql(sql).collect()]
    want = [float(v) if v is not None else None for (_, v) in duck.sql(sql).fetchall()]
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=30, deadline=None)
@given(fn=_win_nav, part=_win_part)
def test_window_navigation_agree(spark, duck, fn, part):
    sql = (
        f"SELECT id, {fn} OVER ({part}ORDER BY id ASC) AS r "
        f"FROM {WIN_VALUES_SQL} ORDER BY id"
    )
    got = [row.r for row in spark.sql(sql).collect()]
    want = [v for (_, v) in duck.sql(sql).fetchall()]
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


# --- grouped-aggregation grammar: GROUP BY x HAVING x grouping sets ----

_grp_key = st.sampled_from(["g", "g % 2", "COALESCE(g, -1)", "(CASE WHEN g > 1 THEN 1 ELSE 0 END)"])
_grp_agg = st.sampled_from(
    ["COUNT(*)", "COUNT(v)", "SUM(v)", "MIN(v)", "MAX(v)", "COUNT(DISTINCT v)", "SUM(v * v)"]
)
_grp_having = st.sampled_from(
    ["", " HAVING COUNT(*) > 1", " HAVING SUM(v) IS NOT NULL", " HAVING MIN(v) <= 20"]
)

GRP_VALUES_SQL = (
    "(VALUES (1, 10), (1, 20), (2, NULL), (2, 30), (NULL, 40), (3, NULL), "
    "(NULL, NULL), (3, 10)) AS t(g, v)"
)


@settings(max_examples=30, deadline=None)
@given(key=_grp_key, agg=_grp_agg, having=_grp_having)
def test_grouped_aggregates_agree(spark, duck, key, agg, having):
    sql = (
        f"SELECT {key} AS k, {agg} AS m FROM {GRP_VALUES_SQL} "
        f"GROUP BY {key}{having}"
    )
    norm = lambda rows: sorted(
        [tuple("N" if v is None else int(v) for v in r) for r in rows], key=str
    )
    got = norm([tuple(r) for r in spark.sql(sql).collect()])
    want = norm(duck.sql(sql).fetchall())
    assert got == want, sql


@settings(max_examples=15, deadline=None)
@given(agg=_grp_agg, form=st.sampled_from(["ROLLUP (g, h)", "CUBE (g, h)", "GROUPING SETS ((g), (h), ())"]))
def test_grouping_set_forms_agree(spark, duck, agg, form):
    rel = (
        "(VALUES (1, 'x', 10), (1, 'y', 20), (2, 'x', NULL), (NULL, 'y', 30), "
        "(2, NULL, 40)) AS t(g, h, v)"
    )
    sql = (
        f"SELECT g, h, {agg} AS m, GROUPING(g) AS gg, GROUPING(h) AS gh "
        f"FROM {rel} GROUP BY {form}"
    )
    norm = lambda rows: sorted(
        [tuple("N" if v is None else str(v) for v in r) for r in rows], key=str
    )
    got = norm([tuple(r) for r in spark.sql(sql).collect()])
    want = norm(duck.sql(sql).fetchall())
    assert got == want, sql


# --- set-operation grammar: UNION / INTERSECT / EXCEPT chains ----------

SET_A_SQL = "(VALUES (1), (2), (2), (3), (NULL)) AS a(x)"
SET_B_SQL = "(VALUES (2), (3), (3), (4), (NULL), (NULL)) AS b(x)"

_set_op = st.sampled_from(
    ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]
)


# --- correlated-subquery grammar: EXISTS / IN / scalar, null-rich ------
#
# The classic dialect-divergence area: three-valued NOT IN over NULLs,
# the COUNT(*) "count bug" in correlated scalar subqueries, non-equality
# correlation decorrelated into joins by both optimizers.

CORR_O_SQL = "(VALUES (1, 10), (2, NULL), (3, 30), (NULL, 40), (2, 21), (5, -5)) AS o(ok, ov)"
CORR_I_SQL = "(VALUES (1, 3), (2, 8), (4, NULL), (NULL, 7), (2, 1), (6, 2)) AS i(ik, iv)"

_corr_op = st.sampled_from(["=", "<", "<=", ">", ">=", "<>"])
_corr_extra = st.sampled_from(["", " AND iv IS NOT NULL", " AND iv > 2", " AND ik <> 2"])


@settings(max_examples=30, deadline=None)
@given(neg=st.sampled_from(["EXISTS", "NOT EXISTS"]), op=_corr_op, extra=_corr_extra)
def test_exists_subquery_shapes_agree(spark, duck, neg, op, extra):
    sub = f"(SELECT 1 FROM {CORR_I_SQL} WHERE ik {op} ok{extra})"
    sql = (
        "SELECT COALESCE(ok, -1) * 100 + COALESCE(ov, -2) AS r "
        f"FROM {CORR_O_SQL} WHERE {neg} {sub}"
    )
    got = sorted(row.r for row in spark.sql(sql).collect())
    # fuzzer finding (2026-08-13, DuckDB 1.0.0): DuckDB's WHERE-EXISTS
    # decorrelation keeps an outer row whose NULL correlation value
    # makes every inner predicate UNKNOWN (e.g. `ik <> ok` with
    # ok = NULL) — its own *projected* EXISTS evaluates the same
    # subquery correctly to FALSE, agreeing with Spark and the
    # standard. Oracle therefore uses the projected form.
    duck_sql = (
        "SELECT COALESCE(ok, -1) * 100 + COALESCE(ov, -2) AS r, "
        f"EXISTS {sub} AS e FROM {CORR_O_SQL}"
    )
    keep = neg == "EXISTS"
    want = sorted(r for (r, e) in duck.sql(duck_sql).fetchall() if bool(e) is keep)
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=30, deadline=None)
@given(
    neg=st.sampled_from(["IN", "NOT IN"]),
    inner=st.sampled_from(["ik", "iv", "ik + 1", "NULLIF(ik, 2)"]),
    extra=_corr_extra,
)
def test_in_subquery_shapes_agree(spark, duck, neg, inner, extra):
    # NOT IN over a list containing NULL must yield zero rows — the
    # three-valued-logic trap both engines must implement identically
    where = extra.removeprefix(" AND ") or "TRUE"
    sql = (
        "SELECT COALESCE(ok, -1) * 100 + COALESCE(ov, -2) AS r "
        f"FROM {CORR_O_SQL} WHERE ok {neg} "
        f"(SELECT {inner} FROM {CORR_I_SQL} WHERE {where})"
    )
    got = sorted(row.r for row in spark.sql(sql).collect())
    want = sorted(v for (v,) in duck.sql(sql).fetchall())
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=30, deadline=None)
@given(
    agg=st.sampled_from(["COUNT(*)", "COUNT(iv)", "MAX(iv)", "MIN(iv)", "SUM(iv)"]),
    op=st.sampled_from(["=", "<=", "<", ">"]),
)
def test_scalar_correlated_subqueries_agree(spark, duck, agg, op):
    # COUNT over an empty correlated group is 0, not NULL (the "count
    # bug" decorrelation must preserve); MAX/MIN/SUM are NULL
    sql = (
        "SELECT COALESCE(ok, -1) AS k, "
        f"CAST((SELECT {agg} FROM {CORR_I_SQL} WHERE ik {op} ok) AS DOUBLE) AS m "
        f"FROM {CORR_O_SQL}"
    )
    norm = lambda rows: sorted(
        [(k, None if m is None else float(m)) for (k, m) in rows], key=str
    )
    got = norm([tuple(r) for r in spark.sql(sql).collect()])
    want = norm(duck.sql(sql).fetchall())
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=20, deadline=None)
@given(op=_corr_op, extra=_corr_extra)
def test_correlated_in_subqueries_agree(spark, duck, op, extra):
    # correlation in the subquery filter AND membership on a computed
    # expression — decorrelates to a join with a non-trivial condition
    sql = (
        "SELECT COALESCE(ok, -1) * 100 + COALESCE(ov, -2) AS r "
        f"FROM {CORR_O_SQL} WHERE ov IN "
        f"(SELECT iv * 10 FROM {CORR_I_SQL} WHERE ik {op} ok{extra})"
    )
    got = sorted(row.r for row in spark.sql(sql).collect())
    want = sorted(v for (v,) in duck.sql(sql).fetchall())
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


@settings(max_examples=25, deadline=None)
@given(op1=_set_op, op2=_set_op)
def test_set_operation_chains_agree(spark, duck, op1, op2):
    # parenthesized left-assoc chain so both parsers bind identically
    sql = (
        f"SELECT * FROM ((SELECT x FROM {SET_A_SQL}) {op1} "
        f"(SELECT x FROM {SET_B_SQL})) s {op2} (SELECT x FROM {SET_A_SQL})"
    )
    norm = lambda rows: sorted(("N" if r[0] is None else int(r[0]) for r in rows), key=str)
    got = norm([tuple(r) for r in spark.sql(sql).collect()])
    want = norm(duck.sql(sql).fetchall())
    assert got == want, sql


# --- cast grammar (dialect intersection + documented divergences) -----
#
# Exploration findings (2026-08-13, Spark 4.1.2 vs DuckDB):
#   1. CAST(double AS INT/BIGINT): Spark TRUNCATES toward zero, DuckDB
#      rounds half-even (1.5 -> 1 vs 2). DataFusion (Arrow cast) also
#      truncates, so Spark matches the reference; oracle queries must
#      write CAST(ROUND(x) AS BIGINT) (half-away in BOTH engines) or
#      FLOOR/CEILING when an integer result is compared.
#   2. TRY_CAST(string AS INT/BIGINT): Spark accepts only integer-shaped
#      strings (sign + digits + surrounding spaces); DuckDB additionally
#      parses decimal/scientific/hex forms ('1.5'->2, '1e2'->100,
#      '0x1A'->26). Intersection grammar: integer-shaped only.
#   3. TRY_CAST(string AS DATE): both accept ISO y-m-d with or without
#      zero padding and surrounding spaces, and agree on invalid
#      calendar dates (NULL); DuckDB additionally accepts '2020/01/02'.
#   4. TRY_CAST(string AS BOOLEAN): Spark accepts 'yes'/'no'/'y'/'n',
#      DuckDB does not; 't'/'f'/'true'/'false'/'0'/'1' agree.
#   5. High-precision DECIMAL literal -> DOUBLE: DuckDB converts via
#      double arithmetic (unscaled_int * 10^-scale) and can land 1 ulp
#      off the correctly-rounded value (900719.9999999999 becomes
#      exactly 900720.0); Spark is correctly rounded. STRING -> DOUBLE
#      parses correctly rounded in BOTH — so fuzzers (and oracle
#      queries needing exact doubles) inject doubles as string casts.
#   6. TRY_CAST(string AS DATE) with a year under 4 digits: DuckDB
#      parses '1-1-1', Spark requires >= 4-digit-ish years (NULL).
# The fuzzers below stay inside the intersection; the divergences are
# pinned by test_cast_divergences_documented so a Spark upgrade that
# silently changes policy fails loudly.

_ONE_ROW = "(VALUES (1)) AS t(one)"

_int_shaped = st.tuples(
    st.sampled_from(["", " ", "  "]),
    st.sampled_from(["", "+", "-"]),
    st.integers(0, 10**12).map(str),
    st.sampled_from(["", " "]),
).map(lambda t: "".join(t))

# no digits => unparseable as a number in both engines (BIGINT target)
# — EXCEPT the sign-then-whitespace class (divergence pinned below)
import re as _re

_SIGN_WS = _re.compile(r"^\s*[-+]\s+$")
_garbage = st.text(alphabet="abcxyz_ .-+", min_size=1, max_size=8).filter(
    lambda s: not _SIGN_WS.match(s)
)


@settings(max_examples=30, deadline=None)
@given(s=st.one_of(_int_shaped, _garbage))
def test_try_cast_string_to_bigint_agree(spark, duck, s):
    lit = s.replace("'", "''")
    _run_both(spark, duck, f"TRY_CAST('{lit}' AS BIGINT)", relation=_ONE_ROW)


def test_try_cast_sign_whitespace_divergence_documented(spark, duck):
    """DOCUMENTED divergence (hypothesis find, r7): DuckDB's integer
    parser accepts a bare sign followed by only whitespace and yields
    **0** (TRY_CAST('- ' AS BIGINT) = 0 — the sign is consumed, the
    empty digit run defaults to zero), while a lone '-' without
    trailing whitespace is NULL; Spark returns NULL for the whole
    class. Consequence for oracle authors: a TRY_CAST over an
    arbitrary STRING column (numeric-suffix slices, hostile text) must
    not let a sign-then-whitespace value reach DuckDB's cast bare —
    strip/guard if the column can contain it. Pinned so an engine
    upgrade that changes either behavior surfaces loudly."""
    for s, spark_want, duck_want in (
        ("- ", None, 0),
        (" - ", None, 0),
        ("+ ", None, 0),
        ("-", None, None),  # no trailing whitespace: both NULL
    ):
        got_s = spark.sql(
            f"SELECT TRY_CAST('{s}' AS BIGINT) AS r"
        ).collect()[0].r
        got_d = duck.sql(f"SELECT TRY_CAST('{s}' AS BIGINT) AS r").fetchone()[0]
        assert got_s == spark_want, (s, got_s)
        assert got_d == duck_want, (s, got_d)


_float_shaped = st.tuples(
    st.sampled_from(["", "-"]),
    st.integers(0, 10**6).map(str),
    st.sampled_from(["", ".", ".5", ".25", ".0"]),
    st.sampled_from(["", "e2", "e-3", "E4"]),
).map(lambda t: "".join(t))


@settings(max_examples=30, deadline=None)
@given(s=_float_shaped)
def test_try_cast_string_to_double_agree(spark, duck, s):
    _run_both(spark, duck, f"TRY_CAST('{s}' AS DOUBLE)", relation=_ONE_ROW)


_bounded_double = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=30, deadline=None)
@given(x=_bounded_double)
def test_double_round_cast_recipe_agrees(spark, duck, x):
    # the portable double->integer recipe oracle queries must use
    # (ROUND is half-away-from-zero in both engines; bare CAST is not
    # portable, see divergence 1 above). Doubles enter as STRING casts
    # (divergence 5).
    _run_both(
        spark, duck, f"CAST(ROUND(CAST('{x!r}' AS DOUBLE)) AS BIGINT)", relation=_ONE_ROW
    )
    _run_both(spark, duck, f"CAST(FLOOR(CAST('{x!r}' AS DOUBLE)) AS BIGINT)", relation=_ONE_ROW)


@settings(max_examples=30, deadline=None)
@given(x=_bounded_double)
def test_double_to_decimal_and_string_agree(spark, duck, x):
    # double -> DECIMAL(18,2) rounds half-even in both engines; the
    # decimal's string form is then canonical in both
    _run_both(
        spark,
        duck,
        f"CAST(CAST(CAST('{x!r}' AS DOUBLE) AS DECIMAL(18,2)) AS STRING)",
        relation=_ONE_ROW,
    )


@settings(max_examples=30, deadline=None)
@given(x=_bounded_double)
def test_numeric_trunc_shim_agrees(spark, duck, x):
    # engine trunc(x) rewrite (compat.py) vs DuckDB's native trunc;
    # doubles enter as STRING casts (divergence 5)
    from datafusion_wasm_bindings_spark.compat import rewrite

    lit = f"CAST('{x!r}' AS DOUBLE)"
    expr = rewrite(f"SELECT trunc({lit}) AS r").split("SELECT ")[1].rsplit(" AS r")[0]
    got = spark.sql(f"SELECT {expr} AS r FROM {_ONE_ROW}").collect()[0].r
    want = duck.sql(f"SELECT trunc({lit}) AS r").fetchall()[0][0]
    assert got == want, f"trunc({x!r}): spark={got} duck={want}"


@settings(max_examples=30, deadline=None)
@given(
    y=st.integers(1000, 2400),
    mo=st.integers(0, 13),
    dy=st.integers(0, 32),
    pad=st.booleans(),
)
def test_try_cast_string_to_date_agree(spark, duck, y, mo, dy, pad):
    s = f"{y:04d}-{mo:02d}-{dy:02d}" if pad else f"{y}-{mo}-{dy}"
    _run_both(spark, duck, f"TRY_CAST('{s}' AS DATE)", relation=_ONE_ROW)


def test_cast_divergences_documented(spark, duck):
    """Pin the known cast-policy divergences so an engine upgrade that
    silently changes either side fails here first (SURVEY §1.1 lists
    the division/null-order analogues)."""
    # 1. double->int: Spark truncates (matches DataFusion/Arrow), DuckDB
    #    rounds half-even
    assert spark.sql("SELECT CAST(CAST(1.5 AS DOUBLE) AS INT) AS r").collect()[0].r == 1
    assert duck.sql("SELECT CAST(CAST(1.5 AS DOUBLE) AS INT) AS r").fetchall()[0][0] == 2
    # 2. decimal-shaped string->int: Spark NULL, DuckDB parses+rounds
    assert spark.sql("SELECT TRY_CAST('1.5' AS INT) AS r").collect()[0].r is None
    assert duck.sql("SELECT TRY_CAST('1.5' AS INT) AS r").fetchall()[0][0] == 2
    # 3. slash dates: Spark NULL, DuckDB parses
    assert spark.sql("SELECT TRY_CAST('2020/01/02' AS DATE) AS r").collect()[0].r is None
    assert duck.sql("SELECT TRY_CAST('2020/01/02' AS DATE) AS r").fetchall()[0][0] is not None
    # 4. 'yes' boolean: Spark parses, DuckDB NULL
    assert spark.sql("SELECT TRY_CAST('yes' AS BOOLEAN) AS r").collect()[0].r is True
    assert duck.sql("SELECT TRY_CAST('yes' AS BOOLEAN) AS r").fetchall()[0][0] is None
    # 5. high-precision decimal literal -> double: DuckDB lands 1 ulp
    #    off correctly-rounded; string -> double agrees in both
    q = "SELECT CAST(CAST(900719.9999999999 AS DOUBLE) AS STRING) AS r"
    assert spark.sql(q).collect()[0].r == "900719.9999999999"
    assert duck.sql(q).fetchall()[0][0] == "900720.0"
    q = "SELECT CAST(CAST('900719.9999999999' AS DOUBLE) AS STRING) AS r"
    assert spark.sql(q).collect()[0].r == "900719.9999999999"
    assert duck.sql(q).fetchall()[0][0] == "900719.9999999999"
    # 6. sub-4-digit years: DuckDB parses, Spark NULL
    assert spark.sql("SELECT TRY_CAST('1-1-1' AS DATE) AS r").collect()[0].r is None
    assert duck.sql("SELECT TRY_CAST('1-1-1' AS DATE) AS r").fetchall()[0][0] is not None


# --- ORDER BY / LIMIT / OFFSET grammar --------------------------------
#
# Explicit NULLS FIRST/LAST always (the oracle determinism recipe):
# the engines' DEFAULTS differ (SURVEY §1.1 — Spark ASC defaults to
# NULLS FIRST, DuckDB/Postgres/DataFusion to NULLS LAST), pinned below.
# Column `a` is unique in VALUES_SQL, so appending it as a tiebreak
# makes every generated ordering total and the row sequence comparable.

@settings(max_examples=25, deadline=None)
@given(
    key=_int_expr(2),
    d=st.sampled_from(["ASC", "DESC"]),
    nl=st.sampled_from([" NULLS FIRST", " NULLS LAST"]),
    lim=st.integers(0, 7),
    off=st.integers(0, 4),
)
def test_order_limit_offset_agree(spark, duck, key, d, nl, lim, off):
    # `0 + (key)`: when the generator draws a bare integer literal,
    # Spark unwraps the parens and resolves it as an ORDER BY ordinal
    # (position 0 → error) while DuckDB orders by the constant; the
    # no-op addition keeps both engines on expression semantics
    sql = (
        f"SELECT COALESCE(a, -999) AS r FROM {VALUES_SQL} "
        f"ORDER BY 0 + ({key}) {d}{nl}, a ASC NULLS LAST LIMIT {lim} OFFSET {off}"
    )
    got = [row.r for row in spark.sql(sql).collect()]
    want = [v for (v,) in duck.sql(sql).fetchall()]
    assert got == want, f"{sql}\n spark={got}\n duck={want}"


def test_default_null_ordering_divergence_documented(spark, duck):
    """Pin SURVEY §1.1: with no NULLS clause, ASC puts NULLs first in
    Spark but last in DuckDB/Postgres/DataFusion — why every checked
    query spells the null position explicitly."""
    sql = f"SELECT COALESCE(b, -999) AS r FROM {VALUES_SQL} ORDER BY b ASC, a ASC NULLS LAST"
    got = [row.r for row in spark.sql(sql).collect()]
    want = [v for (v,) in duck.sql(sql).fetchall()]
    assert got[0] == -999 and got[1] == -999  # Spark: NULLs first
    assert want[-1] == -999 and want[-2] == -999  # DuckDB: NULLs last
    assert sorted(got, key=str) == sorted(want, key=str)


# --- GROUPS window frames (compat rewrite vs a pure-Python oracle) ---
#
# DuckDB 1.x does not implement GROUPS frames ("not implemented yet"
# parser error), so the oracle here is an independent direct
# implementation of the SQL-standard semantics: the frame selects whole
# PEER GROUPS (distinct order-key values) at group-index offsets from
# the current row's group. Ties in the order key are the whole point —
# peer groups of size > 1 distinguish GROUPS from ROWS. x values are
# powers of two, so every aggregate value identifies the exact member
# set of the frame.

GROUPS_ROWS = [
    # (id, p, o, x)
    (1, 1, 10, 1), (2, 1, 10, 2), (3, 1, 20, 4), (4, 1, 30, 8),
    (5, 2, 10, 16), (6, 2, 10, 32), (7, 2, 40, 64), (8, 2, 40, 128),
    (9, 2, 50, 256),
]

GROUPS_VALUES_SQL = (
    "(VALUES " + ", ".join(f"({i}, {p}, {o}, {x})" for i, p, o, x in GROUPS_ROWS)
    + ") AS t(id, p, o, x)"
)


def _groups_oracle(rows, partitioned, desc, lo, hi, agg):
    """{id: aggregate over the GROUPS frame} per the SQL standard."""
    out = {}
    part_key = (lambda r: r[1]) if partitioned else (lambda r: 0)
    for k in {part_key(r) for r in rows}:
        grp = sorted((r for r in rows if part_key(r) == k),
                     key=lambda r: r[2], reverse=desc)
        uniq = sorted({r[2] for r in grp}, reverse=desc)
        gidx = {o: i for i, o in enumerate(uniq)}
        n = len(uniq)
        for r in grp:
            g = gidx[r[2]]
            lo_g = (0 if lo == "UNBOUNDED PRECEDING"
                    else g if lo == "CURRENT ROW" else g - int(lo.split()[0]))
            hi_g = (n - 1 if hi == "UNBOUNDED FOLLOWING"
                    else g if hi == "CURRENT ROW" else g + int(hi.split()[0]))
            sel = [s[3] for s in grp if lo_g <= gidx[s[2]] <= hi_g]
            if agg == "COUNT(x)":
                out[r[0]] = len(sel)
            elif not sel:
                out[r[0]] = None
            elif agg == "SUM(x)":
                out[r[0]] = sum(sel)
            elif agg == "MIN(x)":
                out[r[0]] = min(sel)
            else:
                out[r[0]] = max(sel)
    return out


_g_lo = st.sampled_from(["UNBOUNDED PRECEDING", "2 PRECEDING", "1 PRECEDING", "CURRENT ROW"])
_g_hi = st.sampled_from(["CURRENT ROW", "1 FOLLOWING", "2 FOLLOWING", "UNBOUNDED FOLLOWING"])
_g_agg = st.sampled_from(["SUM(x)", "MIN(x)", "MAX(x)", "COUNT(x)"])
_g_part = st.sampled_from(["", "PARTITION BY p "])
_g_dir = st.sampled_from(["ASC", "DESC"])


@settings(max_examples=30, deadline=None)
@given(agg=_g_agg, part=_g_part, d=_g_dir, lo=_g_lo, hi=_g_hi)
def test_groups_frames_match_python_oracle(spark, agg, part, d, lo, hi):
    from datafusion_wasm_bindings_spark.compat import rewrite

    sql = (
        f"SELECT id, {agg} OVER ({part}ORDER BY o {d} "
        f"GROUPS BETWEEN {lo} AND {hi}) AS r FROM {GROUPS_VALUES_SQL} ORDER BY id"
    )
    got = {row.id: row.r for row in spark.sql(rewrite(sql)).collect()}
    want = _groups_oracle(GROUPS_ROWS, bool(part), d == "DESC", lo, hi, agg)
    assert got == want, f"{sql}\n spark={got}\n oracle={want}"


def test_groups_frame_with_where_and_two_windows(spark):
    from datafusion_wasm_bindings_spark.compat import rewrite

    sql = (
        "SELECT id, "
        "SUM(x) OVER (PARTITION BY p ORDER BY o GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS s, "
        "COUNT(x) OVER (ORDER BY o GROUPS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c "
        f"FROM {GROUPS_VALUES_SQL} WHERE id <> 4 ORDER BY id LIMIT 7"
    )
    rows = [r for r in GROUPS_ROWS if r[0] != 4]
    s = _groups_oracle(rows, True, False, "1 PRECEDING", "1 FOLLOWING", "SUM(x)")
    c = _groups_oracle(rows, False, False, "UNBOUNDED PRECEDING", "CURRENT ROW", "COUNT(x)")
    want = [(i, s[i], c[i]) for i, _, _, _ in rows][:7]
    got = [tuple(r) for r in spark.sql(rewrite(sql)).collect()]
    assert got == want, f"{sql}\n spark={got}\n oracle={want}"


# --- LIKE / ILIKE pattern grammar -------------------------------------
#
# Exploration (2026-08-13): without an ESCAPE clause Spark treats
# backslash as the implicit escape character (Postgres/DataFusion
# semantics — so Spark matches the reference), while DuckDB treats
# backslash as a literal character. With an explicit ESCAPE clause the
# engines agree. Intersection grammar: no backslash in patterns;
# explicit ESCAPE '!' for literal wildcards.

_like_s = st.text(alphabet="abAB_%", max_size=6)
_like_p = st.text(alphabet="ab%_", max_size=6)


@settings(max_examples=40, deadline=None)
@given(
    s=_like_s,
    p=_like_p,
    op=st.sampled_from(["LIKE", "ILIKE", "NOT LIKE", "NOT ILIKE"]),
)
def test_like_patterns_agree(spark, duck, s, p, op):
    _run_both(spark, duck, f"('{s}' {op} '{p}')", relation=_ONE_ROW)


@settings(max_examples=30, deadline=None)
@given(
    s=_like_s,
    pre=st.text(alphabet="ab", max_size=3),
    wc=st.sampled_from(["_", "%"]),
    suf=st.text(alphabet="ab%_", max_size=3),
    escaped=st.booleans(),
)
def test_like_escape_clause_agrees(spark, duck, s, pre, wc, suf, escaped):
    pat = pre + ("!" + wc if escaped else wc) + suf
    _run_both(spark, duck, f"('{s}' LIKE '{pat}' ESCAPE '!')", relation=_ONE_ROW)


def test_like_backslash_divergence_documented(spark, duck):
    """Pin the implicit-escape divergence: Spark/Postgres/DataFusion
    treat backslash in a LIKE pattern as an escape; DuckDB treats it as
    a literal. Oracle queries must avoid bare backslash patterns or
    spell ESCAPE explicitly."""
    q = r"SELECT 'a_c' LIKE 'a\_c' AS r"
    assert spark.sql(q).collect()[0].r is True  # escape: literal _
    assert duck.sql(q).fetchall()[0][0] is False  # literal backslash


# --- regexp function grammar (Java regex ∩ RE2) ------------------------
#
# The PII-redaction and tokenizer operators rely on regex patterns
# behaving identically under Java regex (Spark) and RE2 (DuckDB
# oracle). Intersection grammar: literals, ASCII classes, \d \w \s,
# dot, +, ?, bounded repeats, alternation, groups, \b — no
# backreferences, no lookaround (RE2 has neither). Patterns and
# subjects bind as SQL *parameters* on both engines, so no
# string-literal escaping dialect is involved. Every alternation
# branch carries at least one mandatory piece, so no pattern matches
# the empty string (empty-match iteration in extract/replace loops is
# outside the dialect intersection and nothing checked relies on it).
# Exploration 2026-08-13: 200 examples × {regexp_like,
# regexp_extract_all, regexp_replace} found zero divergences.

_re_atom = st.one_of(
    st.sampled_from(list("ab01 x")),
    st.sampled_from(["[ab]", "[0-9]", "[a-z0-9]", "[^a]", r"\d", r"\w", r"\s", "."]),
)
_re_mand = st.tuples(_re_atom, st.sampled_from(["", "+", "{1,2}", "{2}"])).map("".join)
_re_opt = _re_atom.map(lambda a: a + "?")
_re_concat = st.tuples(
    st.lists(_re_opt, max_size=1),
    st.lists(_re_mand, min_size=1, max_size=3),
    st.lists(_re_opt, max_size=1),
).map(lambda t: "".join(t[0]) + "".join(t[1]) + "".join(t[2]))
_re_pattern = st.one_of(
    _re_concat,
    st.tuples(_re_concat, _re_concat).map(lambda t: f"({t[0]}|{t[1]})"),
    _re_concat.map(lambda c: rf"\b{c}"),
)
_re_subject = st.text(alphabet="ab01 x.", max_size=10)


@settings(max_examples=25, deadline=None)
@given(s=_re_subject, pat=_re_pattern)
def test_regexp_functions_agree(spark, duck, s, pat):
    # NAMED parameters on the Spark side: positional `?` markers
    # mis-bind here (see test_positional_params_shift_documented)
    got = spark.sql(
        "SELECT regexp_like(:s, :p) AS l, regexp_extract_all(:s, :p, 0) AS e, "
        "regexp_replace(:s, :p, 'X') AS r",
        args={"s": s, "p": pat},
    ).collect()[0]
    want = duck.execute(
        "SELECT regexp_matches(?, ?) AS l, regexp_extract_all(?, ?) AS e, "
        "regexp_replace(?, ?, 'X', 'g') AS r",
        [s, pat, s, pat, s, pat],
    ).fetchall()[0]
    assert (got.l, got.e, got.r) == want, f"s={s!r} pat={pat!r}\n spark={got}\n duck={want}"


def test_positional_params_shift_documented(spark):
    """Document a Spark 4.1 positional-parameter quirk: in a
    multi-function projection containing ``regexp_extract_all(?, ?, 0)``,
    the markers AFTER that call bind shifted by one position (observed:
    marker 5 receives argument 4). Named parameters bind correctly —
    why the engine's PREPARE/EXECUTE path (engine._execute_bound) and
    the regexp fuzz above use named binding exclusively.

    The positional outcome is NOT pinned hard: a future Spark may fix
    the shift, and the engine (named params everywhere) keeps working
    either way — so accept both the buggy and the fixed binding, and
    only assert hard on the named path."""
    row = spark.sql(
        "SELECT regexp_like(?, ?) AS l, regexp_extract_all(?, ?, 0) AS e, "
        "regexp_replace(?, ?, 'X') AS r",
        args=["s1", "p1", "s2", "p2", "s3", "p3"],
    ).collect()[0]
    # 'p2' = the 4.1 shifted binding; 's3' = correct binding if fixed
    assert row.r in ("p2", "s3"), f"unexpected positional binding: {row.r!r}"
    named = spark.sql(
        "SELECT regexp_replace(:s, :p, 'X') AS r", args={"s": "s3", "p": "p3"}
    ).collect()[0]
    assert named.r == "s3"  # named binding is correct


def test_similar_to_duckdb_divergence_documented(duck):
    """Pin WHY DuckDB is not an oracle for SIMILAR TO: DuckDB maps the
    operator to regexp_full_match on the RAW pattern (RE2 syntax), so
    'a' SIMILAR TO '%' is FALSE there — while SQL92/Postgres/DataFusion
    define % as the zero-or-more wildcard (TRUE). Our rewrite follows
    the SQL92/DataFusion semantics; the fuzz below therefore checks the
    translated regex across engines instead of the operator itself."""
    assert duck.sql("SELECT 'a' SIMILAR TO '%'").fetchall()[0][0] is False
    assert duck.sql("SELECT 'a' SIMILAR TO '.*'").fetchall()[0][0] is True


@settings(max_examples=60, deadline=None)
@given(
    s=st.text(alphabet="abAB_%", max_size=6),
    p=st.text(alphabet="ab%_|", max_size=6).filter(
        lambda x: "||" not in x and not x.startswith("|") and not x.endswith("|")
    ),
    neg=st.booleans(),
)
def test_similar_to_translation_agrees(spark, duck, s, p, neg):
    """Differential fuzz of the SIMILAR TO -> RLIKE translation
    (compat.similar_to_regex + the masked rewrite): Spark evaluates the
    rewritten RLIKE statement; DuckDB evaluates regexp_full_match on
    the SAME translated pattern (its SIMILAR TO is raw-regex, see the
    divergence pin above) — Java regex and RE2 must agree over %/_
    wildcards and | alternation, and the NOT form must negate."""
    from datafusion_wasm_bindings_spark.compat import rewrite, similar_to_regex

    op = "NOT SIMILAR TO" if neg else "SIMILAR TO"
    sql = f"SELECT ('{s}' {op} '{p}') AS r"
    got = spark.sql(rewrite(sql)).collect()[0].r
    body = similar_to_regex(p)[len("^(?:"):-len(")$")]
    want = duck.sql(
        "SELECT regexp_full_match(?, ?)", params=[s, body]
    ).fetchall()[0][0]
    if neg:
        want = not want
    assert got == want, (sql, rewrite(sql), got, want)
