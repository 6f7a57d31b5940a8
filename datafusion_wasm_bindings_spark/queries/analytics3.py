"""Tenth-wave extension queries: dataset statistics and ML feature
engineering — entropy / mutual information, chi-squared independence,
closed-form multivariate OLS, Benford first-digit audit, leave-one-out
target encoding, hashing-trick feature vectors, per-group Gini
concentration, MAD-based robust anomaly scores, NDCG@k ranking
evaluation, Cohen's kappa agreement, and classifier calibration (ECE).

Like the earlier waves these are statements the reference engine
(datafusion-wasm-bindings executes arbitrary SQL through DataFusion,
`/root/reference/src/lib.rs` execute_sql) could run textually; each is
registered with a Spark-first physical shape chosen to survive 1000
executors — the scale notes live on each query.

Determinism recipes (FIXTURES.md rules): every surfaced double goes
through the DECIMAL(18,6) quantization; ln/log10-derived terms are
quantized per-cell BEFORE the exact decimal sum (libm-vs-Java ulp,
CLAUDE.md pitfall g); integer counts are CAST to BIGINT on the DuckDB
side (SUM→HUGEINT pandas-dtype trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_wasm_bindings_spark.queries import query
from datafusion_wasm_bindings_spark.queries._util import DEC, dsum
from datafusion_wasm_bindings_spark.sources.catalog import table


# ================= entropy + mutual information =======================
def _stats_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of o_orderpriority (X), o_orderstatus (Y), their
    joint, and the mutual information I(X;Y) = H(X)+H(Y)-H(X,Y), in
    nats. Feature-selection / leakage-audit primitive for a training
    pipeline (is a candidate feature informative about the label?).

    Scale shape: ONE map-side-combinable shuffle builds the joint
    contingency table; its cardinality is |X|x|Y| (category product,
    independent of row count), so marginals and entropy sums all run on
    a broadcast-sized relation — nothing downstream grows with data.
    Each p*ln(p) term is quantized to DECIMAL(18,6) per cell, summed
    exactly, and the final additions run on already-quantized doubles —
    bit-equal across engines."""
    joint = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # materialize the |X|x|Y|-row table once (house pattern for
        # reused subtrees): every derived marginal/entropy branch below
        # would otherwise re-derive it — 6 scans of the fact table.
        .localCheckpoint()
    )
    tot = joint.agg(F.sum("cnt").cast("long").alias("n"))
    px = joint.groupBy("o_orderpriority").agg(F.sum("cnt").cast("long").alias("nx"))
    py = joint.groupBy("o_orderstatus").agg(F.sum("cnt").cast("long").alias("ny"))

    def _h(df: DataFrame, cnt_col: str, alias: str) -> DataFrame:
        p = F.col(cnt_col) / F.col("n")
        return df.crossJoin(F.broadcast(tot)).agg(
            dsum(-p * F.log(p), alias), F.first("n").alias(f"_n_{alias}")
        )

    hx = _h(px, "nx", "h_x")
    hy = _h(py, "ny", "h_y")
    hxy = _h(joint, "cnt", "h_xy")
    return (
        hx.crossJoin(hy)
        .crossJoin(hxy)
        .select(
            F.col("_n_h_x").alias("n"),
            "h_x",
            "h_y",
            "h_xy",
            (F.col("h_x") + F.col("h_y") - F.col("h_xy"))
            .cast(DEC)
            .cast("double")
            .alias("mi_nats"),
        )
    )


query(
    "q_stats_entropy_mi",
    """
    WITH joint AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM joint),
    hx AS (
      SELECT CAST(SUM(CAST(-(CAST(nx AS DOUBLE) / n) * ln(CAST(nx AS DOUBLE) / n)
                 AS DECIMAL(18,6))) AS DOUBLE) AS h_x
      FROM (SELECT x, CAST(SUM(cnt) AS BIGINT) AS nx FROM joint GROUP BY x) CROSS JOIN tot
    ),
    hy AS (
      SELECT CAST(SUM(CAST(-(CAST(ny AS DOUBLE) / n) * ln(CAST(ny AS DOUBLE) / n)
                 AS DECIMAL(18,6))) AS DOUBLE) AS h_y
      FROM (SELECT y, CAST(SUM(cnt) AS BIGINT) AS ny FROM joint GROUP BY y) CROSS JOIN tot
    ),
    hxy AS (
      SELECT CAST(SUM(CAST(-(CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)
                 AS DECIMAL(18,6))) AS DOUBLE) AS h_xy
      FROM joint CROSS JOIN tot
    )
    SELECT n, h_x, h_y, h_xy,
           CAST(CAST(h_x + h_y - h_xy AS DECIMAL(18,6)) AS DOUBLE) AS mi_nats
    FROM tot CROSS JOIN hx CROSS JOIN hy CROSS JOIN hxy
    """,
    tags=("extension", "stats", "profiling"),
)(_stats_entropy_mi)


# ================= chi-squared independence test ======================
def _stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-squared statistic + Cramer's V for the
    o_orderpriority x o_orderstatus contingency table — the classic
    categorical-independence audit (is the label distribution skewed
    across a data source? did a stratified split actually stratify?).

    Scale shape: identical to q_stats_entropy_mi — one combinable
    shuffle to the |X|x|Y|-cell table, broadcast marginal joins, and a
    per-cell (o-e)^2/e quantized before the exact decimal sum."""
    joint = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()  # one fact scan; marginals reuse the cells
    )
    rx = joint.groupBy("x").agg(F.sum("cnt").cast("long").alias("nx"))
    cy = joint.groupBy("y").agg(F.sum("cnt").cast("long").alias("ny"))
    tot = joint.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.countDistinct("x").cast("long").alias("r"),
        F.countDistinct("y").cast("long").alias("c"),
    )
    e = F.col("nx") * F.col("ny") / F.col("n")
    cells = (
        joint.join(F.broadcast(rx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(tot))
    )
    agg = cells.agg(
        dsum((F.col("cnt") - e) * (F.col("cnt") - e) / e, "chi2"),
        F.first("n").alias("n"),
        F.first("r").alias("r"),
        F.first("c").alias("c"),
    )
    return agg.select(
        "n",
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        "chi2",
        F.sqrt(F.col("chi2") / (F.col("n") * (F.least("r", "c") - 1)))
        .cast(DEC)
        .cast("double")
        .alias("cramers_v"),
    )


query(
    "q_stats_chi2",
    """
    WITH joint AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    rx AS (SELECT x, CAST(SUM(cnt) AS BIGINT) AS nx FROM joint GROUP BY x),
    cy AS (SELECT y, CAST(SUM(cnt) AS BIGINT) AS ny FROM joint GROUP BY y),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(DISTINCT x) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT y) AS BIGINT) AS c FROM joint),
    agg AS (
      SELECT CAST(SUM(CAST(
               (cnt - CAST(nx AS DOUBLE) * ny / n) * (cnt - CAST(nx AS DOUBLE) * ny / n)
                 / (CAST(nx AS DOUBLE) * ny / n) AS DECIMAL(18,6))) AS DOUBLE) AS chi2,
             MIN(n) AS n, MIN(r) AS r, MIN(c) AS c
      FROM joint JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN tot
    )
    SELECT n, CAST((r - 1) * (c - 1) AS BIGINT) AS dof, chi2,
           CAST(CAST(sqrt(chi2 / (n * (least(r, c) - 1))) AS DECIMAL(18,6)) AS DOUBLE)
             AS cramers_v
    FROM agg
    """,
    tags=("extension", "stats", "profiling"),
)(_stats_chi2)


# ================= closed-form 2-regressor OLS ========================
def _stats_ols2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag ordinary least squares of l_extendedprice on
    (l_quantity, l_discount) solved in CLOSED FORM from sufficient
    statistics — the distributed way to fit a small linear model: one
    map-side-combinable aggregate collects the 9 cross-moments, and the
    2x2 normal-equation solve (Cramer's rule on centered moments) is
    plain scalar arithmetic on the aggregate row. No iteration, no
    driver collect, no UDF; extends DataFusion's regr_* family
    (regr_slope etc., single regressor) to the multivariate case.

    Determinism: the moment sums go through the exact DECIMAL(18,6)
    recipe; the solve is identical IEEE arithmetic on identical
    aggregate doubles on both engines; coefficients are quantized."""
    # parallel=True: 10 decimal cross-moment sums per row — the
    # heaviest map work in the registry per row; widen behind a
    # row-group-starved scan (guide §2.5, q_flagship_pricing_summary
    # precedent; decimal sums are order-independent so rows are
    # bit-identical). Measured r12: 3.17→1.70 s warm at sf0.1.
    li = table(spark, sf_dir, "lineitem", parallel=True).select(
        "l_returnflag",
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("x1"), "sx1"),
        dsum(F.col("x2"), "sx2"),
        dsum(F.col("y"), "sy"),
        dsum(F.col("x1") * F.col("x1"), "sx1x1"),
        dsum(F.col("x1") * F.col("x2"), "sx1x2"),
        dsum(F.col("x2") * F.col("x2"), "sx2x2"),
        dsum(F.col("x1") * F.col("y"), "sx1y"),
        dsum(F.col("x2") * F.col("y"), "sx2y"),
        dsum(F.col("y") * F.col("y"), "syy"),
    )
    n = F.col("n")
    s11 = F.col("sx1x1") - F.col("sx1") * F.col("sx1") / n
    s12 = F.col("sx1x2") - F.col("sx1") * F.col("sx2") / n
    s22 = F.col("sx2x2") - F.col("sx2") * F.col("sx2") / n
    s1y = F.col("sx1y") - F.col("sx1") * F.col("sy") / n
    s2y = F.col("sx2y") - F.col("sx2") * F.col("sy") / n
    syy = F.col("syy") - F.col("sy") * F.col("sy") / n
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = F.col("sy") / n - b1 * F.col("sx1") / n - b2 * F.col("sx2") / n
    r2 = (b1 * s1y + b2 * s2y) / syy
    q = lambda c, a: c.cast(DEC).cast("double").alias(a)  # noqa: E731
    return g.select(
        "l_returnflag", "n", q(b0, "b0"), q(b1, "b1"), q(b2, "b2"), q(r2, "r2")
    )


_OLS_MOMS = """
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx1,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx1x1,
             CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx1x2,
             CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx2x2,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sx1y,
             CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sx2y,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
"""

query(
    "q_stats_ols2",
    f"""
    WITH g AS ({_OLS_MOMS}),
    c AS (
      SELECT l_returnflag, n, sx1, sx2, sy,
             sx1x1 - sx1 * sx1 / n AS s11,
             sx1x2 - sx1 * sx2 / n AS s12,
             sx2x2 - sx2 * sx2 / n AS s22,
             sx1y - sx1 * sy / n AS s1y,
             sx2y - sx2 * sy / n AS s2y,
             syy - sy * sy / n AS vyy
      FROM g
    ),
    b AS (
      SELECT l_returnflag, n, sx1, sx2, sy, s1y, s2y, vyy,
             (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
             (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
      FROM c
    )
    SELECT l_returnflag, n,
           CAST(CAST(sy / n - b1 * sx1 / n - b2 * sx2 / n AS DECIMAL(18,6)) AS DOUBLE) AS b0,
           CAST(CAST(b1 AS DECIMAL(18,6)) AS DOUBLE) AS b1,
           CAST(CAST(b2 AS DECIMAL(18,6)) AS DOUBLE) AS b2,
           CAST(CAST((b1 * s1y + b2 * s2y) / vyy AS DECIMAL(18,6)) AS DOUBLE) AS r2
    FROM b
    """,
    tags=("extension", "stats", "pipeline"),
)(_stats_ols2)


# ================= Benford first-digit audit ==========================
def _stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of l_extendedprice vs the
    Benford expectation log10(1+1/d) — a fabricated-data / corrupted-
    feed audit. Digit extraction is exact integer/string work (price →
    rounded cents → leading decimal digit; multiplying by a power of 10
    never changes the leading significant digit), so both engines bin
    identically; frequencies quantize through DECIMAL(18,6).

    Scale shape: pure map + one 9-group map-side-combinable aggregate;
    the 9-row result cross-joins its own total. Nothing scales with
    input but the scan."""
    li = table(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    digits = (
        li.filter(F.col("cents") > 0)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
        .localCheckpoint()  # one fact scan; the total reuses the 9 rows
    )
    tot = digits.agg(F.sum("n_obs").cast("long").alias("n_all"))
    freq = F.col("n_obs") / F.col("n_all")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        digits.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            freq.cast(DEC).cast("double").alias("freq"),
            benford.cast(DEC).cast("double").alias("benford_freq"),
            F.abs(freq - benford).cast(DEC).cast("double").alias("abs_dev"),
        )
        .orderBy("digit")
    )


query(
    "q_stats_benford",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem)
      WHERE cents > 0
    ),
    g AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_all FROM g)
    SELECT digit, n_obs,
           CAST(CAST(CAST(n_obs AS DOUBLE) / n_all AS DECIMAL(18,6)) AS DOUBLE) AS freq,
           CAST(CAST(log10(1.0 + 1.0 / digit) AS DECIMAL(18,6)) AS DOUBLE) AS benford_freq,
           CAST(CAST(abs(CAST(n_obs AS DOUBLE) / n_all - log10(1.0 + 1.0 / digit))
                AS DECIMAL(18,6)) AS DOUBLE) AS abs_dev
    FROM g CROSS JOIN tot
    ORDER BY digit
    """,
    tags=("extension", "stats", "quality"),
)(_stats_benford)


# ================= leave-one-out target encoding ======================
_TE_M = 20.0  # smoothing pseudo-count


def _ml_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out smoothed target-mean encoding of customer nation
    against the binary target "order is URGENT" — the standard
    high-cardinality-categorical feature for tabular models, computed
    WITHOUT leaking the row's own label: enc_i = (S_g - y_i + m*prior)
    / (n_g - 1 + m).

    Scale shape: the stats pass joins orders→customer on the natural
    key (one co-partitioned shuffle each side) and aggregates per
    nation — map-side combinable, output is |nations| rows, broadcast
    back. The OUTPUT pass filters orders to the sampled keys FIRST, so
    the second join touches only the sample; group stats never
    recompute per output row. Pure integer sums + one global prior;
    the encode arithmetic is identical doubles, quantized."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("t"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    j = o.join(c, o.o_custkey == c.c_custkey)
    g = (
        j.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("t").cast("long").alias("s_g"),
        )
        .localCheckpoint()  # one stats pass over the join
    )
    # global prior FROM the per-nation stats (25 rows) — re-deriving it
    # from j would run the orders⋈customer join a second time.
    tot = g.agg(
        F.sum("n_g").cast("long").alias("n_all"),
        F.sum("s_g").cast("long").alias("s_all"),
    )
    prior = F.col("s_all") / F.col("n_all")
    enc = (F.col("s_g") - F.col("t") + F.lit(_TE_M) * prior) / (
        F.col("n_g") - 1 + F.lit(_TE_M)
    )
    out = (
        o.filter(F.col("o_orderkey") % 997 == 0)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(g), "c_nationkey")
        .crossJoin(F.broadcast(tot))
    )
    # enc surfaces RAW (CLAUDE.md pitfall h): it is integer sums + one
    # integer-ratio prior pushed through an identical expression tree —
    # bit-equal doubles on both engines by construction; quantizing
    # would only ADD a decimal-midpoint failure mode (the numerator can
    # be an exact decimal when the prior's expansion terminates).
    return out.select("o_orderkey", "c_nationkey", "t", enc.alias("nation_te"))


query(
    "q_ml_target_encode",
    f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS t
      FROM orders
    ),
    j AS (
      SELECT o.o_orderkey, o.t, c.c_nationkey
      FROM o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    g AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(t) AS BIGINT) AS s_g
      FROM j GROUP BY c_nationkey
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all, CAST(SUM(t) AS BIGINT) AS s_all FROM j
    )
    SELECT j.o_orderkey, j.c_nationkey, j.t,
           (g.s_g - j.t + {_TE_M} * (CAST(tot.s_all AS DOUBLE) / tot.n_all))
             / (g.n_g - 1 + {_TE_M}) AS nation_te
    FROM j JOIN g USING (c_nationkey) CROSS JOIN tot
    WHERE j.o_orderkey % 997 = 0
    """,
    tags=("extension", "pipeline", "stats"),
)(_ml_target_encode)


# ================= hashing-trick feature vectors ======================
_FH_BUCKETS = 32


def _ml_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed hashing-trick bag-of-words vectors (Weinberger et al.
    2009): token → md5 bucket in [0,32), sign from an independent hex
    digit, per-document signed counts. The fixed-width feature space
    needs no vocabulary pass — the property that makes the hashing
    trick THE text featurizer at 100 TB (one shuffle on (doc, bucket),
    map-side combinable; no global dictionary to build or broadcast).

    md5 is the engine-portable hash (same idiom as the sampling
    draws); zero-weight buckets (sign cancellation) are dropped so the
    output is the sparse vector. Vector surfaced as a '%02d:%d'
    space-joined string, ordered by bucket on both engines."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))
        ).alias("tok"),
    )
    h = F.md5(F.concat(F.col("tok"), F.lit("dfwb-fh")))
    hashed = toks.select(
        "doc_id",
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % _FH_BUCKETS).alias("bkt"),
        (F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 * 2 - 1).alias("sgn"),
    )
    vec = (
        hashed.filter(F.col("doc_id") < 300)
        .groupBy("doc_id", "bkt")
        .agg(F.sum("sgn").cast("long").alias("wt"))
        .filter(F.col("wt") != 0)
    )
    return vec.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.concat_ws(
            " ", F.sort_array(F.collect_list(F.format_string("%02d:%d", "bkt", "wt")))
        ).alias("fvec"),
    )


query(
    "q_ml_feature_hash",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      FROM documents WHERE doc_id < 300
    ),
    hashed AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok || 'dfwb-fh'), 1, 4) AS BIGINT)
               % {_FH_BUCKETS} AS bkt,
             CAST('0x' || substr(md5(tok || 'dfwb-fh'), 5, 1) AS BIGINT)
               % 2 * 2 - 1 AS sgn
      FROM toks
    ),
    vec AS (
      SELECT doc_id, bkt, CAST(SUM(sgn) AS BIGINT) AS wt
      FROM hashed GROUP BY doc_id, bkt HAVING SUM(sgn) <> 0
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_buckets,
           COALESCE(string_agg(printf('%02d:%d', bkt, wt), ' ' ORDER BY bkt), '') AS fvec
    FROM vec GROUP BY doc_id
    """,
    tags=("extension", "pipeline", "text"),
)(_ml_feature_hash)


# ================= per-group Gini concentration =======================
def _stats_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of (shifted-positive) customer account balance
    within each nation — the concentration/inequality profile a data-
    balance audit wants per stratum (is one source/nation dominating
    the value mass?). Rank formula G = (2*Σ r_i x_(i) - (n+1) Σ x) /
    (n Σ x) on the within-nation rank.

    Scale shape (r4): the Gini needs the FULL within-nation rank (every
    r_i weights the sum), so rank-limit pushdown can never bound a
    per-nation window — and 25 nations means 25 sequential tasks over
    the whole fact at 100 TB. The rank runs through
    operators/scale.bucketed_rank on fixed-width VALUE-range buckets
    (width 100 over the shifted balance: monotone in the sort key, so
    the two-pass rank is row-identical); per-(nation, bucket) windows
    stay parallel. Balances are shifted by +1000 (documented) so the
    mass is strictly positive; ties broken by the unique key."""
    from datafusion_wasm_bindings_spark.operators.scale import bucketed_rank

    # the mass is NON-NULL balances: a NULL xs has no rank position
    # (and its engine-dependent placement shifts every other rank) —
    # adversarial NULL replay, r5
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal").isNotNull())
        .select("c_nationkey", "c_custkey", (F.col("c_acctbal") + 1000.0).alias("xs"))
    )
    r = bucketed_rank(
        c,
        ["c_nationkey"],
        F.floor(F.col("xs") / 100.0),
        [F.col("xs").asc(), F.col("c_custkey").asc_nulls_last()],
        rank_col="r",
    )
    g = r.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("r") * F.col("xs"), "srx"),
        dsum(F.col("xs"), "sx"),
    )
    gini = (2 * F.col("srx") - (F.col("n") + 1) * F.col("sx")) / (
        F.col("n") * F.col("sx")
    )
    return g.select(
        "c_nationkey", "n", gini.cast(DEC).cast("double").alias("gini")
    )


query(
    "q_stats_gini",
    """
    WITH r AS (
      SELECT c_nationkey, c_acctbal + 1000.0 AS xs,
             CAST(row_number() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal + 1000.0 ASC,
                             c_custkey ASC NULLS LAST) AS BIGINT) AS r
      FROM customer WHERE c_acctbal IS NOT NULL
    ),
    g AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r * xs AS DECIMAL(18,6))) AS DOUBLE) AS srx,
             CAST(SUM(CAST(xs AS DECIMAL(18,6))) AS DOUBLE) AS sx
      FROM r GROUP BY c_nationkey
    )
    SELECT c_nationkey, n,
           CAST(CAST((2 * srx - (n + 1) * sx) / (n * sx) AS DECIMAL(18,6)) AS DOUBLE)
             AS gini
    FROM g
    """,
    tags=("extension", "stats", "profiling"),
)(_stats_gini)


# ================= MAD robust anomaly scores ==========================
def _events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust z-scores per event type — the outlier detector
    that survives heavy tails where q_events_outliers' moment-based z
    gets dragged by the outliers themselves (median breakdown point 50%
    vs 0% for the mean). z = 0.6745 * (x - med) / MAD, |z| > 3.5 flags
    (Iglewicz-Hoaglin).

    Scale shape: two grouped exact medians (percentile sketch-free —
    same engine pairing the green q_fn_median uses) over the SAME
    event_type clustering, each a single shuffle; the per-type (med,
    mad) table is category-sized and broadcast back; the scored pass
    filters to the sampled ids FIRST so no full-table rescan. At 100 TB
    swap percentile for percentile_approx (documented mode switch, same
    plan shape). med/MAD are quantized (DECIMAL(18,6)) at the source so
    the |z| > 3.5 flag compares against bit-identical operands on both
    engines — percentile interpolation is not bit-identical, and a raw
    threshold comparison could flip is_anomaly at the boundary."""
    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = e.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).cast(DEC).cast("double").alias("med")
    )
    mad = (
        e.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("med").alias("med"),
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5))
            .cast(DEC)
            .cast("double")
            .alias("mad"),
        )
    )
    z = F.lit(0.6745) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        e.filter(F.col("event_id") % 97 == 0)
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            F.col("med").cast(DEC).cast("double").alias("med"),
            F.col("mad").cast(DEC).cast("double").alias("mad"),
            F.when(F.col("mad") > 0, z.cast(DEC).cast("double")).alias("robust_z"),
            F.when(F.col("mad") > 0, F.abs(z) > 3.5).otherwise(F.lit(False)).alias(
                "is_anomaly"
            ),
        )
    )


query(
    "q_events_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type,
             CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, MIN(m.med) AS med,
             CAST(CAST(quantile_cont(abs(e.value - m.med), 0.5) AS DECIMAL(18,6)) AS DOUBLE) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(CAST(m.med AS DECIMAL(18,6)) AS DOUBLE) AS med,
           CAST(CAST(m.mad AS DECIMAL(18,6)) AS DOUBLE) AS mad,
           CASE WHEN m.mad > 0 THEN
             CAST(CAST(0.6745 * (e.value - m.med) / m.mad AS DECIMAL(18,6)) AS DOUBLE)
           END AS robust_z,
           CASE WHEN m.mad > 0 THEN abs(0.6745 * (e.value - m.med) / m.mad) > 3.5
                ELSE FALSE END AS is_anomaly
    FROM events e JOIN mad m USING (event_type)
    WHERE e.event_id % 97 = 0
    """,
    tags=("extension", "events", "cleaning", "stats"),
)(_events_anomaly_mad)


# ================= NDCG@k ranking evaluation ==========================
_NDCG_K = 10


def _rank_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 per event type — the ranking-quality metric a search /
    retrieval training pipeline evaluates every candidate model with.
    Model score = `value`; graded relevance = a deterministic pseudo-
    label (user_id % 4, FIXTURES-seeded) so both engines share exact
    labels. DCG uses the (2^rel - 1) / log2(rank + 1) gain; IDCG ranks
    by relevance itself; rank ties broken by event_id on both sides.

    Scale shape: both rankings are windows PARTITIONED by the query key
    (parallel across queries, never global); rows beyond rank k drop
    immediately, so the aggregate sees k rows per query. Per-rank gain
    terms are quantized to DECIMAL(18,6) before the exact sum; the
    final ratio divides two quantized sums."""
    # event_id IS NOT NULL: the rank tie-break key must be non-null
    # (CLAUDE.md replay convention b) — two NULL-id rows with equal
    # scores but different rel otherwise rank in engine-unspecified
    # order and shift the whole DCG sum (r6 sf0.01 replay); explicit
    # NULLS LAST pins the injected NULL scores/rels identically too
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_id").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.col("value").alias("score"),
            (F.col("user_id") % 4).cast("long").alias("rel"),
        )
    )
    wm = Window.partitionBy("event_type").orderBy(
        F.col("score").desc_nulls_last(), F.col("event_id").asc()
    )
    wi = Window.partitionBy("event_type").orderBy(
        F.col("rel").desc_nulls_last(), F.col("event_id").asc()
    )
    gain = lambda r: (F.pow(F.lit(2.0), F.col("rel")) - 1) / (  # noqa: E731
        F.log(2.0, r + 1)
    )
    dcg = (
        e.withColumn("r", F.row_number().over(wm))
        .filter(F.col("r") <= _NDCG_K)
        .groupBy("event_type")
        .agg(dsum(gain(F.col("r")), "dcg"))
    )
    idcg = (
        e.withColumn("r", F.row_number().over(wi))
        .filter(F.col("r") <= _NDCG_K)
        .groupBy("event_type")
        .agg(dsum(gain(F.col("r")), "idcg"))
    )
    return (
        dcg.join(idcg, "event_type")
        .select(
            "event_type",
            "dcg",
            "idcg",
            # try_divide: an all-rel-0 hostile group has idcg = 0 —
            # NDCG undefined → NULL, matching DuckDB's x/0 → NULL
            # (adversarial extremes replay, r6)
            F.try_divide(F.col("dcg"), F.col("idcg"))
            .cast(DEC)
            .cast("double")
            .alias("ndcg"),
        )
    )


query(
    "q_rank_ndcg",
    f"""
    -- event_id IS NOT NULL + explicit NULLS LAST: see the Spark side
    -- (r6 sf0.01 replay)
    WITH e AS (
      SELECT event_id, event_type, value AS score,
             CAST(user_id % 4 AS BIGINT) AS rel
      FROM events WHERE event_id IS NOT NULL
    ),
    dcg AS (
      SELECT event_type, CAST(SUM(CAST((pow(2.0, rel) - 1) / (ln(r + 1) / ln(2.0))
               AS DECIMAL(18,6))) AS DOUBLE) AS dcg
      FROM (SELECT event_type, rel,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY score DESC NULLS LAST, event_id ASC) AS r FROM e)
      WHERE r <= {_NDCG_K} GROUP BY event_type
    ),
    idcg AS (
      SELECT event_type, CAST(SUM(CAST((pow(2.0, rel) - 1) / (ln(r + 1) / ln(2.0))
               AS DECIMAL(18,6))) AS DOUBLE) AS idcg
      FROM (SELECT event_type, rel,
                   row_number() OVER (PARTITION BY event_type
                     ORDER BY rel DESC NULLS LAST, event_id ASC) AS r FROM e)
      WHERE r <= {_NDCG_K} GROUP BY event_type
    )
    SELECT event_type, dcg, idcg,
           CAST(CAST(dcg / idcg AS DECIMAL(18,6)) AS DOUBLE) AS ndcg
    FROM dcg JOIN idcg USING (event_type)
    """,
    tags=("extension", "stats", "similarity"),
)(_rank_ndcg)


# ================= Cohen's kappa inter-rater agreement ================
def _stats_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two deterministic 'annotators' of orders
    (rater A = o_orderstatus; rater B = a seeded relabeling over the
    same {F,O,P} space) — the label-quality audit run before trusting
    crowd/model annotations: kappa = (p_o - p_e) / (1 - p_e), chance
    agreement from the marginal product.

    Scale shape: one combinable shuffle to the |labels|^2 agreement
    matrix; marginals, p_o, p_e all run on the category-sized table."""
    # F.get (0-based), NOT element_at: Spark 4.1.2's codegen feeds a
    # NULL index's value slot (-1) into element_at, which silently
    # returns the LAST element instead of NULL (and getItem throws
    # INVALID_ARRAY_INDEX -1) — found by the adversarial NULL replay,
    # pinned in tests/test_operators.py::test_null_index_array_pick
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("a"),
        F.get(
            F.array(F.lit("F"), F.lit("O"), F.lit("P")),
            ((F.col("o_custkey") + F.col("o_orderkey")) % 3).cast("int"),
        ).alias("b"),
    )
    m = (
        o.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint()  # one fact scan; marginals/diagonal reuse it
    )
    ra = m.groupBy("a").agg(F.sum("cnt").cast("long").alias("na"))
    cb = m.groupBy("b").agg(F.sum("cnt").cast("long").alias("nb"))
    tot = m.agg(F.sum("cnt").cast("long").alias("n"))
    po = (
        m.filter(F.col("a") == F.col("b"))
        # COALESCE: a population with ZERO agreeing cells sums over an
        # empty relation (NULL) where the oracle's FILTER form is 0
        # (review find r7, the q_profile_expectations class)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("agree"))
        .crossJoin(F.broadcast(tot))
        .select("n", "agree", (F.col("agree") / F.col("n")).alias("po"))
    )
    pe = (
        ra.join(cb, ra.a == cb.b)
        .crossJoin(F.broadcast(tot))
        .agg(dsum(F.col("na") * F.col("nb") / (F.col("n") * F.col("n")), "pe"))
    )
    return (
        po.crossJoin(pe)
        .select(
            "n",
            "agree",
            F.col("po").cast(DEC).cast("double").alias("p_o"),
            "pe",
            # try_divide: perfect chance agreement (pe quantizing to
            # exactly 1.0 — one label dominating both raters) zeroes
            # the denominator; Spark ANSI would abort where DuckDB's
            # native x/0 yields NULL (r6 extremes convention a,
            # review find r7)
            F.try_divide(F.col("po") - F.col("pe"), 1 - F.col("pe"))
            .cast(DEC)
            .cast("double")
            .alias("kappa"),
        )
        # kappa is UNDEFINED on an empty label set: Spark's global agg
        # still emits one all-NULL row where the oracle's GROUP BY n
        # emits none — drop it (inert on any non-empty input, where
        # n >= 1; empty-mode replay r7)
        .filter(F.col("n").isNotNull())
    )


query(
    "q_stats_kappa",
    """
    WITH o AS (
      SELECT o_orderstatus AS a,
             ['F', 'O', 'P'][CAST((o_custkey + o_orderkey) % 3 + 1 AS INTEGER)] AS b
      FROM orders
    ),
    m AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cnt FROM o GROUP BY a, b),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM m),
    po AS (
      SELECT n, CAST(COALESCE(SUM(cnt) FILTER (a = b), 0) AS BIGINT) AS agree
      FROM m CROSS JOIN tot GROUP BY n
    ),
    pe AS (
      SELECT CAST(SUM(CAST(CAST(ra.na AS DOUBLE) * cb.nb / (n * CAST(n AS DOUBLE))
               AS DECIMAL(18,6))) AS DOUBLE) AS pe
      FROM (SELECT a, CAST(SUM(cnt) AS BIGINT) AS na FROM m GROUP BY a) ra
      JOIN (SELECT b, CAST(SUM(cnt) AS BIGINT) AS nb FROM m GROUP BY b) cb
        ON ra.a = cb.b
      CROSS JOIN tot
    )
    SELECT n, agree,
           CAST(CAST(CAST(agree AS DOUBLE) / n AS DECIMAL(18,6)) AS DOUBLE) AS p_o,
           pe,
           CAST(CAST((CAST(agree AS DOUBLE) / n - pe) / (1 - pe) AS DECIMAL(18,6))
                AS DOUBLE) AS kappa
    FROM po CROSS JOIN pe
    """,
    tags=("extension", "stats", "quality"),
)(_stats_kappa)


# ================= score calibration / reliability curve ==============
def _ml_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability curve + expected calibration error for a probability
    score against a binary outcome — the post-training audit that a
    classifier's 0.8 really means 80%. Score = logistic of centered
    order value (deterministic stand-in for a model head); label =
    order is URGENT. The score is QUANTIZED to DECIMAL(18,6) BEFORE
    binning, so a last-ulp exp() divergence can never flip a bin edge
    across engines (CLAUDE.md pitfall g).

    Scale shape: one map-side-combinable shuffle to the 10-bin table;
    ECE re-aggregates those 10 rows and is cross-joined back — two
    scans of a 10-row relation, one of the data."""
    o = table(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("y"),
        (
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(-(F.col("o_totalprice") - F.lit(150000.0)) / F.lit(60000.0))
            )
        )
        .cast(DEC)
        .cast("double")
        .alias("score"),
    )
    b = o.select(
        "y",
        "score",
        F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("long").alias("bin"),
    )
    g = (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bin"),
            dsum(F.col("score"), "s_score"),
            F.sum("y").cast("long").alias("s_y"),
        )
        .localCheckpoint()  # one fact scan; total + ECE reuse the bins
    )
    tot = g.agg(F.sum("n_bin").cast("long").alias("n_all"))
    conf = F.col("s_score") / F.col("n_bin")
    acc = F.col("s_y") / F.col("n_bin")
    # The quotients surface RAW (davg convention): both engines divide
    # identical exact-decimal sums by identical counts — bit-equal
    # doubles. Quantizing them instead would EXPOSE midpoints: a
    # 6-decimal numerator over a small count lands exactly between two
    # DECIMAL(18,6) neighbors, where Spark (shortest-repr HALF_UP) and
    # DuckDB (exact-binary nearest) round apart — observed live on
    # abs_gap at sf0.001.
    per_bin = g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_bin",
        conf.alias("mean_score"),
        acc.alias("event_rate"),
        F.abs(conf - acc).alias("abs_gap"),
        "n_all",
    )
    # ECE = Σ n_bin·gap / N: integer-weighted terms quantized for the
    # order-independent sum, one raw final division.
    ece = per_bin.agg(
        (
            F.sum((F.col("n_bin") * F.col("abs_gap")).cast(DEC)).cast("double")
            / F.first("n_all")
        ).alias("ece")
    )
    return per_bin.crossJoin(F.broadcast(ece)).select(
        "bin", "n_bin", "mean_score", "event_rate", "abs_gap", "ece"
    )


query(
    "q_ml_calibration",
    """
    WITH o AS (
      SELECT CAST(o_orderpriority = '1-URGENT' AS BIGINT) AS y,
             CAST(CAST(1.0 / (1.0 + exp(-(o_totalprice - 150000.0) / 60000.0))
                  AS DECIMAL(18,6)) AS DOUBLE) AS score
      FROM orders
    ),
    b AS (SELECT y, score,
                 CAST(least(floor(score * 10), 9) AS BIGINT) AS bin FROM o),
    g AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_bin,
             CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS s_score,
             CAST(SUM(y) AS BIGINT) AS s_y
      FROM b GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(n_bin) AS BIGINT) AS n_all FROM g),
    per_bin AS (
      SELECT bin, n_bin,
             s_score / n_bin AS mean_score,
             CAST(s_y AS DOUBLE) / n_bin AS event_rate,
             abs(s_score / n_bin - CAST(s_y AS DOUBLE) / n_bin) AS abs_gap,
             n_all
      FROM g CROSS JOIN tot
    ),
    ece AS (
      SELECT CAST(SUM(CAST(n_bin * abs_gap AS DECIMAL(18,6))) AS DOUBLE) / MIN(n_all)
               AS ece
      FROM per_bin
    )
    SELECT bin, n_bin, mean_score, event_rate, abs_gap, ece
    FROM per_bin CROSS JOIN ece
    """,
    tags=("extension", "stats", "pipeline", "quality"),
)(_ml_calibration)


# ================= Kaplan-Meier survival curve ========================
def _stats_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of time-to-first-'error' per user
    — the churn/time-to-event curve a reliability or retention analysis
    starts from. A user's observation window is [first event, last
    event]; users with an 'error' anywhere are events (duration = full
    window, in whole hours), everyone else is right-censored at their
    last observation. S(t) = Π_{t_i<=t} (1 - d_i/n_i) over the hour
    grid, with the standard deaths-before-censors tie rule.

    Scale shape: one map-combinable shuffle reduces events to one row
    per user; a second combinable shuffle reduces users to the bounded
    HOUR grid (fixture span => a few hundred rows). The cumulative
    at-risk / log-survival windows then run GLOBALLY — but over the
    grid relation only, the same driver-trivial tiny-global-window
    shape as q_pipeline_rownum's bucket offsets. The product is
    exp(Σ ln) with per-grid-row quantized logs (pitfall g); a
    d_i = n_i extinction row injects a -100 log-unit sentinel whose
    exp underflows to exactly 0.000000 under the DECIMAL quantization
    on both engines."""
    e = table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.max((F.col("event_type") == "error").cast("long")).alias("died"),
    )
    grid = (
        u.select(
            F.floor((F.col("hi") - F.col("lo")) / F.lit(3_600_000_000)).cast("long").alias("dur_h"),
            "died",
        )
        .groupBy("dur_h")
        .agg(
            F.sum("died").cast("long").alias("d"),
            F.sum(1 - F.col("died")).cast("long").alias("c"),
        )
    )
    w_all = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, 0)
    staged = grid.select(
        "dur_h",
        "d",
        "c",
        (
            F.sum(F.col("d") + F.col("c")).over(w_all)
            - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    qln = F.when(
        F.col("d") < F.col("n_risk"),
        F.floor(
            F.log(F.lit(1.0) - F.col("d") / F.cast("double", F.col("n_risk")))
            * F.lit(1e6)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(-100_000_000))
    return (
        staged.withColumn("qln", qln)
        .select(
            "dur_h",
            "n_risk",
            "d",
            "c",
            F.exp(F.sum("qln").over(w_cum) / F.lit(1e6))
            .cast(DEC)
            .cast("double")
            .alias("survival"),
        )
    )


query(
    "q_stats_survival",
    """
    WITH u AS (
      SELECT user_id,
             MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS lo,
             MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS hi,
             MAX(CAST(event_type = 'error' AS BIGINT)) AS died
      FROM events GROUP BY user_id
    ),
    grid AS (
      SELECT CAST(floor((hi - lo) / 3600000000.0) AS BIGINT) AS dur_h,
             CAST(SUM(died) AS BIGINT) AS d,
             CAST(SUM(1 - died) AS BIGINT) AS c
      FROM u GROUP BY 1
    ),
    staged AS (
      SELECT dur_h, d, c,
             CAST(SUM(d + c) OVER () -
                  COALESCE(SUM(d + c) OVER (ORDER BY dur_h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grid
    ),
    logs AS (
      SELECT dur_h, n_risk, d, c,
             CASE WHEN d < n_risk THEN
               CAST(floor(ln(1.0 - CAST(d AS DOUBLE) / n_risk) * 1000000 + 0.5) AS BIGINT)
             ELSE -100000000 END AS qln
      FROM staged
    )
    SELECT dur_h, n_risk, d, c,
           CAST(CAST(exp(SUM(qln) OVER (ORDER BY dur_h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 1e6)
                AS DECIMAL(18,6)) AS DOUBLE) AS survival
    FROM logs
    """,
    tags=("extension", "stats", "events", "behavior"),
)(_stats_survival)


# ================= CUPED variance-reduced A/B readout =================
def _events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al. 2013): the
    variance-reduction step every mature A/B platform applies before
    the t-test. Covariate X = a user's value-mass on even event ids,
    outcome Y = on odd ids (a deterministic fixture surrogate for
    pre/post-period metrics); arm = user_id parity. theta = cov(X,Y) /
    var(X) pooled; adjusted mean = (S_y - theta * (S_x - n * x_bar)) / n;
    achieved variance ratio = 1 - cov^2 / (var_x * var_y).

    Scale shape: one combinable shuffle to per-user (x, y); one more to
    the 2-row per-arm moment table; the pooled moments are window sums
    OVER the 2-row relation (two-operand adds — deterministic without
    quantization), so the fact data is never rescanned and theta needs
    no broadcast join back. Every surfaced column is raw double
    arithmetic on exact decimal sums (pitfall h: quantizing the
    mean-style quotients would add midpoint risk, not remove any)."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "value",
    )
    pu = e.groupBy("user_id").agg(
        dsum(F.when(F.col("event_id") % 2 == 0, F.col("value")).otherwise(0.0), "x"),
        dsum(F.when(F.col("event_id") % 2 == 1, F.col("value")).otherwise(0.0), "y"),
    )
    g = pu.groupBy((F.col("user_id") % 2).cast("long").alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        dsum(F.col("x"), "sx"),
        dsum(F.col("y"), "sy"),
        dsum(F.col("x") * F.col("x"), "sxx"),
        dsum(F.col("x") * F.col("y"), "sxy"),
        dsum(F.col("y") * F.col("y"), "syy"),
    )
    # pooled sums go through DECIMAL: with a NULL arm the per-arm
    # relation is 3 rows, and a 3-operand double window sum is
    # association-order-dependent across engines (2 rows never was) —
    # adversarial NULL replay, r5. The inputs are exact 1e-6 multiples
    # (dsum outputs), so the decimal detour is lossless.
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    def dwin(c: str, a: str):
        return F.sum(F.col(c).cast(DEC)).over(w).cast("double").alias(a)

    tot = g.select(
        "arm",
        "n",
        "sx",
        "sy",
        F.sum("n").over(w).alias("nt"),
        dwin("sx", "sxt"),
        dwin("sy", "syt"),
        dwin("sxx", "sxxt"),
        dwin("sxy", "sxyt"),
        dwin("syy", "syyt"),
    )
    cov = F.col("sxyt") - F.col("sxt") * F.col("syt") / F.col("nt")
    varx = F.col("sxxt") - F.col("sxt") * F.col("sxt") / F.col("nt")
    vary = F.col("syyt") - F.col("syt") * F.col("syt") / F.col("nt")
    theta = cov / varx
    xbar = F.col("sxt") / F.col("nt")
    return tot.select(
        "arm",
        "n",
        (F.col("sy") / F.col("n")).alias("mean_y"),
        (
            (F.col("sy") - theta * (F.col("sx") - F.col("n") * xbar)) / F.col("n")
        ).alias("mean_y_cuped"),
        theta.alias("theta"),
        (F.lit(1.0) - cov * cov / (varx * vary)).alias("var_ratio"),
    )


query(
    "q_events_cuped",
    """
    WITH pu AS (
      SELECT user_id,
             CAST(SUM(CAST(CASE WHEN event_id % 2 = 0 THEN value ELSE 0.0 END
                  AS DECIMAL(18,6))) AS DOUBLE) AS x,
             CAST(SUM(CAST(CASE WHEN event_id % 2 = 1 THEN value ELSE 0.0 END
                  AS DECIMAL(18,6))) AS DOUBLE) AS y
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS arm,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(y * y AS DECIMAL(18,6))) AS DOUBLE) AS syy
      FROM pu GROUP BY 1
    ),
    tot AS (
      SELECT arm, n, sx, sy,
             SUM(n) OVER () AS nt,
             CAST(SUM(CAST(sx AS DECIMAL(18,6))) OVER () AS DOUBLE) AS sxt,
             CAST(SUM(CAST(sy AS DECIMAL(18,6))) OVER () AS DOUBLE) AS syt,
             CAST(SUM(CAST(sxx AS DECIMAL(18,6))) OVER () AS DOUBLE) AS sxxt,
             CAST(SUM(CAST(sxy AS DECIMAL(18,6))) OVER () AS DOUBLE) AS sxyt,
             CAST(SUM(CAST(syy AS DECIMAL(18,6))) OVER () AS DOUBLE) AS syyt
      FROM g
    )
    SELECT arm, CAST(n AS BIGINT) AS n,
           sy / n AS mean_y,
           (sy - ((sxyt - sxt * syt / nt) / (sxxt - sxt * sxt / nt))
                 * (sx - n * (sxt / nt))) / n AS mean_y_cuped,
           (sxyt - sxt * syt / nt) / (sxxt - sxt * sxt / nt) AS theta,
           1.0 - (sxyt - sxt * syt / nt) * (sxyt - sxt * syt / nt)
             / ((sxxt - sxt * sxt / nt) * (syyt - syt * syt / nt)) AS var_ratio
    FROM tot
    """,
    tags=("extension", "events", "stats", "behavior"),
)(_events_cuped)


# ================= weight-of-evidence encoding ========================
def _ml_woe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information value for customer
    nation against the URGENT-order target — credit-scoring's standard
    monotone categorical encoding and its feature-strength summary:
    WOE_k = ln(share of positives in k / share of negatives in k) with
    0.5 Laplace smoothing, IV = Σ_k (p_k - q_k) * WOE_k.

    Scale shape: same as q_ml_target_encode's stats pass — the natural-
    key join then ONE combinable shuffle to the |nations|-row table;
    WOE/IV arithmetic runs entirely on that tiny relation (window sum
    for IV — 25 rows). WOE quantizes per category (ln-derived, pitfall
    g) BEFORE the exact IV sum."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderpriority") == "1-URGENT").cast("long").alias("t"),
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("t").cast("long").alias("n_pos"),
        )
        .localCheckpoint()  # one stats pass; totals reuse the 25 rows
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    staged = g.select(
        "c_nationkey",
        "n",
        "n_pos",
        F.sum("n_pos").over(w).alias("tot_pos"),
        F.sum(F.col("n") - F.col("n_pos")).over(w).alias("tot_neg"),
    )
    pe = (F.col("n_pos") + 0.5) / (F.col("tot_pos") + 0.5)
    qe = (F.col("n") - F.col("n_pos") + 0.5) / (F.col("tot_neg") + 0.5)
    woe = F.log(pe / qe).cast(DEC).cast("double")
    staged = staged.select(
        "c_nationkey", "n", "n_pos", woe.alias("woe"), (pe - qe).alias("_d")
    )
    return staged.select(
        "c_nationkey",
        "n",
        "n_pos",
        "woe",
        F.sum((F.col("_d") * F.col("woe")).cast(DEC))
        .over(w)
        .cast("double")
        .alias("iv"),
    )


query(
    "q_ml_woe_encode",
    """
    WITH g AS (
      SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(o.o_orderpriority = '1-URGENT' AS BIGINT)) AS BIGINT)
               AS n_pos
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey
    ),
    staged AS (
      SELECT c_nationkey, n, n_pos,
             CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
             CAST(SUM(n - n_pos) OVER () AS BIGINT) AS tot_neg
      FROM g
    ),
    woed AS (
      SELECT c_nationkey, n, n_pos,
             CAST(CAST(ln(((n_pos + 0.5) / (tot_pos + 0.5))
                        / ((n - n_pos + 0.5) / (tot_neg + 0.5)))
                  AS DECIMAL(18,6)) AS DOUBLE) AS woe,
             (n_pos + 0.5) / (tot_pos + 0.5)
               - (n - n_pos + 0.5) / (tot_neg + 0.5) AS _d
      FROM staged
    )
    SELECT c_nationkey, n, n_pos, woe,
           CAST(SUM(CAST(_d * woe AS DECIMAL(18,6))) OVER () AS DOUBLE) AS iv
    FROM woed
    """,
    tags=("extension", "pipeline", "stats"),
)(_ml_woe_encode)


# ================= BPE-style pair-frequency vocab step ================
def _text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first step of BPE vocabulary induction: the top-20 most
    frequent ADJACENT character pairs over the corpus (the pair a BPE
    trainer would merge first). Pure integer counting — no floats
    anywhere.

    Scale shape: tokenize → explode each word into its length-1
    overlapping 2-grams (fan-out bounded by word length, never corpus
    size) → ONE map-side-combinable count shuffle → TakeOrdered top-20
    (never a full sort). Ties broken by the pair string."""
    words = table(spark, sf_dir, "documents").select(
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), F.lit(0))
        ).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc_nulls_last(), F.col("pair").asc_nulls_last())
        .limit(20)
    )


query(
    "q_text_bpe_merges",
    """
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
    ),
    pairs AS (
      SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
      FROM words, LATERAL unnest(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC NULLS LAST, pair ASC NULLS LAST LIMIT 20
    """,
    tags=("extension", "text", "pipeline"),
)(_text_bpe_merges)


# ================= differential-privacy noisy counts ==================
_DP_EPS = 1.0


def _profile_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy per-nation customer counts (epsilon = 1,
    sensitivity 1) — the release format a privacy-reviewed aggregate
    leaves the platform in, completing the governance set
    (q_profile_kanon / q_pipeline_forget). The Laplace draw is
    CONTENT-ADDRESSED for the oracle: u = md5-uniform of the group key
    in (0,1), noise = -sign(u-1/2) * ln(1-2|u-1/2|) / eps — the inverse
    CDF on engine-identical doubles (a production release would draw
    from a CSPRNG instead; the mechanism, sensitivity bound, and
    epsilon accounting are exactly what changes nothing at 100 TB).

    Scale shape: one combinable count shuffle to the |nations| rows;
    the noise is a per-row map on the tiny table. ln-derived output →
    DECIMAL quantization (pitfall g)."""
    g = (
        table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("c_nationkey").cast("string"), F.lit("dfwb-dp"))), 1, 8),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(4294967297.0)
    centered = u - 0.5
    lap = (
        -F.signum(centered)
        * F.log(1 - 2 * F.abs(centered))
        / F.lit(_DP_EPS)
    )
    return g.select(
        "c_nationkey",
        "n_true",
        lap.cast(DEC).cast("double").alias("noise"),
        (F.col("n_true") + lap).cast(DEC).cast("double").alias("n_dp"),
    )


query(
    "q_profile_dp_counts",
    f"""
    WITH g AS (
      SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_true
      FROM customer GROUP BY c_nationkey
    ),
    u AS (
      SELECT c_nationkey, n_true,
             (CAST('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || 'dfwb-dp'), 1, 8)
                   AS BIGINT) + 1) / 4294967297.0 - 0.5 AS cu
      FROM g
    )
    SELECT c_nationkey, n_true,
           CAST(CAST(-sign(cu) * ln(1 - 2 * abs(cu)) / {_DP_EPS} AS DECIMAL(18,6))
                AS DOUBLE) AS noise,
           CAST(CAST(n_true + (-sign(cu) * ln(1 - 2 * abs(cu)) / {_DP_EPS})
                AS DECIMAL(18,6)) AS DOUBLE) AS n_dp
    FROM u
    """,
    tags=("extension", "stats", "profiling", "quality"),
)(_profile_dp_counts)
