"""Property / independent-reference tests for the statistics + ML
feature-engineering wave (queries/analytics3.py) — invariants the
DuckDB oracle cannot express (mathematical bounds, monotonicity,
agreement with an independent numpy/Python computation)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from datafusion_wasm_bindings_spark.queries import load_all

REGISTRY = load_all()


def _rows(name, spark, sf_dir):
    return REGISTRY[name].spark_fn(spark, sf_dir).collect()


def test_survival_curve_is_valid(spark, sf_dir):
    rows = sorted(_rows("q_stats_survival", spark, sf_dir), key=lambda r: r.dur_h)
    assert rows, "empty survival curve"
    # S is a survival function: within [0,1], nonincreasing over time
    last = 1.0 + 1e-9
    for r in rows:
        assert 0.0 <= r.survival <= 1.0 + 1e-9, r
        assert r.survival <= last + 1e-9, (r, last)
        last = r.survival
    # at-risk counts telescope: n_risk(t_{i+1}) = n_risk(t_i) - d_i - c_i
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk == a.n_risk - a.d - a.c, (a, b)
    # first at-risk pool is every observed user
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    assert rows[0].n_risk == n_users


def test_ndcg_bounded_by_ideal(spark, sf_dir):
    for r in _rows("q_rank_ndcg", spark, sf_dir):
        assert r.idcg > 0, r
        assert r.dcg <= r.idcg + 1e-6, r
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9, r


def test_kappa_consistency(spark, sf_dir):
    (r,) = _rows("q_stats_kappa", spark, sf_dir)
    assert abs(r.p_o - r.agree / r.n) < 2e-6
    assert 0.0 < r.pe < 1.0
    # kappa = (po - pe) / (1 - pe), bounded by [-pe/(1-pe), 1]
    assert -r.pe / (1 - r.pe) - 1e-9 <= r.kappa <= 1.0 + 1e-9


def test_calibration_ece_is_weighted_gap_mean(spark, sf_dir):
    rows = _rows("q_ml_calibration", spark, sf_dir)
    n_all = sum(r.n_bin for r in rows)
    want = sum(r.n_bin * r.abs_gap for r in rows) / n_all
    for r in rows:
        assert 0 <= r.bin <= 9, r
        # mean score sits inside its bin (bin 9 additionally absorbs
        # the clamp at score == 1.0)
        lo, hi = r.bin / 10.0, r.bin / 10.0 + 0.1
        assert lo - 1e-9 <= r.mean_score <= (1.0 if r.bin == 9 else hi) + 1e-9, r
        assert abs(r.ece - want) < 2e-6, (r.ece, want)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    rows = _rows("q_stats_ols2", spark, sf_dir)
    li = duckdb.sql(
        f"SELECT l_returnflag, l_quantity, l_discount, l_extendedprice "
        f"FROM '{sf_dir}/lineitem.parquet'"
    ).df()
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        X = np.column_stack(
            [np.ones(len(g)), g.l_quantity.to_numpy(), g.l_discount.to_numpy()]
        )
        y = g.l_extendedprice.to_numpy()
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert abs(r.b0 - beta[0]) < 1e-3 * max(1, abs(beta[0])), (r, beta)
        assert abs(r.b1 - beta[1]) < 1e-3 * max(1, abs(beta[1])), (r, beta)
        assert abs(r.b2 - beta[2]) < 1e-3 * max(1, abs(beta[2])), (r, beta)
        pred = X @ beta
        ss_res = float(((y - pred) ** 2).sum())
        ss_tot = float(((y - y.mean()) ** 2).sum())
        assert abs(r.r2 - (1 - ss_res / ss_tot)) < 1e-4, r


def test_gini_matches_numpy(spark, sf_dir):
    rows = _rows("q_stats_gini", spark, sf_dir)
    c = duckdb.sql(
        f"SELECT c_nationkey, c_custkey, c_acctbal FROM '{sf_dir}/customer.parquet'"
    ).df()
    for r in rows:
        g = c[c.c_nationkey == r.c_nationkey].sort_values(["c_acctbal", "c_custkey"])
        xs = g.c_acctbal.to_numpy() + 1000.0
        n = len(xs)
        rk = np.arange(1, n + 1)
        want = (2 * float((rk * xs).sum()) - (n + 1) * float(xs.sum())) / (
            n * float(xs.sum())
        )
        assert abs(r.gini - want) < 1e-5, (r, want)
        assert r.n == n


def test_woe_iv_nonnegative_and_sign_consistent(spark, sf_dir):
    rows = _rows("q_ml_woe_encode", spark, sf_dir)
    ivs = {round(r.iv, 9) for r in rows}
    assert len(ivs) == 1, "IV must be a single corpus-level value"
    assert rows[0].iv >= -1e-9
    tot_pos = sum(r.n_pos for r in rows)
    tot_neg = sum(r.n - r.n_pos for r in rows)
    for r in rows:
        pe = (r.n_pos + 0.5) / (tot_pos + 0.5)
        qe = (r.n - r.n_pos + 0.5) / (tot_neg + 0.5)
        assert (r.woe >= -1e-6) == (pe >= qe), (r, pe, qe)


def test_feature_hash_buckets_bounded_and_deterministic(spark, sf_dir):
    a = {r.doc_id: r.fvec for r in _rows("q_ml_feature_hash", spark, sf_dir)}
    b = {r.doc_id: r.fvec for r in _rows("q_ml_feature_hash", spark, sf_dir)}
    assert a == b, "hashing-trick vectors must be run-deterministic"
    for vec in a.values():
        for part in vec.split():
            bkt, wt = part.split(":")
            assert 0 <= int(bkt) < 32 and int(wt) != 0, part


def test_cuped_variance_ratio_bounds(spark, sf_dir):
    rows = _rows("q_events_cuped", spark, sf_dir)
    assert {r.arm for r in rows} == {0, 1}
    for r in rows:
        # var_ratio = 1 - rho^2 in [0, 1]; theta finite
        assert -1e-9 <= r.var_ratio <= 1.0 + 1e-9, r
        assert math.isfinite(r.theta) and math.isfinite(r.mean_y_cuped), r


def test_target_encode_matches_direct_loo_formula(spark, sf_dir):
    rows = _rows("q_ml_target_encode", spark, sf_dir)
    assert rows, "empty encode sample"
    stats = duckdb.sql(
        f"""
        SELECT c.c_nationkey,
               count(*) AS n_g,
               sum(CAST(o.o_orderpriority = '1-URGENT' AS BIGINT)) AS s_g
        FROM '{sf_dir}/orders.parquet' o
        JOIN '{sf_dir}/customer.parquet' c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """
    ).fetchall()
    n_all = sum(n for _, n, _ in stats)
    s_all = sum(s for _, _, s in stats)
    g = {k: (n, s) for k, n, s in stats}
    prior = s_all / n_all
    for r in rows:
        n_g, s_g = g[r.c_nationkey]
        want = (s_g - r.t + 20.0 * prior) / (n_g - 1 + 20.0)
        assert abs(r.nation_te - want) < 1e-9, (r, want)
        # leave-one-out: a positive row's own label never inflates it
        if r.t == 1:
            plain = (s_g + 20.0 * prior) / (n_g - 1 + 20.0)
            assert r.nation_te < plain


def test_benford_frequencies_partition_unity(spark, sf_dir):
    rows = _rows("q_stats_benford", spark, sf_dir)
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.freq for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.benford_freq for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.abs_dev - abs(r.freq - r.benford_freq)) < 3e-6, r


def test_bpe_merges_match_python_reference(spark, sf_dir):
    import re
    from collections import Counter

    rows = _rows("q_text_bpe_merges", spark, sf_dir)
    texts = duckdb.sql(f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall()
    cnt: Counter = Counter()
    for (t,) in texts:
        for w in re.findall("[a-z]+", t.lower()):
            for i in range(len(w) - 1):
                cnt[w[i : i + 2]] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.pair, r.n) for r in rows]
    assert got == want


def test_entropy_mi_information_inequalities(spark, sf_dir):
    (r,) = _rows("q_stats_entropy_mi", spark, sf_dir)
    eps = 1e-4  # per-cell quantization slack
    assert 0 <= r.h_x and 0 <= r.h_y and 0 <= r.h_xy
    assert r.h_xy <= r.h_x + r.h_y + eps
    assert -eps <= r.mi_nats <= min(r.h_x, r.h_y) + eps
    # 5 priorities x 3 statuses, near-uniform fixture => near ln(5), ln(3)
    assert abs(r.h_x - math.log(5)) < 0.05 and abs(r.h_y - math.log(3)) < 0.05


def test_chi2_nonnegative_and_v_bounded(spark, sf_dir):
    (r,) = _rows("q_stats_chi2", spark, sf_dir)
    assert r.chi2 >= 0 and r.dof == (5 - 1) * (3 - 1)
    assert 0.0 <= r.cramers_v <= 1.0 + 1e-9


def test_anomaly_mad_flags_match_threshold(spark, sf_dir):
    for r in _rows("q_events_anomaly_mad", spark, sf_dir):
        if r.mad and r.mad > 0:
            assert r.is_anomaly == (abs(r.robust_z) > 3.5), r
        else:
            assert r.is_anomaly is False and r.robust_z is None, r


def test_boxplot_five_number_ordering(spark, sf_dir):
    for r in _rows("q_profile_boxplot", spark, sf_dir):
        assert r.vmin <= r.q1 <= r.med <= r.q3 <= r.vmax, r
        assert 0 <= r.n_outliers < r.n, r


def test_pareto_classes_partition_customers(spark, sf_dir):
    rows = _rows("q_sales_pareto", spark, sf_dir)
    per_nation: dict[int, int] = {}
    for r in rows:
        assert r.abc in ("A", "B", "C"), r
        per_nation[r.c_nationkey] = per_nation.get(r.c_nationkey, 0) + r.n_customers
    want = dict(
        duckdb.sql(
            f"""SELECT c_nationkey, count(DISTINCT o_custkey)
            FROM '{sf_dir}/orders.parquet' JOIN '{sf_dir}/customer.parquet'
              ON o_custkey = c_custkey GROUP BY 1"""
        ).fetchall()
    )
    assert per_nation == want


def test_yoy_growth_consistent_with_revenue(spark, sf_dir):
    rows = _rows("q_sales_yoy", spark, sf_dir)
    assert rows
    for r in rows:
        assert r.revenue > 0
        if r.prev_revenue is not None:
            assert abs(r.yoy_growth - (r.revenue / r.prev_revenue - 1.0)) < 1e-12
        else:
            assert r.yoy_growth is None


def test_ltv_cumulative_is_monotone(spark, sf_dir):
    rows = _rows("q_events_ltv_cohort", spark, sf_dir)
    by_cohort: dict[str, list] = {}
    for r in rows:
        assert r.age >= 0
        by_cohort.setdefault(r.cohort, []).append(r)
    for rs in by_cohort.values():
        rs.sort(key=lambda r: r.age)
        run = 0.0
        for r in rs:
            assert r.cum_rev >= run - 1e-9, r
            run = r.cum_rev


def test_neyman_respects_allocation_and_budget(spark, sf_dir):
    rows = _rows("q_sample_neyman", spark, sf_dir)
    assert rows
    per: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.rk <= r.a_h, r
        per.setdefault(r.event_type, []).append(r)
    total_alloc = sum(rs[0].a_h for rs in per.values())
    assert total_alloc <= 400
    for rs in per.values():
        assert len(rs) == min(rs[0].a_h, rs[0].n_h), rs[0]


def test_confusion_metrics_consistent(spark, sf_dir):
    rows = _rows("q_text_confusion", spark, sf_dir)
    assert rows
    macro = {round(r.macro_f1, 9) for r in rows}
    assert len(macro) == 1
    f1s = []
    for r in rows:
        assert 0 <= r.tp <= min(r.n_true, r.n_pred if r.n_pred else r.n_true), r
        assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0, r
        assert 0.0 <= r.f1 <= 1.0 + 1e-9, r
        f1s.append(r.f1)
    assert abs(rows[0].macro_f1 - sum(f1s) / len(f1s)) < 2e-6


def test_cluster_quality_db_index_valid(spark, sf_dir):
    rows = _rows("q_cluster_quality", spark, sf_dir)
    n_corpus = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()[0]
    assert sum(r.n_vecs for r in rows) == n_corpus
    db = {round(r.db_index, 9) for r in rows}
    assert len(db) == 1 and rows[0].db_index > 0
    for r in rows:
        assert r.s_mean > 0 and r.r_i > 0, r
    assert abs(rows[0].db_index - sum(r.r_i for r in rows) / len(rows)) < 2e-6
