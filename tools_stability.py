"""Plan-perturbation stability sweep: run every registered query's
SPARK side once per physical configuration — the session defaults,
then each perturbation axis in ``PERTURBATIONS`` (shuffle partition
count, scan split size, AQE off) — canonicalize every result with the
adversarial replay's null-unified tokenizer, and demand they are all
IDENTICAL to the baseline.

Why this exists (r11): the full skewex campaign at the sf0.01 source
caught q_events_attribution producing a DIFFERENT answer run-to-run —
its first/last_value frames read a column absent from the window
ordering, so Spark's peer order (a function of physical partitioning
and merge order) leaked into the output. The oracle differential only
catches that class when the two engines HAPPEN to disagree on the
draw; a query can flap between "agrees with DuckDB" and "doesn't"
across runs (tools_triage passed while the campaign failed — the
flapping signature). Perturbing the shuffle partition count forces a
different physical peer order DETERMINISTICALLY, so order-dependence
surfaces without waiting for an unlucky draw.

The engine's core determinism design (decimal exact sums, total
orderings over every consumed column, quantized irrational terms,
monotone-invariant bucketings) implies every query's OUTPUT must be
invariant to partitioning. The one contractual exception class is
documented below: sketch-valued outputs whose merge is not
order-invariant by design (their oracles assert rank-epsilon BOUNDS,
not values).

Usage:
  python tools_stability.py [q_id ...]        # default: whole registry
  SPARK_GRAFT_STAB_SRC=<dir> python tools_stability.py
      # default source: the most hostile cached mutation dir if
      # present, else /root/testdata/sf0.001

Writes /tmp/stability_report.json and prints one verdict line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tools_adversarial_replay import _tokens  # null-unified stringify

DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.adaptive.enabled": "true",
}
# Each axis perturbs a DIFFERENT degree of physical freedom:
# - shuffle7: post-exchange peer order (window/agg tie exposure);
# - split256k: map-side task order and the PARTIAL-aggregation merge
#   tree, which shuffle.partitions cannot reach (map-side-only plans
#   have no exchange) — exercises decimal-exact-sum order-invariance;
# - aqe_off: join strategy selection (runtime broadcast vs sort-merge,
#   skew-join splitting, coalesced partitions) — output must not
#   depend on which physical join/partitioning AQE picked.
PERTURBATIONS = [
    ("shuffle7", {"spark.sql.shuffle.partitions": "7"}),
    ("split256k", {"spark.sql.files.maxPartitionBytes": str(256 * 1024)}),
    ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
]

# Outputs that are APPROXIMATE BY CONTRACT and whose sketch merge is
# not order-invariant: a KLL/GK quantile sketch's surfaced value may
# legitimately move within its rank-epsilon band when the merge tree
# changes shape. Their oracles assert the BAND (join-back bounds, see
# CLAUDE.md r6 (f)), so value movement across partitionings is not a
# correctness signal. Exact-sketch families (HLL register max, bitmap
# OR, CMS counters) are order-invariant and deliberately NOT listed.
# Measured r11: the whole 290-id registry is partition-invariant on
# BOTH skewex mutation dirs — this dict stayed empty.
APPROX_ALLOW: dict[str, str] = {}


def _mode_waiver(src: str, name: str) -> str | None:
    """When the source is a cached hostile mutation dir, honor the
    replay campaign's mode-scoped waivers: a query that deterministically
    ABORTS on that dir's hostile data (e.g. the 255-byte dirname limit)
    errors identically at every partitioning — that is the documented
    waiver class, not instability."""
    from tools_adversarial_replay import EXCLUDED

    base = os.path.basename(src.rstrip("/"))
    mode = base.split(".", 1)[0]
    # Mode-scoped ONLY (ADVICE r11): an unscoped fallback would let one
    # hostile axis's waiver silently cover every other axis — and even
    # benign sources whose dirname happens to parse to a matching mode.
    return EXCLUDED.get(f"{mode}:{name}")


def resolve_waiver(src: str, name: str, rec: dict) -> str | None:
    """Full waiver resolution for one unstable record.

    APPROX_ALLOW covers sketch values that may legitimately move across
    partitionings (variant output). A replay-campaign mode waiver covers
    DETERMINISTIC ABORTS only ('err' records, e.g. the dirname-limit
    abort) — variant output on a waived id is a real VARIANT, never
    silently excused (ADVICE r11)."""
    if "err" not in rec:
        return APPROX_ALLOW.get(name)
    return _mode_waiver(src, name)


def canon(pdf):
    s = _tokens(pdf)[sorted(pdf.columns, key=str.lower)]
    key = s.apply(tuple, axis=1)
    return s.iloc[key.argsort(kind="mergesort").to_numpy()].reset_index(drop=True)


def main() -> None:
    from datafusion_wasm_bindings_spark.queries import load_all
    from datafusion_wasm_bindings_spark.queries.sources_q import _ensure_text_fixtures
    from datafusion_wasm_bindings_spark.session import get_spark

    src = os.environ.get("SPARK_GRAFT_STAB_SRC")
    if not src:
        # prefer the most hostile cached mutation dir (ties are real
        # there); fall back to the benign fixture
        cands = []
        root = "/tmp/dfwb_adversarial"
        if os.path.isdir(root):
            cands = sorted(
                os.path.join(root, d) for d in os.listdir(root) if d.startswith("skewex.")
            )
        src = cands[-1] if cands else "/root/testdata/sf0.001"
    only = set(sys.argv[1:]) or None

    _ensure_text_fixtures(src)
    spark = get_spark("dfwb-stability")
    reg = load_all()
    todo = [(k, v) for k, v in reg.items() if only is None or k in only]

    results: dict[str, dict] = {}
    for name, spec in todo:
        rec: dict = {}
        def same(x, y):
            return bool(
                len(x) == len(y)
                and list(x.columns) == list(y.columns)
                and x.equals(y)
            )

        try:
            for k, v in DEFAULTS.items():
                spark.conf.set(k, v)
            base = canon(spec.spark_fn(spark, src).toPandas())
            variant_axes = []
            for label, confs in PERTURBATIONS:
                for k, v in confs.items():
                    spark.conf.set(k, v)
                try:
                    perturbed = canon(spec.spark_fn(spark, src).toPandas())
                finally:
                    for k in confs:
                        spark.conf.set(k, DEFAULTS[k])
                if not same(base, perturbed):
                    variant_axes.append(label)
            rec["stable"] = not variant_axes
            if variant_axes:
                rec["detail"] = f"variant under: {variant_axes}"
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            rec = {"stable": False, "err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            for k, v in DEFAULTS.items():
                spark.conf.set(k, v)
        results[name] = rec

    json.dump(results, open("/tmp/stability_report.json", "w"), indent=1, default=str)
    def _waiver(k: str, v: dict) -> str | None:
        return resolve_waiver(src, k, v)

    bad = {k: v for k, v in results.items() if not v["stable"] and _waiver(k, v) is None}
    waived = {
        k: _waiver(k, v) for k, v in results.items() if not v["stable"] and _waiver(k, v)
    }
    print(
        f"[stability axes: {'+'.join(l for l, _ in PERTURBATIONS)}] "
        f"{len(results) - len(bad) - len(waived)}/{len(results)} stable, "
        f"{len(waived)} waived, {len(bad)} VARIANT  ({src})"
    )
    for k, v in sorted(bad.items()):
        print("  VARIANT", k, {kk: vv for kk, vv in v.items() if kk != "stable"})
    for k in sorted(waived):
        print("  waived", k, "--", waived[k])
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
