"""Plan-perturbation stability sweep: run every registered query's
SPARK side twice — once at the session default
``spark.sql.shuffle.partitions`` (32) and once at a co-prime perturbed
setting (7) — canonicalize both results with the adversarial replay's
null-unified tokenizer, and demand they are IDENTICAL.

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

DEFAULT_PARTS = "32"
PERTURBED_PARTS = "7"
# third axis: shrink the scan split size so every file fans out into
# many more input tasks — this perturbs the PARTIAL-aggregation merge
# tree and map-side task order, which shuffle.partitions cannot reach
# (a map-side-only plan has no exchange at all). Directly exercises
# the decimal-exact-sum order-invariance claim.
DEFAULT_SPLIT = str(128 * 1024 * 1024)
PERTURBED_SPLIT = str(256 * 1024)

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
    return EXCLUDED.get(f"{mode}:{name}", EXCLUDED.get(name))


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
        try:
            spark.conf.set("spark.sql.shuffle.partitions", DEFAULT_PARTS)
            spark.conf.set("spark.sql.files.maxPartitionBytes", DEFAULT_SPLIT)
            a = canon(spec.spark_fn(spark, src).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", PERTURBED_PARTS)
            b = canon(spec.spark_fn(spark, src).toPandas())
            spark.conf.set("spark.sql.shuffle.partitions", DEFAULT_PARTS)
            spark.conf.set("spark.sql.files.maxPartitionBytes", PERTURBED_SPLIT)
            c = canon(spec.spark_fn(spark, src).toPandas())

            def same(x, y):
                return bool(
                    len(x) == len(y)
                    and list(x.columns) == list(y.columns)
                    and x.equals(y)
                )

            rec["stable"] = same(a, b) and same(a, c)
            if not rec["stable"]:
                rec["detail"] = (
                    f"shuffle-perturb same={same(a, b)}, "
                    f"scan-split-perturb same={same(a, c)}"
                )
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            rec = {"stable": False, "err": f"{type(e).__name__}: {e}"[:300]}
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", DEFAULT_PARTS)
            spark.conf.set("spark.sql.files.maxPartitionBytes", DEFAULT_SPLIT)
        results[name] = rec

    json.dump(results, open("/tmp/stability_report.json", "w"), indent=1, default=str)
    def _waiver(k: str) -> str | None:
        return APPROX_ALLOW.get(k) or _mode_waiver(src, k)

    bad = {k: v for k, v in results.items() if not v["stable"] and _waiver(k) is None}
    waived = {k: _waiver(k) for k, v in results.items() if not v["stable"] and _waiver(k)}
    print(
        f"[stability shuffle {DEFAULT_PARTS}-vs-{PERTURBED_PARTS} + "
        f"scan-split 128M-vs-256K] "
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
