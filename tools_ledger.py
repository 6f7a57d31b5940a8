"""Regenerate COVERAGE.md's driver-verification ledger from
CORRECTNESS_r*.json — run after each round so window rotation stays
mechanical (CLAUDE.md convention)."""
import glob
import json
import re

rounds = {}
for path in sorted(glob.glob("CORRECTNESS_r*.json")):
    r = int(re.search(r"r(\d+)", path).group(1))
    rounds[r] = json.load(open(path))

import importlib

from datafusion_wasm_bindings_spark import queries as _q
from datafusion_wasm_bindings_spark.queries import _WINDOW, load_all

# snapshot REGISTRATION order before load_all's window reorder (fresh
# process: decorators fire in module import order) — the staleness plan
# below tie-breaks equal-round ids by it
for _mod in _q._MODULES:
    try:
        importlib.import_module(f"datafusion_wasm_bindings_spark.queries.{_mod}")
    except ModuleNotFoundError:
        pass
REG_ORDER = list(_q.QUERIES)
names = list(load_all())


def status(rec):
    if rec.get("err"):
        return "err"
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return "green"
    return "hash-fail"


NOTES = {
    "q_dedup_paragraph": "r2 fail was oracle HUGEINT dtype; oracle cast to BIGINT, awaiting r4 window",
    "q_text_stats": "same HUGEINT fix, awaiting r4 window",
    "q_events_props_json": "same HUGEINT fix, awaiting r4 window",
    "q_pipeline_training_mix": "same HUGEINT fix, awaiting r4 window",
    "q_pipeline_pack": "same HUGEINT fix, awaiting r4 window",
    "q_profile_columns": "same HUGEINT fix, awaiting r4 window",
    "q_fn_sum_avg_min_max": "same HUGEINT fix, awaiting r4 window",
    "q_fn_math_gaps": "oracle factorial()->HUGEINT cast pre-emptively before first check",
    "q_win_ranking": "r1 fail (DECIMAL output); fixed r2, re-check in r3 window",
    "q_agg_order_within": "r1 fail (array output); fixed r2, re-check in r3 window",
    "q_dedup_embedding": "r3 rebacked with LSH buckets (all-pairs kept as oracle), awaiting r4 window",
    "q_profile_columns_approx": "new r3 (100 TB HLL mode), awaiting r4 window",
    "q_pipeline_split": "new r3 (leakage-safe group split), awaiting r4 window",
    "q_pipeline_epochs": "new r3 (quality-weighted epochs), awaiting r4 window",
    "q_text_tokens_bpe": "new r3 (GPT-2-style pre-tokenizer counts), awaiting r4 window",
    "q_text_tfidf": "new r3 (top-k TF-IDF keywords), awaiting r4 window",
    "q_pipeline_rownum": "new r3 wave 4 (bucketed global row ids), awaiting r4 window",
    "q_events_interval_merge": "new r3 wave 4, awaiting r4 window",
    "q_events_markov": "new r3 wave 4, awaiting r4 window",
    "q_events_attribution": "new r3 wave 4, awaiting r4 window",
    "q_clean_winsorize": "new r3 wave 4 (order-statistic clip), awaiting r4 window",
    "q_text_normalize": "new r3 wave 4, awaiting r4 window",
    "q_union_by_name": "new r3 wave 4, awaiting r4 window",
    "q_scale_balanced_write": "new r3 wave 4, awaiting r4 window",
    "q_fn_try_arith": "new r3 wave 5 (error-safe try_*), awaiting r4 window",
    "q_fn_url_parse": "new r3 wave 5, awaiting r4 window",
    "q_fn_map_ops": "new r3 wave 5, awaiting r4 window",
    "q_fn_bitmap_distinct": "new r3 wave 5 (exact mergeable distinct), awaiting r4 window",
    "q_events_gapfill": "new r3 wave 5, awaiting r4 window",
    "q_dedup_pipeline": "new r3 wave 6 (end-to-end near-dup removal), awaiting r4 window",
    "q_text_pr_curve": "new r3 wave 6 (threshold sweep), awaiting r4 window",
    "q_scan_text": "new r3 wave 6 (text-lines source), awaiting r4 window",
    "q_fn_argminmax": "new r3 wave 6 (max_by/min_by/count_if), awaiting r4 window",
    "q_fn_pandas_udaf": "new r3 wave 6 (grouped-agg pandas UDF), awaiting r4 window",
    "q_pipeline_incremental_dedup": "new r3 wave 7 (batch-vs-corpus ingest dedup), awaiting r4 window",
    "q_events_windowed_funnel": "new r3 wave 7 (conversion-deadline funnel), awaiting r4 window",
    "q_stream_session": "new r3 wave 7 (streaming session windows), awaiting r4 window",
    "q_text_perplexity": "new r3 wave 7 (unigram-LM quality filter), awaiting r4 window",
    "q_events_active_users": "new r3 wave 7 (DAU/WAU/MAU), awaiting r4 window",
    "q_dedup_containment": "new r3 wave 8 (asymmetric containment), awaiting r4 window",
    "q_events_rfm": "new r3 wave 8 (RFM quintile grid), awaiting r4 window",
    "q_fn_variant": "new r3 wave 8 (Spark 4 VARIANT), awaiting r4 window",
    "q_pipeline_negatives": "new r3 wave 8 (contrastive negatives), awaiting r4 window",
    "q_graph_bfs": "new r3 wave 8 (frontier BFS levels), awaiting r4 window",
    "q_join_spatial": "new r3 wave 8 (grid-cell radius join), awaiting r4 window",
    "q_multimodal_dedup": "new r3 wave 8 (payload content-hash dedup), awaiting r4 window",
    "q_events_ewma": "new r3 wave 8 (truncated-tap EWMA), awaiting r4 window",
    "q_pipeline_curation": "new r3 wave 8 (curation funnel composition), awaiting r4 window",
    "q_profile_kanon": "new r3 wave 9 (k-anonymity audit), awaiting r4 window",
    "q_pipeline_forget": "new r3 wave 9 (deletion propagation), awaiting r4 window",
    "q_pipeline_itemsets": "new r3 wave 9 (market-basket lift mining), awaiting r4 window",
    "q_profile_drift": "new r3 wave 9 (PSI drift monitor), awaiting r4 window",
    "q_events_forecast_backtest": "new r3 wave 9 (seasonal-naive MAPE backtest), awaiting r4 window",
    "q_fn_collation": "new r3 wave 9 (Spark 4 UTF8_LCASE), awaiting r4 window",
    "q_join_interval_overlap": "new r3 wave 9 (span-x-span bucketed), awaiting r4 window",
    "q_sample_balanced": "new r3 wave 9 (class rebalance), awaiting r4 window",
    "q_fn_stringdist": "new r3 wave 9 (levenshtein row), awaiting r4 window",
}

cur_round = max(rounds) + 1 if rounds else 1
lines = [
    "",
    "## Driver verification ledger",
    "",
    "One row per registered query: which round's 50-slot driver window",
    "last checked it and the verdict (green / hash-fail / err / — never",
    "checked). Rotations are chosen mechanically from this table: every",
    "never-checked or non-green id must enter a window before any green",
    "id re-verifies. The upcoming window is `_WINDOW` in",
    "queries/__init__.py. Regenerate with `python tools_ledger.py` after",
    "each round's CORRECTNESS file lands.",
    "",
    "| query id | last checked | verdict | notes |",
    "|---|---|---|---|",
]
for n in sorted(names):
    last, verdict = None, "—"
    for r in sorted(rounds):
        if n in rounds[r]:
            last, verdict = f"r{r}", status(rounds[r][n])
    in_w = f" (in r{cur_round} window)" if n in _WINDOW else ""
    lines.append(f"| `{n}` | {last or '—'}{in_w} | {verdict} | {NOTES.get(n, '')} |")

checked = sum(1 for n in names if any(n in rounds[r] for r in rounds))
green = sum(
    1
    for n in names
    if any(n in rounds[r] for r in rounds)
    and status(rounds[max(r for r in rounds if n in rounds[r])][n]) == "green"
)
lines.append("")
lines.append(
    f"**Cumulative: {checked} of {len(names)} checked; {green} green at last check; "
    f"{len(names) - checked} never in a window.**"
)
def _last_status(n):
    rs = [r for r in rounds if n in rounds[r]]
    return status(rounds[max(rs)][n]) if rs else None


nongreen = [n for n in names if _last_status(n) not in (None, "green")]
never = [n for n in names if _last_status(n) is None]
lines.append("")
lines.append(f"### Round-{cur_round} rotation plan (mechanical, from this ledger)")
lines.append("")
lines.append(f"Priority order for the next 50-slot `_WINDOW`:")
if nongreen:
    lines.append(f"1. fail-closure first — the {len(nongreen)} ids whose latest driver")
    lines.append("   verdict is non-green:")
    lines.append("   " + ", ".join(f"`{n}`" for n in sorted(nongreen)) + ";")
else:
    lines.append("1. no non-green ids await fail-closure;")
lines.append(f"2. never-checked ids in REGISTRATION order until the 50 slots")
lines.append(f"   fill (pool: {len(never)} ids; SURVEY-inventory rows, if any, jump")
lines.append("   the queue so catalog coverage never starves);")
free = 50 - len(nongreen) - len(never)
final_step = "3"
if free > 0:
    final_step = "4"
    # zero-backlog era: spare slots re-verify the STALEST greens,
    # (last-verified round, registration order) — the exact order
    # tests/test_window_rotation.py's staleness rule enforces
    def _last_round(n):
        rs = [r for r in rounds if n in rounds[r]]
        return max(rs) if rs else 0

    reg_idx = {n: i for i, n in enumerate(REG_ORDER)}
    stale = sorted(
        (n for n in names if _last_status(n) == "green"),
        key=lambda n: (_last_round(n), reg_idx.get(n, 1 << 30)),
    )[:free]
    lines.append(f"3. the remaining {free} slots re-verify the stalest greens,")
    lines.append("   oldest (last-verified round, registration order) first —")
    lines.append("   the staleness rule in tests/test_window_rotation.py fails")
    lines.append("   any window that skips them:")
    lines.append("   " + ", ".join(f"`{n}`" for n in stale) + ";")
lines.append(f"{final_step}. run the conftest ORACLE_UNSAFE_TYPES + dtype-parity audit")
lines.append("   (tools_driver_sim.py over the chosen ids) BEFORE committing")
lines.append("   the rotation — tests/test_driver_sim_gate.py enforces the sim")
lines.append("   on any uncommitted query-module edit. Never re-verify a green")
lines.append("   id while any id is unchecked or non-green.")

text = open("COVERAGE.md").read()
text = re.sub(r"\n## Driver verification ledger.*", "", text, flags=re.S)
open("COVERAGE.md", "w").write(text + "\n".join(lines) + "\n")
print("ledger:", checked, "checked,", green, "green,", len(names), "registered")
