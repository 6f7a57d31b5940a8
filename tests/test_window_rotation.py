"""Rotation-correctness guard for the driver's 50-slot window.

The single cheapest high-stakes mistake in this repo (VERDICT r3 #1)
is a stale `_WINDOW`: the driver would re-verify 50 already-green ids
and waste the whole round. This test mechanizes the rotation rule
against the recorded CORRECTNESS files:

1. every id whose LATEST driver verdict is non-green must be in the
   window (fail-closure first);
2. no id with a green latest verdict may occupy a slot while any
   registered id has never been checked (never re-verify green while
   unchecked ids remain);
3. the window holds exactly 50 distinct registered ids and load_all()
   puts them first.

INTENTIONAL side effect: the moment a new CORRECTNESS_r{N}.json lands
recording the current window green, rule 2 starts failing — that is
the next round's builder being forced to rotate `_WINDOW` (and run
`python tools_ledger.py`) BEFORE any other work, exactly the
always-first action every verdict has demanded. Rotate, driver-sim the
chosen 50, and this test goes green again.
"""

from __future__ import annotations

import glob
import json
import os
import re

from datafusion_wasm_bindings_spark.queries import _WINDOW, load_all

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_verdicts():
    last: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        for qid, v in data.items():
            last[qid] = bool(
                v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
                and not v.get("err")
            )
    return last


def test_window_is_50_distinct_registered_ids_and_leads_registry():
    registry = load_all()
    assert len(_WINDOW) == 50 and len(set(_WINDOW)) == 50
    missing = [q for q in _WINDOW if q not in registry]
    assert not missing, f"window names unregistered ids: {missing}"
    assert list(registry)[:50] == list(_WINDOW)


def test_window_rotation_priorities():
    registry = load_all()
    last = _latest_verdicts()
    nongreen = {q for q, ok in last.items() if not ok and q in registry}
    never = [q for q in registry if q not in last]
    w = set(_WINDOW)
    # 1. fail-closure: every non-green id is in the window (until its
    # re-check is recorded green in a later CORRECTNESS file)
    left_out = nongreen - w
    assert not left_out, f"non-green ids not in window: {sorted(left_out)}"
    # 2. no green id occupies a slot while never-checked ids remain
    # OUTSIDE the window — when every never-checked id already has a
    # slot, the spare slots legitimately re-verify the oldest greens
    # (VERDICT r5 #1: 46 never-checked + 4 re-verify slots).
    never_left_out = [q for q in never if q not in w]
    if never_left_out:
        greens_in_window = sorted(
            q for q in _WINDOW if last.get(q) is True
        )
        assert not greens_in_window, (
            f"window re-verifies green ids {greens_in_window} while "
            f"{len(never_left_out)} ids have never been checked and "
            f"are not in the window"
        )
