"""Rotation-ledger invariants: the tool that picks each round's driver
window rotation (tools/rotation_ledger.py) must keep its bookkeeping
sound — wrong batches here become silent driver reds next round."""

from __future__ import annotations

import importlib
import sys

sys.path.insert(0, "/root/repo")


def _ledger():
    mod = importlib.import_module("tools.rotation_ledger")
    return mod, mod.ledger()


def test_batches_partition_the_backlog():
    """Batches are disjoint, cover the whole post-window backlog, and
    never contain a never-rotate query or an already-certified one."""
    mod, led = _ledger()
    seen: set[str] = set()
    for batch in led["batches"]:
        assert not (set(batch) & seen), "batches overlap"
        seen.update(batch)
        assert len(batch) <= 25
    assert len(seen) == led["backlog_after_window"]
    assert not (seen & set(led["never_rotate"]))
    assert not (seen & set(led["certified_rounds"]))
    assert not (seen & set(led["in_window_pending"]))


def test_preferred_r8_batch_leads():
    """ROUND7's dual-mode pre-certified r8 batch goes first, in order,
    for every member still in the backlog."""
    mod, led = _ledger()
    future = [n for b in led["batches"] for n in b]
    preferred_still_pending = [n for n in mod.PREFERRED_NEXT if n in future]
    assert future[: len(preferred_still_pending)] == preferred_still_pending


def test_certified_rounds_match_artifacts():
    """Every (query, round) the ledger claims certified is green on all
    three checks in that round's CORRECTNESS artifact."""
    import json
    import os

    mod, led = _ledger()
    docs = {}
    for name, rounds in led["certified_rounds"].items():
        for rnd in rounds:
            path = f"/root/repo/CORRECTNESS_r{rnd:02d}.json"
            if rnd not in docs:
                docs[rnd] = json.load(open(path)) if os.path.exists(path) else {}
            rec = docs[rnd].get(name)
            assert rec and rec["rows_match"] and rec["schema_match"] and rec[
                "hash_match"
            ], f"{name} not green in r{rnd}"


def test_window_audit_consistent_with_artifacts():
    """Every round's committed entry-file window (window_for_commit on the
    ROUND_WINDOW_COMMITS map) must match the keys of that round's
    CORRECTNESS artifact — the driver's own record of the window it ran.
    A MISMATCH means the commit map points at the wrong entry-file state
    (this caught the original r1/r3 mis-mapping: both pointed at commits
    that landed AFTER their round's close)."""
    mod, led = _ledger()
    audit = led["window_audit"]
    assert set(audit) == set(mod.ROUND_WINDOW_COMMITS) & {
        rnd for rnd in audit  # rounds with an artifact on disk
    }
    assert audit, "no rounds audited"
    for rnd, rec in audit.items():
        assert rec["status"] in ("ok", "registry-order"), (rnd, rec)
        assert rec["artifact_slots"] == 50
    # r1 predates _PRIORITY (queries() returned dict(_QUERIES)): the
    # composition is only recorded by the artifact itself
    assert audit[1]["status"] == "registry-order"


def test_counts_are_consistent():
    mod, led = _ledger()
    # rotatable = oracled minus the two oracled never-rotate exclusions
    oracled_never = 2  # quantize/zscore embeddings (array repr hazard)
    assert (
        len(led["certified_rounds"])
        + len(led["in_window_pending"])
        + led["backlog_after_window"]
        + oracled_never
        == led["oracled"]
    )
    assert led["registry"] - led["oracled"] == len(led["rows_only"])
