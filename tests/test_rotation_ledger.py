"""Rotation-ledger invariants: the tool that picks each round's driver
window rotation (tools/rotation_ledger.py) must keep its bookkeeping
sound — wrong batches here become silent driver reds next round."""

from __future__ import annotations

import importlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def test_preferred_batch_leads():
    """The pre-certified PREFERRED_NEXT batch goes first, in order, for
    every member still in the backlog."""
    mod, led = _ledger()
    future = [n for b in led["batches"] for n in b]
    preferred_still_pending = [n for n in mod.PREFERRED_NEXT if n in future]
    assert future[: len(preferred_still_pending)] == preferred_still_pending


def test_certified_rounds_match_artifacts():
    """Every (query, round) the ledger claims certified is green on all
    three checks in that round's CORRECTNESS artifact."""
    mod, led = _ledger()
    docs = {}
    for name, rounds in led["certified_rounds"].items():
        for rnd in rounds:
            path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
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
    that landed AFTER their round's close). Coverage: every mapped round
    whose artifact exists ON DISK must have been audited — derived from
    the filesystem, not from the audit's own keys (the pre-r9 version of
    this assertion was a tautology)."""
    mod, led = _ledger()
    audit = led["window_audit"]
    expected = {
        rnd
        for rnd in mod.ROUND_WINDOW_COMMITS
        if os.path.exists(os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json"))
    }
    assert set(audit) == expected, (sorted(audit), sorted(expected))
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


def test_post_exhaustion_re_rotation_policy():
    """Post-r12 window policy (VERDICT r8 #5), pinned: once the backlog is
    empty, slots 26-50 carry the 25 EARLIEST-certified rotatable queries
    for drift re-validation — ordered by (first certification round,
    registry order), declared slots / never-rotate / rows-only excluded."""
    mod, led = _ledger()
    batch = led["re_rotation_batch"]
    assert len(batch) == 25
    certified = led["certified_rounds"]
    oracled_rows_only = set(led["rows_only"])
    for n in batch:
        assert n in certified, n
        assert n not in mod.NEVER_ROTATE, n
        assert n not in oracled_rows_only, n
        assert not (n[0] == "q" and n[1:3].isdigit()), n
        assert n != "sql_frontdoor"
    # ordering: earliest certification round is non-decreasing across the
    # batch, and the batch head is from the oldest certified cohort
    firsts = [min(certified[n]) for n in batch]
    assert firsts == sorted(firsts)
    oldest = min(
        min(rs)
        for q, rs in certified.items()
        if q not in mod.NEVER_ROTATE
        and not (q[0] == "q" and q[1:3].isdigit())
        and q != "sql_frontdoor"
        and q not in oracled_rows_only
    )
    assert firsts[0] == oldest
