"""Driver-certification ledger: which registry queries has the verification
driver ever certified (green in some CORRECTNESS_r{N}.json), which are
backlog, and what the next rotation batches are.

Derivation is mechanical, not prose, from two independent records that the
ledger cross-checks against each other:

* the CERTIFIED set comes from the artifacts — a slot counts as
  DRIVER-CERTIFIED only when some ``CORRECTNESS_r{N}.json`` records all
  three checks green for it (the artifact's key set IS the driver's own
  record of the window it ran);
* the WINDOW AUDIT re-derives each round's intended composition from that
  round's committed ``__spark_entry__.py`` (``git show`` →  ``_PRIORITY``,
  first 50) and flags any round where the artifact keys differ from the
  committed window — i.e. the driver ran something other than what was
  committed, or ROUND_WINDOW_COMMITS maps a round to the wrong commit.

The output feeds the per-round rotation decision (VERDICT r6 #1/#2: burn
the never-certified backlog at 25 slots/round).

Usage:
  python tools/rotation_ledger.py            # print ledger + next batches
  python tools/rotation_ledger.py --json     # machine shape
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The entry-file commit whose window the driver ran for round N: the last
# commit touching __spark_entry__.py BEFORE that round's
# "round N: verdict/advice/correctness/bench" close commit (the driver runs
# the sweep, then commits the artifacts). r1 and r3 were originally
# mis-mapped to commits that landed AFTER their round's close (caught by
# audit_windows, r8) — r1's true window predates _PRIORITY entirely
# (queries() returned dict(_QUERIES), registry order), and r3's true window
# is a6abb8db, not the 5f10daf4 rotation that landed 14 minutes after the
# r3 artifacts. Append a row per round when the window rotates.
ROUND_WINDOW_COMMITS = {
    1: "d515b05a41ed6726490aaf3ebfb151f1272a74a4",
    2: "ee3e54cd86f16df389b93cc6795f005d45c7028d",
    3: "a6abb8db28f21fc60223a720d197255809323f2c",
    4: "61e621f1626eb09c8be8cd0d40fd2148ebe5b7f3",
    5: "235dea9df9a4cda5acc33dbe05e602891f0639c2",
    6: "0f25d5fd1dbd2f48207005de59c99c2dfd736fd8",
    7: "e601a537635cd6e813b5a6fff2f3a467d9722665",
    8: "1ef585cc06981114d2ad5d83b7e861f87b3e7294",
    9: "d201cfcee6d7a4925ee612f42091ef87ec3c1620",
}

# Rotation-ineligible registry queries (the window comment in
# __spark_entry__.py documents each): float-sensitive ANN variants score
# red without an oracle; array-emitting queries hit the numpy-repr hazard
# under the pandas fetch model; rows-only queries have no oracle at all.
NEVER_ROTATE = {
    "ext_ann_lsh",
    "ext_ann_ivf",
    "ext_embedding_near_dups",
    "ext_quantize_embeddings",
    "ext_zscore_embeddings",
}

# The batch the NEXT rotation carries, pre-certified through BOTH session
# modes (tuned + JSE_CERTIFY_VANILLA=1) and both oracle fetch models — it
# goes first regardless of registry order so the next rotation is
# unambiguous. r9 state: the r9 batch (pre-certified in r7, re-certified
# post-r8) is IN the window now; this lists the r10 head so the ledger's
# printed batches stay pinned.
PREFERRED_NEXT = [
    "ext_seasonality",
    "ext_new_vs_returning",
    "ext_return_rate",
    "ext_burstiness",
    "ext_gini",
    "ext_autocorrelation",
    "ext_skew_report",
    "ext_cluster_sizes",
    "ext_anomalous_hours",
    "ext_event_paths",
    "ext_first_touch",
    "ext_cohort_ltv",
    "ext_rfm",
    "ext_purchase_intervals",
    "ext_source_quality",
    "ext_weekly_trend",
    "ext_error_rate",
    "ext_pack_multimodal",
    "ext_fk_profile",
    "ext_catalog_summary",
    "ext_abandonment",
    "ext_conversion_lag",
    "ext_peak_hour",
    "ext_log_histogram",
    "ext_audience_overlap",
]


def window_for_commit(commit: str) -> list[str] | None:
    """First-50 window slots of the entry file at ``commit``, parsed
    statically from its ``_PRIORITY`` literal (no Spark needed). Slot
    tokens may be bare ``qNN`` prefixes (the declared-set comprehension);
    :func:`audit_windows` canonicalizes them against the artifact keys.
    Returns ``None`` for pre-``_PRIORITY`` entry files (``queries()``
    returned ``dict(_QUERIES)`` — registry order, not statically
    derivable; only the artifact records that window)."""
    src = subprocess.run(
        ["git", "show", f"{commit}:__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    m = re.search(r"_PRIORITY\s*=\s*\[(.*?)\]\s*\n\n", src, re.S)
    if not m:
        return None
    body = m.group(1)
    names: list[str] = []
    if "n.startswith" in body:
        names.extend(f"q{i:02d}" for i in range(1, 25))
    # the bare "q" comes from the comprehension's n.startswith("q") literal
    names.extend(t for t in re.findall(r'"([\w]+)"', body) if t != "q")
    return names[:50]


def audit_windows() -> dict[int, dict]:
    """Cross-check each round's committed window (window_for_commit)
    against the keys of that round's CORRECTNESS artifact — the driver's
    own record of the window it actually ran. A mismatch means either the
    driver ran a different entry-file state than ROUND_WINDOW_COMMITS maps
    to, or the rotation commit landed after the driver's sweep."""
    out: dict[int, dict] = {}
    for rnd, commit in sorted(ROUND_WINDOW_COMMITS.items()):
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        keys = list(json.load(open(path)))
        tokens = window_for_commit(commit)
        if tokens is None:
            out[rnd] = {"status": "registry-order", "artifact_slots": len(keys)}
            continue

        def _canon(tok: str) -> str | None:
            if tok in keys:
                return tok
            pref = [k for k in keys if k.startswith(tok + "_")]
            return pref[0] if len(pref) == 1 else None

        mapped = {m for m in (_canon(t) for t in tokens) if m is not None}
        missing = sorted(set(keys) - mapped)
        extra = [t for t in tokens if _canon(t) is None]
        out[rnd] = {
            "status": "ok" if not missing and not extra else "MISMATCH",
            "artifact_slots": len(keys),
            "missing_from_window": missing,
            "unmatched_window_tokens": extra,
        }
    return out


def certified_by_round() -> dict[int, set[str]]:
    out: dict[int, set[str]] = {}
    for rnd in sorted(ROUND_WINDOW_COMMITS):
        path = os.path.join(REPO, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        doc = json.load(open(path))
        out[rnd] = {
            name
            for name, rec in doc.items()
            if isinstance(rec, dict)
            and rec.get("rows_match")
            and rec.get("schema_match")
            and rec.get("hash_match")
        }
    return out


def ledger() -> dict:
    import __spark_entry__ as entry  # noqa: PLC0415 (registry import is heavy)

    registry = list(entry.queries())
    oracled = set(entry.oracle_sql())
    certified: dict[str, list[int]] = {}
    for rnd, names in certified_by_round().items():
        for n in names:
            certified.setdefault(n, []).append(rnd)
    backlog = [
        n
        for n in registry
        if n in oracled and n not in certified and n not in NEVER_ROTATE
    ]
    current_window = registry[:50]
    pending = [n for n in current_window if n not in certified]
    # next batches: backlog entries not already in the pending window —
    # the ROUND7-declared (dual-mode pre-certified) r8 batch first.
    future = [n for n in backlog if n not in current_window]
    future = [n for n in PREFERRED_NEXT if n in future] + [
        n for n in future if n not in PREFERRED_NEXT
    ]
    batches = [future[i : i + 25] for i in range(0, len(future), 25)]
    # Post-exhaustion policy (pinned here, not prose): once the
    # never-certified backlog is empty (r12 closes it slot-perfect at
    # 25/25), each subsequent window's slots 26-50 carry the 25
    # EARLIEST-certified rotatable queries for drift re-validation —
    # ordered by (earliest certification round, registry order), declared
    # slots and never-rotate excluded. Re-certifying a query updates its
    # earliest round only in the artifact sense, not here: the re-rotation
    # ORDER is by first certification, so the cycle walks the whole
    # certified set oldest-first round-robin as artifacts accumulate.
    declared = {n for n in registry if (n.startswith("q") and n[1:3].isdigit())}
    declared.add("sql_frontdoor")
    recert_order = sorted(
        (
            n
            for n in certified
            if n in oracled and n not in NEVER_ROTATE and n not in declared
        ),
        key=lambda n: (min(certified[n]), registry.index(n)),
    )
    return {
        "registry": len(registry),
        "oracled": len(oracled),
        "driver_certified": len(certified),
        "in_window_pending": pending,
        "backlog_after_window": len(future),
        "never_rotate": sorted(NEVER_ROTATE),
        "rows_only": sorted(n for n in registry if n not in oracled),
        "batches": batches,
        "certified_rounds": {n: rs for n, rs in sorted(certified.items())},
        "re_rotation_batch": recert_order[:25],
        "window_audit": audit_windows(),
    }


def main() -> None:
    led = ledger()
    if "--json" in sys.argv:
        print(json.dumps(led, indent=1))
        return
    print(
        f"registry={led['registry']} oracled={led['oracled']} "
        f"driver-certified={led['driver_certified']} "
        f"window-pending={len(led['in_window_pending'])} "
        f"backlog-after-window={led['backlog_after_window']}"
    )
    # future batches land in the round after the current (pending) window's
    # artifact; with no pending slots the next rotation is the next round
    last_round = max(led["window_audit"], default=0)
    start = last_round + (2 if led["in_window_pending"] else 1)
    for i, b in enumerate(led["batches"], start=start):
        print(f"r{i} batch ({len(b)}): {' '.join(b)}")
    first_recert = start + len(led["batches"])
    print(
        f"r{first_recert}+ re-rotation (earliest-certified 25, drift "
        f"re-validation): {' '.join(led['re_rotation_batch'])}"
    )
    print(f"never-rotate: {' '.join(led['never_rotate'])}")
    print(f"rows-only: {' '.join(led['rows_only'])}")
    audit = led["window_audit"]
    bad = {r: a for r, a in audit.items() if a["status"] == "MISMATCH"}
    print(
        "window-audit: "
        + (
            f"MISMATCH {bad}"
            if bad
            else f"{len(audit)} rounds consistent with artifacts "
            f"({sum(a['status'] == 'registry-order' for a in audit.values())} "
            "registry-order)"
        )
    )


if __name__ == "__main__":
    main()
