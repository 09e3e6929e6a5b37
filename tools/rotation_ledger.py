"""Driver-certification ledger: which registry queries has the verification
driver ever certified (green in some CORRECTNESS_r{N}.json), which are
backlog, and what the next rotation batches are.

Derivation is mechanical, not prose: each round's window composition comes
from that round's committed ``__spark_entry__.py`` (``git show
<commit>:__spark_entry__.py`` → its ``queries()`` order, first 50), and a
slot counts as DRIVER-CERTIFIED only when the matching
``CORRECTNESS_r{N}.json`` records all three checks green for it. The output
feeds the per-round rotation decision (VERDICT r6 #1/#2: burn the
never-certified backlog at 25 slots/round).

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

# The entry-file commit whose window the driver ran for round N.  Derived
# once from `git log -- __spark_entry__.py` vs the round timestamps in
# PROGRESS.jsonl; append a row per round when the window rotates.
ROUND_WINDOW_COMMITS = {
    1: "baadd480ce9ec5133c1b0b4d25eabc43de0fa06a",
    2: "ee3e54cd86f16df389b93cc6795f005d45c7028d",
    3: "5f10daf4c0df8747c4fd9bc21907462db3f2be4b",
    4: "61e621f1626eb09c8be8cd0d40fd2148ebe5b7f3",
    5: "235dea9df9a4cda5acc33dbe05e602891f0639c2",
    6: "0f25d5fd1dbd2f48207005de59c99c2dfd736fd8",
    7: "e601a537635cd6e813b5a6fff2f3a467d9722665",
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

# The r8 batch ROUND7.md declared and pre-certified through BOTH session
# modes (tuned + JSE_CERTIFY_VANILLA=1) and both oracle fetch models — it
# goes first regardless of registry order so the next rotation is
# unambiguous.
PREFERRED_NEXT = [
    "ext_kcore",
    "ext_audio_features",
    "ext_cohort_retention",
    "ext_tfidf_topterms",
    "ext_length_trim",
    "ext_pmi_bigrams",
    "ext_duplicated_ngrams",
    "ext_train_test_split",
    "ext_pseudonymize",
    "ext_temperature_mix",
    "ext_kfold",
    "ext_stratified_sample",
    "ext_corpus_shuffle",
    "ext_snapshot_diff",
    "ext_ntile_segments",
    "ext_event_transitions",
    "ext_histogram",
    "ext_corr_profile",
    "ext_facet_counts",
    "ext_suggest_next",
    "ext_autocomplete",
    "ext_pmi_collocations",
    "ext_dq_audit",
    "ext_zorder_key",
    "ext_cap_per_group",
]


def window_for_commit(commit: str) -> list[str]:
    """First-50 queries() order of the entry file at ``commit`` — run in a
    subprocess so each historical module resolves against the CURRENT
    registry (names that no longer exist are dropped, mirroring the
    driver's behavior of calling whatever queries() returns)."""
    src = subprocess.run(
        ["git", "show", f"{commit}:__spark_entry__.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    # Parse _PRIORITY statically (no Spark needed): the literal list plus
    # the q01..q24 comprehension prefix it always starts with.
    names: list[str] = []
    m = re.search(r"_PRIORITY\s*=\s*\[(.*?)\]\s*\n", src, re.S)
    if m:
        body = m.group(1)
        if "n.startswith" in body:
            names.extend(f"q{i:02d}" for i in range(1, 25))
        names.extend(re.findall(r'"((?:q|sql|ext|x)[\w]*)"', body))
    else:
        # pre-_PRIORITY rounds: queries() built the dict literally
        names.extend(re.findall(r'"(q\d{2}_[\w]*|sql_frontdoor|ext_[\w]*|x\d_[\w]*)"\s*:', src))
    # early windows list bare q-prefixes; canonicalize against CORRECTNESS
    return names[:50]


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
    for i, b in enumerate(led["batches"], start=8):
        print(f"r{i} batch ({len(b)}): {' '.join(b)}")
    print(f"never-rotate: {' '.join(led['never_rotate'])}")
    print(f"rows-only: {' '.join(led['rows_only'])}")


if __name__ == "__main__":
    main()
