"""Emit the live registry/oracle/window counts as one JSON line — the
numbers round docs (ROUND{N}.md, COVERAGE.md) must quote instead of
hand-counting (r3 verdict nit #1: docs said 242/235 while the imported
registry was 243/236).

Usage: python tools/registry_counts.py
Output: {"queries": N, "oracles": N, "no_oracle": [names...],
         "window": 50, "window_all_oracled": true, "tests": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402


def counts() -> dict:
    qs = entry.queries()
    oracles = entry.oracle_sql()
    window = list(qs)[:50]
    out = {
        "queries": len(qs),
        "oracles": len(oracles),
        "no_oracle": sorted(set(qs) - set(oracles)),
        "window": len(window),
        "window_all_oracled": all(name in oracles for name in window),
    }
    try:
        collected = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
            capture_output=True, text=True, timeout=300,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout
        for line in reversed(collected.strip().splitlines()):
            if "test" in line and ("collected" in line or "selected" in line):
                out["tests"] = int(line.split()[0])
                break
    except Exception:
        pass
    return out


if __name__ == "__main__":
    print(json.dumps(counts()))
