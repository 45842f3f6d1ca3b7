"""Derive the registry totals from the registry itself and check the
prose that quotes them (README.md, COVERAGE.md) — the totals have
drifted twice before when written by hand.

Usage: python tools/totals.py          # print + check, exit 1 on drift
       python tools/totals.py --print  # just print the numbers
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def registry_totals() -> tuple[int, int]:
    import __ray_entry__ as e

    return len(e.queries()), len(e.oracle_sql())


def check_docs(nq: int, no: int) -> list[str]:
    """Every '<N> `queries()` entries / named pipelines' and
    '<M> ... oracle' mention in README/COVERAGE must equal the
    registry-derived totals."""
    problems = []
    for path in ("README.md", "COVERAGE.md"):
        text = open(os.path.join(ROOT, path), encoding="utf-8").read()
        for m in re.finditer(
            r"(\d+)\s+(?:`queries\(\)`\s+entries|named pipelines|"
            r"operator pipelines)", text
        ):
            if int(m.group(1)) != nq:
                problems.append(
                    f"{path}: says {m.group(1)} queries, registry has {nq}")
        for m in re.finditer(
            r"(\d+)\s+(?:of them\s+)?(?:with\s+)?(?:DuckDB\s+)?"
            r"(?:`oracle_sql\(\)`|DuckDB\s+oracle)", text
        ):
            if int(m.group(1)) != no:
                problems.append(
                    f"{path}: says {m.group(1)} oracles, registry has {no}")
    return problems


if __name__ == "__main__":
    nq, no = registry_totals()
    print(f"queries={nq} oracles={no}")
    if "--print" in sys.argv:
        sys.exit(0)
    problems = check_docs(nq, no)
    for p in problems:
        print("DRIFT:", p)
    sys.exit(1 if problems else 0)
