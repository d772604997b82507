"""Deterministic driver-window rotation policy.

The external driver's correctness run evaluates only the first ~50
registered queries, so with 150 registered entries the window is a
rotation. Through round 7 the per-round list was hand-picked (documented,
test-pinned, but chosen by the code being graded — the round-7 advisor
flagged that as a selection-bias surface even when the picks look honest).

This module removes the discretion: the window is a PURE FUNCTION of
(a) the committed driver artifacts CORRECTNESS_r*.json — public record of
which entries have been driver-validated and when — and (b) the set of
hash-gated entries. Policy, applied to gated entries only (every window
slot must carry an oracle; rows-only entries get the weaker check anyway
and are replayed by full_correctness.py):

  1. staleness first — entries NEVER seen by the driver, then oldest
     last-validated round ascending;
  2. alphabetical name as the tiebreak within a staleness tier (stable,
     order-independent of the registry's own import order — using registry
     order would let registration shuffles influence the window again).

The per-round literal in entry_queries.py (ROUND9_WINDOW, ...) is the
OUTPUT of this function pinned at rotation time;
tests/test_entry_contract.py asserts literal == computed, so an auditor
can re-derive the window from the committed artifacts alone and any
hand-edit breaks the build.
"""

from __future__ import annotations

import glob
import json
import os
import re

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _row_is_green(row: object) -> bool:
    """A driver row counts as VALIDATED only when it is fully green:
    rows/schema/hash all matched and no error. A red or errored row must
    NOT advance the entry's staleness stamp — under the staleness-first
    policy that would deprioritize exactly the entry that most needs
    re-validation (round-8 advisor item). Rows-only driver rows (no
    oracle => hash_match never true) also don't stamp: if such an entry
    later gains an oracle it re-enters the window as never-hash-validated,
    which is the behavior we want for newly gated entries."""
    if not isinstance(row, dict):
        # pre-r2 artifacts used bare booleans; True meant fully green
        return bool(row) is True
    return (
        bool(row.get("rows_match"))
        and bool(row.get("schema_match"))
        and bool(row.get("hash_match"))
        and not row.get("err")
    )


def load_validation_history(
    repo_root: str = _REPO_ROOT, through_round: int | None = None
) -> dict[str, int]:
    """name -> latest round whose committed CORRECTNESS_r{N}.json contains a
    fully GREEN row for it (entries absent from every artifact — or never
    green — are absent from the map; see _row_is_green).
    ``through_round`` freezes the history at a given round so a pinned
    window stays reproducible after later artifacts land."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if _row_is_green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def compute_rotation_window(
    registered: list[str],
    gated: set[str],
    history: dict[str, int],
    size: int = 50,
) -> list[str]:
    """The next driver window under the staleness-first policy (docstring
    above). Deterministic given its inputs; independent of registration
    order."""
    candidates = sorted(n for n in registered if n in gated)
    return sorted(candidates, key=lambda n: (history.get(n, 0), n))[:size]


def main() -> None:
    """`python -m datafusion_dedup_ai_spark.rotation [through_round]`:
    print the policy window for the NEXT round as a paste-ready literal —
    what an auditor recomputes to check the pinned list, and what the next
    round's rotation starts from (pass the latest completed round number;
    default = every committed artifact)."""
    import sys

    import __spark_entry__ as entry_mod

    through = int(sys.argv[1]) if len(sys.argv) > 1 else None
    history = load_validation_history(through_round=through)
    win = compute_rotation_window(
        list(entry_mod.queries()), set(entry_mod.oracle_sql()), history
    )
    tier = None
    for name in win:
        t = history.get(name, 0)
        if t != tier:
            tier = t
            print(f"    # staleness tier {'0: never driver-validated' if t == 0 else f'r{t}'}")
        print(f'    "{name}",')


if __name__ == "__main__":
    main()
