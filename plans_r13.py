#!/usr/bin/env python
"""Capture .explain('formatted') for headline queries into plans/r13/.

Usage:
    python plans_r13.py before [query ...]   # write <q>_before.txt
    python plans_r13.py after  [query ...]   # write <q>_after.txt

With no query names, captures every HEADLINE query from bench.py. The
suffix file is only written when absent OR when the stage is 'after'
(re-capture after a change); 'before' files are write-once — also with
explicit names (round-12 advisor: the old `and not names` clause let an
explicit-name invocation clobber pre-optimization evidence).

Note: queries whose construction is eager (ann_recall_report collects its
rows driver-side) explain as a LocalTableScan — the plan evidence for those
lives in the per-tier frames, captured separately as
ann_recall_report__<tier>_{before,after}.txt.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(REPO, "plans", "r13")


def capture(df, path: str) -> None:
    # The same JVM hook DataFrame.explain("formatted") prints through,
    # captured as a string instead of stdout.
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(path, "w") as f:
        f.write(s)
    print(f"wrote {os.path.relpath(path, REPO)} ({len(s)} chars)")


def main() -> None:
    stage = sys.argv[1] if len(sys.argv) > 1 else "before"
    assert stage in ("before", "after"), stage
    names = sys.argv[2:]

    os.makedirs(OUT, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE
    from datafusion_dedup_ai_spark.session import build_session
    import __spark_entry__ as entry_mod

    spark = build_session(app_name=f"plans-r13-{stage}")
    qs = entry_mod.queries()
    todo = names or HEADLINE
    for name in todo:
        path = os.path.join(OUT, f"{name}_{stage}.txt")
        if stage == "before" and os.path.exists(path):
            print(f"skip {name} (before exists)")
            continue
        df = qs[name](spark, sf_dir)
        capture(df, path)
    spark.stop()


if __name__ == "__main__":
    main()
