"""Inspect the driver-coverage ordering (now SELF-MAINTAINING).

Since round 5 the ordering is computed at import time by
``plans.queries.driver_order()`` from the committed CORRECTNESS_r*.json
records — reds first, then stale rows-only pipeline entries, then the
never-sampled backlog, then filler greens (see the comment block in
plans/queries.py). Nothing needs to be pasted anywhere anymore; this
script just prints the order the driver will see next round, with the
status that put each entry where it is, so a human can audit the window
before round end.

Usage: python scripts/rotate_registry.py [--window 50]
"""

from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def main() -> int:
    window = 50
    if "--window" in sys.argv:
        i = sys.argv.index("--window")
        if i + 1 >= len(sys.argv):
            print("usage: rotate_registry.py [--window N]", file=sys.stderr)
            return 2
        window = int(sys.argv[i + 1])

    import __spark_entry__ as entry_mod
    from text_extraction_evaluation_spark.plans.queries import (
        ROWS_ONLY_PIPELINE,
        _find_correctness_records,
        official_row_green,
    )

    order = list(entry_mod.queries())
    recs = _find_correctness_records()
    latest: dict[str, tuple[str, dict]] = {}
    for path in recs:
        # same tolerance as driver_order(): a malformed record is
        # skipped there, so the audit must skip it too (and say so)
        # rather than crash with a different view of the record set
        try:
            rec = json.load(open(path))
        except (OSError, ValueError) as exc:
            print(f"skipping unreadable {path}: {exc!r}", file=sys.stderr)
            continue
        for k, v in rec.items():
            if isinstance(v, dict):
                latest[k] = (pathlib.Path(path).stem, v)

    def status(n: str) -> str:
        if n not in latest:
            return "NEVER-SAMPLED"
        rnd, row = latest[n]
        if n in ROWS_ONLY_PIPELINE:
            kind = "rows-only"
        elif official_row_green(row):
            kind = "green"
        else:
            kind = "RED/ERR"
        return f"{kind} @{rnd}"

    for i, n in enumerate(order):
        marker = "|" if i == window else " "
        if i == window:
            print(f"---- driver window ends ({window}) ----")
        print(f"{marker}{i:3d}  {n:34s} {status(n)}")
    in_window = order[:window]
    never = [n for n in in_window if n not in latest]
    print(
        f"\nwindow={window}: {len(never)} never-sampled, "
        f"{sum(1 for n in in_window if n in ROWS_ONLY_PIPELINE)} rows-only, "
        f"{len(in_window) - len(never)} re-checks",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
