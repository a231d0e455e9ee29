"""Compute the next round's _DRIVER_FIRST ordering (driver-coverage
rotation; see the comment block in plans/queries.py).

The external correctness driver samples the FIRST 50 entries of
``queries()`` per round (verified: CORRECTNESS_r03's keys are exactly
the first 50 of the round-3 dict, in order). This script reads every
CORRECTNESS_r*.json in the repo root plus the current registry and
prints a ready-to-paste _DRIVER_FIRST list:

  1. entries RED in the latest record (re-checks), then
  2. entries with no official row in ANY round (the backlog), then
  3. high-value greens as window filler (flagship gates + one
     representative per heavyweight family), then
  4. everything else, previously-sampled-first is irrelevant past 50.

Run at round start, paste the output over the _DRIVER_FIRST literal in
plans/queries.py, and run `python -m pytest tests/test_bench_list.py
tests/test_queries_oracle.py -q` (the registry import asserts the list
stays a subset of the merged registry).
"""

from __future__ import annotations

import glob
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

FILLER_GREENS = [
    "extract_report_exact",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "quality_filter",
    "extract_text_fingerprint",
    "doc_scores_fingerprint",
]


def main() -> int:
    import __spark_entry__ as entry_mod

    registry = list(entry_mod.oracle_sql())
    records = sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json")))
    sampled: set[str] = set()
    latest_red: list[str] = []
    for path in records:
        rec = json.load(open(path))
        sampled |= set(rec)
        if path == records[-1]:
            latest_red = [
                k
                for k, v in rec.items()
                if not (
                    v.get("hash_match")
                    or (v.get("hash_match") is None and v.get("rows_match"))
                )
                and k in registry
            ]
    backlog = [q for q in registry if q not in sampled]
    filler = [
        q
        for q in FILLER_GREENS
        if q in registry and q not in backlog and q not in latest_red
    ]
    head = latest_red + backlog + filler
    rest = [q for q in registry if q not in head]
    ordered = head + rest
    print(
        f"# reds={len(latest_red)} backlog={len(backlog)} "
        f"filler={len(filler)} (window = first 50)",
        file=sys.stderr,
    )
    print("_DRIVER_FIRST = [")
    for q in ordered:
        print(f'    "{q}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
