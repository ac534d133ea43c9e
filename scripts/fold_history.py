#!/usr/bin/env python
"""Registry-rotation helper: fold a round's CORRECTNESS_r{N}.json into
DRIVER_GREEN_HISTORY and print the staleness ranking the next head-50
should be built from (CLAUDE.md "Registry rotation each round").

Usage:
  python scripts/fold_history.py CORRECTNESS_r10.json 10

Prints:
  1. the folded DRIVER_GREEN_HISTORY literal (paste into
     plans/__init__.py),
  2. every query ranked by last-green round (stalest first — the
     promotion order), flagging never-driver-seen queries,
  3. any non-green rows in the new record (these MUST stay in-cap).

Read-only: never edits source. The guard tests
(tests/test_plans.py: contract_order / tail / history) remain the
check that a hand-applied rotation is consistent.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    record_path, round_no = sys.argv[1], int(sys.argv[2])
    record = json.load(open(record_path))

    from tia_data_pipeline_spark import plans

    hist = {q: sorted(rs) for q, rs in plans.DRIVER_GREEN_HISTORY.items()}
    bad = []
    for q, row in record.items():
        # a row is green only when NOTHING mismatched: rows, schema,
        # and hash (hash/schema may be absent on rows-only checks —
        # only an explicit False is a failure)
        green = (
            bool(row.get("rows_match"))
            and not row.get("err")
            and row.get("schema_match") is not False
            and row.get("hash_match") is not False
        )
        if not green:
            bad.append((q, row))
            continue
        hist.setdefault(q, [])
        if round_no not in hist[q]:
            hist[q].append(round_no)
            hist[q].sort()

    print("DRIVER_GREEN_HISTORY = {")
    for q in sorted(hist):
        print(f'    "{q}": {hist[q]},')
    print("}")
    print()
    print("# staleness ranking (last green round, stalest first):")
    last = {q: (max(rs) if rs else 0) for q, rs in hist.items()}
    for q in plans.REGISTRY:
        last.setdefault(q, 0)  # never driver-seen
    for q, r in sorted(last.items(), key=lambda kv: (kv[1], kv[0])):
        tag = "  <-- NEVER DRIVER-SEEN (must be in head)" if r == 0 else ""
        print(f"#   r{r:<2} {q}{tag}")
    if bad:
        print()
        print("# NON-GREEN rows this round (keep in-cap, investigate):")
        for q, row in bad:
            print(f"#   {q}: {row}")


if __name__ == "__main__":
    main()
