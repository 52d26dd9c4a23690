#!/usr/bin/env python
"""Retire the legacy-warm floor class from BENCH_DETAIL.json (r14 verdict
#2).

~118 best_ever floors predate r11's env fingerprinting and were set as
DEEP-WARM full-bench minima — a measurement protocol fresh processes sit
1.2-1.8x above. They generated 12 spurious regression flags in r12, 1 in
r13 and 3 in r14, each burning an adjudication session that concluded
"environmental" (PLANS.md r13/r14/r15 ledgers). This script moves every
floor tagged ``protocol: legacy-warm`` out of best_ever/best_ever_env and
into a top-level ``floors_retired`` section (NOT owned by bench.py's
detail_payload, so it carries forward across bench runs and stays
adjudicable — same rationale as provenance.floors_reset, ADVICE r12 #2).
The next full bench run re-sets each floor under the ``bench-run``
protocol, after which every future drift flag compares same-protocol
numbers and is decisive on arrival.

Run once, then run bench.py (twice, back to back — the second run ratchets
any first-run warmup noise out of the new floors):

    python scripts/retire_legacy_floors.py
    python bench.py && python bench.py
"""
from __future__ import annotations

import json
import os

DETAIL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH_DETAIL.json")


def main() -> int:
    with open(DETAIL) as f:
        detail = json.load(f)
    best_ever = detail.get("best_ever", {})
    best_ever_env = detail.get("best_ever_env", {})
    retired = detail.setdefault("floors_retired", {})

    names = sorted(
        n for n in best_ever
        if best_ever_env.get(n, {}).get("protocol") == "legacy-warm"
    )
    for n in names:
        retired[n] = {
            "old_floor": best_ever.pop(n),
            "old_env": best_ever_env.pop(n, None),
            "retired": "r15 legacy-warm class retirement (r14 verdict #2)",
        }
        print(f"retired {n}: {retired[n]['old_floor']}s")

    with open(DETAIL, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"retired {len(names)} legacy-warm floors; "
          f"{len(best_ever)} bench-run floors remain")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
