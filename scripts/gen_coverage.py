#!/usr/bin/env python
"""Regenerate COVERAGE.md from the live query registry.

Run after adding/moving queries so the operator-inventory map (file:line,
check kind, first doc line) never goes stale:

    python scripts/gen_coverage.py
"""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cta_train_tracker_analytics_spark.plans import registry  # noqa: E402

#: section layout mirrors SURVEY.md §2; new queries go to the section their
#: name prefix maps to (fallback: the prefix itself, appended at the end).
SECTIONS = [
    ("flagship", ["flagship_region_pricing"]),
    ("SQL text API", ["sql_"]),
    ("§2.1 sources", ["src_"]),
    ("§2.1 sinks", ["snk_"]),
    ("§3.3 jobs", ["job_"]),
    ("§2.2 projections/filters", ["arr_", "explode_", "filter_", "nav_", "proj_"]),
    ("§2.3 joins", ["join_"]),
    ("§2.4 aggregations", ["agg_"]),
    ("§2.5 windows", ["win_"]),
    ("§2.6 sorts/limits", ["sort_"]),
    ("§2.7 set ops", ["set_"]),
    ("§2.8 scalar functions", ["f_"]),
    ("§2.9 streaming", ["str_"]),
    ("§2.11 LLM-pipeline (EXT)", ["ext_", "snk_training_shards"]),
]


def section_for(name: str) -> str:
    for title, pats in SECTIONS:
        for p in pats:
            if name == p or (p.endswith("_") and name.startswith(p)):
                return title
    return "other"


def main() -> None:
    registry._ensure_loaded()
    rows: dict[str, list[str]] = {}
    n_oracle = 0
    for name, spec in sorted(registry._REGISTRY.items()):
        fn = spec.fn
        src = Path(inspect.getsourcefile(fn)).relative_to(REPO)
        line = inspect.getsourcelines(fn)[1]
        if spec.oracle is not None:
            check = "hash-checked (DuckDB oracle)"
            n_oracle += 1
        else:
            check = "rows-only (non-SQL-expressible)"
        doc = (spec.doc.splitlines() or [""])[0].rstrip()
        rows.setdefault(section_for(name), []).append(
            f"| `{name}` | `{src}:{line}` | {check} | {doc} |"
        )
    total = sum(len(v) for v in rows.values())
    out = [
        "# COVERAGE — SURVEY.md §2 operator inventory → implementation map",
        "",
        "Generated from the live query registry (scripts/gen_coverage.py).",
        "Every row is a registered `queries()` entry verified by the driver at",
        "sf0.01; 'hash-checked' rows also carry `oracle_sql()` DuckDB SQL",
        "compared by row-count + schema + order-insensitive value hash.",
        "Unit/plan tests in `tests/`.",
        f"**{total} queries; {n_oracle} oracle-checked, {total - n_oracle} rows-only.**",
        "",
    ]
    titles = [t for t, _ in SECTIONS] + [t for t in rows if t not in dict(SECTIONS)]
    for title in titles:
        if title not in rows:
            continue
        out += ["", f"## {title}", "", "| query | implementation | check | what it does |", "|---|---|---|---|"]
        out += rows[title]
    out.append("")
    (REPO / "COVERAGE.md").write_text("\n".join(out))
    print(f"COVERAGE.md: {total} queries, {n_oracle} oracle-checked")


if __name__ == "__main__":
    main()
