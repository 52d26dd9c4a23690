#!/usr/bin/env python
"""Ad-hoc single-query parity check against the DuckDB oracle at sf0.01 —
the fast inner loop while authoring a new registry entry (the full suite
replay is tests/test_oracle_parity.py):

    python scripts/check_parity.py agg_mode_median ext_tfidf_topk
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from cta_train_tracker_analytics_spark.session import get_spark  # noqa: E402
from test_oracle_parity import canonical_rows  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    names = sys.argv[1:]
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    spark = get_spark(app_name="parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    rc = 0
    for name in names:
        sdf = queries[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(oracles[name]).df()
        s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
        if s_cols != o_cols:
            print(f"{name}: SCHEMA MISMATCH spark={s_cols} oracle={o_cols}")
            rc = 1
            continue
        srows, orows = canonical_rows(sdf), canonical_rows(odf)
        if len(srows) != len(orows):
            print(f"{name}: ROWS MISMATCH spark={len(srows)} oracle={len(orows)}")
            rc = 1
        elif srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b]
            print(f"{name}: VALUE MISMATCH at {len(diffs)} rows, first: ")
            i = diffs[0]
            print("  spark :", srows[i])
            print("  oracle:", orows[i])
            rc = 1
        else:
            print(f"{name}: OK ({len(srows)} rows)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
