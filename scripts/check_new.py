"""Ad-hoc parity check for a subset of registered queries.

Usage: python scripts/check_new.py name1 name2 ... [--sf /root/testdata/sf0.001]
Mirrors tests/test_oracle_parity.py's canonicalization.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import duckdb

import __spark_entry__ as entrymod
from cta_train_tracker_analytics_spark.data import TABLES
from cta_train_tracker_analytics_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf = args[i + 1]
        del args[i : i + 2]

    import os

    os.environ["SPARK_GRAFT_TEST_SF"] = sf
    from test_oracle_parity import canonical_rows  # noqa: E402

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(app_name="check-new", shuffle_partitions=8)
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    failed = []
    for name in args:
        try:
            sdf = queries[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"{name}: rows-only, {len(sdf)} rows OK")
                continue
            odf = duck.execute(oracles[name]).df()
            assert sorted(sdf.columns) == sorted(odf.columns), (
                f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            assert len(sdf) == len(odf), f"rows {len(sdf)} vs {len(odf)}"
            s, o = canonical_rows(sdf), canonical_rows(odf)
            if s != o:
                diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
                raise AssertionError(f"values differ, first: {diffs}")
            print(f"{name}: OK ({len(sdf)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAIL — {e}")
            failed.append(name)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
