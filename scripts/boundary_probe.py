"""Round-13 pre-rotation boundary probe over the latent round(avg(..), k)
oracle sites (VERDICT r12 task #2).

For each site, recompute the EXACT rational average per group with
Python Fractions over DuckDB-fetched exact sums (events.value and
l_discount are exact cents, l_quantity / flags / counts are integers),
and report the distance of avg*10^k to the nearest .5 rounding boundary.
A distance ~0 means Spark (shortest-decimal HALF_UP) and DuckDB (binary
round) can disagree on TODAY's data; a comfortable distance means the r4
re-queue is safe and the site stays documented-latent.

Runs at sf0.001, sf0.01 (the driver's correctness scale) and sf0.1.
"""
import duckdb
from fractions import Fraction

SITES = {
    # name: (sql producing per-group (num, den, scale_k) with EXACT integer num/den)
    "sql_pricing_summary.avg_disc(k=4)": """
        SELECT CAST(round(sum(l_discount*100),0) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 100 AS unit
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    "agg_delay_rate.rate(k=4)": """
        SELECT CAST(sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 1 AS unit
        FROM orders GROUP BY o_orderpriority""",
    "f_math_std.avg_qty(k=4)": """
        SELECT CAST(sum(l_quantity) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 1 AS unit
        FROM lineitem GROUP BY l_returnflag""",
    "job_skew_report.mean_rows(k=4)": """
        WITH kk AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
        SELECT CAST(sum(n) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 1 AS unit
        FROM kk""",
    "ext_calibration_bins.mean_score(k=4)": """
        WITH e AS (SELECT * FROM events WHERE isfinite(value)),
        s AS (SELECT least(CAST(floor(value/50.0) AS INTEGER), 9) AS bin, value FROM e)
        SELECT CAST(round(sum(value*100),0) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 100 AS unit
        FROM s GROUP BY bin""",
    "ext_calibration_bins.purchase_rate(k=6)": """
        WITH e AS (SELECT * FROM events WHERE isfinite(value)),
        s AS (SELECT least(CAST(floor(value/50.0) AS INTEGER), 9) AS bin,
                     CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS label FROM e)
        SELECT CAST(sum(label) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 6 AS k, 1 AS unit
        FROM s GROUP BY bin""",
    "ext_winsorized_mean.raw_mean(k=4)": """
        WITH e AS (SELECT * FROM events WHERE isfinite(value))
        SELECT CAST(round(sum(value*100),0) AS BIGINT) AS num100,
               CAST(count(*) AS BIGINT) AS den, 4 AS k, 100 AS unit
        FROM e GROUP BY event_type""",
}

# Sites whose averaged values are NOT exact decimals (quantile-clipped
# doubles): probe approximately — distance of the double avg*10^k to the
# nearest .5 boundary. Far (>1e-6) means no flip possible on today's data.
APPROX_SITES = {
    "ext_winsorized_mean.winsorized_mean(k=4)": """
        WITH e AS (SELECT * FROM events WHERE isfinite(value)),
        b AS (SELECT event_type, quantile_cont(value,0.05) AS lo,
                     quantile_cont(value,0.95) AS hi
              FROM e GROUP BY event_type)
        SELECT avg(least(greatest(e.value,b.lo),b.hi)) AS a, 4 AS k
        FROM e JOIN b USING (event_type) GROUP BY e.event_type""",
}

for sf in ("sf0.001", "sf0.01", "sf0.1"):
    con = duckdb.connect()
    for t in ("lineitem", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/{sf}/{t}.parquet')"
        )
    print(f"== {sf} ==")
    for name, sql in SITES.items():
        rows = con.execute(sql).fetchall()
        worst = None
        for num, den, k, unit in rows:
            if den == 0:
                continue
            # avg = num / (unit*den); boundary when avg*10^k*2 is an odd integer
            x = Fraction(int(num) * 10**k * 2, int(unit) * int(den))
            # distance (in units of 1, i.e. half-ulps of the rounded digit)
            # to the nearest ODD integer = the ambiguous .5 boundary
            fl = x.numerator // x.denominator
            cands = [fl - 1, fl, fl + 1, fl + 2]
            d = min(abs(x - c) for c in cands if c % 2 == 1)
            if worst is None or d < worst:
                worst = d
        print(f"  {name:45s} groups={len(rows):3d} min_boundary_dist={float(worst):.3e}")
    for name, sql in APPROX_SITES.items():
        rows = con.execute(sql).fetchall()
        worst = None
        for a, k in rows:
            x = a * 10**k * 2
            d = abs(x - (2 * round((x - 1) / 2) + 1))  # dist to nearest odd int
            if worst is None or d < worst:
                worst = d
        print(f"  {name:45s} groups={len(rows):3d} approx_boundary_dist={worst:.3e}")
    con.close()
print("dist >= ~1e-3 half-ulps -> no flip possible on today's data; "
      "0 exactly -> engines may already disagree")
