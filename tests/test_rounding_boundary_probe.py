"""Cross-engine rounding boundary probes (r8 verdict #6/#7).

`round(double, k)` is the one scalar where Spark and DuckDB can disagree:
Spark rounds the shortest-decimal repr (BigDecimal.valueOf), DuckDB the
binary value, so a result landing EXACTLY on a `.5`-in-shortest-repr
boundary at the rounded digit flips between engines (found live by the
round-7 negative-values sweep at -9.38375; fixed for
agg_seasonality_profile via pure-BIGINT rounding). The remaining oracle
sites that use raw `round(avg|sum(...), k)` are documented-latent; these
probes convert that to MONITORED: for every such site, at both driver
scale factors, the unrounded aggregate must sit measurably far from any
half-point boundary — if testdata regeneration or a query edit ever
moves a value onto one, this fails before the driver hash does.

The round-13 boundary pre-sweep (PLANS.md; exact-Fraction probe at
three SFs) RE-KEYED three of the originally monitored sites to the
pure-BIGINT recipe after finding a calibration bin mean landing exactly
on a boundary at sf0.001: ext_calibration_bins (both columns),
ext_winsorized_mean (order-statistic bounds + cents), and
f_math_std.avg_qty. Their probes are removed below — BIGINT rounding
has no boundary to monitor.

Also pins the ≤2-decimal events.value input contract shared by
agg_seasonality_profile, ext_calibration_bins, and ext_winsorized_mean
(warehouse.py): per-row cents quantization `round(value*100, 0)` is
exact only for ≤2-decimal inputs; the probe asserts every events.value
is unambiguous at the half-cent boundary.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

#: (site, scale-k, probe SQL returning one unrounded column `v`).
#: Each probe reproduces the aggregate INPUT to a `round(..., k)` call in
#: an oracle (file:line in the comment), without the round.
PROBES = [
    # relational.py:88,105 (sql_pricing_summary / Spark SQL twin) + scalar
    ("pricing_avg_disc", 4, """
        SELECT avg(l_discount) AS v FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
    ("pricing_sum_disc_price", 2, """
        SELECT sum(l_extendedprice * (1 - l_discount)) AS v FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
    ("pricing_sum_qty", 2, """
        SELECT sum(l_quantity) AS v FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
    # relational.py flagship_region_pricing revenue (round(sum, 2))
    ("flagship_revenue", 2, """
        SELECT sum(l_extendedprice * (1 - l_discount)) AS v
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, l_returnflag"""),
    # relational.py:338 agg_delay_rate
    ("delay_rate", 4, """
        SELECT avg(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS v
        FROM orders GROUP BY o_orderpriority"""),
    # scalar_queries.py f_math_std (avg re-keyed to BIGINT r13; stddev and
    # median keep raw round() — irrational-valued statistics, monitored)
    ("math_std_stddev", 4,
     "SELECT stddev_samp(l_quantity) AS v FROM lineitem GROUP BY l_returnflag"),
    ("math_std_median", 4,
     "SELECT quantile_cont(l_quantity, 0.5) AS v FROM lineitem GROUP BY l_returnflag"),
    # warehouse.py job_skew_report: mean_rows and the skew factor built on it
    ("skew_mean_rows", 4, """
        SELECT avg(n) AS v FROM (
            SELECT count(*) AS n FROM orders GROUP BY o_custkey)"""),
    ("skew_factor", 4, """
        SELECT max(n) / round(avg(n), 4) AS v FROM (
            SELECT count(*)::DOUBLE AS n FROM orders GROUP BY o_custkey)"""),
    # ext_calibration_bins + ext_winsorized_mean: re-keyed to pure-BIGINT
    # rounding in r13 (PLANS.md boundary pre-sweep) — no probes needed.
    #
    # ---- r15 re-queue pre-sweep (added r14, same move r13 made for the
    # r5 cohort): the r7 cohort + r6 overflow carry five more
    # round(sum(float), 2) groupings not covered by the probes above.
    # LIMITed queries probe only the top rows by unrounded revenue (the
    # shipped rows plus cutoff neighbors): probing every group would
    # false-flag boundaries on rows that never ship. Transcendental
    # sites in the same cohort (ext_drift_psi ln, ext_quality_model
    # sigmoid, ext_pagerank, join_spatial_grid haversine) keep the
    # irrational-valued measure-zero stance (see math_std_stddev note).
    ("obs_metrics_revenue", 2, """
        SELECT sum(l_extendedprice * (1 - l_discount)) AS v
        FROM lineitem WHERE l_returnflag = 'R'"""),
    ("ship_priority_revenue", 2, """
        SELECT v FROM (
          SELECT sum(l_extendedprice * (1 - l_discount)) AS v
          FROM customer
          JOIN orders   ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority)
        ORDER BY v DESC LIMIT 12"""),
    ("incremental_agg_total", 2, """
        SELECT sum(o_totalprice) AS v
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment"""),
    # r16 re-queue pre-sweep (added r14): win_cusum's rounded DOUBLE-SUM
    # aggregates — daily means and their running deviation sums — are
    # the round(avg/sum, 4) class (summation order can differ across
    # engines, so even an exact boundary hit is dangerous here, unlike
    # the integer-ratio/quantile sites in RATIO_SITES).
    ("cusum_daily_mean", 4, """
        SELECT avg(value) AS v FROM events
        WHERE isfinite(value) GROUP BY CAST(ts AS DATE)"""),
    ("cusum_cum_dev", 4, """
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, avg(value) AS v
          FROM events WHERE isfinite(value) GROUP BY CAST(ts AS DATE)
        ),
        m AS (SELECT avg(v) AS mu FROM daily)
        SELECT sum(v - mu) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        FROM daily, m"""),
    # r16 re-queue pre-sweep, r11 cohort (added r15): the two rounded
    # sites in that cohort that are SUMMATION-ORDER-SENSITIVE double sums
    # (so even an exact boundary hit is dangerous — the engines need not
    # agree on the double): gini's rank-weighted spend sum and the
    # time-weighted average's value*microseconds sum. Everything else in
    # the cohort is either an exact-rational site (RATIO_SITES below),
    # grid-exact, or irrational-valued (classification at the end of
    # RATIO_SITES).
    ("gini_unrounded", 6, """
        WITH spend AS (
          SELECT o_custkey, sum(o_totalprice) AS s
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT s, row_number() OVER (ORDER BY s, o_custkey) AS i,
                 count(*) OVER () AS n, sum(s) OVER () AS tot
          FROM spend
        )
        SELECT 2.0 * sum(i * s) / (n * tot) - (n + 1.0) / n AS v
        FROM ranked GROUP BY n, tot"""),
    ("twap_unrounded", 4, """
        WITH g AS (
          SELECT user_id, value, ts,
                 lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     AS next_ts
          FROM events
        ),
        d AS (
          SELECT user_id, value,
                 epoch_us(next_ts) - epoch_us(ts) AS dur_us
          FROM g WHERE next_ts IS NOT NULL
        )
        SELECT sum(value * dur_us) / sum(dur_us) AS v
        FROM d GROUP BY user_id"""),
    # sql_top_returned_customers + sql_market_share: the r14 pre-sweep
    # found LIVE half-cent hits in both (two shipped top-24 revenues and
    # three (nation, year) revenues sat exactly on .xx5 at sf0.01) —
    # re-keyed to the pure-BIGINT sign-branch recipe the same round, so
    # no probes remain; market_share became an exact integer ratio and
    # moved to RATIO_SITES. win_leave_one_out.peer_avg (near-but-not-
    # exact hit at sf0.1) re-keyed likewise; vs_peers stays monitored.
]

#: An aggregate this close to a half-point (in units of the rounded digit)
#: is ambiguous: double-summation-order differences between engines are
#: ~1e-10 relative, so 1e-6 leaves five orders of magnitude of margin
#: while still catching any value that actually sits on a boundary.
BOUNDARY_MARGIN = 1e-6


def _views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "orders", "lineitem", "events",
              "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# --------------------------------------------------------------------------
# Registry-driven probes for INTEGER-RATIO rounded outputs (added r13,
# ahead of the r5 cohort's r14 hash re-queue): jaccard / containment /
# weight / percent_rank-style columns are exact rationals num/den of
# integer counts — the same boundary class as round(avg(cents)) — so
# their oracles are re-run with every round(…, k) STRIPPED and the raw
# values probed. One refinement over the aggregate probes above: a ratio
# whose double is EXACTLY on the boundary (a dyadic rational like
# percent_rank = 1/32 → 0.03125) is BENIGN — both engines see the same
# exact double and round half away from zero identically (Spark
# BigDecimal HALF_UP; DuckDB round()). The danger class is
# near-but-not-exact (the r7 -9.38375 shape: the exact rational is on
# the boundary but its double is not), where Spark rounds the shortest
# decimal repr and DuckDB the binary value.
# --------------------------------------------------------------------------

#: (query, column, k) — column must appear as round(expr, k) in the oracle
RATIO_SITES = [
    ("ext_decontaminate", "bench_frac", 4),
    ("ext_dedup_containment", "containment", 4),
    ("ext_dedup_minhash", "jaccard", 4),
    ("ext_dedup_ngram", "jaccard", 4),
    ("ext_mix_weights", "weight", 6),
    ("ext_repetition_stats", "top_unigram_frac", 6),
    ("ext_repetition_stats", "dup_token_frac", 6),
    ("ext_repetition_stats", "dup_bigram_frac", 6),
    ("ext_token_entropy", "ttr", 4),
    ("win_percent_rank", "pct_rank", 4),
    ("win_percent_rank", "cume", 4),
    ("agg_corr", "qty_price_cov", 2),
    # r15 re-queue pre-sweep (added r14): win_leave_one_out's remaining
    # raw-rounded integer-cents ratio sc*(n-1)/(sum(sc)-sc) — the same
    # exact-rational class as agg_corr's covariance (peer_avg was
    # re-keyed to BIGINT after the pre-sweep found a near-boundary hit
    # at sf0.1, so it has no boundary left to monitor). The inner
    # round(o_totalprice*100) quantization survives _strip_rounds
    # (single-argument, ADVICE r13 #4) so the probed expression is
    # exactly what ships minus the output rounds. sql_market_share's
    # share is an exact integer ratio rev4/sum(rev4) since its r14
    # BIGINT re-key.
    ("win_leave_one_out", "vs_peers", 4),
    ("sql_market_share", "market_share", 6),
    # r16 re-queue pre-sweep (added r14, one cycle early — the r9/r10
    # cohorts re-queue then): two more integer-count ratios, plus the
    # quantile-interpolation class. quantile_cont qualifies for the
    # dyadic-benign rule because it is a deterministic function of the
    # sorted value multiset — no summation-order divergence — exactly
    # like an integer ratio; a double-SUM aggregate does not (those go
    # in PROBES above where even an exact boundary hit flags).
    ("ext_basket_lift", "lift", 4),
    ("ext_ngram_novelty", "novelty", 6),
    ("agg_quantile_bands", "p10", 4),
    ("agg_quantile_bands", "p50", 4),
    ("agg_quantile_bands", "p90", 4),
    # ---- r16 re-queue pre-sweep, r11 cohort (added r15; the r16 rotation
    # is the r10 remainder + the FULL r11 cohort, 49 names). Exact-rational
    # sites — single divisions / half-integer sums / BIGINT-quantized sums
    # / quantile_cont — where both engines compute the identical double, so
    # the dyadic-benign rule applies and only near-but-not-exact boundary
    # hits are dangerous:
    ("agg_funnel", "conv_from_top", 4),        # n_step / n1 integer ratio
    ("agg_pareto_8020", "customer_share", 4),  # min(rn) / max(n)
    ("agg_benford_deviation", "observed_p", 6),  # digit count / total
    ("agg_markov_transitions", "p", 6),        # transition count ratio
    ("ext_auc", "auc", 6),      # rank-sum of half-integers: every term an
                                # exact multiple of 0.5 < 2^52, so the sum
                                # is order-independent-exact in double
    ("ext_ks_test", "ks_stat", 6),  # max |cum/tr - cum/tc| of int ratios
    ("ext_hybrid_retrieval_rrf", "rrf", 6),  # 1/(60+r_l) + 1/(60+r_v)
    ("ext_ab_welch", "mean_a", 4),  # avg of 2-decimal values: cents ratio
    ("ext_ab_welch", "mean_b", 4),
    ("ext_mad_outliers", "med", 4),  # quantile_cont class (deterministic
    ("ext_mad_outliers", "mad", 4),  # function of the sorted multiset)
    ("ext_bootstrap_ci", "mean_value", 4),  # BIGINT-cents sums / counts
    ("ext_bootstrap_ci", "ci_low", 4),      # order statistics of exact
    ("ext_bootstrap_ci", "ci_high", 4),     # per-replicate cents ratios
    ("ext_kmeans_update", "coord", 6),  # sum(BIGINT qv) / (n * 10^6)
    # ext_text_readability.flesch: this sweep found it LIVE — several
    # driver-corpus documents score EXACTLY on .xxxx5 at k=4 (60.67375,
    # 50.09875, 44.81125 at sf0.01; ≤3-decimal constants over integer
    # counts make an exact 5-decimal rational, the calibration-bins
    # class) — re-keyed r15 to the pure-BIGINT sign-branch recipe on
    # both engines; no boundary left to monitor.
    ("win_wow_change", "wow_change", 6),  # cents-grid revenue ratio - 1
    # ---- r17 re-queue pre-sweep, r12 cohort (added r15, one cycle
    # early — the pattern has paid for itself three rounds running). Of
    # the 48 r12-cohort names, 14 carry rounded oracle sites and ALL but
    # one are already covered: agg_delay_rate / sql_pricing_summary /
    # flagship_region_pricing sit in PROBES since r8-r13; the six
    # rounded cosine outputs (ext_dedup_embed* / ext_sim_search_ivf_
    # sharded / ext_knn_graph_ivf_*) are the irrational class with their
    # cos >= 0.2 membership thresholds and ANN windows monitored by
    # test_cosine_tie_probe; ext_lm_perplexity.avg_nll is ln-based
    # (irrational); agg_concat_union / agg_group_by_day / join_key_equi
    # round cents-grid sums of 2-decimal inputs at k=2 (grid-exact).
    # The one new site:
    ("ext_quality_filter", "score", 4),  # n_alpha / n_chars int ratio
    # (its >= 0.5 / <= 0.3 quality thresholds are single divisions of
    # the same integers on both engines — identical doubles, no
    # membership risk, unlike pareto's order-sensitive double sums)
    # ---- r18 re-queue pre-sweep, r13 cohort (added r15; with this the
    # whole forward re-queue through r18 is classified). 19 of its 50
    # names carry rounded sites; covered already: the five RATIO_SITES
    # veterans (corr cov / decontaminate / containment / minhash /
    # ngram jaccards), the three BIGINT re-keys (calibration_bins /
    # winsorized_mean / f_math_std avg) plus f_math_std's probed
    # stddev/median, grid-exact cents sums at k=2 (salted_skew — BIGINT
    # cents on the Spark side since r11 — bucketed_colocated,
    # str_tumbling_day / str_microbatch_sink totals, all over 2-decimal
    # inputs), and the irrational class (corr, bm25 ln, haversine trig,
    # prod/knn cosine outputs). New exact-rational sites:
    ("agg_custom_pandas_udaf", "iq_median", 4),  # quantile_cont class
    ("ext_sim_recall", "recall", 4),             # hits / k int ratios
    ("ext_knn_graph_recall", "recall", 4),
    ("ext_knn_graph_prod_recall", "recall", 4),
    # NOT probed from the r11 cohort (irrational-valued, measure-zero
    # stance per math_std_stddev): benford_p/abs_dev (log10), ext_ab_welch
    # t_stat (sqrt), win_ewma (alpha powers), every rounded cosine/dot
    # output (ext_sim_search*/ext_knn_graph*/ext_tfidf_cosine_pairs/
    # ext_hard_negatives — and their WINDOW boundaries are monitored by
    # tests/test_cosine_tie_probe.py; hybrid_rrf's vector arm is the same
    # probed top-10 window over vec_id<3 ⊂ vec_id<5 queries). Grid-exact
    # (cents-grid sums/passthroughs of ≤2-decimal inputs, rounded at k=2
    # where the nearest half-cent boundary is 0.005 away): agg_cube /
    # agg_rollup / agg_grouping_sets / sql_lateral_topk / win_ntile lo,hi /
    # win_ohlc / win_drawdown / ext_cohort_ltv / ext_rfm_segments /
    # win_wow_change revenue columns. Invariant-boolean oracles (no
    # rounding at all): agg_approx_distinct / agg_hll_union /
    # agg_kll_quantiles / ext_compression_quality / ext_dedup_minhash_mllib.
]


def _strip_rounds(sql: str) -> str:
    """Remove every two-argument ``round(expr, k)`` wrapper
    (paren-matched), leaving ``(expr)`` so the probed column carries the
    raw double. Single-argument ``round(expr)`` calls are QUANTIZATION
    (e.g. the cents recipe's ``round(value*100)``), not output rounding —
    stripping one would make the probe evaluate a different expression
    than ships, so they are left intact (ADVICE r13 #4)."""
    out = sql
    search_from = 0
    while True:
        i = out.lower().find("round(", search_from)
        if i < 0:
            return out
        depth = 0
        j = i + len("round(") - 1  # position of the opening paren
        last_comma = None
        for p in range(j, len(out)):
            c = out[p]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = p
                    break
            elif c == "," and depth == 1:
                last_comma = p
        else:  # unbalanced — leave untouched rather than corrupt
            return out
        if last_comma is None:
            # single-argument round: quantization, keep it and scan on
            search_from = j + 1
            continue
        inner = out[j + 1: last_comma]
        out = out[:i] + "(" + inner + ")" + out[end + 1:]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_integer_ratio_outputs_avoid_inexact_half_boundaries(sf_dir):
    from cta_train_tracker_analytics_spark.plans import registry

    con = _views(sf_dir)
    offenders = []
    by_query: dict[str, list[tuple[str, int]]] = {}
    for q, col, k in RATIO_SITES:
        by_query.setdefault(q, []).append((col, k))
    for q, cols in by_query.items():
        sql = _strip_rounds(registry.spec(q).oracle)
        rows = con.execute(sql).fetch_df()
        for col, k in cols:
            for v in rows[col]:
                if v is None or v != v:
                    continue
                x = float(v) * 10**k * 2
                nearest_odd = 2 * round((x - 1) / 2) + 1
                d = abs(x - nearest_odd)
                # d == 0: dyadic-exact boundary, both engines agree
                # (away from zero on the same exact double) — benign
                if 0 < d <= BOUNDARY_MARGIN:
                    offenders.append((q, col, sf_dir, float(v)))
    con.close()
    assert offenders == [], (
        "integer-ratio output sits NEAR (not exactly on) a .5 rounding "
        "boundary — the engines may round it apart; apply the BIGINT "
        f"recipe at these sites: {offenders}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_no_rounded_aggregate_sits_on_a_half_point_boundary(sf_dir):
    con = _views(sf_dir)
    offenders = []
    for site, k, sql in PROBES:
        for (v,) in con.execute(sql).fetchall():
            if v is None or v != v:  # NULL / NaN: nothing gets rounded
                continue
            frac = (v * 10**k) % 1.0
            if abs(frac - 0.5) <= BOUNDARY_MARGIN:
                offenders.append((site, sf_dir, v))
    con.close()
    assert offenders == [], (
        "aggregate landed on a cross-engine .5 rounding boundary — apply "
        f"the pure-BIGINT rounding recipe at these sites: {offenders}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_pareto_cutoff_clears_threshold_boundary(sf_dir):
    """agg_pareto_8020's ``WHERE cum >= 0.8 * tot`` is THRESHOLD
    MEMBERSHIP over order-sensitive double sums (r16 re-queue pre-sweep,
    added r15): if a customer's cumulative spend sits exactly at 80% of
    total, the two engines — summing in different orders and multiplying
    by the non-binary-representable 0.8 — can disagree on which row is
    the cutoff, shifting min(rn) and with it customer_share. Exact check
    in BIGINT cents (o_totalprice is 2-decimal, pinned by
    test_money_columns_are_exact_two_decimal): 5*cum - 4*tot is an exact
    integer; an exact ZERO is the danger class here (unlike the dyadic-
    benign rounding sites, threshold comparison gives no deterministic
    tiebreak), and any nonzero integer distance is >= 1 cent-unit —
    ~10^5 x the double-evaluation noise, so membership cannot flip."""
    con = _views(sf_dir)
    (min_gap,) = con.execute("""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS sc
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT sc,
                 sum(sc) OVER (ORDER BY sc DESC, o_custkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum,
                 sum(sc) OVER () AS tot
          FROM spend
        )
        SELECT min(abs(5 * cum - 4 * tot)) FROM ranked""").fetchone()
    con.close()
    assert min_gap is not None and min_gap >= 1, (
        f"a cumulative spend sits EXACTLY on the 80% threshold at "
        f"{sf_dir} — re-key agg_pareto_8020's cutoff to the BIGINT-cents "
        "comparison (5*cum_cents >= 4*tot_cents) on both engines before "
        "its driver re-queue"
    )


def test_strip_rounds_only_removes_two_argument_output_rounding():
    """ADVICE r13 #4: single-argument round() is QUANTIZATION (part of the
    shipped expression, e.g. round(value*100) in the cents recipe), not
    output rounding — the probe must evaluate it as shipped."""
    assert _strip_rounds("SELECT round(avg(x), 4) AS v") == "SELECT (avg(x)) AS v"
    keep = "SELECT round(value * 100) AS cents"
    assert _strip_rounds(keep) == keep
    mixed = "SELECT round(sum(round(v * 100)) / 100.0, 2) AS v"
    assert _strip_rounds(mixed) == "SELECT (sum(round(v * 100)) / 100.0) AS v"


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001"] + SF_DIRS
)
def test_lineitem_quantity_is_integral(sf_dir):
    """f_math_std's BIGINT avg recipe (scalar_queries.py) assumes
    l_quantity — stored as DOUBLE — is always integral: a fractional
    quantity would make Spark's cast (truncate) and DuckDB's CAST (round)
    diverge and the *20000 integer formula misround (ADVICE r13 #1). The
    input contract holds on today's data; this pin fails before the
    driver hash does if testdata regeneration ever breaks it."""
    con = _views(sf_dir)
    (n,) = con.execute(
        """SELECT count(*) FROM lineitem
           WHERE NOT isfinite(l_quantity) OR l_quantity != trunc(l_quantity)"""
    ).fetchone()
    con.close()
    assert n == 0, f"{n} lineitem.l_quantity rows are non-integral/non-finite"


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001"] + SF_DIRS
)
def test_money_columns_are_exact_two_decimal(sf_dir):
    """The r14 BIGINT revenue recipe (sql_top_returned_customers /
    sql_market_share) is exact ONLY because l_extendedprice and
    l_discount are exact 2-decimal values — cents(price) and
    cents(discount) must be integers — and win_leave_one_out's
    round(o_totalprice*100) cents quantization assumes the same of
    o_totalprice. Same input-contract class as the events.value
    half-cent pin below (ADVICE r13 #1): holds on today's data, fails
    here before the driver hash if testdata regeneration breaks it."""
    con = _views(sf_dir)
    (n_price, n_disc) = con.execute(
        f"""SELECT
              count(*) FILTER (WHERE NOT isfinite(l_extendedprice)
                  OR abs(l_extendedprice * 100
                         - round(l_extendedprice * 100)) > {BOUNDARY_MARGIN}),
              count(*) FILTER (WHERE NOT isfinite(l_discount)
                  OR abs(l_discount * 100
                         - round(l_discount * 100)) > {BOUNDARY_MARGIN})
            FROM lineitem"""
    ).fetchone()
    (n_total,) = con.execute(
        f"""SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet')
            WHERE NOT isfinite(o_totalprice)
               OR abs(o_totalprice * 100
                      - round(o_totalprice * 100)) > {BOUNDARY_MARGIN}"""
    ).fetchone()
    con.close()
    assert (n_price, n_disc, n_total) == (0, 0, 0), (
        f"non-2-decimal money values: extendedprice={n_price} "
        f"discount={n_disc} totalprice={n_total}"
    )


def test_sign_branch_halfup_div_semantics_match_duckdb():
    """The BIGINT half-away-from-zero recipe relies on Spark's ``div``
    (truncating) and DuckDB's ``//`` (flooring) agreeing — true only
    because the sign branch feeds both a NONNEGATIVE numerator. Pin the
    recipe on adversarial values (exact halves, both signs, zero) so a
    refactor that drops the sign branch fails here, not at a driver
    hash: floor(-1.75) = -2 but trunc(-1.75) = -1, the exact divergence
    the branch exists to avoid."""
    import duckdb

    cases = [150, 50, -50, -150, 0, 249, -249, 251, -251, 100, -100]
    # reference: round-half-away-from-zero of v4 / 100 (10^-4 units -> cents)
    expected = [
        (abs(v) * 2 + 100) // 200 * (1 if v >= 0 else -1) for v in cases
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT CASE WHEN {v} >= 0 THEN (2 * {v} + 100) // 200 "
            f"ELSE -((2 * ({-v})::BIGINT + 100) // 200) END"
        ).fetchone()[0]
        for v in cases
    ]
    con.close()
    from cta_train_tracker_analytics_spark.session import get_spark

    spark = get_spark(app_name="halfup-pin")
    df = spark.createDataFrame([(v,) for v in cases], "rev4 bigint")
    from pyspark.sql import functions as F

    got_spark = [
        r["c"]
        for r in df.select(
            F.when(
                F.col("rev4") >= 0, F.expr("(2 * rev4 + 100) div 200")
            ).otherwise(-F.expr("(2 * (-rev4) + 100) div 200")).alias("c")
        ).collect()
    ]
    assert got_duck == expected
    assert got_spark == expected


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_seasonality_cents_quantization_is_unambiguous(sf_dir):
    """agg_seasonality_profile's `round(value*100, 0)` per-row
    quantization assumes ≤2-decimal inputs; any events.value within the
    margin of a half-cent would quantize differently across engines."""
    con = _views(sf_dir)
    (n,) = con.execute(
        f"""SELECT count(*) FROM events
            WHERE isfinite(value)
              AND abs(abs((value * 100) % 1.0) - 0.5) <= {BOUNDARY_MARGIN}"""
    ).fetchone()
    con.close()
    assert n == 0, f"{n} events.value rows sit on the half-cent boundary"
