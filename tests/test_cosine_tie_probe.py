"""Cross-engine cosine near-tie boundary probes (r13 verdict stretch #7).

The ANN family ranks by UNROUNDED cosine with an id tiebreak
(operators/similarity.py assignment argmax / probe slice; llm.py graph
top-3 and search top-10 windows; the prod residence-cap eviction rank).
Output values are rounded, but WHICH rows ship is decided by unrounded
comparisons — so two candidates whose cosines differ by less than the
engines' double-summation disagreement could rank apart between Spark
(sequential fold) and the DuckDB oracle, flipping a row at a window
boundary and with it the driver hash. This was the one documented
latent surface left after r13 (VERDICT r13 "what's wrong" #3).

Same philosophy as tests/test_rounding_boundary_probe.py: convert
documented-latent to MONITORED. For every BINDING window boundary in
the shipped corpora (both driver scale factors), measure the gap
|Δcos| between the two candidates that straddle the boundary and
assert it clears the summation noise floor by a wide margin. An EXACT
tie (gap == 0, bit-identical doubles) is benign — both engines break
it by id identically; the danger class is near-but-not-zero, exactly
like the dyadic refinement in the integer-ratio probe.

Noise floor: dims = 64, double eps ~ 1.1e-16, unit-normalized inputs →
sequential-vs-any-order summation disagreement <= ~64·eps ≈ 7e-15
relative. MARGIN = 1e-9 leaves > 5 orders of magnitude while still
catching any genuinely colliding pair. The windows are replicated in
numpy from the shipped knob formulas (llm.py ext_knn_graph_prod:
n_cells = max(8, ceil(N/250)), cap = 2*ceil(N/n_cells), nprobe=2; at
both driver SFs n_cells = 8 and n_coarse=3 <= n_branches=4, so the
two-level tree degenerates to flat multi-probe — the prod docstring's
documented driver-scale regime — and the flat replication below IS the
shipped candidate structure)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIRS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
MARGIN = 1e-9


def _load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    df = t.to_pandas()
    df = df[df["embedding"].notna()].sort_values("vec_id")
    ids = df["vec_id"].to_numpy()
    v = np.array([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    labels = df["label"].to_numpy()
    return ids, v, labels


def _min_positive(gaps: list[float]) -> float:
    pos = [g for g in gaps if g > 0]
    return min(pos) if pos else math.inf


def _windows(sf_dir: str) -> dict[str, float]:
    """Min positive boundary gap per shipped window type."""
    ids, v, labels = _load(sf_dir)
    n = len(ids)
    n_cells = max(8, math.ceil(n / 250))
    cap = 2 * math.ceil(n / n_cells)
    nrm = np.linalg.norm(v, axis=1)

    # centroids: the n_cells smallest vec_ids (ids are sorted ascending)
    c = v[:n_cells]
    c_nrm = nrm[:n_cells]
    cs_cent = (v @ c.T) / np.outer(nrm, c_nrm)  # (n, n_cells)

    # per-vector centroid ranking under (cos DESC, cent_id ASC): stable
    # argsort on -cos preserves ascending cent_id among equal cos
    order = np.argsort(-cs_cent, axis=1, kind="stable")
    ranked = np.take_along_axis(cs_cent, order, axis=1)

    gaps: dict[str, list[float]] = {
        "assign_argmax": [],      # rank1|2: residence / single-assign cell
        "probe_set": [],          # rank2|3: nprobe=2 probed-set membership
        "residence_cap": [],      # prod cap eviction rank (if binding)
        "graph_top3_knn": [],     # same-(label,cell) top-3 (ext_knn_graph)
        "graph_top3_prod": [],    # probed-cells vs probe-1 top-3 (prod)
        "hardneg_top3": [],       # different-label same-cell top-3
        "search_top10": [],       # per-query rank10|11 (search family)
    }
    gaps["assign_argmax"] = list(ranked[:, 0] - ranked[:, 1])
    gaps["probe_set"] = list(ranked[:, 1] - ranked[:, 2])

    cell1 = order[:, 0]  # residence (argmax) cell
    cell2 = order[:, 1]  # second probe

    # residence-cap eviction: per over-cap residence cell, members ranked
    # by (cos-to-cell DESC, id ASC); the boundary is rank cap|cap+1
    for cell in range(n_cells):
        members = np.where(cell1 == cell)[0]
        if len(members) <= cap:
            continue  # cap not binding for this cell
        aff = cs_cent[members, cell]
        srt = np.sort(aff)[::-1]
        gaps["residence_cap"].append(srt[cap - 1] - srt[cap])

    cs_all = (v @ v.T) / np.outer(nrm, nrm)
    np.fill_diagonal(cs_all, -np.inf)

    def topk_boundary(cands: np.ndarray, row: np.ndarray, k: int):
        if len(cands) <= k:
            return None  # window not binding: every candidate ships
        vals = np.sort(row[cands])[::-1]
        return vals[k - 1] - vals[k]

    for u in range(n):
        # ext_knn_graph: candidates share label AND argmax cell
        knn_c = np.where(
            (labels == labels[u]) & (cell1 == cell1[u]) & (np.arange(n) != u)
        )[0]
        g = topk_boundary(knn_c, cs_all[u], 3)
        if g is not None:
            gaps["graph_top3_knn"].append(g)
        # prod: left side probes 2 cells, right side is probe-1 residents
        prod_c = np.where(
            ((cell1 == cell1[u]) | (cell1 == cell2[u])) & (np.arange(n) != u)
        )[0]
        g = topk_boundary(prod_c, cs_all[u], 3)
        if g is not None:
            gaps["graph_top3_prod"].append(g)
        # ext_hard_negatives: different label, same argmax cell
        hn_c = np.where(
            (labels != labels[u]) & (cell1 == cell1[u]) & (np.arange(n) != u)
        )[0]
        g = topk_boundary(hn_c, cs_all[u], 3)
        if g is not None:
            gaps["hardneg_top3"].append(g)

    # search family: queries are vec_id < 5 (result queries); exact search
    # ranks ALL corpus rows, IVF ranks the query's argmax cell — the exact
    # (full-candidate) window dominates, and the IVF window is probed too.
    # Query rows selected by the SHIPPED predicate ids < 5, not position
    # (ADVICE r14 #2: positional rows 0-4 match only while non-null
    # vec_ids are contiguous from 0 — true today, but unpinned; a
    # regenerated id space would have silently probed the wrong rows)
    for q in np.where(ids < 5)[0]:
        g = topk_boundary(
            np.delete(np.arange(n), q), cs_all[q], 10
        )
        if g is not None:
            gaps["search_top10"].append(g)
        ivf_c = np.where((cell1 == cell1[q]) & (np.arange(n) != q))[0]
        g = topk_boundary(ivf_c, cs_all[q], 10)
        if g is not None:
            gaps["search_top10"].append(g)

    return {k: _min_positive(g) for k, g in gaps.items()}


#: every cosine THRESHOLD compared against an unrounded float sum in a
#: registered query (llm.py): semdedup's within-cell cos >= 0.2 and the
#: LSH embed-dedup verify joins' cos >= 0.2 (lsh_bucketed_pairs /
#: lsh_banded_pairs). Jaccard/containment thresholds (0.0/0.3/0.7/0.8)
#: are EXACT integer ratios — both engines divide the same integers and
#: get bit-identical doubles — so only cosine cutoffs carry flip risk.
COS_THRESHOLDS = [0.2]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cosine_threshold_gaps_clear_summation_noise(sf_dir):
    """A pair whose cosine sits within the engines' summation
    disagreement of a >= threshold flips MEMBERSHIP (not just rank)
    between Spark and the oracle. Probed over ALL distinct pairs — a
    superset of every candidate set any LSH/cell blocking produces, so
    clearing here clears every shipped comparison."""
    ids, v, _ = _load(sf_dir)
    nrm = np.linalg.norm(v, axis=1)
    cs = (v @ v.T) / np.outer(nrm, nrm)
    iu = np.triu_indices(len(ids), k=1)
    vals = cs[iu]
    offenders = {}
    for t in COS_THRESHOLDS:
        d = np.abs(vals - t)
        mn = float(d.min())
        if 0 < mn <= MARGIN:
            offenders[t] = mn
    assert offenders == {}, (
        f"pair cosine within summation noise of a membership threshold "
        f"at {sf_dir}: {offenders}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cosine_window_boundaries_clear_summation_noise(sf_dir):
    mins = _windows(sf_dir)
    offenders = {k: g for k, g in mins.items() if g <= MARGIN}
    assert offenders == {}, (
        "cosine window boundary gap within cross-engine summation noise — "
        "two candidates could rank apart between Spark and the oracle at "
        f"these windows: {offenders} (min gaps overall: {mins})"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_tfidf_cosine_threshold_gap_clears_summation_noise(sf_dir):
    """ext_tfidf_cosine_pairs keeps pairs by ``dot/(nrm_a*nrm_b) >= 0.8``
    — threshold MEMBERSHIP over order-sensitive double sums of ln-based
    tf-idf weights (r15: found by the systematic threshold-comparison
    scan that followed the pareto-cutoff probe; it was the one remaining
    unmonitored membership boundary over a summation-order-sensitive
    expression). A candidate pair whose unrounded cosine sits within the
    engines' summation disagreement of 0.8 flips in/out of the result
    between Spark and DuckDB. The probe replays the ORACLE's own
    candidate structure (rare-trigram-blocked pairs) with the threshold
    and output rounding removed — derived from the live oracle text so
    it cannot drift from what ships — and asserts every candidate
    cosine clears 0.8 by more than the noise floor (~1e-13 relative for
    a few-hundred-term dot product; MARGIN 1e-9 leaves 4 orders)."""
    import duckdb

    from cta_train_tracker_analytics_spark.plans import registry

    oracle = registry.spec("ext_tfidf_cosine_pairs").oracle
    select_marker = "round(d.dot / (na.nrm * nb.nrm), 4) AS cos_sim"
    where_marker = "WHERE d.dot / (na.nrm * nb.nrm) >= 0.8"
    assert select_marker in oracle and where_marker in oracle, (
        "ext_tfidf_cosine_pairs oracle changed shape — update this probe's "
        "markers so the threshold stays monitored"
    )
    probe = oracle.replace(
        select_marker, "d.dot / (na.nrm * nb.nrm) AS cs"
    ).replace(where_marker, "")

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    (min_gap,) = con.execute(
        f"SELECT min(abs(cs - 0.8)) FROM ({probe})"
    ).fetchone()
    con.close()
    # no candidate pairs -> no boundary to sit on
    if min_gap is None:
        return
    assert min_gap > MARGIN, (
        f"a rare-trigram candidate pair's tf-idf cosine sits within "
        f"summation noise of the 0.8 membership threshold at {sf_dir} "
        f"(gap {min_gap}) — re-key the cutoff before the next driver "
        "re-queue of ext_tfidf_cosine_pairs"
    )
