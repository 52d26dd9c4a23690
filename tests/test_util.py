"""Pin the private-API probe inside spread() (operators/util.py).

spread() asks the JVM for the partition count via
``df._jdf.queryExecution().toRdd().getNumPartitions()`` — private API, with
a documented fallback to ``df.rdd``. If a Spark bump removes or renames the
probe, the fallback silently changes spread()'s cost profile (a Python RDD
conversion per call); this test fails loudly instead so the bump is noticed
and the probe re-pointed."""

from __future__ import annotations


def test_spread_jvm_probe_api_exists(spark):
    df = spark.range(10)
    qe = df._jdf.queryExecution()
    n = qe.toRdd().getNumPartitions()
    assert n == df.rdd.getNumPartitions()


def test_spread_noop_on_well_partitioned_input(spark):
    from cta_train_tracker_analytics_spark.operators.util import spread

    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    assert spread(wide) is wide  # no repartition inserted
    narrow = spark.range(0, 1000, 1, 1)
    assert spread(narrow) is not narrow


def test_bench_driver_line_is_bounded_and_parseable():
    """bench.py's stdout JSON line must stay far under output-tail capture
    limits at ANY registry size (r6's 137-query line was truncated
    mid-object, destroying the round's perf evidence): 15-slowest only,
    parseable, and < 2 KiB even with 500 registered queries."""
    import json as _json

    import bench

    timings = {f"query_name_padded_{i:04d}": i / 1000.0 for i in range(500)}
    line = bench.driver_line(timings, sum(timings.values()), 0.1)
    assert len(line) < 2048, len(line)
    parsed = _json.loads(line)
    assert parsed["n_queries"] == 500
    assert len(parsed["queries"]) == 15
    assert parsed["value"] > 0


def test_bench_driver_line_filtered_runs_are_labeled():
    """A SPARK_GRAFT_BENCH_ONLY run must never masquerade as the round's
    full headline number: distinct metric name + explicit flag."""
    import json as _json

    import bench

    line = bench.driver_line({"q": 1.0}, 1.0, 0.1, filtered=True)
    parsed = _json.loads(line)
    assert parsed["metric"] == "headline_queries_filtered"
    assert parsed["filtered"] is True
    full = _json.loads(bench.driver_line({"q": 1.0}, 1.0, 0.1))
    assert full["metric"] == "headline_queries_total"
    assert "filtered" not in full


def test_bench_parse_only_strips_and_rejects_unknown():
    import pytest

    import bench

    known = ["a", "b", "c"]
    assert bench.parse_only(" b , a ", known) == ["a", "b"]  # HEADLINE order
    assert bench.parse_only("c,,", known) == ["c"]
    with pytest.raises(SystemExit, match="typo_name"):
        bench.parse_only("a,typo_name", known)


def test_bench_regression_candidates_need_ratio_and_delta():
    """Both thresholds must trip: ratio alone is scheduler jitter on
    sub-second queries, delta alone is invisible on multi-second ones."""
    import bench

    best = {"sub": 0.2, "mid": 1.0, "big": 10.0, "new": None}
    best = {k: v for k, v in best.items() if v is not None}
    timings = {
        "sub": 0.35,   # 1.75x but only +0.15s -> jitter, not flagged
        "mid": 1.8,    # 1.8x and +0.8s -> flagged
        "big": 12.0,   # +2s but only 1.2x -> not flagged
        "brand_new": 5.0,  # no best_ever yet -> not flagged
    }
    assert bench.regression_candidates(timings, best) == ["mid"]


def test_bench_detail_payload_carries_foreign_sections_forward():
    """A bench run must only replace the sections it produces: the first
    full run after the sf1 probe landed clobbered the probe's record out
    of BENCH_DETAIL.json; this pins the carry-forward."""
    import bench

    prior = {
        "queries": {"old": 9.9},
        "best_ever": {"old": 1.0},
        "sf1_probe": {"queries": {"q": {"ratio": 2.0}}},
        "some_future_section": [1, 2],
    }
    out = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False
    )
    assert out["sf1_probe"] == prior["sf1_probe"]
    assert out["some_future_section"] == [1, 2]
    assert out["queries"] == {"q": 1.0}  # owned keys fully replaced
    assert out["provenance"] == {
            "last_run": "full", "merged": False, "env": None, "floors_reset": {},
            "floors_carried_unverified": [], "control_query": None,
            "drift_excused": [],
        }
    filt = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=True,
        env={"loadavg": [0.5, 0.4, 0.3]},
    )
    assert filt["provenance"]["last_run"] == "filtered"
    assert filt["provenance"]["merged"] is True
    assert filt["provenance"]["env"] == {"loadavg": [0.5, 0.4, 0.3]}


def test_bench_best_ever_env_is_owned_and_defaults_empty():
    """best_ever_env (r10 verdict #4: the machine state each per-query
    floor was set under) is an OWNED section: a run replaces it with its
    merged map, never leaves a stale copy via the foreign-key
    carry-forward, and a payload built without one (old callers, tests)
    gets an empty dict — not None, not a KeyError."""
    import bench

    prior = {"best_ever_env": {"stale": {"unix_time": 1}}}
    out = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False
    )
    assert out["best_ever_env"] == {}  # owned: replaced, not carried
    env = {"unix_time": 2, "loadavg": [0.1, 0.1, 0.1]}
    out2 = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
        best_ever_env={"q": env},
    )
    assert out2["best_ever_env"] == {"q": env}


def test_bench_env_fingerprint_shape():
    """The per-run machine-state snapshot (r9 verdict #5) must carry the
    fields drift adjudication needs, as plain JSON-serializable scalars."""
    import json

    import bench

    fp = bench.env_fingerprint()
    assert isinstance(fp["unix_time"], int)  # the one unconditional field
    # every other probe is OPTIONAL by contract (env_fingerprint wraps
    # each in try/except so a platform where /proc or getloadavg fails
    # still records a run) — assert the shape only when present, so the
    # test and function contracts agree (ADVICE r10)
    if "loadavg" in fp:
        assert len(fp["loadavg"]) == 3
    if "memavailable_mb" in fp:
        assert fp["memavailable_mb"] > 0
    if "disk_free_gb" in fp:
        assert fp["disk_free_gb"] > 0
    json.dumps(fp)  # round-trippable


def test_bench_impl_fingerprint_ignores_docs_and_decorators():
    """The floor-reset fingerprint (r11 verdict #2) hashes IMPLEMENTATION
    only: editing a docstring or the @query decorator (which carries the
    oracle SQL) must not churn perf floors, while any body change must."""
    import bench

    def deco(fn):
        return fn

    def q(spark, sf_dir):
        """one docstring"""
        return spark.range(10)

    h1 = bench.impl_fingerprint(q)

    @deco
    def q(spark, sf_dir):  # noqa: F811 — same name, changed doc/decorator
        """a completely different docstring"""
        return spark.range(10)

    h2 = bench.impl_fingerprint(q)

    def q(spark, sf_dir):  # noqa: F811 — same name, changed body
        """one docstring"""
        return spark.range(11)

    h3 = bench.impl_fingerprint(q)
    assert h1 is not None and h1 == h2  # doc/decorator-insensitive
    assert h3 != h1  # body-sensitive
    # renaming the function is a re-key too (the AST dump carries the
    # name) — acceptable: a renamed query gets a fresh floor


def test_bench_detail_payload_owns_impl_hash_and_records_resets():
    """impl_hash and impl_hash_meta are OWNED sections (replaced wholesale
    each run) and floors_reset lands in provenance as {name: {old_floor,
    old_env}} — a dropped floor stays adjudicable and recoverable, not a
    bare name whose value survives only on stderr (ADVICE r12 #2)."""
    import bench

    prior = {"impl_hash": {"stale": "deadbeef"}, "impl_hash_meta": {"version": 0}}
    reset = {"q": {"old_floor": 0.5, "old_env": {"unix_time": 1}}}
    out = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
        impl_hash={"q": "abc123"}, floors_reset=reset,
        impl_hash_meta={"version": bench.FINGERPRINT_VERSION, "python": "3.x"},
    )
    assert out["impl_hash"] == {"q": "abc123"}  # owned: replaced
    assert out["impl_hash_meta"]["version"] == bench.FINGERPRINT_VERSION
    assert out["provenance"]["floors_reset"] == reset
    out2 = bench.detail_payload(
        prior, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False
    )
    assert out2["impl_hash"] == {} and out2["provenance"]["floors_reset"] == {}
    assert out2["impl_hash_meta"] == {}


def test_bench_floor_protocol_tagging():
    """r13 verdict #3: legacy (pre-r11, env-unknown) floors are deep-warm
    full-bench minima — fresh processes sit 1.2-1.8x above them by
    protocol, not regression. tag_floor_protocols must (a) backfill the
    explicit unknown marker for floors predating best_ever_env, (b) tag
    env-unknown records legacy-warm, (c) tag env-known records bench-run,
    and (d) never overwrite an existing protocol tag."""
    import bench

    best_ever = {"legacy": 0.5, "recorded": 1.0, "pretagged": 2.0, "bare": 3.0}
    env = {
        "legacy": {"unknown": True},
        "recorded": {"unix_time": 5, "loadavg": [0.1, 0.1, 0.1]},
        "pretagged": {"unknown": True, "protocol": "fresh-process"},
        # "bare" missing entirely: predates best_ever_env
    }
    bench.tag_floor_protocols(best_ever, env)
    assert env["legacy"]["protocol"] == "legacy-warm"
    assert env["recorded"]["protocol"] == "bench-run"
    assert env["pretagged"]["protocol"] == "fresh-process"  # not clobbered
    assert env["bare"] == {"unknown": True, "protocol": "legacy-warm"}


def test_bench_detail_payload_records_floors_carried_unverified():
    """ADVICE r13 #2: on a fingerprint-scheme/interpreter transition the
    floor-reset rule is skipped for one run, so every kept floor is
    unverified against real code changes — the carried names must land in
    provenance (adjudicable), defaulting to [] on ordinary runs."""
    import bench

    out = bench.detail_payload(
        {}, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
        floors_carried_unverified=["a", "b"],
    )
    assert out["provenance"]["floors_carried_unverified"] == ["a", "b"]
    out2 = bench.detail_payload(
        {}, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False
    )
    assert out2["provenance"]["floors_carried_unverified"] == []


def test_bench_prune_carried_floors_drops_only_reverified_names():
    """ADVICE r14 #3: the carried-unverified record must survive ordinary
    full runs (detail_payload owns the key, so the old default of []
    erased it one run after the transition) and shrink only as floors are
    actually re-verified: reset by the re-key rule, re-set by a fresh
    measurement, or dropped from best_ever."""
    import bench

    kept = bench.prune_carried_floors(
        ["gone", "kept", "refloored", "reset"],
        best_ever={"kept": 1.0, "refloored": 0.8, "reset": 1.2},
        floors_reset={"reset": {"old_floor": 1.2}},
        refloored={"refloored"},
    )
    assert kept == ["kept"]
    # nothing re-verified -> the record carries forward verbatim
    assert bench.prune_carried_floors(
        ["a", "b"], {"a": 1.0, "b": 2.0}, {}, set()
    ) == ["a", "b"]


def test_bench_detail_payload_records_control_query():
    """r14 verdict #6: the fixed protocol-offset control's same-session
    timing lands in provenance at every bench run, so the standing
    driver-vs-builder offset is measured per-run instead of re-argued
    per-flag. A filtered run that excluded the control records None."""
    import bench

    rec = {"name": bench.CONTROL_QUERY, "min_sec": 0.7, "measured_sec": 0.75,
           "floor": 0.65}
    out = bench.detail_payload(
        {}, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
        control_query=rec,
    )
    assert out["provenance"]["control_query"] == rec
    assert bench.CONTROL_QUERY in bench.HEADLINE  # every full run times it


def test_bench_impl_fingerprint_sees_helper_and_constant_changes(tmp_path):
    """v2 fingerprint (ADVICE r12 #1): a behavior change confined to a
    same-package HELPER — including a value-only re-key of a module-level
    constant the helper names (the r12 LSH_TARGET_BUCKET_ROWS 1024→64
    case, invisible to the v1 own-body hash) — must churn the dependent
    query's fingerprint and thereby reset its floor."""
    import importlib
    import sys

    import bench

    pkg = tmp_path / "fakepkg"
    (pkg / "ops").mkdir(parents=True)
    (pkg / "__init__.py").write_text("")
    (pkg / "ops" / "__init__.py").write_text("")

    def write_helper(const: int, body: str = "return x * TARGET") -> None:
        (pkg / "ops" / "helper.py").write_text(
            f"TARGET = {const}\n\ndef scale(x, t=TARGET):\n    {body}\n"
        )

    (pkg / "plan.py").write_text(
        "from .ops.helper import scale\n\ndef q(spark, sf_dir):\n"
        "    return scale(2)\n"
    )
    write_helper(1024)
    sys.path.insert(0, str(tmp_path))
    try:
        mod = importlib.import_module("fakepkg.plan")
        h1 = bench.impl_fingerprint(mod.q)

        write_helper(64)  # constant value ONLY — no AST shape change
        importlib.reload(importlib.import_module("fakepkg.ops.helper"))
        mod = importlib.reload(mod)
        h2 = bench.impl_fingerprint(mod.q)

        write_helper(64, body="return x * TARGET + 0")  # helper body change
        importlib.reload(importlib.import_module("fakepkg.ops.helper"))
        mod = importlib.reload(mod)
        h3 = bench.impl_fingerprint(mod.q)
    finally:
        sys.path.remove(str(tmp_path))
        for m in list(sys.modules):
            if m.startswith("fakepkg"):
                del sys.modules[m]
    assert h1 is not None and h2 is not None and h3 is not None
    assert h1 != h2  # constant re-key visible
    assert h2 != h3  # helper body change visible


def test_bench_real_registry_fingerprint_covers_lsh_constant():
    """The shipped wiring, not just the fake package: ext_dedup_embed's
    fingerprint must fold in operators/similarity.py helpers and the
    LSH_TARGET_BUCKET_ROWS value (the exact r12 change the v1 scheme
    missed)."""
    import bench
    from cta_train_tracker_analytics_spark.operators import similarity
    from cta_train_tracker_analytics_spark.plans import registry

    fn = registry.spec("ext_dedup_embed").fn
    h1 = bench.impl_fingerprint(fn)
    assert h1 is not None
    old = similarity.LSH_TARGET_BUCKET_ROWS
    try:
        similarity.LSH_TARGET_BUCKET_ROWS = old + 1
        h2 = bench.impl_fingerprint(fn)
    finally:
        similarity.LSH_TARGET_BUCKET_ROWS = old
    assert h2 != h1


def test_bench_session_offset_and_normalized_ratio():
    """r15 verdict #2: the flag rule divides out the session's
    control-measured warmth offset before reporting a regression, so a
    warm driver session no longer produces presumptive-drift flags that
    need prose adjudication."""
    import bench

    # offset = control min / control floor, None without both sides
    assert bench.session_offset_of(
        {bench.CONTROL_QUERY: 0.9}, {bench.CONTROL_QUERY: 0.6}
    ) == 1.5
    assert bench.session_offset_of({}, {bench.CONTROL_QUERY: 0.6}) is None
    assert bench.session_offset_of({bench.CONTROL_QUERY: 0.9}, {}) is None

    # a 1.56x raw flag in a 1.37x-warm session normalizes under the margin
    # (the exact r15 ext_dedup_embed shape the rule mechanizes)
    n = bench.normalized_regression_ratio(1.56, 1.0, 1.37, "ext_dedup_embed")
    assert n == 1.14 and n <= bench.NORMALIZED_REGRESSION_RATIO
    # a genuine 2x plan regression still flags through the same session
    assert (
        bench.normalized_regression_ratio(2.0, 1.0, 1.37, "q")
        > bench.NORMALIZED_REGRESSION_RATIO
    )
    # a fast control (offset < 1) is clamped: it never amplifies a flag
    assert bench.normalized_regression_ratio(1.3, 1.0, 0.8, "q") == 1.3
    # the control cannot excuse its own drift
    assert (
        bench.normalized_regression_ratio(1.6, 1.0, 1.6, bench.CONTROL_QUERY)
        == 1.6
    )
    # no offset measured -> raw ratio (filtered run without the control)
    assert bench.normalized_regression_ratio(1.6, 1.0, None, "q") == 1.6


def test_bench_detail_payload_records_drift_excused():
    """Offset-excused candidates must stay adjudicable in provenance
    rather than vanish (r15 verdict #2's 'decisive on arrival' promise
    cuts both ways: flags decisive, excusals recorded)."""
    import bench

    rec = [{"query": "q", "ratio": 1.56, "normalized_ratio": 1.14,
            "session_offset": 1.37}]
    out = bench.detail_payload(
        {}, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
        drift_excused=rec,
    )
    assert out["provenance"]["drift_excused"] == rec
    out2 = bench.detail_payload(
        {}, 0.1, {"q": 1.0}, {"q": 0.9}, {"q": 0.9}, [], filtered=False,
    )
    assert out2["provenance"]["drift_excused"] == []


def test_bench_detail_second_decade_ledger_is_complete():
    """r15 verdict #4: every sf10-probe superlinear carries a decomposed
    cause record in BENCH_DETAIL.second_decade_probe (the records must
    survive bench merges, not live only in PLANS.md prose)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DETAIL.json")
    detail = json.load(open(path))
    superlinear = set(detail["sf10_probe"]["superlinear"])
    decomposed = detail["second_decade_probe"]["decomposed"]
    missing = superlinear - set(decomposed)
    assert missing == set(), missing
    for name, rec in decomposed.items():
        assert rec["cause"], name
        assert rec["wall_ratio"], name


def test_bench_effective_session_offset_rules():
    """ADVICE r16: the excusing offset prefers the control re-time taken
    alongside the candidate re-times (same warmth window as the numbers
    being judged), and a control reading past REGRESSION_RATIO is itself
    a regression — it must excuse nothing rather than blanket-excuse
    every query's drift up to its own factor."""
    import bench

    # re-timed reading wins over the (possibly stale) main-loop reading
    assert bench.effective_session_offset(1.37, 1.12) == 1.12
    # falls back to the main-loop reading when no re-time happened
    assert bench.effective_session_offset(1.37, None) == 1.37
    assert bench.effective_session_offset(None, None) is None
    # a control past the flag threshold cannot excuse anything
    assert (
        bench.effective_session_offset(1.2, bench.REGRESSION_RATIO + 0.1)
        == 1.0
    )
    assert bench.effective_session_offset(bench.REGRESSION_RATIO + 0.3, None) == 1.0


def test_bench_driver_line_carries_streaming_tier():
    """r16 verdict #6: the driver line reports the str_* tier's total and
    slowest entries under SEPARATE keys — never summed into the headline
    value — and stays bounded."""
    import json as _json

    import bench

    timings = {f"q{i}": 1.0 for i in range(30)}
    streaming = {f"str_q{i}": float(i + 1) for i in range(8)}
    line = bench.driver_line(timings, 30.0, 0.1, streaming=streaming)
    assert len(line) < 4096
    obj = _json.loads(line)
    assert obj["value"] == 30.0  # headline-only
    assert obj["streaming_tier_total"] == sum(streaming.values())
    assert obj["n_streaming"] == 8
    assert len(obj["streaming_slowest"]) == 5
    assert max(obj["streaming_slowest"].values()) == 8.0
    # without a streaming tier the keys are absent (filtered runs)
    obj2 = _json.loads(bench.driver_line({"q": 1.0}, 1.0, 0.1))
    assert "streaming_tier_total" not in obj2


def test_bench_detail_payload_splits_streaming_total():
    """total_sec stays headline-only (round-comparable across the r17
    tier addition); the str_* tier gets streaming_total_sec."""
    import bench

    out = bench.detail_payload(
        {}, 0.1, {"q": 1.0, "str_a": 2.0}, {"q": 0.9, "str_a": 1.9},
        {"q": 0.9}, [], filtered=False, streaming_names={"str_a"},
    )
    assert out["total_sec"] == 1.0
    assert out["streaming_total_sec"] == 2.0


def test_bench_driver_line_headline_map_excludes_streaming():
    """First r17 closing bench mixed str_* rows into the line's top-15 and
    n_queries; main() must pass a headline-only timings map when the
    streaming tier rides its own keys."""
    import json as _json

    import bench

    timings = {"q_fast": 0.5, "q_slow": 3.0}
    streaming = {"str_a": 9.0}
    obj = _json.loads(bench.driver_line(timings, 3.5, 0.1, streaming=streaming))
    assert obj["n_queries"] == 2
    assert "str_a" not in obj["queries"]
    assert obj["streaming_slowest"] == {"str_a": 9.0}


def test_bench_driver_line_carries_control_offset():
    """r18 verdict #6: every bench emission carries the control query's
    measured/floor ratio so the judge separates environment drift from
    code without BENCH_DETAIL archaeology. Additions-only: absent when a
    filtered run excluded the control."""
    import json as _json

    import bench

    control = {"sec": 0.7, "floor": 0.62, "offset": 1.13}
    obj = _json.loads(
        bench.driver_line({"q": 1.0}, 1.0, 0.1, control=control)
    )
    assert obj["control"] == control
    obj2 = _json.loads(bench.driver_line({"q": 1.0}, 1.0, 0.1))
    assert "control" not in obj2


def test_bench_streaming_tier_gate():
    """r18 verdict #7: the streaming tier TOTAL joins the regression gate
    under the headline thresholds; filtered runs neither flag nor
    re-floor it (their partial tier sum is a different quantity)."""
    import bench

    # first full run: floor set, no flag
    best, rec = bench.streaming_tier_gate(30.0, None, 1.0, full_run=True)
    assert best == 30.0 and rec is None
    # improvement re-floors
    best, rec = bench.streaming_tier_gate(25.0, 30.0, 1.0, full_run=True)
    assert best == 25.0 and rec is None
    # drift past both thresholds flags with the offset-normalized ratio
    best, rec = bench.streaming_tier_gate(45.0, 25.0, 1.2, full_run=True)
    assert best == 25.0
    assert rec is not None and rec["query"] == "streaming_tier_total"
    assert rec["ratio"] == 1.8
    assert rec["normalized_ratio"] == 1.5  # 45/25/1.2
    # a slow control never amplifies: offset clamped at >=1 by the shared
    # normalized_regression_ratio helper
    _, rec_fast = bench.streaming_tier_gate(45.0, 25.0, 0.5, full_run=True)
    assert rec_fast["normalized_ratio"] == 1.8
    # filtered run: carries the floor, never flags
    best, rec = bench.streaming_tier_gate(45.0, 25.0, 1.0, full_run=False)
    assert best == 25.0 and rec is None
    # no streaming timings this run (e.g. headline-only filter)
    best, rec = bench.streaming_tier_gate(None, 25.0, 1.0, full_run=True)
    assert best == 25.0 and rec is None


def test_bench_detail_payload_carries_streaming_total_best():
    import bench

    out = bench.detail_payload(
        {}, 0.1, {"str_a": 2.0}, {"str_a": 1.9}, {}, [], filtered=False,
        streaming_names={"str_a"}, streaming_total_best=24.5,
    )
    assert out["streaming_total_best"] == 24.5
