"""Decompose ext_bpe_merges's 8.49x sf0.1->sf1 slope (r12 verdict #4).

Hypothesis A (one-liner): the op is a full-corpus tokenize + in-row char
pair explode + tiny-vocab aggregate — genuinely LINEAR CPU work, so at
10x data the slope should approach 10x as constant overheads amortize;
8.49x IS the linear regime, and the 2-3x family band queries are the
ones with sublinear stages dominating at this scale.

Hypothesis B (fix): a superlinear term — pair-vocabulary growth breaking
map-side combine, an AQE single-task collapse on the aggregate, or
explode row growth beyond 10x.

Measured decomposition at sf0.1 vs /tmp/cta_sf1:
  1. token rows + pair rows (must be ~10x if the data is linear)
  2. distinct pair vocabulary (must stay ~|alphabet|^2-bounded)
  3. time of the tokenize+explode+count stage alone (pairs.count())
     vs the full query (adds the groupBy + top-20)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.data import load
from cta_train_tracker_analytics_spark.functions.text import tokens
from cta_train_tracker_analytics_spark.plans import registry
from cta_train_tracker_analytics_spark.session import get_spark

spark = get_spark(app_name="bpe-decompose")
out = {}
for label, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/cta_sf1")):
    docs = load(spark, d, "documents")
    t = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).filter(
        F.length("tok") >= 2
    )
    chars = F.split(F.col("tok"), "")
    pairs = t.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(chars) - 2),
                lambda i: F.concat(
                    F.element_at(chars, i + 1), F.element_at(chars, i + 2)
                ),
            )
        ).alias("pair")
    )
    rec = {}
    t0 = time.perf_counter(); rec["n_tokens"] = t.count()
    rec["t_tokens_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter(); rec["n_pairs"] = pairs.count()
    rec["t_pairs_count_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    rec["n_vocab"] = pairs.distinct().count()
    rec["t_vocab_s"] = round(time.perf_counter() - t0, 3)
    fn = registry.all_queries()["ext_bpe_merges"]
    for _ in range(2):
        t0 = time.perf_counter(); fn(spark, d).count()
        full = time.perf_counter() - t0
        rec["t_full_s"] = round(min(full, rec.get("t_full_s", 1e9)), 3)
    out[label] = rec
    print(label, rec, flush=True)

r = {k: round(out["sf1"][k] / max(out["sf0.1"][k], 1e-9), 2)
     for k in ("n_tokens", "n_pairs", "n_vocab", "t_pairs_count_s", "t_full_s")}
print("RATIOS sf1/sf0.1:", json.dumps(r))

# task-parallelism sanity on the aggregate stage at sf1
df = registry.all_queries()["ext_bpe_merges"](spark, "/tmp/cta_sf1")
df.count()
tr = spark.sparkContext.statusTracker()
print("jobs run:", len(tr.getJobIdsForGroup(None) or []))
