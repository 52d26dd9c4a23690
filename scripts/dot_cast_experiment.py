#!/usr/bin/env python
"""A/B/C isolate for the pair-scoring fold (guide §1.4: noop-sink timing).

The vector tier's per-pair cosine is an interpreted higher-order fold
(`aggregate(zip_with(...))` — both CodegenFallback). Three candidates for
the same scoring stage, measured on the REAL pair volume of
ext_knn_graph_prod's shape (cell self-join at sf0.1):

  A. status quo — float arrays, `x.cast("double") * y.cast("double")`
     inside the zip_with lambda (2 interpreted Cast evals per element per
     pair);
  B. pre-cast — vectors cast to array<double> ONCE per vector before the
     join; SimplifyCasts removes the lambda's per-element casts (verify in
     the plan), fold becomes mult+add only. Bit-identical: float→double
     widening is exact and happens on the same values, just earlier.
  C. Arrow — mapInArrow over the joined pairs: zero-copy flatten of the
     fixed-width list arrays, accumulation loop over dims in float64
     (identical left-to-right (acc + a_i*b_i) order per pair → IEEE-
     identical to the JVM fold), cosine division kept in the JVM so
     null/ANSI semantics stay exactly the engine's.

Every variant is checked for EXACT equality of rounded output against A
before its timing counts (diff count must be 0).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from cta_train_tracker_analytics_spark.session import get_spark
from cta_train_tracker_analytics_spark.data import load
from cta_train_tracker_analytics_spark.operators.similarity import dot, norm

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_pairs(spark, cast_double: bool):
    """The knn-family pair shape: cell self-join on a modulo cell id
    (stand-in for the IVF assignment — the scoring stage is what we time)."""
    emb = load(spark, SF_DIR, "embeddings").filter(F.col("embedding").isNotNull())
    vec = F.col("embedding")
    if cast_double:
        vec = vec.cast("array<double>")
    base = emb.select(
        F.col("vec_id").alias("id"),
        vec.alias("vec"),
        (F.col("vec_id") % 8).alias("cell"),
    ).select("id", "vec", norm(F.col("vec")).alias("nrm"), "cell")
    base = base.localCheckpoint(eager=True)
    left = base.repartition(32, "cell").select(
        F.col("id").alias("vec_id"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), "cell",
    )
    right = base.repartition(32, "cell").select(
        F.col("id").alias("neighbor_id"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), "cell",
    )
    return left.join(right, "cell").filter(F.col("vec_id") != F.col("neighbor_id"))


def score_jvm(pairs):
    cs = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return pairs.select("vec_id", "neighbor_id", F.round(cs, 4).alias("cos_sim"))


def score_arrow(pairs):
    import pyarrow as pa

    def batches(it):
        import numpy as np
        for b in it:
            va = b.column("va")
            vb = b.column("vb")
            n = len(b)
            if n == 0:
                continue
            # combine_chunks not needed: mapInArrow yields RecordBatch
            a_off = va.offsets.to_numpy()
            b_off = vb.offsets.to_numpy()
            widths_a = np.diff(a_off)
            widths_b = np.diff(b_off)
            d = widths_a[0] if len(widths_a) else 0
            ok = (
                (widths_a == d).all() and (widths_b == d).all()
                and va.null_count == 0 and vb.null_count == 0
                and va.values.null_count == 0 and vb.values.null_count == 0
            )
            if ok:
                A = va.values.to_numpy().reshape(n, d).astype(np.float64)
                B = vb.values.to_numpy().reshape(n, d).astype(np.float64)
                acc = np.zeros(n, dtype=np.float64)
                for i in range(d):
                    acc += A[:, i] * B[:, i]
                dot_col = pa.array(acc, type=pa.float64())
            else:
                # slow exact fallback replicating zip_with/aggregate null
                # semantics (never taken on the bench corpora)
                vals = []
                pa_list = va.to_pylist()
                pb_list = vb.to_pylist()
                for x, y in zip(pa_list, pb_list):
                    if x is None or y is None or len(x) != len(y) or \
                            any(e is None for e in x) or any(e is None for e in y):
                        vals.append(None)
                        continue
                    s = 0.0
                    for xe, ye in zip(x, y):
                        s += float(xe) * float(ye)
                    vals.append(s)
                dot_col = pa.array(vals, type=pa.float64())
            yield pa.RecordBatch.from_arrays(
                [b.column("vec_id"), b.column("neighbor_id"),
                 b.column("na"), b.column("nb"), dot_col],
                names=["vec_id", "neighbor_id", "na", "nb", "dt"],
            )

    sel = pairs.select("vec_id", "neighbor_id", "va", "vb", "na", "nb")
    out = sel.mapInArrow(
        batches,
        "vec_id long, neighbor_id long, na double, nb double, dt double",
    )
    return out.select(
        "vec_id", "neighbor_id",
        F.round(F.col("dt") / (F.col("na") * F.col("nb")), 4).alias("cos_sim"),
    )


def time_df(spark, df, label, n=3):
    runs = []
    for _ in range(n):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(f"{label}: min {min(runs):.3f}s runs {[round(r,3) for r in runs]}",
          flush=True)
    return min(runs)


def main():
    spark = get_spark(app_name="dot-cast-experiment")
    load(spark, SF_DIR, "embeddings").count()  # warm footers

    pairs_a = build_pairs(spark, cast_double=False)
    pairs_b = build_pairs(spark, cast_double=True)
    a = score_jvm(pairs_a)
    b = score_jvm(pairs_b)
    c = score_arrow(pairs_a)
    c2 = score_arrow(pairs_b)

    n_pairs = a.count()
    print(f"pair volume: {n_pairs}", flush=True)

    # exactness gates (rounded output, exceptAll both ways)
    for label, v in (("B", b), ("C", c), ("C2", c2)):
        d1 = a.exceptAll(v).count()
        d2 = v.exceptAll(a).count()
        print(f"variant {label}: diff rows {d1}+{d2}", flush=True)
        assert d1 == 0 and d2 == 0, f"variant {label} diverged"

    spark.sparkContext.setJobDescription("A: float+cast-in-lambda fold")
    ta = time_df(spark, a, "A float fold        ")
    spark.sparkContext.setJobDescription("B: pre-cast double fold")
    tb = time_df(spark, b, "B pre-cast double   ")
    spark.sparkContext.setJobDescription("C: arrow numpy (float src)")
    tc = time_df(spark, c, "C arrow numpy       ")
    spark.sparkContext.setJobDescription("C2: arrow numpy (double src)")
    tc2 = time_df(spark, c2, "C2 arrow numpy dbl  ")
    # second interleaved pass to expose warmup asymmetry
    ta2 = time_df(spark, a, "A float fold (2nd)  ")
    tb2 = time_df(spark, b, "B pre-cast (2nd)    ")
    tc_2 = time_df(spark, c, "C arrow (2nd)       ")
    print(f"ratios vs A(best {min(ta,ta2):.3f}): "
          f"B {min(ta,ta2)/min(tb,tb2):.2f}x  C {min(ta,ta2)/min(tc,tc_2):.2f}x",
          flush=True)
    # plan check: did SimplifyCasts remove the lambda casts in B?
    bplan = b._jdf.queryExecution().optimizedPlan().toString()
    print("B optimized plan mentions cast-in-lambda:",
          "cast(lambda" in bplan or "CAST(lambda" in bplan, flush=True)


if __name__ == "__main__":
    main()
