"""cta_train_tracker_analytics_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline ``amolrairikar/cta-train-tracker-analytics`` (a serverless
CTA Train Tracker ingest/compact/analyze stack), re-expressed Spark-first:

- explicit-schema DataFrame pipelines for the ingest flatten
  (reference ``lambdas/get_train_status/get_train_status.py:82-138``),
- one-line distributed batch compaction
  (reference ``lambdas/bucket_raw_data/bucket_raw_data.py:76-117``),
- Spark SQL window/agg analytics over the curated fact table,
- Structured Streaming for the per-minute cadence
  (reference ``main.tf:45-53``), and
- LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale.

Nothing here is a port: the reference is imperative Python inside Lambda
handlers; this package declares logical plans and lets Catalyst/Tungsten pick
the physical strategy.
"""

__version__ = "0.1.0"
