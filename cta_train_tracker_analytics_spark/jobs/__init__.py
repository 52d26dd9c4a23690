"""Batch jobs — the reference's scheduled Lambdas as Spark batch plans."""
