"""Scalar function surface (SURVEY.md §2.8)."""
