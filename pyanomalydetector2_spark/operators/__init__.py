"""Operator inventory (SURVEY.md §2) re-expressed Spark-first."""
