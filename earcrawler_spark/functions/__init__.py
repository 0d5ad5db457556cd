"""Scalar function surface (SURVEY.md §2.9) — native Spark expressions
first, Arrow-batched pandas UDFs only where the JVM has no equivalent."""
