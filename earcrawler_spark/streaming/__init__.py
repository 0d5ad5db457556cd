"""Structured Streaming surface — the reference's incremental-batch
behaviors (SURVEY.md §2.10) expressed as true streams."""
