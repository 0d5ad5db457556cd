"""Relational operator library (SURVEY.md §2.3-2.8) — dedup families,
similarity search, ranking, reconciliation, temporal selection."""
