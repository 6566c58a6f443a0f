"""Operator modules — one per reference workload family (SURVEY.md §2)."""
