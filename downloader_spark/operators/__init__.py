"""Operator implementations, grouped by SURVEY.md §2 category."""
