"""Sinks (SURVEY.md §2.1 S6–S11)."""
