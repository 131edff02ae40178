"""Scalar function helpers (SURVEY.md §2.7 X1–X9 are Spark built-ins;
this package holds the few portable compositions we need)."""
