"""Driver-contract harness: the query registry mapping every
implemented SURVEY.md §2 operator onto the TPC-H-ish test tables, with
DuckDB oracle SQL for the correctness gate."""
