"""DataFrame-level operators of the dedup engine (SURVEY.md §2)."""
