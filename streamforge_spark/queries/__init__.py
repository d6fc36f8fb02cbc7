"""Named queries: one per implemented operator (SURVEY.md §2)."""
