"""placeholder — operators land incrementally (SURVEY.md §7)."""
