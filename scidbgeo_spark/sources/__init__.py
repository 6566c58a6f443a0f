"""Source generators/readers (SURVEY §2.3)."""
