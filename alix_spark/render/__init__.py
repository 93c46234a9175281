"""Document rendering operators: KWIC concordance, hilite (SURVEY.md §2.8)."""
