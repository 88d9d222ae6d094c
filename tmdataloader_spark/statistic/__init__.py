"""Summary statistics + validation rules (SURVEY.md §2.5 A11/A12)."""
