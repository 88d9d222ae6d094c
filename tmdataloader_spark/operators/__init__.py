"""Relational operators (SURVEY.md §2.2–2.10).

Each module maps a family of reference stored-procedure steps to
declarative DataFrame transformations — one narrow select chain where
the reference ran sequential UPDATEs, explode+equi-join where it ran
LIKE theta-joins, groupBy/window where it ran cursors.
"""
