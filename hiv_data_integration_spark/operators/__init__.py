"""Operator library — relational, aggregate, reshape, rules, fuzzy, dedup,
similarity, text, multimodal (SURVEY.md §2)."""
