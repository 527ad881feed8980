"""Relational operators: prepare, blocking, exact joins, fuzzy join,
household aggregation, clustering, dedup, similarity search."""
