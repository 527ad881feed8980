"""Scalar function surface: normalization, phonetics, similarity, fuzzy ladder."""
