"""Scalar function packs: exact-numeric helpers, cleaning, temporal, buckets,
extraction (reference F1-F12, SURVEY.md §2.8)."""
