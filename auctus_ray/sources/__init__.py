"""Corpus sources: deterministic synthetic generator + Parquet readers."""
