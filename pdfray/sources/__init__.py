"""Corpus sources: deterministic fixture synthesis and parquet readers."""
