"""Ingest jobs: one-time conversions from external formats to the
engine's canonical partitioned parquet (SURVEY §2.A)."""
