"""Connectors: readers/writers for text, CSV, JSON, Parquet."""
