"""Table storage layer (Iceberg-style API over partitioned Parquet)."""
