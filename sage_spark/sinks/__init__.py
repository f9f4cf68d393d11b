"""Output sinks beyond the resumable TableStore parquet layout."""
