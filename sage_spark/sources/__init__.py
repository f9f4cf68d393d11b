"""Input-source adapters for the webtext table (parquet is the canonical
Iceberg stand-in; JSONL covers Common-Crawl-style interchange dumps)."""
