"""Source connectors for the extraction corpus (WARC, parquet directories)."""
