"""Sources & sinks: CSV/text/parquet readers, partitioned append writers."""
