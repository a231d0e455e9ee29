"""Sources & sinks: synthetic page generation, parquet/Iceberg-seam catalog."""
