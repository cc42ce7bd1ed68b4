"""Catalog modules — each self-registers queries into velostream_spark.registry."""
