"""Spark pipeline: generator, partitioning, encode/decode jobs, warehouse."""
