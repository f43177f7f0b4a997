"""LLM-data-pipeline operators over the driver tables.

These are engine-side additions (the reference, a delta codec, has no
relational surface — SURVEY §2.2): similarity search over embeddings,
exact + near-duplicate detection/materialization over documents, and
text-analysis statistics. Every operator is built from JVM-side built-in
functions only (no Python UDFs) and is oracle-checkable: all arithmetic
that crosses the Spark/DuckDB comparison is integer-exact (quantized
dot products, md5-derived hashes, count/sum aggregates).
"""
