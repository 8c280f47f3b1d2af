"""Training-data pipeline functions over the documents/embeddings tables:
text analysis, deduplication, similarity search, multimodal plumbing.

All hot-path logic is built-in pyspark.sql.functions (JVM, whole-stage
codegen) or Arrow-vectorized pandas UDFs — never per-row Python.
"""
