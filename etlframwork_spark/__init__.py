"""etlframwork_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL framework (jijicanyu/ETLFramwork; the checkout at
/root/reference is empty — see SURVEY.md §0 — so the authoritative spec is
BASELINE.json's north rule):

- Structured Streaming binlog/WAL tail over an append-only event directory
  (``streaming/ingest.py``)
- key-partitioned MERGE/upsert with last-writer-wins dedup by commit LSN
  (``merge.py``)
- Iceberg-semantics snapshot table: atomic manifest commits, batch-epoch
  fencing, additive schema evolution, time travel (``table.py``)
- per-partition lineage + throughput metrics (``lineage.py``)
- a generic DataFrame operator layer + training-data pipeline functions
  (dedup, similarity search, text analysis, multimodal plumbing) under
  ``operators/`` and ``functions/``

All transform logic is vectorized (built-in pyspark.sql.functions or
pandas/Arrow UDFs) — no per-row Python on data paths.
"""

__version__ = "0.1.0"
