"""montandon_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild (NOT a port) of the capability class of
``IFRCGo/montandon-etl`` (reference snapshot at /root/reference): an
incremental extract → validate → dedup → transform → load engine,
re-targeted as a binlog/WAL-tail → lake-upsert CDC pipeline over
Common-Crawl-style web pages, expressed Spark-first:

- change events are a ``DataFrame`` / Structured Streaming source,
- validation gates are ``filter``/``when`` expressions,
- content dedup + revision chains are ``sha2`` + window functions
  (reference: apps/etl/extraction/sources/gdacs/extract.py:128-148),
- the upsert-on-retry ledger is a last-writer-wins MERGE
  (reference: apps/etl/etl_tasks/gdacs.py:39-53),
- the Postgres ledger + blob store become an Iceberg-style snapshot-log
  table format over Parquet (``montandon_etl_spark.lake``),
- the Celery task DAG becomes ``foreachBatch`` with checkpointed,
  idempotent commits (reference at-least-once: main/settings.py:59).

Subpackages
-----------
- ``lake``       snapshot-log table format (field-id schema evolution,
                 atomic commits, time travel, exactly-once on batchId)
- ``operators``  relational + CDC operators (LWW merge, dedup, joins,
                 similarity search, text analysis)
- ``functions``  scalar/vectorized functions (HTML→text extractor,
                 content hashing, language id)
- ``sources``    deterministic changelog generator + readers
- ``streaming``  Structured Streaming pipeline wrapper
- ``plans``      pipeline/DDL plan objects
"""

__version__ = "0.1.0"
