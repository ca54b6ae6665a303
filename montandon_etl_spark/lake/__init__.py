"""Iceberg-style snapshot-log table format over Parquet (from scratch).

No Iceberg/Delta jar exists in this environment, and the assignment is
a from-scratch engine, so the lake layer is a minimal but honest
re-creation of the parts of the Iceberg spec the CDC pipeline needs:

- **field-id-based schema evolution** (add/rename without rewriting
  data; reads resolve columns by id, so a rename never orphans old
  Parquet files) — the property the reference's Django migration
  history demands (SURVEY.md §1.3; rename at
  apps/etl/migrations/0005_*.py:13-16);
- **atomic snapshot commits** (write data files → write snapshot json
  → atomic HEAD pointer swap via ``os.replace``);
- **idempotent commits keyed by batchId** — re-delivered micro-batches
  are no-ops, turning foreachBatch's at-least-once into exactly-once
  (reference analogue: CELERY_ACKS_LATE at main/settings.py:59 plus
  instance_id-reuse upserts at apps/etl/etl_tasks/gdacs.py:39-53);
- **bucket partitioning** by ``pmod(xxhash64(url), B)`` so a MERGE
  rewrites only affected buckets (copy-on-write, bounded write
  amplification);
- **per-commit lineage + metrics**: source offset ranges (min/max
  seq), per-bucket row counts, snapshot parentage, extractor version;
- **time travel** by snapshot id.

The sink interface is small so a real Iceberg catalog can be slotted
in where the jar exists.
"""

from montandon_etl_spark.lake.format import Field, TableMetadataIO  # noqa: F401
from montandon_etl_spark.lake.matview import MaterializedAggregate  # noqa: F401
from montandon_etl_spark.lake.table import PAGES_FIELDS, SnapshotTable  # noqa: F401
