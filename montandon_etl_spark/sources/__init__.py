"""Sources: deterministic changelog generator + changelog readers."""

from montandon_etl_spark.sources.changelog import (  # noqa: F401
    CHANGELOG_DDL_SCHEMA,
    CHANGELOG_SCHEMA,
    embed_ddl_events,
    gen_changelog,
    gen_ddl_events,
    write_changelog,
)
from montandon_etl_spark.sources.kafka import (  # noqa: F401
    kafka_frames_dir_source,
    kafka_source,
)
