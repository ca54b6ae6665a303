"""Sources: deterministic changelog generator + changelog readers."""

from montandon_etl_spark.sources.changelog import (  # noqa: F401
    CHANGELOG_SCHEMA,
    gen_changelog,
    gen_ddl_events,
    write_changelog,
)
