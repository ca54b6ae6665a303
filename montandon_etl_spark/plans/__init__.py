"""Pipeline plans: declarative descriptions of end-to-end dataflows."""

from montandon_etl_spark.plans.cdc import CdcPipelinePlan  # noqa: F401
