"""Relational + CDC operators, each a pure DataFrame → DataFrame function."""

from montandon_etl_spark.operators.lww import lww_latest, lww_latest_salted  # noqa: F401
