"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``concerts_etl_sa_spark``; this module only
adapts the registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from concerts_etl_sa_spark import registry
from concerts_etl_sa_spark.operators import consolidate as _consolidate
from concerts_etl_sa_spark.operators import fixtures as _fixtures
from concerts_etl_sa_spark.sources.readers import load_table

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the reference's raison d'être end-to-end: derive the two
    provider-event inputs from events.parquet, then consolidate
    (day-blocked token-overlap join, bidirectional 1:1, full-outer
    assembly — SURVEY §2.D1-D4).
    """
    events = load_table(spark, SMOKE_SF_DIR, "events")
    return _consolidate.consolidate(
        _fixtures.shotgun_events(events), _fixtures.dice_events(events)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
