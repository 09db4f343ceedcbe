"""Parquet source readers with explicit schemas (SURVEY §2.A1-A3).

Reference analog: the Dice GraphQL scan (adapters/dice.py:78-108) does
source-side predicate + projection pushdown by hand; on Spark the same
effect is declarative — Catalyst pushes ``filter``/``select`` into the
parquet scan (verify with ``.explain``: ``PushedFilters``, ``ReadSchema``).

Scale note: at 100 TB each table is a partitioned parquet/Delta dataset;
the reader API is unchanged — partition pruning comes from Catalyst when
predicates hit partition columns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..schemas import TESTDATA_SCHEMAS

# Below this size a parquet source is a single scan split (one row group),
# so every downstream projection — however CPU-heavy — runs on ONE core
# until the first shuffle. ``load_table`` round-robins such scans to
# ``defaultParallelism`` so tokenize/regex/hash projections parallelize.
# At real scale (100 TB, many >=128 MB files) the gate never fires and no
# extra exchange is added; this is a small-file shim, not a plan strategy.
_SMALL_SCAN_BYTES = 64 << 20

# Driver parquet stores timestamps as TIMESTAMP(NANOS,false) (INT64).
# Spark's vectorized reader has no NANOS type, so the session sets
# spark.sql.legacy.parquet.nanosAsLong=true and these columns are read as
# long nanos then converted via integer division (ns -> us).  Plain
# float/floor would corrupt: 2024 epoch-nanos ~1.7e18 exceeds the double
# exact-integer range.
# Only events.ts is TIMESTAMP(NANOS); orders/lineitem are TIMESTAMP(MILLIS)
# which the native reader handles directly.
_NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with its pinned schema (never inferSchema)."""
    schema = TESTDATA_SCHEMAS.get(name)
    nano_cols = _NANO_TS_COLUMNS.get(name, [])
    if schema is not None:
        # swap declared TimestampType -> LongType for the raw nano columns
        from pyspark.sql import types as T

        fields = [
            T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType, f.nullable)
            for f in schema.fields
        ]
        reader = spark.read.schema(T.StructType(fields))
    else:
        reader = spark.read
    path = f"{sf_dir}/{name}.parquet"
    df = reader.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    if os.path.isfile(path) and os.path.getsize(path) < _SMALL_SCAN_BYTES:
        # Catalyst pushes later filters/pruning through the exchange into
        # the scan (asserted in tests/test_plan_hygiene.py), so pushdown
        # is unaffected; only the post-scan work spreads across cores.
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every testdata table; also registers each as a temp view."""
    out = {}
    for name in TESTDATA_SCHEMAS:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
