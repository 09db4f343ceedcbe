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

# Parquet timestamp physical units vary across driver testdata versions
# (events.ts has shipped as TIMESTAMP(NANOS,false) and TIMESTAMP(MICROS)).
# Spark's vectorized reader has no NANOS type, so nano columns are read as
# long (session sets spark.sql.legacy.parquet.nanosAsLong=true) and
# converted via integer division (ns -> us); plain float/floor would
# corrupt: 2024 epoch-nanos ~1.7e18 exceeds the double exact-integer range.
# MICROS/MILLIS columns read directly as TimestampType (session tz pinned
# UTC, so no-tz micros == DuckDB's naive TIMESTAMP, epoch-identical).
# The unit is detected from the file footer, never assumed.
_TS_UNIT_CACHE: dict[str, dict[str, str]] = {}


def _parquet_ts_units(path: str) -> dict[str, str]:
    """{column: arrow unit ('ns'/'us'/'ms'/'s')} from the parquet footer.

    Driver-side only, one footer read per path per process — never touches
    row data, so it costs nothing at 100 TB (and with a partitioned
    dataset, one member file's footer is authoritative for the dataset).
    """
    cached = _TS_UNIT_CACHE.get(path)
    if cached is not None:
        return cached
    units: dict[str, str] = {}
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            members = sorted(
                m for m in os.listdir(path) if m.endswith(".parquet")
            )
            if members:
                probe = os.path.join(path, members[0])
        sch = pq.read_schema(probe)
        units = {
            f.name: f.type.unit
            for f in sch
            if pa.types.is_timestamp(f.type)
        }
    except Exception:
        units = {}
    _TS_UNIT_CACHE[path] = units
    return units


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Read one testdata table with its pinned schema (never inferSchema).

    ``spread=False`` skips the small-scan round-robin repartition: a
    query whose first real operator is a shuffle (join/agg on the raw
    columns) gains nothing from pre-spreading the scan — the exchange it
    already owns redistributes the rows — and measurably loses the extra
    shuffle (~0.5 s on the sf0.1 4-way join). Keep the default for
    CPU-heavy projections (regex/tokenize/hash) that would otherwise run
    on a single task of a one-row-group file."""
    from pyspark.sql import types as T

    schema = TESTDATA_SCHEMAS.get(name)
    path = f"{sf_dir}/{name}.parquet"
    nano_cols: list[str] = []
    if schema is not None:
        units = _parquet_ts_units(path)
        nano_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, T.TimestampType)
            and units.get(f.name) == "ns"
        ]
        # swap declared TimestampType -> LongType for the raw nano columns
        fields = [
            T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType, f.nullable)
            for f in schema.fields
        ]
        reader = spark.read.schema(T.StructType(fields))
    else:
        reader = spark.read
    df = reader.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    if spread and os.path.isfile(path) and os.path.getsize(path) < _SMALL_SCAN_BYTES:
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
