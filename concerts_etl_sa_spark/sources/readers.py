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

# Above the byte gate a single FILE can still be unsplittable: Spark
# assigns parquet tasks by byte ranges but a task reads whole row groups,
# so a 200 MB file written as ONE row group scans on one core no matter
# how it is range-split. The footer (already probed for timestamp units)
# tells us the real split count.
_SPREAD_PROBE_MAX_BYTES = 1 << 30
_RG_COUNT_CACHE: dict[tuple, int] = {}


class MixedTimestampUnits(RuntimeError):
    """A directory dataset's members disagree on a timestamp column's
    physical unit. Reading it under one schema would corrupt values, so
    the probe refuses instead of guessing. Deliberately NOT a ValueError:
    pyarrow's ArrowInvalid subclasses ValueError, and the probe must let
    transient footer failures (a file mid-write in a streaming landing
    dir) degrade to ``{}``-and-retry rather than crash ``load_table``."""


def _stat_key(path: str) -> tuple:
    """Footer-cache key: (path, mtime_ns, size). A file rewritten in
    place (compaction, re-export with different row grouping or units)
    changes mtime/size and misses the cache, forcing a re-probe; the
    previous path-only key served stale metadata for the process
    lifetime. For directories the stat covers membership changes (add/
    remove re-probes); an in-place member rewrite that leaves the dir
    mtime unchanged is accepted as a process-lifetime assumption."""
    try:
        st = os.stat(path)
    except OSError:
        return (path, -1, -1)
    return (path, st.st_mtime_ns, st.st_size)


def _needs_spread(path: str, parallelism: int) -> bool:
    """True when a single-file parquet scan cannot fill ``parallelism``
    cores: small files (byte gate) OR files whose row-group count — the
    true upper bound on scan splits — is below the core count. Directory
    datasets (the real-scale layout) never spread."""
    if not os.path.isfile(path):
        return False
    size = os.path.getsize(path)
    if size < _SMALL_SCAN_BYTES:
        return True
    if size > _SPREAD_PROBE_MAX_BYTES:
        return False  # big enough that a repartition would be a real cost
    key = _stat_key(path)
    n_rg = _RG_COUNT_CACHE.get(key)
    if n_rg is None:
        try:
            import pyarrow.parquet as pq

            n_rg = pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return False  # unreadable footer: don't add an exchange
        _RG_COUNT_CACHE[key] = n_rg
    return n_rg < parallelism

# Parquet timestamp physical units vary across driver testdata versions
# (events.ts has shipped as TIMESTAMP(NANOS,false) and TIMESTAMP(MICROS)).
# Spark's vectorized reader has no NANOS type, so nano columns are read as
# long (session sets spark.sql.legacy.parquet.nanosAsLong=true) and
# converted via integer division (ns -> us); plain float/floor would
# corrupt: 2024 epoch-nanos ~1.7e18 exceeds the double exact-integer range.
# MICROS/MILLIS columns read directly as TimestampType (session tz pinned
# UTC, so no-tz micros == DuckDB's naive TIMESTAMP, epoch-identical).
# The unit is detected from the file footer, never assumed.
_TS_UNIT_CACHE: dict[tuple, dict[str, str]] = {}


# Footers probed per directory dataset: one member's footer is usually
# authoritative, but a writer mix (e.g. a compaction that switched nanos
# -> micros mid-dataset) would make member[0] silently wrong — probe a
# few and require homogeneity.
_TS_PROBE_MEMBERS = 3


def _parquet_ts_units(path: str) -> dict[str, str]:
    """{column: arrow unit ('ns'/'us'/'ms'/'s')} from the parquet footer.

    Driver-side only, a few footer reads per path per process — never
    touches row data, so it costs nothing at 100 TB. For a directory
    dataset the first ``_TS_PROBE_MEMBERS`` members are probed and must
    agree per column; mixed units raise (a mixed dataset needs per-file
    handling, and reading it with one schema would corrupt timestamps).
    Failures/empty probes are NOT cached: an empty streaming source dir
    re-probes once files land instead of pinning units={} forever.
    """
    key = _stat_key(path)
    cached = _TS_UNIT_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        probes = [path]
        if os.path.isdir(path):
            members = sorted(
                m for m in os.listdir(path) if m.endswith(".parquet")
            )
            if not members:
                return {}  # uncached: re-probe when files appear
            probes = [
                os.path.join(path, m) for m in members[:_TS_PROBE_MEMBERS]
            ]
        units: dict[str, str] = {}
        for probe in probes:
            sch = pq.read_schema(probe)
            got = {
                f.name: f.type.unit
                for f in sch
                if pa.types.is_timestamp(f.type)
            }
            for col, unit in got.items():
                if col in units and units[col] != unit:
                    raise MixedTimestampUnits(
                        f"mixed parquet timestamp units in {path}: "
                        f"{col} is {units[col]} and {unit} across members"
                    )
            units.update(got)
    except MixedTimestampUnits:
        raise
    except Exception:
        return {}  # transient probe failure: uncached, next call retries
    _TS_UNIT_CACHE[key] = units
    return units


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Read one testdata table with its pinned schema (never inferSchema).

    ``spread=False`` skips the small-scan round-robin repartition. Use it
    ONLY when the scan stage does light per-row work before its first
    exchange — joins and windows on raw columns — where the exchange the
    query already owns redistributes the rows and the extra shuffle
    measurably loses (~0.5 s on the sf0.1 4-way join). Keep the default
    whenever the scan stage runs heavy per-row CPU: regex/tokenize/hash
    projections AND partial aggregates over non-trivial expressions — a
    groupBy's partial HashAggregate executes BEFORE the exchange, inside
    the scan stage, so on a one-row-group file ``spread=False`` pins all
    of it to a single core (the round-4 e1 regression: 0.78 s -> 1.55 s)."""
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
    if spread and _needs_spread(path, spark.sparkContext.defaultParallelism):
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
