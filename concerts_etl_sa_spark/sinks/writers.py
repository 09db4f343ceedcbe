"""Sinks & write lifecycle (SURVEY §2.A7-A12, C6, I2, I5).

Reference analogs:
- CSV sink                    : storage/google_sheets.py:81-100,139-160 (A7)
- append historized + lineage : storage/google_sheets.py:20-79 (A8/I2)
- overwrite snapshot          : core/gsheet.py:95-125 (A9/I5)
- schema-union write          : core/gsheet.py:19-24,74-92 (A10) — the
  engine emits typed nulls where the reference emits "" (SURVEY §7.3.6)
- JSON preview                : cli.py:44-55 (A11)
- empty-input short-circuit   : gsheet.py:101-104 (C6)

Scale notes: all writers are plain distributed ``df.write`` — parquet with
partitioning columns where the downstream read pattern wants pruning
(append_historized partitions by ingestion date). The reference's
clear+rewrite idempotence (I5) maps to mode('overwrite'); its append path
is at-least-once, dedupable by (event_id_provider, ingestion_run_id) —
kept as documented semantics, not hidden dedup.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _skip_if_empty(fn):
    """C6: sink no-ops on empty input (gsheet.py:101-104)."""

    @functools.wraps(fn)
    def wrapper(df: DataFrame, *a, **kw):
        if df.isEmpty():
            return None
        return fn(df, *a, **kw)

    return wrapper


def _stringify_timestamps(df: DataFrame) -> DataFrame:
    """B23: datetime -> ISO string, null -> '' on text-format export
    (gsheet.py:29-36)."""
    out = df
    for f in df.schema.fields:
        if f.dataType.typeName() in ("timestamp", "timestamp_ntz"):
            out = out.withColumn(
                f.name,
                F.coalesce(
                    F.date_format(f.name, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("")
                ),
            )
    return out


@_skip_if_empty
def export_csv(df: DataFrame, path: str) -> None:
    """A7: header CSV with ISO datetimes."""
    _stringify_timestamps(df).write.mode("overwrite").option(
        "header", True
    ).csv(path)


@_skip_if_empty
def append_historized(df: DataFrame, path: str) -> None:
    """A8/I2: append-only fact table with lineage, partitioned by scrape
    date so daily-batch reads prune to one partition."""
    (
        df.withColumn("scrape_date", F.to_date("scrape_ts_utc"))
        .write.mode("append")
        .partitionBy("scrape_date")
        .parquet(path)
    )


@_skip_if_empty
def overwrite_snapshot(df: DataFrame, path: str) -> None:
    """A9/I5: clear + rewrite — each run replaces the snapshot."""
    df.write.mode("overwrite").parquet(path)


def union_heterogeneous(*dfs: DataFrame) -> DataFrame:
    """A10/H1: union rows with heterogeneous column sets into one nullable
    superset schema (unionByName allowMissingColumns — the engine's analog
    of the reference's sorted-header union)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def export_json_preview(df: DataFrame, path: str, n: int = 20) -> None:
    """A11/G2: first-n JSON debug dump (cli.py:44-55)."""
    _stringify_timestamps(df.limit(n)).coalesce(1).write.mode(
        "overwrite"
    ).json(path)


def save_table_resolved(df: DataFrame, table: str, path: str | None = None) -> None:
    """A12: sink-path fallback resolution (gsheet.py:56-71's open-by-id ->
    by-title -> create-if-missing, catalog edition): write to the managed
    table if it exists, else create it (optionally as external at
    ``path``). Append semantics with schema enforcement — a mismatched
    schema raises instead of silently widening (the legacy sink's header
    contract, storage/google_sheets.py:42-53)."""
    spark = df.sparkSession
    if spark.catalog.tableExists(table):
        df.write.mode("append").saveAsTable(table)
        return
    writer = df.write.mode("overwrite")
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 16,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Bucketed managed table for co-located joins (100 TB join strategy).

    Writing both sides of a recurring join bucketed (and optionally
    sorted) by the join key lets Spark plan the join with NO shuffle —
    each bucket pairs 1:1 across tables. This is the pre-partitioning
    the reference's day-keyed dict index (consolidate_events.py:78-84)
    approximates in-process; asserted shuffle-free in
    tests/test_bucketed_join.py.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_via_connections(df: DataFrame, connection_factory, batch_size: int = 500) -> None:
    """Connection-per-partition push sink (SURVEY §2.A4/K5 mapping: the
    reference holds one Sheets client per process, gsheet.py:26,39-53;
    the distributed analog is one connection per PARTITION inside
    foreachPartition, with batched sends).

    ``connection_factory`` runs on the executor and must return an object
    with ``send_batch(rows: list) -> None`` and ``close() -> None``.
    Executor-side construction is what makes this scale: connections are
    never serialized from the driver, and partition count bounds fan-in
    to the external system (repartition first to control it).
    """

    def _handle_partition(rows) -> None:
        conn = connection_factory()
        try:
            buf = []
            for r in rows:
                buf.append(r)
                if len(buf) >= batch_size:
                    conn.send_batch(buf)
                    buf = []
            if buf:
                conn.send_batch(buf)
        finally:
            conn.close()

    df.foreachPartition(_handle_partition)
