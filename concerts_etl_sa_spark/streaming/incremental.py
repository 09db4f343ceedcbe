"""Structured Streaming veneer (SURVEY §2.I, §7.1 M7).

The reference is a daily batch (cron 0 6 * * *, .github/workflows/daily.yml:4-6)
whose semantics are stream-shaped: incremental append with lineage
(I2, storage/google_sheets.py:20-79), a bounded 90-day lookback (I3,
adapters/dice.py:85-87), late/stale-data drop (I4,
core/consolidate_events.py:164-166) and an overwrite snapshot (I5,
core/gsheet.py:114-117). This module re-expresses that lifecycle as
Structured Streaming:

- ``read_events_stream``      : file-source stream with the pinned events
  schema (never inferSchema) — new parquet files are the micro-batches,
  exactly the reference's "new scrape each morning".
- ``incremental_append``      : trigger(availableNow) + foreachBatch
  append, stamping ``ingestion_run_id`` = batch id and
  ``scrape_ts_utc`` = batch wall-clock (I1/I2). Checkpointing makes the
  daily re-run exactly-once per input file where the reference's append
  sink is at-least-once (documented upgrade, SURVEY §2.I2).
- ``daily_event_counts``      : tumbling 1-day event-time window with a
  watermark bounding state (I3) and dropping late rows (I4).
- ``snapshot_consolidation``  : foreachBatch overwrite of the consolidated
  snapshot per micro-batch (I5's clear+rewrite idempotence).

Scale notes: file-source streams shard listing/processing across
executors; the windowed aggregate is a standard partial-agg + state-store
shuffle on (window, key) — at 100 TB the watermark is what bounds state
(without it, state grows forever). ``availableNow`` processes the backlog
then stops, so the same job serves both backfill and the daily cron.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..schemas import EVENTS

LOOKBACK = "90 days"      # I3: dice.py:85-87
LATE_TOLERANCE = "2 days" # I4 watermark: late rows beyond this are dropped


def read_events_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of events parquet files (A1/I1).

    Driver parquet has shipped events.ts as both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across testdata versions; like the batch reader
    (sources.readers), the physical unit is probed from an existing file's
    footer — nanos are read as long and integer-divided to micros, any
    other unit reads directly as TimestampType.
    """
    from ..sources.readers import _parquet_ts_units

    ts_is_nanos = _parquet_ts_units(src_dir).get("ts") == "ns"
    if ts_is_nanos:
        schema = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.LongType() if f.name == "ts" else f.dataType,
                    f.nullable,
                )
                for f in EVENTS.fields
            ]
        )
    else:
        schema = EVENTS
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    if ts_is_nanos:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def incremental_append(
    events: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """I1/I2: availableNow micro-batch append with lineage columns.

    ingestion_run_id = micro-batch id (the driver-contract analog of the
    reference's per-run uuid4, shotgun.py:118); partitioned by event day
    so daily reads prune to one partition.
    """

    def _write_batch(batch: DataFrame, batch_id: int) -> None:
        append_batch(batch, batch_id, out_path)

    return (
        events.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_write_batch)
        .start()
    )


def append_batch(batch: DataFrame, batch_id: int, out_path: str) -> None:
    """The per-micro-batch write of :func:`incremental_append`: DYNAMIC
    partition overwrite on (event_date, run id), never a blind append.
    foreachBatch is at-least-once — a crash after the files land but
    before the checkpoint commits replays the batch, and an append would
    duplicate every row. The dynamic overwrite rewrites exactly the
    replayed batch's own partitions (the file-source checkpoint pins the
    batch's file set, so the replay produces the same partitions) and
    leaves every other batch untouched — this is what makes the module's
    exactly-once-per-input-file claim true. Module-level so the replay
    idempotence is directly testable."""
    (
        batch.withColumn("ingestion_run_id", F.lit(f"batch-{batch_id}"))
        .withColumn("scrape_ts_utc", F.current_timestamp())
        .withColumn("event_date", F.to_date("ts"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_date", "ingestion_run_id")
        .parquet(out_path)
    )


def daily_event_counts(events: DataFrame) -> DataFrame:
    """I3/I4: tumbling daily counts per event_type with watermarked state.

    Batch-equivalent semantics: groupBy(to_date(ts), event_type).count()
    over rows no older than the watermark — the streaming form of the
    reference's past-date filter + daily cadence.
    """
    return (
        events.withWatermark("ts", LATE_TOLERANCE)
        .groupBy(F.window("ts", "1 day").alias("day_window"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("day_window").start.cast("date").alias("event_date"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_daily_counts(
    events: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """Append-mode sink for the windowed aggregate: a window emits once its
    watermark passes (late rows dropped = I4)."""
    return (
        daily_event_counts(events)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .format("parquet")
        .start()
    )


def snapshot_consolidation(
    events: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    """I5: every micro-batch rewrites the consolidated snapshot (the
    reference's clear+rewrite, gsheet.py:114-117) — run via foreachBatch
    because the consolidation join is a batch transform per trigger.

    The snapshot is DATASET-WIDE, not batch-wide: each batch is first
    folded (idempotently, dynamic partition overwrite keyed on batch
    id) into a cumulative event store at ``out_path + "__events"``, and
    the snapshot is rebuilt from the FULL store — consolidation's 1:1
    matching is a global decision, so consolidating one micro-batch
    alone would both drop all previously ingested events from the
    snapshot and mis-match pairs that straddle batches. The rewrite is
    a staged write + rename promote (shared ``_fs`` machinery): the
    prior snapshot survives any crash window and external readers never
    observe a missing path."""
    from ..operators.consolidate import consolidate
    from ..operators.fixtures import dice_events, shotgun_events
    from ._fs import promote_staged, recover_promote, staging_dir

    store = out_path.rstrip("/") + "__events"

    def _write_batch(batch: DataFrame, batch_id: int) -> None:
        spark_b = batch.sparkSession
        recover_promote(spark_b, out_path)
        (
            batch.withColumn("ingest_batch", F.lit(f"batch-{batch_id}"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(store)
        )
        full = spark_b.read.parquet(store).drop("ingest_batch")
        out = consolidate(shotgun_events(full), dice_events(full))
        out.write.mode("overwrite").parquet(staging_dir(out_path))
        promote_staged(spark_b, out_path)

    # recover before the stream too: an availableNow rerun with no new
    # files never enters foreachBatch (same rationale as ann_maintenance)
    recover_promote(events.sparkSession, out_path)
    return (
        events.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_write_batch)
        .start()
    )


def stream_stream_click_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join with watermarks on BOTH sides: each click
    joined to same-user purchases within the preceding 30 minutes.

    The canonical two-stream pattern: both sides watermarked (bounds the
    join state store), the join condition carries the event-time band so
    Spark can expire state once the watermark passes. Batch-equivalent
    semantics: a band self-join on (user_id, ts range) — the streaming
    form of the legacy band join (SURVEY §2.D5).
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "click_id", F.col("c_user").alias("user_id"), "click_ts",
        "purchase_id", "purchase_ts", "purchase_value",
    )


def run_stream_stream_join(
    events: DataFrame, out_path: str, checkpoint: str
) -> StreamingQuery:
    return (
        stream_stream_click_purchase_join(events)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .option("path", out_path)
        .format("parquet")
        .start()
    )


def drain_until_fixpoint(
    spark: SparkSession,
    src_dir: str,
    out_path: str,
    checkpoint: str,
    max_rounds: int = 10,
) -> dict:
    """A5: scroll-until-fixpoint exhaust (reference shotgun.py scroll loop
    — keep fetching until a pass surfaces nothing new).

    Each round is an ``availableNow`` drain of the file source; the
    checkpoint makes every round ingest only files that appeared since
    the previous one (exactly the scraper's "scroll, collect the new
    cards, stop when a scroll adds none"). The fixpoint is a round whose
    micro-batches ingest zero rows — robust to files landing WHILE a
    round is running, which a single availableNow pass would miss.

    Returns {"rounds": n, "rows": total_ingested}.
    """
    from ._fs import path_exists

    def _sink_rows() -> int:
        # count the SINK, not q.recentProgress: recentProgress retains
        # only the last ~100 progress updates, so a >100-micro-batch
        # round would silently undercount. The sink count is exact —
        # the per-batch dynamic-overwrite write is replay-idempotent,
        # so sink delta == rows genuinely ingested this round.
        if not path_exists(spark, out_path):
            return 0
        return spark.read.parquet(out_path).count()

    start = _sink_rows()  # pre-existing rows (a resumed drain) excluded
    base = start
    for rnd in range(1, max_rounds + 1):
        q = incremental_append(
            read_events_stream(spark, src_dir), out_path, checkpoint
        )
        q.awaitTermination()
        now = _sink_rows()
        ingested = now - base
        base = now
        if ingested == 0:
            return {"rounds": rnd, "rows": base - start}
    raise RuntimeError(
        f"no fixpoint after {max_rounds} rounds ({base - start} rows "
        "ingested) — source is producing faster than it drains"
    )
