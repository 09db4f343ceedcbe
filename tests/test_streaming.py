"""Streaming veneer tests (SURVEY §2.I): availableNow incremental ingest
with exactly-once file processing, watermarked daily windows, snapshot
rewrite. Staged by copying the sf0.001 events parquet into a tmp source
dir — new files arriving = new micro-batches (the daily-scrape analog)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from concerts_etl_sa_spark.sources.readers import load_table
from concerts_etl_sa_spark.streaming import incremental as S

from .conftest import SF_DIR

SRC = f"{SF_DIR}/events.parquet"


@pytest.fixture()
def staged(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(SRC, src / "day1.parquet")
    return tmp_path


def _await(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_incremental_append_exactly_once_per_file(spark, staged):
    out = str(staged / "out")
    ckpt = str(staged / "ckpt")
    src = str(staged / "src")
    n_src = load_table(spark, SF_DIR, "events").count()

    ev = S.read_events_stream(spark, src)
    _await(S.incremental_append(ev, out, ckpt))
    got = spark.read.parquet(out)
    assert got.count() == n_src
    assert {"ingestion_run_id", "scrape_ts_utc", "event_date"} <= set(got.columns)

    # re-run with no new files: checkpoint => nothing re-ingested
    _await(S.incremental_append(S.read_events_stream(spark, src), out, ckpt))
    assert spark.read.parquet(out).count() == n_src

    # a new file arrives (next "day"): only it is ingested, new run id
    shutil.copy(SRC, staged / "src" / "day2.parquet")
    _await(S.incremental_append(S.read_events_stream(spark, src), out, ckpt))
    got = spark.read.parquet(out)
    assert got.count() == 2 * n_src
    assert got.select("ingestion_run_id").distinct().count() == 2


def test_daily_counts_window_matches_batch(spark, staged):
    out = str(staged / "counts")
    ckpt = str(staged / "ckpt2")
    ev = S.read_events_stream(spark, str(staged / "src"))
    _await(S.run_daily_counts(ev, out, ckpt))

    got = spark.read.parquet(out)
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("event_date"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    # append mode only emits windows the watermark has passed; with
    # availableNow over a finite backlog the final watermark leaves the
    # last LATE_TOLERANCE of windows unemitted — compare the emitted set
    emitted = {tuple(r) for r in got.select("event_date", "event_type", "n_events").collect()}
    expected = {tuple(r) for r in batch.select("event_date", "event_type", "n_events").collect()}
    assert emitted <= expected
    assert len(emitted) > 0


def test_snapshot_consolidation_rewrites(spark, staged):
    out = str(staged / "snap")
    ckpt = str(staged / "ckpt3")
    ev = S.read_events_stream(spark, str(staged / "src"))
    _await(S.snapshot_consolidation(ev, out, ckpt))
    snap1 = spark.read.parquet(out)
    assert snap1.count() > 0
    cols = set(snap1.columns)
    assert {"event_name", "shotgun_event_id", "dice_event_id"} <= cols


def test_stream_stream_join_matches_batch(spark, staged):
    """Two watermarked streams joined on (user, 30-min band) == the batch
    band join over the same data."""
    out = str(staged / "ssjoin")
    ckpt = str(staged / "ckpt4")
    ev = S.read_events_stream(spark, str(staged / "src"))
    _await(S.run_stream_stream_join(ev, out, ckpt))

    got = spark.read.parquet(out)
    batch_ev = load_table(spark, SF_DIR, "events")
    clicks = batch_ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = batch_ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"))
    expected = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") <= F.col("click_ts"))
        & (F.col("purchase_ts") >= F.col("click_ts") - F.expr("INTERVAL 30 MINUTES")),
    ).count()
    assert got.count() == expected
    assert expected > 0


def test_drain_until_fixpoint(spark, staged):
    out = str(staged / "fx_out")
    ckpt = str(staged / "fx_ckpt")
    src = str(staged / "src")
    n_src = load_table(spark, SF_DIR, "events").count()

    # one backlog file: round 1 ingests it, round 2 sees nothing -> stop
    res = S.drain_until_fixpoint(spark, src, out, ckpt)
    assert res["rows"] == n_src
    assert res["rounds"] == 2
    assert spark.read.parquet(out).count() == n_src

    # new file lands after the fixpoint: a fresh drain picks up ONLY it
    shutil.copy(SRC, staged / "src" / "day2.parquet")
    res2 = S.drain_until_fixpoint(spark, src, out, ckpt)
    assert res2["rows"] == n_src
    assert spark.read.parquet(out).count() == 2 * n_src


def test_native_watermarked_dedup_drops_replays(spark, staged):
    # day2 is a byte-identical replay of day1 (an at-least-once upstream
    # re-delivery): the native watermarked dedup must emit each event_id
    # exactly once across both files
    from concerts_etl_sa_spark.streaming.stateful import (
        streaming_dedup_watermarked,
    )

    shutil.copy(SRC, staged / "src" / "day2.parquet")
    out = str(staged / "dedup_out")
    ckpt = str(staged / "dedup_ckpt")
    ev = S.read_events_stream(spark, str(staged / "src"))
    q = (
        streaming_dedup_watermarked(ev)
        .writeStream.trigger(availableNow=True)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .format("parquet")
        .start()
    )
    _await(q)
    got = spark.read.parquet(out)
    n_src = load_table(spark, SF_DIR, "events").count()
    n_distinct = (
        load_table(spark, SF_DIR, "events")
        .select("event_id").distinct().count()
    )
    assert got.count() == n_distinct < 2 * n_src
    assert got.select("event_id").distinct().count() == n_distinct


def test_streaming_topk_maintenance_matches_batch_bruteforce(spark, tmp_path):
    """Fold embedding batches through the streaming top-k maintainer;
    the final state must equal the batch brute-force over everything
    landed (monotone-merge exactness), and a re-drain with no new files
    must be a no-op."""
    from concerts_etl_sa_spark.operators.similarity import (
        N_QUERIES,
        topk_cosine_bruteforce,
    )
    from concerts_etl_sa_spark.sources.readers import load_table
    from concerts_etl_sa_spark.streaming.ann_maintenance import (
        run_topk_maintenance,
    )
    from .conftest import SF_DIR

    src = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).cache()

    # two candidate batches landed separately
    emb.filter((F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < 500)) \
        .coalesce(1).write.mode("append").parquet(src)
    run_topk_maintenance(spark, src, state, ckpt, queries)
    emb.filter(F.col("vec_id") >= 500).coalesce(1).write.mode("append") \
        .parquet(src)
    run_topk_maintenance(spark, src, state, ckpt, queries)

    got = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in spark.read.parquet(state).collect()
    }
    want = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in topk_cosine_bruteforce(spark, SF_DIR).collect()
    }
    assert got == want

    run_topk_maintenance(spark, src, state, ckpt, queries)  # no new files
    again = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in spark.read.parquet(state).collect()
    }
    assert again == want


def test_topk_maintenance_corrupt_state_fails_loudly(spark, tmp_path):
    """A present-but-unreadable state dir must NOT be treated as 'first
    batch' (the old bare-except path): the overwrite would silently
    replace the accumulated top-k with just this batch's. With the
    explicit existence probe, the read failure kills the stream and the
    state dir is left untouched for a retry."""
    import pathlib

    import pytest

    from concerts_etl_sa_spark.operators.similarity import N_QUERIES
    from concerts_etl_sa_spark.sources.readers import load_table
    from concerts_etl_sa_spark.streaming.ann_maintenance import (
        run_topk_maintenance,
    )
    from .conftest import SF_DIR

    src = str(tmp_path / "landing")
    state_p = tmp_path / "state"
    ckpt = str(tmp_path / "ckpt")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    emb.filter(F.col("vec_id") >= N_QUERIES).limit(50).coalesce(1) \
        .write.mode("append").parquet(src)

    state_p.mkdir()
    corrupt = state_p / "part-00000-corrupt.parquet"
    corrupt.write_bytes(b"this is not a parquet file")
    with pytest.raises(Exception):
        run_topk_maintenance(spark, src, str(state_p), ckpt, queries)
    # nothing overwrote the state dir — the corrupt file survives intact
    assert corrupt.read_bytes() == b"this is not a parquet file"
    assert pathlib.Path(corrupt).exists()


def test_incremental_topk_replay_is_idempotent(spark):
    """Re-merging a batch whose entries already live in the prior top-k
    (at-least-once foreachBatch redelivery) must not change the state —
    duplicates would otherwise occupy two ranks and evict genuine k-th
    candidates."""
    from concerts_etl_sa_spark.operators.similarity import (
        N_QUERIES,
        _emb_normed,
        topk_cosine_incremental_df,
    )
    from .conftest import SF_DIR

    emb = _emb_normed(spark, SF_DIR)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    batch = emb.filter(F.col("vec_id") >= 500)
    prior = emb.filter(
        (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < 500)
    )
    from concerts_etl_sa_spark.operators.similarity import _score_topk

    state1 = topk_cosine_incremental_df(
        _score_topk(queries, prior), queries, batch
    )
    once = {(r.q_id, r.rn): (r.c_id, r.cosine) for r in state1.collect()}
    # replay: fold the SAME batch into the state it already produced
    state2 = topk_cosine_incremental_df(
        state1.select("q_id", "c_id", "cosine"), queries, batch
    )
    twice = {(r.q_id, r.rn): (r.c_id, r.cosine) for r in state2.collect()}
    assert twice == once


def test_topk_state_survives_promote_crash_window(spark, tmp_path):
    """A death between the snapshot promote's two renames leaves the
    state staged aside in __old: the next fold must roll it back and
    refold the replayed batch — never rebuild state from one batch
    (the mode('overwrite') delete-before-commit hazard)."""
    import os
    import shutil

    from concerts_etl_sa_spark.operators.similarity import (
        N_QUERIES,
        topk_cosine_bruteforce,
    )
    from concerts_etl_sa_spark.sources.readers import load_table
    from concerts_etl_sa_spark.streaming.ann_maintenance import (
        run_topk_maintenance,
    )
    from .conftest import SF_DIR

    src = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).cache()

    emb.filter((F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < 500)) \
        .coalesce(1).write.mode("append").parquet(src)
    run_topk_maintenance(spark, src, state, ckpt, queries)

    # reconstruct the mid-promote crash: state renamed aside, a stale
    # staging snapshot still on disk
    shutil.copytree(state, state + "__staging")
    os.rename(state, state + "__old")
    assert not os.path.isdir(state)

    emb.filter(F.col("vec_id") >= 500).coalesce(1).write.mode("append") \
        .parquet(src)
    run_topk_maintenance(spark, src, state, ckpt, queries)

    got = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in spark.read.parquet(state).collect()
    }
    want = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in topk_cosine_bruteforce(spark, SF_DIR).collect()
    }
    assert got == want
    # promote fully settled: no staging or staged-aside dirs left
    assert not os.path.isdir(state + "__old")
    assert not os.path.isdir(state + "__staging")


def test_topk_crash_recovery_runs_before_stream_starts(spark, tmp_path):
    """Start-time recovery (round-9 advice): after a death between the
    promote's two renames, a rerun with an EMPTY landing dir never
    invokes foreachBatch — the per-batch recovery alone would leave the
    live state_dir missing (surviving only in __old) and external
    readers would see no snapshot. run_topk_maintenance must recover at
    start, before the stream."""
    import os

    from concerts_etl_sa_spark.operators.similarity import N_QUERIES
    from concerts_etl_sa_spark.sources.readers import load_table
    from concerts_etl_sa_spark.streaming.ann_maintenance import (
        run_topk_maintenance,
    )
    from .conftest import SF_DIR

    src = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).cache()

    emb.filter(F.col("vec_id") >= N_QUERIES).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_topk_maintenance(spark, src, state, ckpt, queries)
    before = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in spark.read.parquet(state).collect()
    }

    # mid-promote crash, then a rerun that delivers NO new batch
    os.rename(state, state + "__old")
    assert not os.path.isdir(state)
    run_topk_maintenance(spark, src, state, ckpt, queries)

    after = {
        (r.q_id, r.rn): (r.c_id, r.cosine)
        for r in spark.read.parquet(state).collect()
    }
    assert after == before
    assert not os.path.isdir(state + "__old")


def test_append_batch_replay_is_idempotent(spark, staged):
    """foreachBatch is at-least-once: re-delivering the SAME (batch,
    batch_id) — the crash-after-write-before-commit window — must not
    duplicate rows (dynamic partition overwrite, not blind append)."""
    out = str(staged / "replay_out")
    ev = load_table(spark, SF_DIR, "events")
    S.append_batch(ev, 0, out)
    n1 = spark.read.parquet(out).count()
    assert n1 == ev.count()
    S.append_batch(ev, 0, out)  # crash-replay of the same batch
    assert spark.read.parquet(out).count() == n1
    S.append_batch(ev, 1, out)  # a genuinely new batch still lands
    assert spark.read.parquet(out).count() == 2 * n1


def test_snapshot_is_dataset_wide_across_batches_and_runs(spark, staged):
    """The consolidated snapshot must reflect EVERY ingested file, not
    just the last micro-batch: 5 staged files > maxFilesPerTrigger=4
    forces multiple batches in one drain, and a later drain's new file
    must ADD to the dataset (the pre-fix code consolidated each batch
    alone and overwrote the snapshot with it)."""
    from concerts_etl_sa_spark.operators.consolidate import consolidate
    from concerts_etl_sa_spark.operators.fixtures import (
        dice_events,
        shotgun_events,
    )

    src = staged / "src"
    for i in range(2, 6):  # day1 already staged; 5 files total
        shutil.copy(SRC, src / f"day{i}.parquet")
    out = str(staged / "snap_wide")
    ckpt = str(staged / "ckpt_snap_wide")
    _await(
        S.snapshot_consolidation(
            S.read_events_stream(spark, str(src)), out, ckpt
        )
    )
    ev1 = load_table(spark, SF_DIR, "events")
    full5 = ev1
    for _ in range(4):
        full5 = full5.unionByName(ev1)
    expected5 = consolidate(
        shotgun_events(full5), dice_events(full5)
    ).count()
    assert spark.read.parquet(out).count() == expected5

    # a sixth file lands; a fresh drain folds it into the SAME dataset
    shutil.copy(SRC, src / "day6.parquet")
    _await(
        S.snapshot_consolidation(
            S.read_events_stream(spark, str(src)), out, ckpt
        )
    )
    full6 = full5.unionByName(ev1)
    expected6 = consolidate(
        shotgun_events(full6), dice_events(full6)
    ).count()
    assert spark.read.parquet(out).count() == expected6
