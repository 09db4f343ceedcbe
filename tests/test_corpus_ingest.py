"""Streaming corpus ingest: incremental dedup against the sink,
quality gating, idempotent re-drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.sources.readers import load_table
from concerts_etl_sa_spark.streaming.corpus_ingest import run_corpus_ingest

from .conftest import SF_DIR


def _land(spark, docs, path):
    docs.coalesce(1).write.mode("append").parquet(path)


def test_corpus_ingest_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF_DIR, "documents").limit(40).cache()
    first = docs.filter(F.col("doc_id") < 20)
    _land(spark, first, src)
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    curated1 = spark.read.parquet(out)
    n1 = curated1.count()
    assert 0 < n1 <= 20
    # hashes unique after first drain
    assert curated1.select("content_hash").distinct().count() == n1

    # second landing: 10 overlapping docs (same text => same hash) + 20 new
    second = docs.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 40))
    _land(spark, second, src)
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    curated2 = spark.read.parquet(out)
    # overlap rows anti-joined away: every content_hash appears once
    assert (
        curated2.groupBy("content_hash").count().filter("count > 1").count() == 0
    )
    assert curated2.count() > n1


def test_corpus_ingest_quality_gate_and_lineage(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    _land(spark, load_table(spark, SF_DIR, "documents").limit(60), src)
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.4)
    curated = spark.read.parquet(out)
    rows = curated.collect()
    assert rows and all(r.quality >= 0.4 for r in rows)
    assert all(r.ingest_batch_id is not None for r in rows)


def test_corpus_ingest_rerun_without_new_files_is_noop(spark, tmp_path):
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    _land(spark, load_table(spark, SF_DIR, "documents").limit(20), src)
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    n1 = spark.read.parquet(out).count()
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    assert spark.read.parquet(out).count() == n1


def test_corpus_ingest_near_dup_admission_gate(spark, tmp_path):
    """With near_dup_threshold set, a second batch's near-variant of an
    already-curated doc (different hash, high Jaccard) is refused;
    genuinely new docs are admitted."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    base = " ".join(f"w{k} common body token" for k in range(12))
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    _land(spark, mk([(1, base + " original tail")]), src)
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    assert spark.read.parquet(out).count() == 1

    _land(
        spark,
        mk([
            (2, base + " variant tail"),   # near-dup of doc 1
            (3, " ".join(f"fresh{k} unrelated words" for k in range(12))),
        ]),
        src,
    )
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}, kept


def test_near_dup_gate_survives_sink_flood_with_bucket_cap(spark, tmp_path):
    """A giant near-dup cluster already in the sink must not blow up the
    gate's band join: with the corpus-side bucket cap the probe is still
    refused (any surviving bucket member triggers the hit)."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    words = [f"w{k}" for k in range(70)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    # 60 case-variant copies: distinct hashes, identical shingle sets
    flood = [
        (i, " ".join(w.upper() if j == i else w for j, w in enumerate(words)))
        for i in range(60)
    ]
    _land(spark, mk(flood), src)
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0,
        near_dup_threshold=0.5, near_dup_max_bucket=8,
    )
    n_sink = spark.read.parquet(out).count()
    assert n_sink == 60  # first batch: nothing in the sink to refuse against

    _land(
        spark,
        mk([
            (100, " ".join(words) + " extra"),  # near-dup of the flood
            (101, " ".join(f"fresh{k} novel words" for k in range(12))),
        ]),
        src,
    )
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0,
        near_dup_threshold=0.5, near_dup_max_bucket=8,
    )
    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 100 not in kept and 101 in kept


def test_near_dup_gate_covers_pre_index_sink(spark, tmp_path):
    """A sink written BEFORE index-on-write existed (no band_fps column)
    must neither crash the armed gate nor silently exempt pre-upgrade
    docs: legacy rows read band_fps = NULL under the pinned sink schema
    and are re-indexed on the fly, so a near-dup of a pre-upgrade doc is
    still refused while genuinely new docs are admitted."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    base = " ".join(f"w{k} common body token" for k in range(12))
    # simulate the pre-upgrade layout: write the sink directly with the
    # old writer's schema (no band_fps)
    spark.createDataFrame(
        [(1, base + " original tail")], "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"), F.lit(1.0).alias("quality"),
        F.md5("text").alias("content_hash"),
        F.lit(0).cast("long").alias("ingest_batch_id"),
    ).write.mode("append").parquet(out)

    _land(
        spark,
        spark.createDataFrame(
            [
                (2, base + " variant tail"),  # near-dup of pre-upgrade doc 1
                (3, " ".join(f"fresh{k} unrelated words" for k in range(12))),
            ],
            "doc_id BIGINT, text STRING",
        ).select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("src0").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        ),
        src,
    )
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert kept == {1, 3}, kept


def test_backfill_band_fps_upgrades_pre_index_sink(spark, tmp_path):
    """One-shot backfill: legacy rows gain band_fps identical to the
    write-path definition, already-indexed rows keep their stored
    fingerprints verbatim, the call is idempotent, and the armed gate
    works against the upgraded sink."""
    from pyspark.sql import functions as F2

    from concerts_etl_sa_spark.operators.dedup import (
        _shingles,
        _tokens,
        band_fps_from_shingles,
    )
    from concerts_etl_sa_spark.streaming.corpus_ingest import (
        backfill_band_fps,
        run_corpus_ingest,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    base = " ".join(f"w{k} common body token" for k in range(12))
    legacy = spark.createDataFrame(
        [(1, base + " original tail"), (2, "another unrelated doc body")],
        "doc_id BIGINT, text STRING",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"), F.lit(1.0).alias("quality"),
        F.md5("text").alias("content_hash"),
        F.lit(0).cast("long").alias("ingest_batch_id"),
    )
    legacy.write.mode("append").parquet(out)

    assert backfill_band_fps(spark, out) == 2
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    want = {
        r.doc_id: list(r.fps)
        for r in legacy.select(
            "doc_id",
            F2.col("text").alias("text"),
        ).withColumn("_t", _tokens(F2.col("text")))
        .withColumn("_s", _shingles(F2.col("_t")))
        .select("doc_id", band_fps_from_shingles(F2.col("_s")).alias("fps"))
        .collect()
    }
    assert {k: list(v.band_fps) for k, v in rows.items()} == want

    # idempotent no-op on an already-indexed sink
    assert backfill_band_fps(spark, out) == 0
    assert {r.doc_id: list(r.band_fps)
            for r in spark.read.parquet(out).collect()} == want

    # the gate refuses a near-dup of a backfilled doc
    _land(
        spark,
        spark.createDataFrame(
            [(10, base + " variant tail")], "doc_id BIGINT, text STRING"
        ).select(
            "doc_id", "text", F.lit("en").alias("lang"),
            F.lit("src0").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        ),
        src,
    )
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    kept = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    assert kept == {1, 2}, kept


def test_backfill_crash_window_recovery(spark, tmp_path):
    """A death between the backfill's two renames must be repairable:
    a rerun promotes the verified rewrite (or rolls the original back)
    instead of reporting 'already indexed' while the next ingest
    silently rebuilds an empty sink."""
    import os
    import shutil

    from concerts_etl_sa_spark.streaming.corpus_ingest import (
        backfill_band_fps,
    )

    out = str(tmp_path / "curated")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta body text")],
        "doc_id BIGINT, text STRING",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"), F.lit(1.0).alias("quality"),
        F.md5("text").alias("content_hash"),
        F.lit(0).cast("long").alias("ingest_batch_id"),
    ).write.mode("append").parquet(out)

    # run a full backfill once to get the upgraded layout, then
    # reconstruct the mid-swap crash state: sink gone, old + tmp present
    assert backfill_band_fps(spark, out) == 1
    shutil.copytree(out, out + "__backfill")
    os.rename(out, out + "__pre_backfill")
    assert not os.path.isdir(out)

    # recovery path: rerun promotes the verified tmp and cleans up
    assert backfill_band_fps(spark, out) == 0
    assert os.path.isdir(out)
    assert not os.path.isdir(out + "__backfill")
    assert not os.path.isdir(out + "__pre_backfill")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].band_fps is not None

    # rollback path: old exists, no tmp
    os.rename(out, out + "__pre_backfill")
    assert backfill_band_fps(spark, out) == 0
    assert os.path.isdir(out) and not os.path.isdir(out + "__pre_backfill")
    assert spark.read.parquet(out).count() == 1


def test_backfill_ambiguous_state_fails_loudly(spark, tmp_path):
    """sink + __pre_backfill + __backfill all present means an ingest
    recreated the sink inside the crash window: the original corpus
    lives in __pre_backfill and MUST NOT be silently deleted as a
    'completed-swap leftover'."""
    import os
    import shutil

    import pytest

    from concerts_etl_sa_spark.streaming.corpus_ingest import (
        backfill_band_fps,
    )

    out = str(tmp_path / "curated")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta body text")],
        "doc_id BIGINT, text STRING",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"), F.lit(1.0).alias("quality"),
        F.md5("text").alias("content_hash"),
        F.lit(0).cast("long").alias("ingest_batch_id"),
    ).write.mode("append").parquet(out)
    assert backfill_band_fps(spark, out) == 1

    shutil.copytree(out, out + "__backfill")
    shutil.copytree(out, out + "__pre_backfill")
    with pytest.raises(RuntimeError, match="ambiguous state"):
        backfill_band_fps(spark, out)
    # nothing was deleted
    assert os.path.isdir(out + "__pre_backfill")
    assert os.path.isdir(out + "__backfill")
    assert os.path.isdir(out)


def test_near_gate_refusal_is_content_keyed(spark, tmp_path):
    """An at-least-once upstream re-emitting corrected text under a
    REUSED doc_id in the same batch: the near-hit on the stale variant
    must not drag out the DISTINCT-content row sharing its doc_id —
    refusal anti-joins on content_hash, mirroring the embedding gate."""
    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    base = " ".join(f"w{k} common body token" for k in range(12))
    fresh_text = " ".join(f"fresh{k} unrelated words" for k in range(12))
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    _land(spark, mk([(1, base + " original tail")]), src)
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    # same batch, same reused doc_id: a near-dup of doc 1 AND a
    # genuinely distinct correction
    _land(
        spark,
        mk([(2, base + " variant tail"), (2, fresh_text)]),
        src,
    )
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    texts = {r.text for r in spark.read.parquet(out).collect()}
    assert texts == {base + " original tail", fresh_text}, texts


def test_intra_batch_near_dup_stance(spark, tmp_path):
    """Pin both documented behaviors: by default two mutual near-dups
    in ONE micro-batch are both admitted (sink-only probe); with
    intra_batch_near_dup=True the min-content_hash anchor is admitted
    and its in-batch near-neighbor is refused."""
    import hashlib

    base = " ".join(f"w{k} common body token" for k in range(12))
    t_a, t_b = base + " variant one", base + " variant two"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )

    # default: both admitted
    src = str(tmp_path / "land_default")
    out = str(tmp_path / "cur_default")
    ckpt = str(tmp_path / "ck_default")
    _land(spark, mk([(1, t_a), (2, t_b)]), src)
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0, near_dup_threshold=0.5
    )
    assert spark.read.parquet(out).count() == 2

    # flag armed: only the smaller content_hash survives
    src2 = str(tmp_path / "land_flag")
    out2 = str(tmp_path / "cur_flag")
    ckpt2 = str(tmp_path / "ck_flag")
    _land(spark, mk([(1, t_a), (2, t_b)]), src2)
    run_corpus_ingest(
        spark, src2, out2, ckpt2, min_quality=0.0,
        near_dup_threshold=0.5, intra_batch_near_dup=True,
    )
    rows = spark.read.parquet(out2).collect()
    want = min(t_a, t_b, key=lambda t: hashlib.md5(t.encode()).hexdigest())
    assert len(rows) == 1 and rows[0].text == want


def test_ingest_refuses_during_backfill_fence(spark, tmp_path):
    """While the backfill swap fence exists, run_corpus_ingest must
    refuse to start (an ingest recreating the sink inside the swap
    window is the one unrecoverable backfill state); a backfill rerun
    over the settled sink clears the stale fence and ingest resumes."""
    import pathlib

    import pytest

    from concerts_etl_sa_spark.streaming.corpus_ingest import (
        backfill_band_fps,
        backfill_marker_path,
    )

    src = str(tmp_path / "landing")
    out = str(tmp_path / "curated")
    ckpt = str(tmp_path / "ckpt")
    docs = load_table(spark, SF_DIR, "documents").limit(10)
    _land(spark, docs, src)
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    marker = pathlib.Path(backfill_marker_path(out))
    marker.touch()
    _land(spark, load_table(spark, SF_DIR, "documents").limit(20), src)
    with pytest.raises(RuntimeError, match="backfill fence"):
        run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    assert spark.read.parquet(out).count() == n1  # nothing ran

    # the sink is settled and fully indexed: a backfill rerun is the
    # documented way to clear a stale fence
    assert backfill_band_fps(spark, out) == 0
    assert not marker.exists()
    run_corpus_ingest(spark, src, out, ckpt, min_quality=0.0)
    assert spark.read.parquet(out).count() > n1


def test_intra_batch_self_probe_respects_bucket_cap(spark, tmp_path):
    """Document twin of the embedding cap test: near_dup_max_bucket
    bounds the intra-batch self-probe's buckets (round-9 advice). With
    cap=1 each in-batch band bucket keeps one row, so the mutual
    near-dup pair never forms a candidate and both docs are admitted."""
    base = " ".join(f"w{k} common body token" for k in range(12))
    t_a, t_b = base + " variant one", base + " variant two"
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id BIGINT, text STRING"
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    src = str(tmp_path / "land_cap")
    out = str(tmp_path / "cur_cap")
    ckpt = str(tmp_path / "ck_cap")
    _land(spark, mk([(1, t_a), (2, t_b)]), src)
    run_corpus_ingest(
        spark, src, out, ckpt, min_quality=0.0,
        near_dup_threshold=0.5, intra_batch_near_dup=True,
        near_dup_max_bucket=1,
    )
    assert spark.read.parquet(out).count() == 2
