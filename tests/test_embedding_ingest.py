"""Streaming embedding ingest: content-exact dedup, sign-LSH near-dup
admission gate over the stored band-key index, bucket cap, idempotent
re-drain."""

from __future__ import annotations

import random

from concerts_etl_sa_spark.streaming.embedding_ingest import (
    run_embedding_ingest,
)

EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT"


def _vec(seed: int):
    rng = random.Random(seed)
    return [round(rng.uniform(-1, 1), 3) for _ in range(64)]


def _land(spark, rows, path):
    spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_embedding_ingest_exact_dedup_across_batches(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    a, b = _vec(1), _vec(2)
    _land(spark, [(1, a, 0), (2, b, 0), (3, a, 0)], src)  # 3 dups 1 in-batch
    run_embedding_ingest(spark, src, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 2
    # re-land the same content under a new id: refused against the sink
    _land(spark, [(10, a, 1)], src)
    run_embedding_ingest(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2 and {r.vec_id for r in rows} <= {1, 2, 3}
    assert all(r.band_keys is not None and len(r.band_keys) == 2
               and r.vec_hash is not None for r in rows)


def test_embedding_ingest_near_dup_gate(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    a = _vec(7)
    near = [round(x * 1.001, 6) for x in a]        # same signs, cos ~ 1
    anti = [-x for x in a]                         # cos = -1, other buckets
    _land(spark, [(1, a, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    _land(spark, [(2, near, 0), (3, anti, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}, kept

    # idempotent re-drain with no new files
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    assert spark.read.parquet(out).count() == 2


def test_embedding_ingest_gate_survives_flood_with_cap(spark, tmp_path):
    """30 distinct near-identical vectors flood one band bucket in the
    sink; with the bucket cap the probe is still refused (any surviving
    member is a cosine hit) and the join stays bounded."""
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    base = _vec(11)
    flood = [
        (i, [round(x + (0.0001 * i if j == 60 else 0.0), 6)
             for j, x in enumerate(base)], 0)
        for i in range(30)
    ]
    _land(spark, flood, src)
    run_embedding_ingest(
        spark, src, out, ckpt, near_dup_cosine=0.95, near_dup_max_bucket=4
    )
    assert spark.read.parquet(out).count() == 30  # first drain: empty sink

    probe = [(100, [round(x * 0.999, 6) for x in base], 0),
             (101, [-x for x in base], 1)]
    _land(spark, probe, src)
    run_embedding_ingest(
        spark, src, out, ckpt, near_dup_cosine=0.95, near_dup_max_bucket=4
    )
    kept = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert 100 not in kept and 101 in kept


def test_embedding_ingest_same_id_distinct_vector_is_admitted(spark, tmp_path):
    """The exact gate's anti-join identity is the (hash, embedding)
    pair, not vec_id: a batch row whose vec_id collides with a
    sink-matching row must not be dragged out with it."""
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    a, b = _vec(21), _vec(22)
    _land(spark, [(1, a, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt)
    # one batch: the sink copy of a (same id) AND a distinct vector b
    # under the SAME vec_id
    _land(spark, [(1, a, 0), (1, b, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    # old behavior left 1 row (b anti-joined away by its colliding id);
    # two DISTINCT vectors must survive (float32 storage rounds the
    # python literals, so compare distinctness, not exact values)
    assert len(rows) == 2
    assert len({tuple(r.embedding) for r in rows}) == 2
    assert len({r.vec_hash for r in rows}) == 2


def test_embedding_ingest_null_embedding_replay_exactly_once(spark, tmp_path):
    """A NULL-embedding row must exact-match its own earlier admission
    on redelivery (eqNullSafe) — plain equality would append a duplicate
    NULL row per replay."""
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    _land(spark, [(1, None, 0), (2, _vec(31), 0)], src)
    run_embedding_ingest(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 2
    _land(spark, [(1, None, 0)], src)  # redelivered content
    run_embedding_ingest(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2
    assert sum(1 for r in rows if r.embedding is None) == 1


def test_embedding_ingest_near_gate_refuses_by_content_not_id(spark, tmp_path):
    """With the near gate armed, a batch row near a sink vector is
    refused while a DISTINCT row sharing its vec_id is admitted — the
    refusal identity is content, not id."""
    src, out, ckpt = (str(tmp_path / d) for d in ("land", "cur", "ck"))
    a = _vec(41)
    near_a = [round(x * 1.001, 6) for x in a]
    unrelated = [-x for x in a]
    _land(spark, [(1, a, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    _land(spark, [(1, near_a, 0), (1, unrelated, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 2  # a + unrelated; near_a refused
    hashes = {r.vec_hash for r in rows}
    assert len(hashes) == 2


def test_embedding_intra_batch_near_dup_flag(spark, tmp_path):
    """Twin of the document gate's stance test: by default two mutual
    near-dup vectors in one micro-batch are both admitted; with
    intra_batch_near_dup=True only the min-vec_hash anchor survives."""
    from pyspark.sql import functions as F

    a = _vec(21)
    near = [round(x * 1.001, 6) for x in a]

    src, out, ckpt = (str(tmp_path / d) for d in ("land_d", "cur_d", "ck_d"))
    _land(spark, [(1, a, 0), (2, near, 0)], src)
    run_embedding_ingest(spark, src, out, ckpt, near_dup_cosine=0.95)
    assert spark.read.parquet(out).count() == 2  # default: both admitted

    src2, out2, ckpt2 = (
        str(tmp_path / d) for d in ("land_f", "cur_f", "ck_f")
    )
    _land(spark, [(1, a, 0), (2, near, 0)], src2)
    run_embedding_ingest(
        spark, src2, out2, ckpt2, near_dup_cosine=0.95,
        intra_batch_near_dup=True,
    )
    rows = spark.read.parquet(out2).collect()
    # the survivor is the min-vec_hash anchor (content-keyed rank)
    hashes = {
        r.vec_id: r.h
        for r in spark.createDataFrame([(1, a), (2, near)],
                                        "vec_id BIGINT, e ARRAY<FLOAT>")
        .select("vec_id", F.xxhash64("e").alias("h")).collect()
    }
    want_id = min(hashes, key=hashes.get)
    assert len(rows) == 1 and rows[0].vec_id == want_id


def test_embedding_intra_batch_self_probe_respects_bucket_cap(spark, tmp_path):
    """near_dup_max_bucket bounds the intra-batch self-probe too
    (round-9 advice): with cap=1 each flooded bucket keeps one row, so
    no candidate pair forms and BOTH mutual near-dups are admitted —
    the documented capped-out-neighbor recall trade, now shared with
    the sink probe instead of silently ignored."""
    a = _vec(33)
    near = [round(x * 1.001, 6) for x in a]

    src, out, ckpt = (str(tmp_path / d) for d in ("land_c", "cur_c", "ck_c"))
    _land(spark, [(1, a, 0), (2, near, 0)], src)
    run_embedding_ingest(
        spark, src, out, ckpt, near_dup_cosine=0.95,
        intra_batch_near_dup=True, near_dup_max_bucket=1,
    )
    assert spark.read.parquet(out).count() == 2

    # cap wide enough to see the pair: the anchor rule refuses one
    src2, out2, ckpt2 = (
        str(tmp_path / d) for d in ("land_w", "cur_w", "ck_w")
    )
    _land(spark, [(1, a, 0), (2, near, 0)], src2)
    run_embedding_ingest(
        spark, src2, out2, ckpt2, near_dup_cosine=0.95,
        intra_batch_near_dup=True, near_dup_max_bucket=10,
    )
    assert spark.read.parquet(out2).count() == 1
