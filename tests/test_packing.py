"""Sequence packing: shard budget invariants, determinism, coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.packing import pack_sequences, shard_stats
from concerts_etl_sa_spark.operators.textstats import _tokens
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR

MAX_TOKENS = 200


def _docs_with_tokens(spark):
    d = load_table(spark, SF_DIR, "documents")
    return d.select(
        "doc_id", "text", F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )


def test_every_doc_in_exactly_one_shard(spark):
    docs = _docs_with_tokens(spark)
    packed = pack_sequences(docs, MAX_TOKENS)
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    assert packed.filter(F.col("shard_id").isNull()).count() == 0


def test_shard_budget_held_unless_single_doc_oversized(spark):
    docs = _docs_with_tokens(spark)
    packed = pack_sequences(docs, MAX_TOKENS)
    over = (
        shard_stats(packed)
        .filter(F.col("total_tokens") > MAX_TOKENS)
        .filter(F.col("n_docs") > 1)  # oversized lone docs are allowed
        .count()
    )
    assert over == 0


def test_packing_deterministic_and_bucket_contiguous(spark):
    docs = _docs_with_tokens(spark)
    a = {r.doc_id: r.shard_id for r in pack_sequences(docs, MAX_TOKENS).collect()}
    b = {r.doc_id: r.shard_id for r in pack_sequences(docs, MAX_TOKENS).collect()}
    assert a == b
    # within a bucket namespace, doc order and shard order agree
    by_shard = sorted(a.items())
    for (d1, s1), (d2, s2) in zip(by_shard, by_shard[1:]):
        if (s1 >> 40) == (s2 >> 40):  # same bucket
            assert s1 <= s2 or d1 > d2


def test_oversized_doc_gets_own_shard(spark):
    rows = [(1, 10), (2, 5000), (3, 20), (4, 30)]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, n_tokens BIGINT")
    packed = pack_sequences(docs, max_tokens=100, n_buckets=1)
    shards = {r.doc_id: r.shard_id for r in packed.collect()}
    others = {shards[1], shards[3], shards[4]}
    assert shards[2] not in others or len({shards[2]}) == 1
    stats = {r.shard_id: (r.n_docs, r.total_tokens)
             for r in shard_stats(packed).collect()}
    # the 5000-token doc sits alone in its shard
    n_docs, total = stats[shards[2]]
    assert n_docs == 1 and total == 5000


def test_materialize_training_shards_end_to_end(spark, tmp_path):
    from concerts_etl_sa_spark.plans.corpus import materialize_training_shards

    from .conftest import SF_DIR

    out = str(tmp_path / "release")
    manifest = materialize_training_shards(
        spark, SF_DIR, out, max_tokens=1024
    ).collect()
    assert manifest, "at least one shard"

    shards = spark.read.parquet(f"{out}/shards")
    rows = shards.collect()
    # every curated doc in exactly one shard; shard totals match manifest
    assert shards.select("doc_id").distinct().count() == len(rows)
    from collections import defaultdict

    totals = defaultdict(int)
    for r in rows:
        totals[r.shard_id] += r.n_tokens
    by_shard = {m.shard_id: m for m in manifest}
    assert set(totals) == set(by_shard)
    for sid, tok in totals.items():
        assert by_shard[sid].total_tokens == tok
        # budget respected unless a single doc overflows alone
        if by_shard[sid].n_docs > 1:
            assert tok <= 1024
