"""Pin the first-shared-band emission property of the banded LSH joins.

simhash_near_pairs, minhash_lsh_pairs_df and topk_cosine_lsh replaced
their candidate dropDuplicates exchange with per-row "emit only from the
lowest shared band" filters (round 5). Two invariants protect that
rewrite:

1. no (a_id, b_id) [or (q_id, c_id)] appears more than once, even for
   inputs engineered to share EVERY band (identical payloads);
2. the pair set equals what the banding semantics require — identical
   docs must always pair (they share band 0).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.dedup import (
    minhash_lsh_pairs_df,
    simhash_near_pairs,
)
from concerts_etl_sa_spark.operators.similarity import topk_cosine_lsh

from .conftest import SF_DIR


def _assert_unique_pairs(df, a="a_id", b="b_id"):
    dups = df.groupBy(a, b).count().filter("count > 1").count()
    assert dups == 0


def test_simhash_pairs_unique_at_test_sf(spark):
    out = simhash_near_pairs(spark, SF_DIR)
    _assert_unique_pairs(out)
    assert out.count() > 0


def test_minhash_identical_docs_emit_exactly_once(spark):
    """Identical texts share ALL four bands — the strongest duplicate-
    emission stressor: the old code emitted such a pair 4x before its
    dropDuplicates; the first-band filter must emit it exactly once."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about spark physical planning",
    ]
    rows = [(i, texts[i % 2]) for i in range(8)]  # 4 copies of each text
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = minhash_lsh_pairs_df(docs).collect()
    got = {(r.a_id, r.b_id) for r in out}
    assert len(out) == len(got), "duplicate pair emissions"
    # 4 copies of each of 2 texts -> C(4,2)=6 identical pairs per text,
    # jaccard 1.0; cross-text pairs shouldn't reach the 0.8 threshold
    expected = {
        (a, b)
        for a in range(8)
        for b in range(a + 1, 8)
        if a % 2 == b % 2
    }
    assert got == expected
    assert all(r.jaccard == 1.0 for r in out)


def test_topk_lsh_pairs_unique_at_test_sf(spark):
    out = topk_cosine_lsh(spark, SF_DIR)
    # the top-k output is rank-unique by construction; assert the
    # underlying property instead: no (q_id, c_id) appears twice
    _assert_unique_pairs(out, "q_id", "c_id")
    assert out.count() > 0
