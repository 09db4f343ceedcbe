"""100 TB skew stress: the giant near-dup cluster through EVERY LSH
family (minhash bands, simhash blocks, embedding sign buckets — all
sharing ``util.capped_candidates``), hot-gram duplicate_spans, and
long-chain convergence of the components closure.

Shapes under test:
- ONE heavy cluster (60 identical docs/vectors -> every bucket the
  cluster touches holds all 60) inside a background of unique items:
  the unguarded self-join would emit C(60,2)=1770 candidate pairs per
  bucket; the cap bounds it.
- star mode must keep the cluster CONNECTED (one component) while
  emitting only linear anchor edges per heavy bucket.
- sample mode must emit a bounded subset of the uncapped pairs.
- a 1024-hop chain must converge in O(log n) pointer-doubling rounds,
  not O(n) propagation rounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.components import connected_components
from concerts_etl_sa_spark.operators.dedup import (
    minhash_lsh_pairs_df,
    ngram_jaccard_pairs_df,
    simhash_near_pairs_df,
)
from concerts_etl_sa_spark.operators.similarity import (
    embedding_near_dup_pairs_df,
)

CLUSTER = 60
CAP = 8
N_BANDS = 4  # minhash bands == simhash blocks; embeddings have 1 bucket


def _giant_cluster_corpus(spark):
    """60 identical docs (one near-dup clique) + 200 unique background."""
    dup_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, dup_text) for i in range(CLUSTER)]
    rows += [
        (1000 + i, " ".join(f"w{i}t{j}" for j in range(12))) for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _small_groups_corpus(spark):
    """No heavy buckets: 5 identical twin-pairs + 100 unique docs."""
    rows = []
    for k in range(5):
        t = f"twin pair number {k} shares exactly this text body " + " ".join(
            f"p{k}x{j}" for j in range(8)
        )
        rows += [(2000 + 2 * k, t), (2001 + 2 * k, t)]
    rows += [
        (3000 + i, " ".join(f"u{i}q{j}" for j in range(12))) for i in range(100)
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def _giant_vector_corpus(spark):
    """60 identical all-positive vectors (one sign bucket) + 200
    background vectors whose first-8-dim sign patterns are the bits of
    their index — each background lands in its own bucket, none in the
    cluster's all-ones bucket (needs index 255 > 199)."""
    cluster_vec = [1.0 + 0.01 * j for j in range(64)]
    rows = [(i, cluster_vec) for i in range(CLUSTER)]
    for i in range(200):
        v = [1.0 if (i >> j) & 1 else -1.0 for j in range(8)] + [0.0] * 56
        v[8 + (i % 56)] = 1.0
        rows.append((1000 + i, v))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def _small_vector_corpus(spark):
    """No heavy buckets: 5 identical vector twin-pairs, each pair in its
    own sign bucket, plus orthogonal background."""
    rows = []
    for k in range(5):
        v = [1.0 if (k >> j) & 1 else -1.0 for j in range(8)] + [
            0.1 * ((k + j) % 7) + 0.05 for j in range(56)
        ]
        rows += [(2000 + 2 * k, v), (2001 + 2 * k, v)]
    for i in range(40):
        v = [1.0 if ((i + 64) >> j) & 1 else -1.0 for j in range(8)] + [0.0] * 56
        v[8 + (i % 56)] = 1.0
        rows.append((3000 + i, v))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


# (pairs_fn(df, cap, mode), giant_corpus, small_corpus, n_buckets_touched)
FAMILIES = {
    "minhash": (
        lambda df, cap=None, mode="star": minhash_lsh_pairs_df(
            df, max_bucket_size=cap, heavy_bucket_mode=mode
        ),
        _giant_cluster_corpus,
        _small_groups_corpus,
        N_BANDS,
    ),
    "simhash": (
        lambda df, cap=None, mode="star": simhash_near_pairs_df(
            df, max_bucket_size=cap, heavy_bucket_mode=mode
        ),
        _giant_cluster_corpus,
        _small_groups_corpus,
        N_BANDS,
    ),
    "embedding": (
        lambda df, cap=None, mode="star": embedding_near_dup_pairs_df(
            df, threshold=0.99, max_bucket_size=cap, heavy_bucket_mode=mode
        ),
        _giant_vector_corpus,
        _small_vector_corpus,
        2,  # two OR'd sign-LSH bands since the round-7 recall fix
    ),
    # round-9 addition: min-shingle blocking has exactly ONE bucket per
    # doc, so the identical-doc flood is its worst case too
    "ngram": (
        lambda df, cap=None, mode="star": ngram_jaccard_pairs_df(
            df, max_bucket_size=cap, heavy_bucket_mode=mode
        ),
        _giant_cluster_corpus,
        _small_groups_corpus,
        1,
    ),
}


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_star_cap_bounds_pairs_and_keeps_cluster_connected(spark, family):
    fn, giant, _, n_buckets = FAMILIES[family]
    pairs = fn(giant(spark), cap=CAP).collect()
    cluster_pairs = [r for r in pairs if r.a_id < CLUSTER and r.b_id < CLUSTER]
    # linear, not quadratic: <= (CLUSTER - 1) anchor edges per bucket
    assert len(cluster_pairs) <= n_buckets * (CLUSTER - 1)
    assert len(cluster_pairs) >= CLUSTER - 1
    # the star edges still connect the WHOLE cluster into one component
    edges = spark.createDataFrame(
        [(r.a_id, r.b_id) for r in cluster_pairs], "a_id BIGINT, b_id BIGINT"
    )
    comp = connected_components(edges).collect()
    assert len(comp) == CLUSTER
    assert {r.component for r in comp} == {0}


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_sample_cap_emits_bounded_subset(spark, family):
    fn, giant, _, n_buckets = FAMILIES[family]
    docs = giant(spark)
    capped = {
        (r.a_id, r.b_id) for r in fn(docs, cap=CAP, mode="sample").collect()
    }
    # <= C(CAP, 2) pairs per heavy bucket (+ any light-bucket pairs)
    assert len(capped) <= n_buckets * (CAP * (CAP - 1) // 2) + 10
    assert len(capped) > 0
    uncapped = {(r.a_id, r.b_id) for r in fn(docs).collect()}
    assert capped <= uncapped


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_cap_is_inert_without_heavy_buckets(spark, family):
    fn, _, small, _ = FAMILIES[family]
    docs = small(spark)
    uncapped = {(r.a_id, r.b_id) for r in fn(docs).collect()}
    # the 5 twin pairs are the ground truth
    assert uncapped == {(2000 + 2 * k, 2001 + 2 * k) for k in range(5)}
    for mode in ("star", "sample"):
        capped = {
            (r.a_id, r.b_id) for r in fn(docs, cap=CAP, mode=mode).collect()
        }
        assert capped == uncapped, mode


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_capped_output_has_no_duplicate_pairs(spark, family):
    fn, giant, _, _ = FAMILIES[family]
    out = fn(giant(spark), cap=CAP)
    assert out.count() == out.select("a_id", "b_id").distinct().count()


@pytest.mark.parametrize("family", list(FAMILIES), ids=list(FAMILIES))
def test_bad_heavy_bucket_mode_rejected(spark, family):
    fn, _, small, _ = FAMILIES[family]
    with pytest.raises(ValueError, match="heavy_bucket_mode"):
        fn(small(spark), cap=CAP, mode="nope").collect()


def test_duplicate_spans_hot_gram_uses_groupby_not_window(spark):
    """Corpus-wide hot gram (one 8-token span in 20% of docs): the
    cross-doc count must be a map-side-combining groupBy + join back —
    a Window over the gram key would put every hot-gram posting in ONE
    window partition (single-task straggler, no AQE skew remedy)."""
    from concerts_etl_sa_spark.operators.decontam import duplicate_spans_df

    hot = "alpha bravo charlie delta echo foxtrot golf hotel"
    rows = []
    for i in range(100):
        if i % 5 == 0:
            tail = " ".join(f"d{i}w{j}" for j in range(8))
            rows.append((i, f"{hot} {tail}"))
        else:
            rows.append((i, " ".join(f"u{i}q{j}" for j in range(16))))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = duplicate_spans_df(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "gram count regressed to a window"
    res = {r.doc_id: r for r in out.collect()}
    assert len(res) == 100
    for i in range(100):
        if i % 5 == 0:
            # the pure-hot window (tokens 1-8) is shared by all 20 docs
            assert res[i].n_shared_spans >= 1
            assert 0 < res[i].shared_frac < 1
        else:
            assert res[i].n_shared_spans == 0
            assert res[i].shared_frac == 0.0


def test_duplicate_spans_degenerate_docs_score_zero(spark):
    """Empty/null/whitespace-only docs share no content and must score
    0 — not the shared_frac = 1.0 artifact of an ungated ragged window
    (every degenerate doc used to hash the same all-NULL window)."""
    from concerts_etl_sa_spark.operators.decontam import duplicate_spans_df

    body = "shared eight token span goes right here now"
    rows = [
        (0, ""),
        (1, None),
        (2, "   \t  "),
        (3, f"{body} plus doc three filler words here"),
        (4, f"{body} plus doc four filler words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    res = {
        r.doc_id: r
        for r in duplicate_spans_df(docs).collect()
    }
    assert len(res) == 5
    for i in (0, 1, 2):
        assert res[i].n_spans == 0
        assert res[i].n_shared_spans == 0
        assert res[i].shared_frac == 0.0
    for i in (3, 4):
        assert res[i].n_shared_spans >= 1


def test_exact_dedup_hot_hash_uses_groupby_not_window(spark, tmp_path):
    """A massively-duplicated document must not pin a single window
    partition: exact_dedup's group stats are a map-side-combining
    groupBy + join back (same rationale as duplicate_spans)."""
    from concerts_etl_sa_spark.operators.dedup import exact_dedup

    rows = [(i, "the exact same document body") for i in range(500)]
    rows += [(1000 + i, f"unique body number {i}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = exact_dedup(spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "group stats regressed to a window"
    res = {r.doc_id: r for r in out.collect()}
    assert len(res) == 550
    assert res[7].representative_id == 0 and res[7].group_size == 500
    assert res[7].is_duplicate and not res[0].is_duplicate
    assert res[1000].group_size == 1 and not res[1000].is_duplicate


def test_components_long_chain_converges_in_log_rounds(spark):
    # 1025 vertices in one chain: plain min-label propagation moves the
    # min ONE hop per round (~1024 rounds); pointer doubling composes the
    # label map with itself, so max_iters=14 only converges if the
    # doubling is actually doing its O(log n) job.
    n = 1024
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "a_id BIGINT, b_id BIGINT"
    )
    out = connected_components(edges, max_iters=14, driver_max_edges=0)
    assert out.filter(F.col("component") != 0).count() == 0
    assert out.count() == n + 1


def test_star_anchor_is_membership_determined(spark):
    """Round-11 flood fix: the star anchor must be a pure function of
    bucket MEMBERSHIP (ordered by xxhash64(doc_id) alone), so two bands
    whose heavy buckets hold the same docs elect the SAME anchor and
    the multi-band dropDuplicates collapses their edges. The pre-fix
    per-band seed elected a different anchor per band — ~N_BANDS x the
    deduped pair volume at flood for zero extra connectivity."""
    from concerts_etl_sa_spark.operators.util import capped_candidates

    docs = list(range(40))
    # the SAME membership under two different band fingerprints
    rows = [(d, 111) for d in docs] + [(d, 222) for d in docs]
    bands = spark.createDataFrame(rows, "doc_id LONG, band_fp LONG")
    pairs = {
        (r.a_id, r.b_id)
        for r in capped_candidates(bands, 10, "star").collect()
    }
    # identical membership -> identical star edges -> exactly |bucket|-1
    # pairs after the multi-band dedup (not 2x)
    assert len(pairs) == len(docs) - 1, len(pairs)
    anchors = {a for a, _ in pairs} & {b for _, b in pairs}
    # star shape: one endpoint is shared across all edges
    from collections import Counter

    ends = Counter([x for p in pairs for x in p])
    assert ends.most_common(1)[0][1] == len(docs) - 1
