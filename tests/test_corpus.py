"""Corpus-curation plan: stage invariants, determinism, annotation parity.

The composed pipeline (quality/lang rules -> exact dedup -> MinHash-LSH
near-dup collapse -> bucketed token budget) over driver testdata.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.dedup import minhash_lsh_pairs_df
from concerts_etl_sa_spark.operators.textstats import lang_id, quality_score
from concerts_etl_sa_spark.plans.corpus import curate_corpus
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def test_curation_stage_invariants(spark):
    rep = curate_corpus(spark, SF_DIR, min_quality=0.3)
    assert (
        rep.n_input
        >= rep.n_after_rules
        >= rep.n_after_exact
        >= rep.n_after_near
        >= rep.n_final
        > 0
    )
    rows = rep.curated.collect()
    assert len(rows) == rep.n_final
    # quality floor holds on every retained doc
    assert all(r.quality >= 0.3 for r in rows)
    # no exact duplicates among retained texts
    texts = [r.text for r in rows]
    assert len(set(texts)) == len(texts)


def test_curation_no_near_dup_pair_retained(spark):
    rep = curate_corpus(spark, SF_DIR, min_quality=0.0)
    kept = {r.doc_id for r in rep.curated.select("doc_id").collect()}
    pairs = minhash_lsh_pairs_df(
        rep.curated.select("doc_id", "text")
    ).collect()
    both = [(p.a_id, p.b_id) for p in pairs if p.a_id in kept and p.b_id in kept]
    assert both == []


def test_curation_token_budget_bucketed(spark):
    unbudgeted = curate_corpus(spark, SF_DIR, min_quality=0.0)
    budget = max(1, unbudgeted.tokens_final // 2)
    rep = curate_corpus(spark, SF_DIR, min_quality=0.0, token_budget=budget)
    # the bucketed cap is exact within one doc per bucket; total tokens
    # must never exceed the budget itself
    assert 0 < rep.tokens_final <= budget
    assert rep.n_final < unbudgeted.n_final


def test_curation_language_filter(spark):
    rep = curate_corpus(spark, SF_DIR, min_quality=0.0, keep_langs=("en",))
    langs = {r.lang_detected for r in rep.curated.collect()}
    assert langs <= {"en"}


def test_curation_deterministic(spark):
    a = curate_corpus(spark, SF_DIR, min_quality=0.4)
    b = curate_corpus(spark, SF_DIR, min_quality=0.4)
    ids_a = sorted(r.doc_id for r in a.curated.collect())
    ids_b = sorted(r.doc_id for r in b.curated.collect())
    assert ids_a == ids_b and a.tokens_final == b.tokens_final


def test_curation_annotations_match_l3_queries(spark):
    """The plan's quality/lang annotations must equal the oracle-checked
    l3 query outputs — guards formula drift between the suite and the
    composed pipeline."""
    rep = curate_corpus(spark, SF_DIR, min_quality=0.0)
    q = quality_score(spark, SF_DIR).select("doc_id", "quality")
    l = lang_id(spark, SF_DIR).select("doc_id", "lang_detected")
    joined = (
        rep.curated.select(
            "doc_id",
            F.col("quality").alias("p_quality"),
            F.col("lang_detected").alias("p_lang"),
        )
        .join(q, "doc_id")
        .join(l, "doc_id")
    )
    bad = joined.filter(
        (F.col("p_quality") != F.col("quality"))
        | (F.col("p_lang") != F.col("lang_detected"))
    ).count()
    assert bad == 0


def test_curation_df_extra_columns_ride_along(spark):
    from concerts_etl_sa_spark.plans.corpus import curate_corpus_df

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    rep = curate_corpus_df(docs, min_quality=0.0)
    assert rep.n_input == 50
    assert {"doc_id", "text", "quality", "lang_detected", "n_tokens"} <= set(
        rep.curated.columns
    )


def test_curation_decontam_and_transitive_stages(spark):
    from concerts_etl_sa_spark.plans.corpus import curate_corpus
    from concerts_etl_sa_spark.operators.decontam import decontaminate_df
    from concerts_etl_sa_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 10 == 7).select("doc_id", "text")

    base = curate_corpus(spark, SF_DIR)
    rep = curate_corpus(
        spark, SF_DIR, eval_docs=eval_docs, transitive_dedup=True
    )
    # eval docs themselves pass rules/dedup like any other doc; the
    # decontam stage only ever REMOVES docs relative to the base run
    assert rep.n_after_decontam <= rep.n_after_exact
    assert rep.n_after_near <= rep.n_after_decontam
    assert rep.n_final <= base.n_final
    # base run reports the pass-through decontam count
    assert base.n_after_decontam == base.n_after_exact

    # no contaminated doc survives into the curated output
    kept = {r.doc_id for r in rep.curated.select("doc_id").collect()}
    contam = {
        r.doc_id
        for r in decontaminate_df(
            docs.select("doc_id", "text"), eval_docs
        ).filter("is_contaminated").collect()
    }
    assert not (kept & contam)


def test_curation_skew_cap_collapses_flood(spark):
    """Giant near-dup cluster through the WHOLE curation plan with the
    per-bucket cap: 40 case-variant copies (distinct content hashes, so
    exact dedup keeps them all; identical token/shingle sets, so every
    LSH bucket holds all 40) must collapse to ONE representative via
    star edges + the components closure, while unique docs survive."""
    from concerts_etl_sa_spark.plans.corpus import curate_corpus_df

    words = [f"w{k}" for k in range(45)]
    flood = [
        (i, " ".join(w.upper() if j == i else w for j, w in enumerate(words)))
        for i in range(40)
    ]
    uniq = [
        (1000 + i, " ".join(f"u{i}x{j}" for j in range(12)))
        for i in range(30)
    ]
    docs = spark.createDataFrame(flood + uniq, "doc_id BIGINT, text STRING")
    rep = curate_corpus_df(
        docs,
        min_quality=0.0,
        transitive_dedup=True,
        max_bucket_size=8,
    )
    kept = {r.doc_id for r in rep.curated.select("doc_id").collect()}
    assert len(kept & set(range(40))) == 1, "flood must collapse to one rep"
    assert kept & set(range(40)) == {0}
    assert set(1000 + i for i in range(30)) <= kept


def test_decontaminate_eval_size_guard(spark):
    """The eval n-gram set is broadcast; misuse (decontaminating against
    a corpus-sized 'eval' side) must fail loudly BEFORE the broadcast,
    not OOM an executor."""
    import pytest

    from concerts_etl_sa_spark.operators.decontam import decontaminate_df

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} body text here") for i in range(20)],
        "doc_id BIGINT, text STRING",
    )
    ev = spark.createDataFrame(
        [(100 + i, f"eval doc {i} body text here") for i in range(10)],
        "doc_id BIGINT, text STRING",
    )
    with pytest.raises(ValueError, match="max_eval_docs"):
        decontaminate_df(corpus, ev, max_eval_docs=5)
    # under the cap and with the probe disabled: normal result
    assert decontaminate_df(corpus, ev, max_eval_docs=50).count() == 20
    assert decontaminate_df(corpus, ev, max_eval_docs=None).count() == 20


def test_corpus_datacard_consistency(spark):
    from concerts_etl_sa_spark.plans.corpus import corpus_datacard
    from concerts_etl_sa_spark.operators.decontam import decontaminate
    from concerts_etl_sa_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    card = corpus_datacard(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")

    # strata cover the whole corpus exactly once
    assert sum(r.n_docs for r in card) == docs.count()
    # totals agree with direct whole-table computation
    direct = docs.select(
        F.sum(
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"\s+"), lambda t: t != ""
                )
            )
        ).alias("toks")
    ).collect()[0]["toks"]
    assert sum(r.total_tokens for r in card) == direct
    # contamination totals agree with the operator
    n_contam = decontaminate(spark, SF_DIR).filter("is_contaminated").count()
    assert sum(r.n_contaminated for r in card) == n_contam
    for r in card:
        assert 0.0 <= r.avg_quality <= 1.0
        assert 0 <= r.n_exact_dups < r.n_docs or r.n_docs == 0


def test_curation_semantic_dedup_stage(spark):
    """Arming the SemDeDup stage (fixed centroids for determinism) drops
    semantic duplicates AFTER the lexical stages: n_after_sem <=
    n_after_near, the sem-armed curated set is a subset of the unarmed
    one, and survivors with no embedding row are kept."""
    from concerts_etl_sa_spark.operators.semdedup import _fixed_centroids

    emb = load_table(spark, SF_DIR, "embeddings")
    base = curate_corpus(spark, SF_DIR, min_quality=0.0)
    rep = curate_corpus(
        spark, SF_DIR, min_quality=0.0,
        embeddings=emb, sem_centroids=_fixed_centroids(spark, SF_DIR),
    )
    assert rep.n_after_near == base.n_after_near
    assert rep.n_after_sem <= rep.n_after_near
    assert rep.n_after_sem < rep.n_after_near  # tau=0.30 bites at this sf
    assert rep.n_final == rep.n_after_sem  # no budget stage armed
    base_ids = {r.doc_id for r in base.curated.collect()}
    sem_ids = {r.doc_id for r in rep.curated.collect()}
    assert sem_ids < base_ids

    # survivors lacking an embedding row are kept, not silently dropped
    half_emb = emb.filter("vec_id % 2 = 0")
    rep_half = curate_corpus(
        spark, SF_DIR, min_quality=0.0,
        embeddings=half_emb, sem_centroids=_fixed_centroids(spark, SF_DIR),
    )
    odd_survivors = {i for i in base_ids if i % 2 == 1}
    kept_half = {r.doc_id for r in rep_half.curated.collect()}
    assert odd_survivors <= kept_half

    # unarmed report mirrors n_after_near into n_after_sem
    assert base.n_after_sem == base.n_after_near


def test_curation_semantic_dedup_trained_default(spark):
    """With no sem_centroids the stage trains kmeans on the survivor
    embeddings — the production path; the run is deterministic."""
    emb = load_table(spark, SF_DIR, "embeddings")
    a = curate_corpus(
        spark, SF_DIR, min_quality=0.0, embeddings=emb, sem_k=4
    )
    b = curate_corpus(
        spark, SF_DIR, min_quality=0.0, embeddings=emb, sem_k=4
    )
    assert a.n_after_sem == b.n_after_sem > 0
    assert {r.doc_id for r in a.curated.collect()} == {
        r.doc_id for r in b.curated.collect()
    }


def test_curation_sem_stage_no_judgeable_survivors_is_noop(spark):
    """Armed SemDeDup stage with an embeddings frame that overlaps NO
    lexical survivor (id-space mismatch) must degrade to a no-op —
    everything kept — not crash the trained-centroid path on an empty
    kmeans fit."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    base = curate_corpus(spark, SF_DIR, min_quality=0.0)
    rep = curate_corpus(spark, SF_DIR, min_quality=0.0, embeddings=emb)
    assert rep.n_after_sem == rep.n_after_near == base.n_after_near
    assert rep.n_final == base.n_final
