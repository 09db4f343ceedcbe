"""Semantics tests for the round-6 corpus operators: repetition stats,
corpus vocabulary top-k, and the stratified train/val/test split.

Oracle parity for all three lives in test_oracle_parity.py
(unreg_l3_repetition_stats / unreg_l3_vocab_topk /
unreg_l5_stratified_split); these tests pin the SEMANTICS the parity
comparison can't see — hand-computed values on crafted rows, the
stratification property, and determinism/independence guarantees.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import sampling as SMP
from concerts_etl_sa_spark.operators import textstats as TS
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


# ---------------------------------------------------- repetition stats

def _rep_on_text(spark, text: str):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    # round-7 internals: grams are xxhash64 fingerprints over a staged
    # token column (same dup-fraction values; identity via hash)
    row = (
        df.select("doc_id", TS._tokens(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            F.size("toks").alias("n_tokens"),
            TS._dup_frac(TS._gram_hashes(F.col("toks"), 2)).alias(
                "dup_2gram_frac"
            ),
            TS._dup_frac(TS._gram_hashes(F.col("toks"), 3)).alias(
                "dup_3gram_frac"
            ),
        )
        .collect()[0]
    )
    return row


def test_repetition_handcomputed_values(spark):
    # tokens: a b a b a -> 2-grams [ab, ba, ab, ba]: 4 total, 2 distinct
    row = _rep_on_text(spark, "a b a b a")
    assert row.n_tokens == 5
    assert row.dup_2gram_frac == 0.5
    # 3-grams [aba, bab, aba]: 3 total, 2 distinct -> 1/3
    assert row.dup_3gram_frac == round(1 / 3, 6)


def test_repetition_short_docs_are_zero_not_negative(spark):
    # 1 token: no 2-grams at all -> 0.0 (and the sequence() guard means
    # no descending [1, 0] window artifacts)
    row = _rep_on_text(spark, "solo")
    assert row.n_tokens == 1
    assert row.dup_2gram_frac == 0.0
    assert row.dup_3gram_frac == 0.0


def test_top_token_frac_is_max_multiplicity(spark):
    out = {
        r.doc_id: r
        for r in TS.repetition_stats(spark, SF_DIR).collect()
    }
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    for d in docs[:50]:
        toks = [t for t in d.text.lower().split() if t]
        want = (
            round(Counter(toks).most_common(1)[0][1] / len(toks), 6)
            if toks
            else 0.0
        )
        assert abs(out[d.doc_id].top_token_frac - want) < 1e-9, d.doc_id


# ------------------------------------------------------- vocab top-k

def test_vocab_topk_matches_python_counts(spark):
    out = TS.vocab_topk(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    occ = Counter()
    dfq = Counter()
    for d in docs:
        toks = [t for t in d.text.lower().split() if t]
        occ.update(toks)
        dfq.update(set(toks))
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[: TS.VOCAB_K]
    got = [(r.token, r.n_occurrences) for r in out]
    assert got == want
    for r in out:
        assert r.n_docs == dfq[r.token]


def test_vocab_topk_plans_as_take_ordered(spark):
    plan = TS.vocab_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a full vocabulary sort


# --------------------------------------------------- stratified split

def test_split_matches_hash_gate_and_is_total(spark):
    out = SMP.stratified_split(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(out) == n_docs  # an assignment, not a sample
    for r in out[:200]:
        u32 = int(
            hashlib.md5(f"split:{r.doc_id}".encode()).hexdigest()[:8], 16
        )
        want = (
            "train"
            if u32 < SMP._TRAIN_T
            else ("val" if u32 < SMP._VAL_T else "test")
        )
        assert r.split == want, r.doc_id


def test_split_is_stratified_per_source(spark):
    rows = SMP.stratified_split(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, Counter())[r.split] += 1
    for src, c in by_src.items():
        n = sum(c.values())
        if n < 15:
            continue  # too small for a proportion check
        # 80/10/10 in expectation; generous tolerance at test sf
        assert 0.55 <= c["train"] / n <= 0.97, (src, dict(c))


def test_split_independent_of_mixture_gate(spark):
    # the salt means split membership is NOT the mixture-sample gate:
    # some sampled-out docs are train, some sampled-in docs are test
    split = {r.doc_id: r.split for r in SMP.stratified_split(spark, SF_DIR).collect()}
    sampled = {r.doc_id for r in SMP.mixture_sample(spark, SF_DIR).collect()}
    out_train = [d for d, s in split.items() if d not in sampled and s == "train"]
    in_test = [d for d, s in split.items() if d in sampled and s == "test"]
    assert out_train and in_test


# ------------------------------------------------- duplicate spans

def test_duplicate_spans_crafted_corpus(spark, tmp_path):
    from concerts_etl_sa_spark.operators.decontam import (
        SPAN_TOKENS,
        duplicate_spans,
    )

    boiler = " ".join(f"b{i}" for i in range(SPAN_TOKENS))  # exact window
    docs = [
        (1, boiler + " unique one alpha beta gamma delta"),
        (2, boiler + " other tail epsilon zeta eta theta"),
        (3, "entirely different words with no overlap at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in duplicate_spans(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    # docs 1 and 2 share exactly the boilerplate window; doc 3 shares none
    assert out[1].n_shared_spans == 1 and out[2].n_shared_spans == 1
    assert out[3].n_shared_spans == 0 and out[3].shared_frac == 0.0
    assert 0 < out[1].shared_frac < 1


def test_duplicate_spans_plan_shape(spark):
    from concerts_etl_sa_spark.operators.decontam import duplicate_spans

    plan = (
        duplicate_spans(spark, SF_DIR)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # round-7 shape: the cross-doc count is groupBy(gram) + equi-join
    # back (map-side combine collapses hot grams; AQE skew-join covers
    # the postings side). A WINDOW over the gram key (single-task
    # hot-gram straggler) and any doc-doc pair fan-out (cartesian /
    # nested-loop) must never appear.
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------- tf-idf

def test_tfidf_top_terms_matches_python(spark):
    import math

    out = {}
    for r in TS.tfidf_top_terms(spark, SF_DIR).collect():
        out.setdefault(r.doc_id, []).append((r.rn, r.token, r.tfidf))
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).collect()
    n = len(docs)
    dfq = Counter()
    tokd = {}
    for d in docs:
        toks = [t for t in d.text.lower().split() if t]
        tokd[d.doc_id] = toks
        dfq.update(set(toks))
    for d in docs[:30]:
        toks = tokd[d.doc_id]
        if not toks:
            assert d.doc_id not in out
            continue
        cnt = Counter(toks)
        scored = sorted(
            (
                (
                    round(
                        (c / len(toks)) * math.log((n + 1) / (dfq[t] + 1)), 6
                    ),
                    t,
                )
                for t, c in cnt.items()
            ),
            key=lambda x: (-x[0], x[1]),
        )[: TS.TFIDF_TOP_N]
        got = sorted(out[d.doc_id])
        want = [(i + 1, t, s) for i, (s, t) in enumerate(scored)]
        assert got == want, d.doc_id


# ------------------------------------------------- unigram-LM cross-entropy

def test_unigram_xent_ranks_fluent_below_gibberish(spark, tmp_path):
    """The truncated-unigram LM must score corpus-typical text cheaper
    (lower cross-entropy) than never-seen gibberish, and the exact
    values must match a hand-computed Laplace model."""
    import math
    from collections import Counter

    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zqx vwk jjy qqz plm zzv wxq kkj"))  # gibberish
    rows.append((101, None))                               # token-less
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in TS.unigram_xent(spark, str(tmp_path)).collect()}

    assert out[101].n_tokens == 0 and out[101].cross_entropy is None
    assert out[0].cross_entropy < out[100].cross_entropy

    # hand-computed Laplace model over the whole corpus
    toks = []
    for _, text in rows:
        if text:
            toks += text.lower().split()
    cnt = Counter(toks)
    n, v = len(toks), len(cnt)

    def xent(text):
        ts = text.lower().split()
        return round(
            sum(-math.log((cnt[t] + 1) / (n + v)) for t in ts) / len(ts), 6
        )

    assert out[0].cross_entropy == xent(common)
    assert out[100].cross_entropy == xent("zqx vwk jjy qqz plm zzv wxq kkj")


# ------------------------------------------------- token-budget planner

def test_mixture_plan_semantics(spark):
    """Rates follow min(1, weighted-budget-share / token mass), and the
    planned sample respects them (observed keep fraction ~ rate)."""
    plan = {r.source: r for r in SMP.mixture_plan(spark, SF_DIR).collect()}
    w_total = sum(r.weight for r in plan.values())
    for src, r in plan.items():
        share = SMP.PLAN_TOKEN_BUDGET * r.weight / w_total
        assert r.rate == round(min(1.0, share / r.n_tokens), 9), src
        assert r.weight == (2 if src in ("src0", "src1") else 1)

    sampled = SMP.mixture_sample_planned(spark, SF_DIR).collect()
    by_src = Counter(r.source for r in sampled)
    docs_by_src = Counter(
        r.source
        for r in load_table(spark, SF_DIR, "documents").select("source").collect()
    )
    for src, n_docs in docs_by_src.items():
        frac = by_src.get(src, 0) / n_docs
        assert frac <= min(1.0, plan[src].rate * 2.5 + 0.2), src
    # weights are the inverse rate
    for r in sampled[:20]:
        assert r.sample_weight == round(1.0 / plan[r.source].rate, 6)


def test_per_source_sample_exact_n_and_stable(spark):
    """Exactly n docs per source, ranks 1..n, identical across runs and
    across n: the top-10 sample is a PREFIX of the top-20 (lowering n
    never reshuffles membership — the property eval sets need)."""
    from concerts_etl_sa_spark.operators.sampling import per_source_sample

    s20 = per_source_sample(spark, SF_DIR, n=20).collect()
    by_src: dict = {}
    for r in s20:
        by_src.setdefault(r.source, []).append(r.sample_rank)
    assert all(sorted(v) == list(range(1, 21)) for v in by_src.values())
    s10 = {(r.source, r.sample_rank, r.doc_id)
           for r in per_source_sample(spark, SF_DIR, n=10).collect()}
    prefix = {(r.source, r.sample_rank, r.doc_id) for r in s20
              if r.sample_rank <= 10}
    assert s10 == prefix


def test_quality_deciles_cover_and_are_monotone(spark):
    """Every decile 1..10 is populated at this sf, sizes are near-
    uniform (ties at mass points allowed), and the binning is monotone:
    a higher-quality doc never lands in a lower decile."""
    from concerts_etl_sa_spark.operators.textstats import quality_deciles

    rows = quality_deciles(spark, SF_DIR).collect()
    sizes: dict = {}
    for r in rows:
        sizes[r.decile] = sizes.get(r.decile, 0) + 1
    assert set(sizes) == set(range(1, 11))
    n = len(rows)
    assert all(abs(c - n / 10) <= n * 0.05 for c in sizes.values())
    by_quality = sorted(rows, key=lambda r: r.quality)
    deciles_in_quality_order = [r.decile for r in by_quality]
    assert deciles_in_quality_order == sorted(deciles_in_quality_order)
