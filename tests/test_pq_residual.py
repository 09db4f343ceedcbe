"""Energy-gated residual IVF-PQ (operators/pq.py — full FAISS IVFADC,
Jégou 2011 §IV, with the measured break-even gate): the gate's regime
decisions on isotropic vs clustered inputs, gated-fallback equality
with the plain trained build, the residual form's recall win in its
own regime (clustered data), and determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import pq
from concerts_etl_sa_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _norm2,
)
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _clustered_emb(spark, n=600, n_clusters=6, dim=64, sigma=0.10):
    """Planted-Gaussian clustered embeddings (the test_labelqa fixture
    device, unlabeled): unit centers, points = center + sigma*noise —
    the regime residual encoding exists for. sigma=0.10 puts the mean
    residual energy ~0.4 (vectors are ~0.78 cosine from their center),
    comfortably under the 1.0 gate. Deterministic (seeded)."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cl = np.arange(n) % n_clusters
    x = centers[cl] + sigma * rng.normal(size=(n, dim))
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).withColumn("norm2", _norm2("embedding"))
    return df, x


def _np_truth(x) -> set[tuple[int, int]]:
    """Exact top-TOP_K cosine pairs (queries = ids < N_QUERIES,
    candidates = the rest), numpy-computed."""
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn[:N_QUERIES] @ xn[N_QUERIES:].T
    truth = set()
    for qi in range(N_QUERIES):
        top = np.argsort(-sims[qi], kind="stable")[:TOP_K]
        truth.update((qi, int(ci) + N_QUERIES) for ci in top)
    return truth


def _pairs(df) -> set[tuple[int, int]]:
    return {(r["q_id"], r["c_id"]) for r in df.select("q_id", "c_id").collect()}


def test_gate_measures_both_regimes(spark):
    """The gate statistic itself: isotropic fixture residuals carry
    MORE energy than the unit vectors (measured ~1.48 — the break-even
    argument's empirical anchor), clustered fixture residuals far less
    (~0.4)."""
    from concerts_etl_sa_spark.operators.kmeans import (
        TRAIN_POINTS_PER_CENTROID,
        centroids_df,
        kmeans_fit,
    )
    from concerts_etl_sa_spark.operators.similarity import _assign_buckets

    def energy(emb_raw):
        fitted, _ = kmeans_fit(
            emb_raw, k=8, max_iters=3,
            train_sample_rows=TRAIN_POINTS_PER_CENTROID * 8,
        )
        coarse = centroids_df(spark, fitted).withColumn(
            "c_n2", _norm2("centroid_vec")
        )
        emb = (
            emb_raw
            if "norm2" in emb_raw.columns
            else emb_raw.withColumn("norm2", _norm2("embedding"))
        )
        cand = _assign_buckets(
            emb.filter(F.col("vec_id") >= N_QUERIES), coarse, n_keep=1
        )
        res = pq._residual_frame(cand, pq._unit_coarse(coarse))
        n_cand = emb_raw.count() - N_QUERIES
        return pq._residual_energy(res, 256 * pq.PQ_K, n=n_cand)

    iso = energy(load_table(spark, SF_DIR, "embeddings"))
    clustered, _ = _clustered_emb(spark)
    clu = energy(clustered)
    assert iso >= pq.RESIDUAL_ENERGY_GATE, iso
    assert clu < pq.RESIDUAL_ENERGY_GATE, clu
    assert clu < 0.7 < 1.2 < iso, (clu, iso)


def test_gated_fallback_equals_plain_trained(spark):
    """On the isotropic fixture the gate must select the plain build,
    and the result must be EXACTLY topk_cosine_ivfpq_trained (same
    trainer calls, same args — the fallback is not a lookalike, it is
    the same composition)."""
    a = sorted(
        map(tuple, pq.topk_cosine_ivfpq_residual(spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, pq.topk_cosine_ivfpq_trained(spark, SF_DIR).collect())
    )
    assert a == b


def test_residual_wins_its_regime_and_is_deterministic(spark):
    """On clustered embeddings the gate selects residual codes and the
    residual index must beat the plain trained index at equal budget
    (same k_coarse/k_codes/nprobe) — the reason IVFADC quantizes
    residuals. Both recalls vs the numpy-exact truth; the margin is
    pinned at the measured gap's floor. Determinism: two builds give
    identical rows."""
    emb, x = _clustered_emb(spark)
    truth = _np_truth(x)

    res = pq.topk_cosine_ivfpq_residual_df(emb)
    got_res = _pairs(res)
    got_res2 = _pairs(pq.topk_cosine_ivfpq_residual_df(emb))
    assert got_res == got_res2
    plain = pq.topk_cosine_ivfpq_residual_df(emb, force_residual=False)
    got_plain = _pairs(plain)

    r_res = len(got_res & truth) / len(truth)
    r_plain = len(got_plain & truth) / len(truth)
    # measured: residual 0.270 vs plain 0.170 at sigma=0.10 (and
    # 0.170 vs 0.090 at sigma=0.05 — the margin GROWS as clusters
    # tighten, the IVFADC prediction). Absolute recall is modest by
    # construction: top-5 among ~100 same-cluster near-ties through
    # 8x16 codes — the same near-tie regime as the sign-LSH/PQ floors
    # in test_pq.py. Floors at measured-minus-noise.
    assert r_res >= r_plain + 0.05, (r_res, r_plain)
    assert r_res >= 0.20, r_res


def test_residual_index_build_is_shuffle_free(spark):
    """The residual index (assign -> residual -> encode) must stay a
    pure projection chain like the plain encode path: coarse
    assignment is a broadcast-HOF ranking, the residual subtract is a
    broadcast K-row join, encode is a broadcast codebook lookup — no
    hash/range exchange on the data side at any step (the property
    that makes the build corpus-scan-shaped at 100 TB)."""
    from concerts_etl_sa_spark.operators.kmeans import (
        centroids_df,
        kmeans_fit,
    )
    from concerts_etl_sa_spark.operators.similarity import _assign_buckets

    emb, _ = _clustered_emb(spark, n=200)
    fitted, _hist = kmeans_fit(emb, k=4, max_iters=2)
    coarse = centroids_df(spark, fitted).withColumn(
        "c_n2", _norm2("centroid_vec")
    )
    cand_res = pq._residual_frame(
        _assign_buckets(
            emb.filter(F.col("vec_id") >= N_QUERIES), coarse, n_keep=1
        ),
        pq._unit_coarse(coarse),
    )
    books = pq.pq_train_fused(cand_res, k=4, max_iters=1)
    enc = pq.pq_encode(
        cand_res,
        pq.pq_codebook_from_trained(spark, books),
        keep=("centroid_id",),
    )
    enc.count()
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_forced_residual_on_isotropic_degrades_but_works(spark):
    """force_residual=True on the isotropic fixture: the regime the
    gate exists to avoid. Must still return a full valid top-k frame
    (N_QUERIES*TOP_K rows), just with the measured-worse ranking — the
    override is a probe, not a footgun that crashes."""
    emb = load_table(spark, SF_DIR, "embeddings")
    out = pq.topk_cosine_ivfpq_residual_df(emb, force_residual=True)
    rows = out.collect()
    assert len(rows) == N_QUERIES * TOP_K
    assert len(_pairs(out)) == N_QUERIES * TOP_K
