"""kNN label-noise detection (round 11 — the first operator computing
on ``embeddings.label``).

The exact form's DuckDB parity lives in test_oracle_parity.py
(``unreg_l2_knn_label_noise``); here the structural contract and the
IVF-pruned production form are pinned. Note the synthetic labels are
nearly independent of the embedding geometry, so absolute agreement
numbers are LOW by construction — what these tests pin is determinism,
coverage, vote semantics, and a floor on exact-vs-IVF agreement (on
real clustered data both rise sharply; the floor guards regressions,
not quality)."""

from __future__ import annotations

from concerts_etl_sa_spark.operators.labelqa import (
    KNN_K,
    knn_label_noise,
    knn_label_noise_ivf,
)

from .conftest import SF_DIR


def test_exact_form_structure_and_votes(spark):
    rows = knn_label_noise(spark, SF_DIR).collect()
    assert len(rows) == 500  # one verdict per labeled vector
    for r in rows:
        assert 0.0 <= r["knn_agree_frac"] <= 1.0
        # majority label always comes from the neighbor vote
        assert r["knn_majority_label"] is not None
        # is_suspect is exactly the majority-vs-own disagreement
        assert r["is_suspect"] == (r["knn_majority_label"] != r["label"])
        # agree_frac and the majority are consistent: a majority equal
        # to the own label implies the own label got the plurality of
        # the k votes (>= 1/k of them)
        if not r["is_suspect"]:
            assert r["knn_agree_frac"] >= 1.0 / KNN_K


def test_exact_form_deterministic(spark):
    a = sorted(tuple(r) for r in knn_label_noise(spark, SF_DIR).collect())
    b = sorted(tuple(r) for r in knn_label_noise(spark, SF_DIR).collect())
    assert a == b


def test_ivf_form_covers_all_and_agrees_with_exact(spark):
    exact = {
        r["vec_id"]: (r["knn_majority_label"], r["is_suspect"])
        for r in knn_label_noise(spark, SF_DIR).collect()
    }
    ivf_rows = knn_label_noise_ivf(spark, SF_DIR).collect()
    ivf = {
        r["vec_id"]: (r["knn_majority_label"], r["is_suspect"])
        for r in ivf_rows
    }
    # every vector gets a verdict (each probes >= 1 non-empty list —
    # its own), and each appears exactly once
    assert len(ivf_rows) == len(exact) == len(ivf)
    # pruned-kNN agreement floor (measured 0.59 at the default
    # nprobe=4 / per_list=60 on the isotropic synthetic labels — the
    # worst case for pruning; real clustered data sits far higher.
    # The floor guards against a broken candidate join, not against
    # the approximation)
    agree = sum(ivf[k] == v for k, v in exact.items()) / len(exact)
    assert agree >= 0.50, agree


def test_ivf_form_deterministic(spark):
    a = sorted(
        tuple(r) for r in knn_label_noise_ivf(spark, SF_DIR).collect()
    )
    b = sorted(
        tuple(r) for r in knn_label_noise_ivf(spark, SF_DIR).collect()
    )
    assert a == b
