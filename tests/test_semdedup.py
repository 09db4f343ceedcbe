"""SemDeDup (embedding-cluster semantic dedup): keep-rule invariants,
paper-exact groups variant, skew cap, trained centroids, edge cases.

The DuckDB value parity of the fixed-centroid `semdedup` runs in
tests/test_oracle_parity.py like every other oracle-backed op.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.semdedup import (
    SEMDEDUP_TAU,
    _fixed_centroids,
    semdedup,
    semdedup_df,
    semdedup_groups_df,
    semdedup_trained,
)
from concerts_etl_sa_spark.operators.similarity import _emb_normed, _norm2

from .conftest import SF_DIR

EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<FLOAT>"


def _centroid_frame(spark, rows):
    return spark.createDataFrame(
        rows, "centroid_id BIGINT, centroid_vec ARRAY<FLOAT>"
    ).withColumn("c_n2", _norm2("centroid_vec"))


def test_groups_rule_is_subset_of_local_rule(spark):
    """The paper-exact per-group keeper (connected components + argmin)
    must be kept by the one-shot local rule too: a group's global
    (cent_cos, id)-min has no more-peripheral neighbor. The local rule
    may keep MORE (interior local minima of chains), never fewer."""
    emb = _emb_normed(spark, SF_DIR)
    cents = _fixed_centroids(spark, SF_DIR)
    local = {r.vec_id: r for r in semdedup_df(emb, cents).collect()}
    groups = {r.vec_id: r for r in semdedup_groups_df(emb, cents).collect()}
    assert set(local) == set(groups)  # both cover every vector
    kept_local = {v for v, r in local.items() if r.is_kept}
    kept_groups = {v for v, r in groups.items() if r.is_kept}
    assert kept_groups <= kept_local
    # both rules agree on neighbor counts and assignment
    for v in local:
        assert local[v].n_dup_neighbors == groups[v].n_dup_neighbors
        assert local[v].centroid_id == groups[v].centroid_id
    # non-trivial at this sf: some duplicates exist and some are dropped
    assert any(r.n_dup_neighbors > 0 for r in local.values())
    assert kept_groups < set(groups)


def test_groups_rule_keeps_exactly_one_per_group(spark):
    """Every vector with tau-neighbors belongs to a duplicate group;
    under the groups rule each group keeps exactly one member — its
    most-peripheral (lowest cent_cos, id tiebreak)."""
    emb = _emb_normed(spark, SF_DIR)
    cents = _fixed_centroids(spark, SF_DIR)
    rows = semdedup_groups_df(emb, cents).collect()
    # reconstruct groups from the output: kept member + its dropped
    # neighbors share a component; we only check the global invariant
    # that #kept == #isolated + #groups, by recomputing components from
    # the pair frame
    from concerts_etl_sa_spark.operators.components import (
        connected_components,
    )
    # recompute pairs exactly as the operator does — through the SAME
    # _assigned_frame definition (a hand-rebuilt frame drifted once when
    # normalize-once landed; reuse is the fix)
    from concerts_etl_sa_spark.operators._cachescope import begin_scope
    from concerts_etl_sa_spark.operators.semdedup import (
        _assigned_frame,
        _dup_pairs,
    )

    begin_scope("test_semdedup_recompute")
    a = _assigned_frame(emb, cents, "test_semdedup_recompute")
    dup = _dup_pairs(a, SEMDEDUP_TAU, None, "star")
    comp = {
        r.vertex: r.component
        for r in connected_components(
            dup.select("a_id", "b_id"), src="a_id", dst="b_id"
        ).collect()
    }
    n_groups = len(set(comp.values()))
    n_isolated = sum(1 for r in rows if r.vec_id not in comp)
    assert sum(1 for r in rows if r.is_kept) == n_isolated + n_groups
    # the keeper of each group is its (cent_cos, vec_id) minimum
    by_comp: dict = {}
    meta = {r.vec_id: r for r in rows}
    for v, c in comp.items():
        by_comp.setdefault(c, []).append(v)
    for members in by_comp.values():
        keepers = [v for v in members if meta[v].is_kept]
        want = min(members, key=lambda v: (meta[v].cent_cos, v))
        assert keepers == [want]


def test_semdedup_flood_capped_cluster(spark):
    """An identical-embedding flood lands in ONE cluster; with
    max_cluster_size the pair stage is bounded (star anchor edges, not
    |cluster|^2/2) and the groups rule still collapses the whole flood
    to a single keeper — connectivity survives the cap."""
    rng = random.Random(7)
    v = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
    w = [round(rng.uniform(-1, 1), 3) for _ in range(64)]
    flood = [(i, v) for i in range(1, 41)]           # 40 identical vectors
    lone = [(100, w)]                                # unrelated singleton
    emb = spark.createDataFrame(flood + lone, EMB_SCHEMA)
    cents = _centroid_frame(spark, [(0, v), (1, w)])
    from concerts_etl_sa_spark.operators._cachescope import begin_scope
    from concerts_etl_sa_spark.operators.semdedup import (
        _assigned_frame,
        _dup_pairs,
    )

    begin_scope("test_semdedup_flood")
    assigned = _assigned_frame(
        emb.withColumn("norm2", _norm2("embedding")),
        cents,
        "test_semdedup_flood",
    )
    n_pairs = _dup_pairs(assigned, 0.9, 5, "star").count()
    assert n_pairs <= 39 + 5 * 4  # star edges + capped-core pairs, not 780

    out = semdedup_groups_df(
        emb, cents, tau=0.9, max_cluster_size=5
    ).collect()
    kept = {r.vec_id for r in out if r.is_kept}
    assert 100 in kept
    assert len(kept & set(range(1, 41))) == 1  # one keeper for the flood
    # identical vectors tie on cent_cos; id breaks the tie -> keeper is 1
    assert 1 in kept

    # the local rule under the same cap also keeps doc 1 and the lone doc
    out_local = semdedup_df(
        emb, cents, tau=0.9, max_cluster_size=5
    ).collect()
    kept_local = {r.vec_id for r in out_local if r.is_kept}
    assert 1 in kept_local and 100 in kept_local


def test_semdedup_trained_covers_all_and_is_deterministic(spark):
    out1 = semdedup_trained(spark, SF_DIR, k_centroids=4, max_iters=2)
    rows1 = {r.vec_id: tuple(r) for r in out1.collect()}
    n_emb = _emb_normed(spark, SF_DIR).count()
    assert len(rows1) == n_emb
    out2 = semdedup_trained(spark, SF_DIR, k_centroids=4, max_iters=2)
    rows2 = {r.vec_id: tuple(r) for r in out2.collect()}
    assert rows1 == rows2


def test_semdedup_empty_corpus_degrades(spark):
    emb = spark.createDataFrame([], EMB_SCHEMA)
    cents = _centroid_frame(
        spark, [(0, [1.0] * 64)]
    )
    assert semdedup_df(emb, cents).count() == 0
    assert semdedup_groups_df(emb, cents).count() == 0


def test_semdedup_registry_shape(spark):
    """The sf wrapper emits one decision row per embedding with the
    documented schema."""
    out = semdedup(spark, SF_DIR)
    assert out.columns == [
        "vec_id", "centroid_id", "cent_cos", "n_dup_neighbors", "is_kept"
    ]
    n = out.count()
    assert n == _emb_normed(spark, SF_DIR).count()


def test_auto_stride_formula():
    """K tracks N (constant mean cluster size) with the floor of 8 —
    the integer arithmetic the DuckDB twin reproduces from count(*)."""
    from concerts_etl_sa_spark.operators.semdedup import _auto_stride

    assert _auto_stride(0) == 1  # degenerate: empty corpus
    assert _auto_stride(500) == 62  # k = max(500//60, 8) = 8
    assert _auto_stride(2000) == 60  # k = 33
    assert _auto_stride(50_000) == 60  # k = 833 — stride saturates at
    assert _auto_stride(10_000_000) == 60  # per_cluster: K grows, not |c|


def test_semdedup_auto_scales_k_with_n(spark):
    """The auto pick yields ~K centroids spread over the id space, and
    the decision frame covers every vector (same contract as the fixed
    form)."""
    from concerts_etl_sa_spark.operators.semdedup import (
        SEMDEDUP_CENTROID_RESIDUE,
        _auto_stride,
        semdedup_auto,
    )

    n = _emb_normed(spark, SF_DIR).count()
    stride = _auto_stride(n)
    out = semdedup_auto(spark, SF_DIR)
    assert out.columns == [
        "vec_id", "centroid_id", "cent_cos", "n_dup_neighbors", "is_kept"
    ]
    rows = out.collect()
    assert len(rows) == n
    # every assigned centroid is one the modular rule selected
    assert all(
        r.centroid_id % stride == SEMDEDUP_CENTROID_RESIDUE % stride
        for r in rows
    )
    # ~K distinct ids available; at least half actually win a vector
    k = max(n // 60, 8)
    assert len({r.centroid_id for r in rows}) >= k // 2


def test_semdedup_trained_auto_sizes_k_from_n(spark):
    """Production composition: k = max(N//60, 8) trained centroids
    (ids 0..k-1 from centroids_df); decision frame covers every
    vector."""
    from concerts_etl_sa_spark.operators.semdedup import (
        semdedup_trained_auto,
    )

    n = _emb_normed(spark, SF_DIR).count()
    out = semdedup_trained_auto(spark, SF_DIR, max_iters=1)
    rows = out.collect()
    assert len(rows) == n
    k = max(n // 60, 8)
    assert {r.centroid_id for r in rows} <= set(range(k))


def test_semdedup_auto_fails_loud_on_sparse_id_space(spark, tmp_path):
    """Dense-id guard (round-10 #5): the modular centroid pick assumes
    vec_ids roughly cover [0, n). Ids striped at 10M (every id sharing
    a residue class the rule can't hit) must raise, not silently run
    with a fraction of the intended K and a quadratic pair stage."""
    import pytest

    from concerts_etl_sa_spark.operators.semdedup import semdedup_auto
    from concerts_etl_sa_spark.schemas import TESTDATA_SCHEMAS

    rows = [
        (i * 10_000_000, [float((i * 7 + d) % 13) for d in range(64)], 0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, TESTDATA_SCHEMAS["embeddings"])
    sf = str(tmp_path / "sparse_sf")
    df.coalesce(1).write.parquet(sf + "/embeddings_dir")
    import os
    import shutil

    part = next(
        f
        for f in os.listdir(sf + "/embeddings_dir")
        if f.endswith(".parquet")
    )
    shutil.move(
        os.path.join(sf, "embeddings_dir", part),
        os.path.join(sf, "embeddings.parquet"),
    )
    with pytest.raises(ValueError, match="modular centroid pick"):
        semdedup_auto(spark, sf)
