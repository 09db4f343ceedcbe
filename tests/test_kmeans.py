"""k-means centroid training (L2 scale path): Lloyd invariants,
determinism, cluster recovery, IVF integration."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators.kmeans import (
    centroids_df,
    kmeans_assign,
    kmeans_fit,
)
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _clustered(spark):
    """90 points in 3 well-separated 4-d blobs (deterministic offsets)."""
    centers = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 10.0]]
    rows = []
    i = 0
    for cid, c in enumerate(centers):
        for j in range(30):
            off = [((j * 7 + d * 3) % 5 - 2) * 0.1 for d in range(4)]
            rows.append((i, cid, [c[d] + off[d] for d in range(4)]))
            i += 1
    return centers, spark.createDataFrame(
        rows, "vec_id BIGINT, true_cluster INT, embedding ARRAY<DOUBLE>"
    )


def test_kmeans_recovers_separated_clusters(spark):
    centers, df = _clustered(spark)
    fitted, inertia = kmeans_fit(df, k=3, max_iters=6)
    # every fitted centroid is within 1.0 of a distinct true center
    used = set()
    for c in fitted:
        dists = [
            (math.dist(c, t), i) for i, t in enumerate(centers) if i not in used
        ]
        d, i = min(dists)
        assert d < 1.0, (c, centers)
        used.add(i)
    # assignments are pure: each true cluster maps to one fitted cluster
    assigned = kmeans_assign(df, fitted)
    purity = (
        assigned.groupBy("true_cluster")
        .agg(F.countDistinct("cluster").alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert purity == 1


def test_kmeans_inertia_non_increasing(spark):
    _, df = _clustered(spark)
    _, inertia = kmeans_fit(df, k=3, max_iters=6)
    assert all(b <= a + 1e-6 for a, b in zip(inertia, inertia[1:]))


def test_kmeans_deterministic(spark):
    _, df = _clustered(spark)
    a, ia = kmeans_fit(df, k=3, max_iters=4)
    b, ib = kmeans_fit(df, k=3, max_iters=4)
    assert a == b and ia == ib


def test_kmeans_trains_ivf_centroids_on_embeddings(spark):
    from concerts_etl_sa_spark.operators.similarity import _assign_buckets, _norm2

    emb = load_table(spark, SF_DIR, "embeddings")
    fitted, inertia = kmeans_fit(emb, k=4, max_iters=3)
    assert len(fitted) == 4 and len(inertia) >= 1
    dim = len(fitted[0])
    assert all(len(c) == dim for c in fitted)
    # trained centroids drop into the IVF assignment path
    cdf = centroids_df(spark, fitted).withColumn("c_n2", _norm2("centroid_vec"))
    with_norm = emb.withColumn("norm2", _norm2("embedding"))
    buckets = _assign_buckets(with_norm, cdf, n_keep=1)
    n = emb.count()
    assert buckets.count() == n  # every vector lands in exactly one bucket
    assert buckets.select("centroid_id").distinct().count() >= 2


def test_kmeans_early_stops_on_converged_fixture(spark):
    """Relative-inertia early stop: on a fixture where one Lloyd
    iteration already reaches the fixed point (each blob's hash-seeded
    init lands inside it), the trainer must NOT run all max_iters —
    exact float-mean equality almost never fires, the rel_tol test is
    what bounds the loop (round-9 verdict item #4)."""
    _, df = _clustered(spark)
    _, inertia = kmeans_fit(df, k=3, max_iters=8)
    assert len(inertia) < 8, inertia
    # the rel_tol arm is deterministic to exercise directly: with
    # rel_tol=1.0 ANY non-negative inertia satisfies the relative test,
    # so the loop must stop right after the second measurement even
    # though the centroids moved between iterations 1 and 2
    _, hist = kmeans_fit(df, k=3, max_iters=8, rel_tol=1.0)
    assert len(hist) == 2, hist


def test_kmeans_assign_plan_size_flat_in_k(spark):
    """The assignment expression is O(1) in k: centroids travel as
    broadcast DATA (one row of structs), not as plan literals. At k=256
    the executed plan must stay about the size of the k=8 plan — the
    pre-round-9 literal-inlined form grew ~k*dim expression nodes and
    broadcast multi-MiB task binaries (round-8 verdict finding #1)."""
    _, df = _clustered(spark)
    sizes = {}
    for k in (8, 256):
        cents = [[float((j * 13 + d * 7) % 97) / 97.0 for d in range(4)] for j in range(k)]
        a = kmeans_assign(df, cents)
        sizes[k] = len(a._jdf.queryExecution().executedPlan().toString())
        assert a.count() == 90
    assert sizes[256] < sizes[8] + 2000, sizes
