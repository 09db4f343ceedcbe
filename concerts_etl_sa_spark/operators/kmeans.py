"""Distributed Lloyd's k-means over embedding columns (SURVEY §2.L2).

Trains the centroids the IVF index (``similarity.topk_cosine_ivf``)
partitions by — the reference point is pyspark.ml's KMeans; this is the
same algorithm expressed directly on the DataFrame API so the whole loop
stays inside codegen (no MLlib vector conversions, no Python UDFs).

Iterative algorithm — not expressible as one SQL query, so its contract
is pytest-verified (convergence, determinism, cluster recovery) rather
than DuckDB-oracled.

Per iteration:

1. **assign**: ``argmin_j ||x - c_j||²`` with the k centroids inlined as
   SQL literals (broadcast-by-constant: k·dim doubles in the plan —
   cheaper than a join for any practical k; the generated expression is
   parsed once per iteration). Tie-break to the lowest ``j`` via struct
   ordering, so assignment is deterministic.
2. **update**: ``posexplode(vec) -> groupBy(cluster, pos).avg`` — the
   shuffle carries k·dim partial sums per map task (map-side combine),
   and exactly k·dim rows reach the driver. That collect is the
   algorithm's synchronization point, not a data pull.

Empty clusters keep their previous centroid. At 100 TB each iteration is
one scan + one tiny shuffle; convergence state (the centroids) is k·dim
floats on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist_sql(vec_col: str, centroid: list[float]) -> str:
    return " + ".join(
        f"(CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - ({c!r}))"
        f" * (CAST(element_at({vec_col}, {i + 1}) AS DOUBLE) - ({c!r}))"
        for i, c in enumerate(centroid)
    )


def _best_cluster_expr(vec_col: str, centroids: list[list[float]]):
    structs = ", ".join(
        f"named_struct('d', ({_sq_dist_sql(vec_col, c)}), 'j', {j})"
        for j, c in enumerate(centroids)
    )
    return F.expr(f"array_min(array({structs}))")


def kmeans_init(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seed-free init: the min-id vector of each of k hash
    buckets of ``id_col``. Parallel (hash agg + self-join on k ids) — a
    rank-based pick would funnel every row through one global-sort
    partition. Hash spreading approximates an even sample of the id
    space; Lloyd's iterations do the rest."""
    slim = emb.select(id_col, vec_col)
    seed_ids = (
        slim.select(F.pmod(F.hash(id_col), F.lit(k)).alias("b"), id_col)
        .groupBy("b")
        .agg(F.min(id_col).alias(id_col))
    )
    picked = (
        slim.join(F.broadcast(seed_ids.select(id_col)), id_col)
        .orderBy(id_col)
        .collect()
    )
    if len(picked) < k:  # fewer distinct buckets than k (tiny inputs)
        picked = slim.orderBy(id_col).limit(k).collect()
    return [[float(x) for x in r[vec_col]] for r in picked[:k]]


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Adds ``out_col`` (argmin cluster id) and ``_sq_dist`` columns."""
    best = _best_cluster_expr(vec_col, centroids)
    return emb.withColumn("_b", best).select(
        "*", F.col("_b.j").alias(out_col), F.col("_b.d").alias("_sq_dist")
    ).drop("_b")


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[list[list[float]], list[float]]:
    """Returns (centroids, per-iteration inertia). Inertia is
    non-increasing across iterations (Lloyd's invariant — tested)."""
    centroids = kmeans_init(emb, k, id_col=id_col, vec_col=vec_col)
    dim = len(centroids[0])
    inertia_hist: list[float] = []
    slim = emb.select(id_col, vec_col)
    for _ in range(max_iters):
        assigned = kmeans_assign(slim, centroids, vec_col=vec_col)
        # one pass: per-(cluster, pos) sums/counts AND global inertia.
        # posexplode keeps the shuffle narrow: (cluster, pos) keyed
        # partial sums, k*dim rows out.
        stats = (
            assigned.select(
                "cluster", "_sq_dist", F.posexplode(vec_col).alias("pos", "x")
            )
            .groupBy("cluster", "pos")
            .agg(
                F.sum(F.col("x").cast("double")).alias("s"),
                F.count(F.lit(1)).alias("n"),
                # _sq_dist repeats per exploded dim; divide back out
                F.sum(F.col("_sq_dist") / dim).alias("d"),
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]  # empty keeps old
        inertia = 0.0
        for r in stats:
            new_centroids[r["cluster"]][r["pos"]] = r["s"] / r["n"]
            inertia += r["d"]
        inertia_hist.append(inertia)
        if new_centroids == centroids:
            break
        centroids = new_centroids
    return centroids, inertia_hist


def centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    """Materialize trained centroids in the shape
    ``similarity._assign_buckets`` consumes (centroid_id, centroid_vec)."""
    rows = [(j, [float(x) for x in c]) for j, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "centroid_id INT, centroid_vec ARRAY<DOUBLE>")
