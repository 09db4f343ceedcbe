"""Distributed Lloyd's k-means over embedding columns (SURVEY §2.L2).

Trains the centroids the IVF index (``similarity.topk_cosine_ivf``)
partitions by — the reference point is pyspark.ml's KMeans; this is the
same algorithm expressed directly on the DataFrame API so the whole loop
stays inside codegen (no MLlib vector conversions, no Python UDFs).

Iterative algorithm — not expressible as one SQL query, so its contract
is pytest-verified (convergence, determinism, cluster recovery) rather
than DuckDB-oracled.

Per iteration:

1. **assign**: ``argmin_j ||x - c_j||²`` as a CONSTANT-SIZE broadcast
   projection: the k centroids collapse into ONE broadcast row holding
   an array of (j, vec) structs, and each embedding row ranks all k
   in-place with ``array_min(transform(...))`` over (sq_dist, j)
   structs — the same device as ``similarity._assign_buckets``. Plan
   size is O(1) in k (the centroid floats travel as broadcast DATA, not
   as expression-tree literals), so k=50k-scale training is a data-size
   question, not a plan-compile one. An earlier form inlined k·dim
   literal ``element_at`` terms per row, which cost ~40 s of pure
   codegen at k=32/dim=64 and could not be built at production k at
   all. Tie-break to the lowest ``j`` via struct ordering, so
   assignment is deterministic.
2. **update**: ``posexplode(vec) -> groupBy(cluster, pos).avg`` — the
   shuffle carries k·dim partial sums per map task (map-side combine),
   and exactly k·dim rows reach the driver. That collect is the
   algorithm's synchronization point, not a data pull.

Convergence: iterations stop early when centroids are exactly fixed OR
when the relative inertia improvement drops below ``rel_tol`` (exact
float-mean equality almost never fires; the relative test is what
bounds the iteration count in practice).

Empty clusters keep their previous centroid. At 100 TB each iteration is
one scan + one tiny shuffle; convergence state (the centroids) is k·dim
floats on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sq_dist_lambda(vec, cent_vec):
    """Squared euclidean distance usable INSIDE a higher-order-function
    lambda. FP-identical to the sum a hand-inlined
    ``(x1-c1)^2 + (x2-c2)^2 + ...`` expression produces: ``zip_with``
    preserves element order and the left fold adds the per-dim squared
    diffs in the same left-associative sequence (the 0.0 seed is exact:
    0.0 + t == t)."""
    diffs = F.zip_with(
        vec,
        cent_vec,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, p: acc + p)


def centroids_df(spark, centroids: list[list[float]]) -> DataFrame:
    """Materialize trained centroids in the shape
    ``similarity._assign_buckets`` consumes (centroid_id, centroid_vec)."""
    rows = [(j, [float(x) for x in c]) for j, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "centroid_id INT, centroid_vec ARRAY<DOUBLE>")


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
    centroids: list[list[float]] | DataFrame,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Adds ``out_col`` (argmin cluster id) and ``_sq_dist`` columns.

    ``centroids`` is either the trainer's list-of-lists (cluster id =
    list position) or a (centroid_id, centroid_vec) DataFrame. Either
    way the k vectors are collapsed into one broadcast row and ranked
    per embedding row with a constant-size HOF expression — assignment
    never leaves the scan stage and the plan does not grow with k."""
    cdf = (
        centroids
        if isinstance(centroids, DataFrame)
        else centroids_df(emb.sparkSession, centroids)
    )
    cents = cdf.agg(
        F.collect_list(
            F.struct(
                F.col("centroid_id").alias("j"),
                F.col("centroid_vec").alias("v"),
            )
        ).alias("_cents")
    )
    # named_struct, not struct(...).alias(...): aliases are stripped
    # inside HOF lambdas (same pitfall as similarity._assign_buckets).
    # array_min over (d, j) structs = argmin distance, lowest-j tiebreak.
    best = F.array_min(
        F.transform(
            "_cents",
            lambda c: F.named_struct(
                F.lit("d"),
                _sq_dist_lambda(F.col(vec_col), c["v"]),
                F.lit("j"),
                c["j"],
            ),
        )
    )
    return (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("_b", best)
        .select(
            *emb.columns,
            F.col("_b.j").alias(out_col),
            F.col("_b.d").alias("_sq_dist"),
        )
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_tol: float = 1e-6,
) -> tuple[list[list[float]], list[float]]:
    """Returns (centroids, per-iteration inertia). Inertia is
    non-increasing across iterations (Lloyd's invariant — tested).
    Stops early on exactly-fixed centroids or when the relative inertia
    improvement falls below ``rel_tol``.

    The slim (id, vec) projection is persisted for the whole fit: every
    Lloyd iteration (and the init pick) re-consumes it with a different
    broadcast centroid row, so without the cache each iteration re-reads
    the source — max_iters+1 scans of a 100 TB input instead of one.
    Released before returning; MEMORY_AND_DISK (the persist default)
    spills rather than evicts when the projection exceeds storage."""
    slim = emb.select(id_col, vec_col).persist()
    try:
        return _fit_loop(slim, k, max_iters, id_col, vec_col, rel_tol)
    finally:
        slim.unpersist(blocking=False)


def _fit_loop(
    slim: DataFrame,
    k: int,
    max_iters: int,
    id_col: str,
    vec_col: str,
    rel_tol: float,
) -> tuple[list[list[float]], list[float]]:
    centroids = kmeans_init(slim, k, id_col=id_col, vec_col=vec_col)
    dim = len(centroids[0])
    inertia_hist: list[float] = []
    for _ in range(max_iters):
        assigned = kmeans_assign(slim, centroids, vec_col=vec_col)
        # `assigned` is consumed by exactly ONE action per iteration
        # (the stats collect below), so persisting it would add cache
        # write traffic without saving any recomputation.
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
        if (
            len(inertia_hist) >= 2
            and inertia_hist[-2] - inertia_hist[-1]
            <= rel_tol * max(inertia_hist[-2], 1e-12)
        ):
            break
    return centroids, inertia_hist
