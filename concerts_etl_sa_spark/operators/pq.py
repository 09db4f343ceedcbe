"""Product-quantized approximate nearest neighbor (SURVEY §2.L2).

Beyond-reference scale component (the reference has no vector ops; its
nearest analog is the similarity matching in
``concerts_etl/matching.py:21-38``): at corpus scale the ANN index
memory is the bottleneck — a 64-dim float32 vector is 256 B, while an
8-subspace / 16-code product quantization (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011)
stores 8 bytes of codes per vector, a 32x compression that turns a
100 TB full-vector index into ~3 TB of codes that fit executor memory.

Pipeline (cosine variant — vectors are unit-normalized first, so the
asymmetric dot approximates cosine):

1. **codebook**: per subspace ``s`` (8 dims each), ``k`` reference
   subvectors. The oracle path derives them from FIXED data rows
   (``PQ_CODE_IDS`` — same deterministic-and-DuckDB-reproducible device
   as ``semdedup.SEMDEDUP_CENTROID_IDS``); the production path trains
   them with per-subspace Lloyd's (:func:`pq_train`, reusing
   ``kmeans.kmeans_fit``).
2. **encode**: each vector's subspace slice is assigned its argmin-
   squared-distance code — a PURE PROJECTION against ONE broadcast row
   of (s, j, subvec) structs (the ``similarity._assign_buckets``
   device: plan size O(1) in m·k, the codebook floats travel as
   broadcast data). No shuffle; at scale the encoded (vec_id, codes)
   frame is the index and is what gets persisted/joined — the full
   vectors never move again.
3. **ADC score**: each query precomputes a lookup table of its dot
   with every (s, j) codebook entry (m·k doubles — one row per query,
   broadcast), and a candidate scores as the sum of m table lookups
   (``lp[s·k + code_s]``) — 8 lookups+adds per pair instead of a
   64-term dot, on 8-byte codes instead of 256-byte vectors.

FP-lockstep with the DuckDB oracle: unit-normalization divides by the
same correctly-rounded sqrt; every per-subspace dot / squared distance
is an 8-term left-associated chain on both engines; the final score
adds the m=8 lookups in subspace order left-associatively; ties in the
encode argmin break to the lowest code id via (d, j) struct ordering
vs ``ORDER BY d, j``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import DIM, N_QUERIES, TOP_K, _norm2, _norm2_sql
from .util import sorted_small


def _nrm(df: DataFrame, vec_col: str) -> "F.Column":
    """Full-vector norm, reusing a precomputed ``norm2`` column when the
    frame carries one (FP-identical: ``_emb_normed`` builds norm2 with
    the same left-associated 64-term sum this would recompute) — the
    recompute costs 64 multiplies + 63 adds per row on a corpus scan."""
    return F.sqrt(
        F.col("norm2") if "norm2" in df.columns else _norm2(vec_col)
    )

PQ_M = 8                     # subspaces
PQ_SUB = DIM // PQ_M         # dims per subspace
PQ_K = 16                    # codes per subspace (fixed-codebook path)
# 16 fixed code-source rows: deterministic, data-derived, >= N_QUERIES
# so no query vector doubles as a codebook entry, < 500 so the same ids
# exist at every sf (sf0.001 ships 500 embeddings)
PQ_CODE_IDS = list(range(23, 503, 30))


def _unit_sql(col: str = "embedding") -> str:
    """Once-per-row unit normalization (same staging as the semdedup
    oracle: norm + sqrt per row in an inner projection, divide per
    element in the outer one)."""
    return (
        f"SELECT vec_id, list_transform({col}, x -> CAST(x AS DOUBLE) / nrm)"
        f" AS nemb FROM (SELECT vec_id, {col},"
        f" sqrt({_norm2_sql(col)}) AS nrm FROM embeddings)"
    )


def _sub_dot_lambda(q_vec, nrm, s, sub_vec):
    """dot of the query's unit-normalized subspace-``s`` slice with an
    8-dim codebook entry — 8-term left fold, FP-identical to the
    oracle's explicit chain over a precomputed ``nemb`` (``x/nrm`` is
    the same double divide either way). The divide lives INSIDE the
    per-element lambda on purpose: a materialized ``nemb`` column in
    the same projection would be re-inlined by CollapseProject into
    every (s, j) lambda — m·k copies of the full 64-element transform
    per row — while ``nrm`` is a per-row ATTRIBUTE (computed below the
    broadcast-join barrier) so the sqrt still runs once per row."""
    return F.aggregate(
        F.zip_with(
            F.slice(q_vec, s * PQ_SUB + F.lit(1), PQ_SUB),
            sub_vec,
            lambda x, y: (x.cast("double") / nrm) * y,
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _sub_sqdist_lambda(vec, nrm, s, sub_vec):
    diffs = F.zip_with(
        F.slice(vec, s * PQ_SUB + F.lit(1), PQ_SUB),
        sub_vec,
        lambda x, y: (x.cast("double") / nrm - y)
        * (x.cast("double") / nrm - y),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, t: acc + t)


def pq_codebook_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(s, j, v) codebook rows from the fixed code-source vectors'
    unit-normalized subspace slices. m·k = 128 rows — broadcast-sized
    by construction at any corpus scale."""
    from ..sources.readers import load_table

    ids_arr = F.array(*[F.lit(i) for i in PQ_CODE_IDS])
    # spread=False: 16 rows — repartitioning them is pure overhead
    base = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .filter(F.col("vec_id").isin(PQ_CODE_IDS))
        .withColumn("_nrm", F.sqrt(_norm2("embedding")))
        .select(
            (F.array_position(ids_arr, F.col("vec_id")) - 1)
            .cast("int")
            .alias("j"),
            F.transform(
                "embedding", lambda x: x.cast("double") / F.col("_nrm")
            ).alias("nemb"),
        )
    )
    return base.select(
        "j",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(PQ_M - 1)),
                lambda s: F.struct(
                    s.cast("int").alias("s"),
                    F.slice("nemb", s * PQ_SUB + F.lit(1), PQ_SUB).alias(
                        "v"
                    ),
                ),
            )
        ).alias("e"),
    ).select(F.col("e.s").alias("s"), "j", F.col("e.v").alias("v"))


def _cb_row(codebook: DataFrame):
    """Collapse the (s, j, v) codebook into ONE broadcast row — entry
    order is irrelevant: the encode argmin ranks (d, j) structs and the
    LUT is array_sort-ed by (s, j) before positional lookup."""
    return codebook.agg(
        F.collect_list(F.struct("s", "j", "v")).alias("_cb")
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, *keep, codes): per subspace the argmin-sq-dist code over
    the vector's UNIT-normalized slice. Pure projection — one broadcast
    codebook row, no shuffle, plan size O(1) in m·k. ``keep`` carries
    extra columns (e.g. the coarse inverted-list id) through to the
    encoded index."""
    base = emb.select(
        "vec_id", *keep, vec_col, _nrm(emb, vec_col).alias("_nrm")
    )
    joined = base.crossJoin(F.broadcast(_cb_row(codebook)))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda s: F.array_min(
            F.transform(
                F.filter("_cb", lambda e: e["s"] == s.cast("int")),
                lambda e: F.named_struct(
                    F.lit("d"),
                    _sub_sqdist_lambda(
                        F.col(vec_col), F.col("_nrm"), s, e["v"]
                    ),
                    F.lit("j"),
                    e["j"],
                ),
            )
        )["j"],
    )
    return joined.withColumn("codes", codes).select(
        "vec_id", *keep, "codes"
    )


def _query_luts(q: DataFrame, codebook: DataFrame) -> DataFrame:
    """(q_id, lp): per query the flat (s·k + j)-indexed array of dots
    with every codebook entry — m·k doubles per query."""
    joined = q.crossJoin(F.broadcast(_cb_row(codebook)))
    lp = F.transform(
        F.array_sort(
            F.transform(
                "_cb",
                lambda e: F.named_struct(
                    F.lit("s"),
                    e["s"],
                    F.lit("j"),
                    e["j"],
                    F.lit("p"),
                    _sub_dot_lambda(
                        F.col("q_vec"), F.col("_nrm"), e["s"], e["v"]
                    ),
                ),
            )
        ),
        lambda x: x["p"],
    )
    return joined.withColumn("lp", lp).select("q_id", "lp")


def topk_cosine_pq_df(
    emb: DataFrame,
    codebook: DataFrame,
    top_k: int = TOP_K,
) -> DataFrame:
    """(q_id, c_id, adc, rn): per query the top-k candidates by
    asymmetric-distance score (approximate cosine on unit vectors).
    Per pair: m table lookups + adds over the broadcast LUT row — the
    full vectors are never shuffled and never touched again after
    encode.

    The lookup stride is derived from the LUT itself (``size(lp)/m``),
    not from a caller-supplied k: a wrong k would not error — an
    out-of-range ``element_at`` yields NULL (non-ANSI), NULL sums to
    NULL, and ``desc`` orders NULL last — so every score would go
    quietly NULL-or-misaligned instead of failing loud (the same
    silent-degrade class as the sign-LSH band-width guard,
    ``similarity._check_band_width``)."""
    from ._cachescope import begin_scope, scoped_persist

    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        _nrm(emb, "embedding").alias("_nrm"),
    )
    luts = _query_luts(q, codebook)
    # the encoded (vec_id, codes) frame IS the index — 8 bytes of codes
    # per vector, the thing a production build persists once and every
    # query batch reuses (index-on-write). Scope-persisted like the
    # semdedup assigned frame: repeat runs against an unchanged corpus
    # resurrect it instead of re-encoding.
    begin_scope("pq")
    enc = scoped_persist(
        "pq",
        pq_encode(emb.filter(F.col("vec_id") >= N_QUERIES), codebook),
    )
    scored = enc.crossJoin(F.broadcast(luts)).withColumn(
        "adc", _adc_col()
    )
    return _rank_topk(scored, top_k)


def _adc_raw():
    """The per-pair asymmetric-distance fold BEFORE rounding: m lookups
    into the flat LUT, added in subspace order (left-associative —
    oracle lockstep). The stride is size(lp)/m, never a caller-supplied
    k (see :func:`topk_cosine_pq_df`)."""
    stride = (F.size("lp") / F.lit(PQ_M)).cast("int")
    return F.aggregate(
        F.zip_with(
            "codes",
            F.sequence(F.lit(0), F.lit(PQ_M - 1)),
            lambda c, s: F.element_at(
                "lp", (s * stride + c + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _adc_col():
    """Rounded ADC score — the plain (non-residual) forms' ranking key."""
    return F.round(_adc_raw(), 6)


def _rank_topk(scored: DataFrame, top_k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(
        F.desc("adc"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select(
            "q_id", F.col("vec_id").alias("c_id"), "adc", "rn"
        )
        .transform(lambda d: sorted_small(d, "q_id", "rn"))
    )


def topk_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-codebook PQ top-k — the DuckDB-oracled variant."""
    from ..sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return topk_cosine_pq_df(emb, pq_codebook_fixed(spark, sf_dir))


def pq_train(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    max_iters: int = 3,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's codebooks over the unit-normalized slices —
    m independent k-means fits (each a :func:`kmeans.kmeans_fit` on an
    SUB-dim projection; the fit persists its slim frame, so each
    subspace is one cached scan + iterations of broadcast-HOF
    assignment). Returns codebooks[s][j] = SUB-dim list."""
    from .kmeans import kmeans_fit

    # persisted across the m fits: each kmeans_fit caches only its own
    # (vec_id, subv) slice, so without this the source scan + the
    # 64-term norm re-run once PER SUBSPACE (m scans of a 100 TB input
    # instead of one). Released before returning.
    base = emb.select(
        "vec_id", vec_col, _nrm(emb, vec_col).alias("_nrm")
    ).persist()
    try:
        books: list[list[list[float]]] = []
        for s in range(m):
            sub = base.select(
                "vec_id",
                F.transform(
                    F.slice(vec_col, s * PQ_SUB + 1, PQ_SUB),
                    lambda x: x.cast("double") / F.col("_nrm"),
                ).alias("subv"),
            )
            fitted, _ = kmeans_fit(
                sub, k=k, max_iters=max_iters, vec_col="subv"
            )
            books.append(fitted)
        return books
    finally:
        base.unpersist(blocking=False)


def pq_train_fused(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    max_iters: int = 3,
    vec_col: str = "embedding",
    rel_tol: float = 1e-6,
    train_sample_rows: int | None = None,
    train_sample_n: int | None = None,
    driver_train: bool | None = None,
) -> list[list[list[float]]]:
    """All-subspace Lloyd's in ONE loop — the production trainer.

    :func:`pq_train` runs m SEQUENTIAL kmeans_fit calls: m inits + up to
    m*max_iters assignment/update jobs, i.e. ~m*(max_iters+1) passes over
    the (cached) corpus — 32 passes at the defaults, which the round-10
    bench gate surfaced as 23 s at sf0.1 and which at 100 TB is 32 reads
    of a cache that may spill. Here every iteration is ONE job: the m
    codebooks travel as one broadcast row (array-of-arrays of (j, v)
    structs), ``zip_with(subs, _books)`` ranks each subspace's k entries
    against its slice in-place, and a single posexplode aggregation
    yields all (s, cluster, pos) partial sums — m*SUB = DIM narrow rows
    per vector, the SAME shuffle volume as one full-dim kmeans
    iteration. Total passes: 1 init + max_iters, independent of m.

    Per-subspace convergence matches kmeans_fit's contract (exact
    fixed-point OR relative-inertia early stop, each subspace freezing
    independently; a frozen subspace's stats are simply ignored). The
    seed ids are id-derived (hash buckets), hence IDENTICAL across
    subspaces — one collect seeds all m books. Results match
    :func:`pq_train` up to floating-point aggregation order (the fused
    job sums partials in a different partition order; parity is pinned
    by test at 1e-9, determinism exactly).

    ``train_sample_rows`` bounds the training set via
    :func:`kmeans.train_sample` (the FAISS max-points-per-centroid
    device): a k-codes codebook needs ~256·k training vectors, not the
    corpus, so at scale the trainer's 1+max_iters passes run over a
    bounded sample while encode/score still see every row. Default
    ``None`` trains exactly as before (the pq_train parity contract);
    below the cap the thinning filter short-circuits bit-identically.

    ``driver_train`` collects the bounded sample ONCE and runs all m
    Lloyd loops locally in numpy (the :func:`opq_rotation` device,
    extended to codebook training — FAISS itself trains codebooks on
    the in-RAM sample): one job instead of 1 init + max_iters fused
    jobs. The default ``None`` dispatches by MEASURED size exactly like
    :func:`kmeans.kmeans_fit` (r16): driver-side iff the training set
    is provably at most ``kmeans.DRIVER_TRAIN_MAX_ROWS`` rows — via the
    thinning arithmetic or the caller's ``train_sample_n`` count — else
    the distributed fused loop runs unchanged. The subspace slices and
    unit normalization are computed by the ENGINE before the collect
    (one Arrow transfer), so the init books are bit-identical to the
    distributed loop's and iterations differ only by float-summation
    order (parity pinned in tests/test_driver_lloyd.py, same class as
    fused-vs-sequential)."""
    from .kmeans import _driver_train_auto, train_sample

    # _nrm is built as a real column in its own projection stage so the
    # divide lambdas see a per-row attribute (same device as
    # semdedup._assigned_frame)
    sample_target = (
        None if train_sample_rows is None else max(train_sample_rows, k)
    )
    slim = train_sample(
        emb, "vec_id", sample_target, n=train_sample_n
    ).select(
        "vec_id", vec_col, _nrm(emb, vec_col).alias("_nrm")
    ).select(
        "vec_id",
        F.array(
            *[
                F.transform(
                    F.slice(vec_col, s * PQ_SUB + 1, PQ_SUB),
                    lambda x: x.cast("double") / F.col("_nrm"),
                )
                for s in range(m)
            ]
        ).alias("subs"),
    )
    if driver_train is None:
        driver_train = _driver_train_auto(sample_target, train_sample_n, k)
    if driver_train:
        return _np_fused_loop(_collect_subs_arrow(slim, m), m, k,
                              max_iters, rel_tol)
    slim = slim.persist()
    try:
        return _fused_loop(slim, m, k, max_iters, rel_tol)
    finally:
        slim.unpersist(blocking=False)


def _fused_stats(slim: DataFrame, books, sub_dim: int):
    """One fused Lloyd iteration's assignment/update job — shared by
    the production loop and the oracle-form loop (round-15) so the
    assignment semantics (broadcast books row, array_min over (d, j)
    structs = argmin with lowest-j tie-break, posexplode partial sums)
    cannot drift between them. Returns the collected
    (s, cluster, pos, sum_x, n, d) rows."""
    from .kmeans import _sq_dist_lambda

    from .util import driver_rows_df

    spark = slim.sparkSession
    schema = "_books ARRAY<ARRAY<STRUCT<j: INT, v: ARRAY<DOUBLE>>>>"
    bdf = driver_rows_df(
        spark,
        [([[(j, v) for j, v in enumerate(book)] for book in books],)],
        schema,
    )
    best = F.zip_with(
        "subs",
        "_books",
        lambda subv, book: F.named_struct(
            F.lit("b"),
            F.array_min(
                F.transform(
                    book,
                    lambda c: F.named_struct(
                        F.lit("d"),
                        _sq_dist_lambda(subv, c["v"]),
                        F.lit("j"),
                        c["j"],
                    ),
                )
            ),
            F.lit("subv"),
            subv,
        ),
    )
    return (
        slim.crossJoin(F.broadcast(bdf))
        .select(F.posexplode(best).alias("s", "info"))
        .select(
            "s",
            F.col("info.b.j").alias("cluster"),
            F.col("info.b.d").alias("_sq_dist"),
            F.posexplode("info.subv").alias("pos", "x"),
        )
        .groupBy("s", "cluster", "pos")
        .agg(
            F.sum("x").alias("sum_x"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_sq_dist") / sub_dim).alias("d"),
        )
        .collect()
    )


def _fused_loop(
    slim: DataFrame, m: int, k: int, max_iters: int, rel_tol: float
) -> list[list[list[float]]]:
    # init: the hash-bucket min-id pick is id-derived, so every subspace
    # seeds from the SAME rows — one collect slices all m books
    # (identical ids, and identical subvector values, to what m separate
    # kmeans_init calls would pick)
    seed_ids = (
        slim.select(F.pmod(F.hash("vec_id"), F.lit(k)).alias("b"), "vec_id")
        .groupBy("b")
        .agg(F.min("vec_id").alias("vec_id"))
    )
    picked = (
        slim.join(F.broadcast(seed_ids.select("vec_id")), "vec_id")
        .orderBy("vec_id")
        .collect()
    )
    if len(picked) < k:
        picked = slim.orderBy("vec_id").limit(k).collect()
    books = [
        [[float(x) for x in r["subs"][s]] for r in picked[:k]]
        for s in range(m)
    ]
    sub_dim = len(books[0][0])
    hists: list[list[float]] = [[] for _ in range(m)]
    frozen = [False] * m
    for _ in range(max_iters):
        if all(frozen):
            break
        stats = _fused_stats(slim, books, sub_dim)
        new_books = [[list(c) for c in book] for book in books]
        inertia = [0.0] * m
        for r in stats:
            if frozen[r["s"]]:
                continue
            new_books[r["s"]][r["cluster"]][r["pos"]] = (
                r["sum_x"] / r["n"]
            )
            inertia[r["s"]] += r["d"]
        for s in range(m):
            if frozen[s]:
                continue
            hists[s].append(inertia[s])
            if new_books[s] == books[s]:
                frozen[s] = True
                continue
            books[s] = new_books[s]
            h = hists[s]
            if len(h) >= 2 and h[-2] - h[-1] <= rel_tol * max(
                h[-2], 1e-12
            ):
                frozen[s] = True
    return books


def _collect_subs_arrow(slim: DataFrame, m: int):
    """Collect the (vec_id, subs) training frame as (ids, [per-subspace
    (n, sub_dim) float64 matrices]) via ONE Arrow transfer — the same
    driver-boundary hygiene as ``kmeans._collect_ids_matrix`` (r16): the
    nested list<list<double>> column lands as one flat buffer and is
    reshaped to (n, m, sub), never materialized as boxed Rows. Row
    order matches ``collect()`` (partition order) and the doubles were
    computed by the engine, so the numpy twin sees bit-identical
    inputs."""
    import numpy as np

    tbl = slim.toArrow()
    ids = tbl.column("vec_id").to_pylist()
    if not ids:
        raise ValueError("pq_train_fused: empty training frame")
    outer = tbl.column("subs").combine_chunks()
    flat = outer.flatten().flatten().to_numpy(zero_copy_only=False)
    arr = np.asarray(flat, dtype=np.float64).reshape(len(ids), m, -1)
    return ids, [arr[:, s, :] for s in range(m)]


def _np_fused_loop(
    sample, m: int, k: int, max_iters: int, rel_tol: float
) -> list[list[list[float]]]:
    """Driver-side twin of :func:`_fused_loop` over the collected
    (vec_id, subs) sample — ``sample`` is the (ids, per-subspace
    matrices) pair from :func:`_collect_subs_arrow`: IDENTICAL
    hash-bucket min-id init (the murmur3 twin picks the same seed rows,
    and the sub-slices were computed by the engine before the collect,
    so init books are bit-identical), then m independent numpy Lloyd
    loops with the same per-subspace freeze logic (inertia appended
    before the exact-fixpoint freeze, then the relative-inertia stop).
    Subspaces never interact in the fused job, so per-subspace loops
    are semantically identical to the fused iteration; the only
    divergence from the distributed loop is float-summation order
    (pinned at 1e-9 in tests/test_driver_lloyd.py)."""
    import numpy as np

    from .kmeans import _np_seed_indices

    ids, S = sample
    seed_pos = _np_seed_indices(ids, k)
    books: list[list[list[float]]] = []
    for s in range(m):
        X = S[s]
        C = X[seed_pos].copy()
        hist: list[float] = []
        for _ in range(max_iters):
            d = np.empty((X.shape[0], C.shape[0]))
            for j in range(C.shape[0]):
                diff = X - C[j]
                d[:, j] = (diff * diff).sum(1)
            g = d.argmin(1)
            newC = C.copy()
            for j in range(C.shape[0]):
                mask = g == j
                if mask.any():
                    newC[j] = X[mask].mean(0)
            hist.append(float(d[np.arange(X.shape[0]), g].sum()))
            if np.array_equal(newC, C):
                break
            C = newC
            if len(hist) >= 2 and hist[-2] - hist[-1] <= rel_tol * max(
                hist[-2], 1e-12
            ):
                break
        books.append([[float(x) for x in c] for c in C])
    return books


def pq_codebook_from_trained(
    spark: SparkSession, books: list[list[list[float]]]
) -> DataFrame:
    """Materialize trained codebooks as the (s, j, v) frame the encode
    and score paths consume."""
    from .util import driver_rows_df

    rows = [
        (s, j, [float(x) for x in v])
        for s, book in enumerate(books)
        for j, v in enumerate(book)
    ]
    return driver_rows_df(spark, rows, "s INT, j INT, v ARRAY<DOUBLE>")


def topk_cosine_pq_trained(
    spark: SparkSession,
    sf_dir: str,
    k_codes: int = PQ_K,
    max_iters: int = 3,
) -> DataFrame:
    """PQ top-k over per-subspace kmeans-TRAINED codebooks — the
    production index build. Deterministic for a given input but not a
    DuckDB one-shot (iterative trainer), hence pytest-pinned. Uses the
    FUSED trainer (one job per iteration for all m subspaces) — the
    sequential :func:`pq_train` is the semantic reference — with the
    training set bounded at 256·k_codes rows (the FAISS
    max-points-per-centroid rule; below the cap, bit-identical to
    unbounded training, which covers every in-repo test fixture)."""
    from ..sources.readers import load_table
    from .kmeans import TRAIN_POINTS_PER_CENTROID

    emb = load_table(spark, sf_dir, "embeddings")
    # stride-sizing count on the UNSPREAD bare scan — the cheapest
    # count the source supports (no repartition, no projections)
    n_total = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .select("vec_id")
        .count()
    )
    books = pq_train_fused(
        emb,
        m=PQ_M,
        k=k_codes,
        max_iters=max_iters,
        train_sample_rows=TRAIN_POINTS_PER_CENTROID * k_codes,
        train_sample_n=n_total,
    )
    return topk_cosine_pq_df(
        emb, pq_codebook_from_trained(spark, books)
    )


# ------------- oracle-form trained codebooks (round-15 verdict #7) --------
#
# The production trainer above is deterministic but was never DuckDB-
# oracled: its hash-bucket init uses Spark's murmur hash (no DuckDB
# twin), its rel-tol early stop compares float inertias (cross-engine
# ulp differences could flip the iteration COUNT), and its centroid
# means carry raw float-aggregation-order noise that a mid-iteration
# Voronoi boundary could amplify into different memberships. The
# ORACLE FORM below closes each hole with a contract change that is
# part of the operator's definition (mirrored exactly in the SQL twin):
#
# - init = the k smallest candidate vec_ids (ORDER BY vec_id LIMIT k);
# - fixed iteration count (PQ_ORACLE_ITERS), no inertia early stop
#   (an exact fixpoint freeze stays: iterating past one is a no-op in
#   BOTH engines, so it cannot diverge);
# - every centroid coordinate is rounded to PQ_ORACLE_ROUND_DP after
#   each update, in DuckDB's round semantics (round half away from
#   zero — pinned bit-exact against duckdb round() in
#   tests/test_oracle_sql_form.py). Cross-engine float-sum-order
#   differences in a mean are ~1e-13; the 5e-7 rounding grid absorbs
#   them, so both engines enter every iteration with IDENTICAL books
#   and the assignment argmin (lowest-j tie-break both sides) cannot
#   flip off an ulp.
#
# The Spark side still runs the REAL distributed machinery — the same
# _fused_stats job per iteration as the production loop — so a hash
# match proves the fused broadcast-assign/posexplode-update pipeline
# computes Lloyd's, not that two copies of numpy agree. DuckDB runs the
# iterations as UNROLLED chained CTEs (fixed count, so no recursive CTE
# single-reference contortions).

PQ_ORACLE_ITERS = 3
PQ_ORACLE_ROUND_DP = 6


def _round_away(x: float, dp: int) -> float:
    """DuckDB ``round(DOUBLE, dp)`` twin: half away from zero on the
    scaled double (bit-parity pinned in tests/test_oracle_sql_form.py)."""
    import math

    s = 10.0 ** dp
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def pq_train_books_oracle(
    emb: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = PQ_ORACLE_ITERS,
    round_dp: int = PQ_ORACLE_ROUND_DP,
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Oracle-form fused Lloyd's (see the block comment above): min-id
    init, fixed ``iters``, centroids rounded to ``round_dp`` per
    iteration. Each iteration runs the production :func:`_fused_stats`
    job; only init/stop/rounding differ, and each difference exists to
    make the trainer a DuckDB one-shot."""
    slim = (
        emb.select("vec_id", vec_col, _nrm(emb, vec_col).alias("_nrm"))
        .select(
            "vec_id",
            F.array(
                *[
                    F.transform(
                        F.slice(vec_col, s * PQ_SUB + 1, PQ_SUB),
                        lambda x: x.cast("double") / F.col("_nrm"),
                    )
                    for s in range(m)
                ]
            ).alias("subs"),
        )
        .persist()
    )
    try:
        picked = slim.orderBy("vec_id").limit(k).collect()
        books = [
            [[float(x) for x in r["subs"][s]] for r in picked]
            for s in range(m)
        ]
        sub_dim = len(books[0][0])
        for _ in range(iters):
            stats = _fused_stats(slim, books, sub_dim)
            new_books = [[list(c) for c in book] for book in books]
            for r in stats:
                new_books[r["s"]][r["cluster"]][r["pos"]] = _round_away(
                    r["sum_x"] / r["n"], round_dp
                )
            if new_books == books:  # exact fixpoint: further iters no-op
                break
            books = new_books
        return books
    finally:
        slim.unpersist(blocking=False)


def topk_cosine_pq_trained_oracle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PQ top-k over ORACLE-FORM trained codebooks — the iterative
    trained-codebook class under a DuckDB oracle (round-15 verdict #7):
    train on the candidate set (vec_id >= N_QUERIES, so no query vector
    leaks into its own codebook), then the standard encode/ADC/rank.

    Reference anchor: the trained path a production PQ deployment runs
    (FAISS ProductQuantizer.train, Jégou 2011 §II) — the production
    twin is :func:`topk_cosine_pq_trained` (hash init, early stop,
    sample-bounded), whose quality/determinism is pytest-pinned."""
    from ..sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_train_books_oracle(emb.filter(F.col("vec_id") >= N_QUERIES))
    return topk_cosine_pq_df(emb, pq_codebook_from_trained(spark, books))


def _lloyd_iter_sql(i: int) -> str:
    """One unrolled Lloyd iteration: assign every training subvector to
    its nearest cb{i-1} codeword (lowest-j tie-break, the Spark
    array_min struct order), then per-(s, j, pos) rounded means with
    empty codewords keeping their previous entry."""
    prev = f"cb{i - 1}"
    return f"""
asg{i} AS (
  SELECT vec_id, s, j FROM (
    SELECT e.vec_id, t.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, t.s
             ORDER BY {_sub_sqdist_sql('e.nemb', 'c.v', 't.s')}, c.j
           ) AS rn
    FROM samp e CROSS JOIN sub t JOIN {prev} c ON c.s = t.s
  ) WHERE rn = 1
),
upd{i} AS (
  SELECT s, j, list(mv ORDER BY pos) AS v FROM (
    SELECT a.s, a.j, p.pos,
           round(avg(e.nemb[a.s*{PQ_SUB} + p.pos]),
                 {PQ_ORACLE_ROUND_DP}) AS mv
    FROM asg{i} a JOIN samp e USING (vec_id) CROSS JOIN pos p
    GROUP BY a.s, a.j, p.pos
  ) GROUP BY s, j
),
cb{i} AS MATERIALIZED (
  SELECT c.s, c.j, coalesce(u.v, c.v) AS v
  FROM {prev} c LEFT JOIN upd{i} u ON u.s = c.s AND u.j = c.j
)"""


def _topk_cosine_pq_trained_oracle_sql(
    k: int = PQ_K, iters: int = PQ_ORACLE_ITERS
) -> str:
    """DuckDB twin of :func:`topk_cosine_pq_trained_oracle`: the SAME
    min-id init, ``iters`` UNROLLED Lloyd iterations (chained CTEs — a
    fixed iteration count needs no recursive CTE) with per-iteration
    round-to-{dp} centroids, then the standard encode/LUT/ADC/rank tail
    (verbatim the fixed-codebook twin's). The per-iteration rounding is
    what makes the iterative fixpoint cross-engine comparable: both
    engines enter every iteration with identical books (see the Spark
    side's block comment)."""
    score = " + ".join(
        f"l.lp[{s}*{k} + e.codes[{s + 1}] + 1]" for s in range(PQ_M)
    )
    iter_ctes = ",".join(_lloyd_iter_sql(i) for i in range(1, iters + 1))
    return f"""
WITH enorm AS MATERIALIZED ({_unit_sql()}),
samp AS MATERIALIZED (
  SELECT vec_id, nemb FROM enorm WHERE vec_id >= {N_QUERIES}
),
sub AS (SELECT CAST(s AS INT) AS s FROM generate_series(0, {PQ_M - 1}) AS t(s)),
pos AS (SELECT CAST(pos AS INT) AS pos
        FROM generate_series(1, {PQ_SUB}) AS t(pos)),
seed AS (
  SELECT * FROM (
    SELECT vec_id, nemb,
           CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS j
    FROM samp
  ) WHERE j < {k}
),
cb0 AS MATERIALIZED (
  SELECT t.s, e.j, e.nemb[t.s*{PQ_SUB}+1 : t.s*{PQ_SUB}+{PQ_SUB}] AS v
  FROM seed e CROSS JOIN sub t
),{iter_ctes},
cb AS MATERIALIZED (SELECT s, j, v FROM cb{iters}),
enc AS MATERIALIZED (
  SELECT vec_id, list(j ORDER BY s) AS codes FROM (
    SELECT e.vec_id, t.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, t.s
             ORDER BY {_sub_sqdist_sql('e.nemb', 'c.v', 't.s')}, c.j
           ) AS rn
    FROM enorm e CROSS JOIN sub t JOIN cb c ON c.s = t.s
    WHERE e.vec_id >= {N_QUERIES}
  ) WHERE rn = 1 GROUP BY vec_id
),
lut AS MATERIALIZED (
  SELECT q_id, list(p ORDER BY s, j) AS lp FROM (
    SELECT q.vec_id AS q_id, t.s, c.j,
           {_sub_dot_sql('q.nemb', 'c.v', 't.s')} AS p
    FROM enorm q CROSS JOIN sub t JOIN cb c ON c.s = t.s
    WHERE q.vec_id < {N_QUERIES}
  ) GROUP BY q_id
)
SELECT q_id, c_id, adc, rn FROM (
  SELECT l.q_id, e.vec_id AS c_id, round({score}, 6) AS adc,
         row_number() OVER (
           PARTITION BY l.q_id ORDER BY round({score}, 6) DESC, e.vec_id
         ) AS rn
  FROM enc e CROSS JOIN lut l
) WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


# TOPK_COSINE_PQ_TRAINED_ORACLE_SQL is materialized further down, after
# the _sub_*_sql helpers it composes are defined.


def pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@TOP_K of the fixed-codebook PQ ranking vs the exact
    brute-force truth — same harness shape as ``ann_recall``."""
    from .similarity import topk_cosine_bruteforce

    truth = topk_cosine_bruteforce(spark, sf_dir).select(
        "q_id", "c_id"
    )
    approx = topk_cosine_pq(spark, sf_dir).select("q_id", "c_id")
    hits = truth.join(approx, ["q_id", "c_id"]).groupBy("q_id").count()
    return (
        truth.groupBy("q_id")
        .agg(F.count(F.lit(1)).alias("n_true"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.round(
                F.coalesce(F.col("count"), F.lit(0))
                / F.col("n_true"),
                6,
            ).alias("recall"),
        )
        .transform(lambda d: sorted_small(d, "q_id"))
    )


def topk_cosine_ivfpq_df(
    emb: DataFrame,
    coarse: DataFrame,
    codebook: DataFrame,
    nprobe: int,
    top_k: int = TOP_K,
) -> DataFrame:
    """IVF coarse pruning + PQ scoring — the FAISS-style composition:
    candidates live in inverted lists keyed by their nearest coarse
    centroid AND are stored as PQ codes; a query probes only its
    ``nprobe`` nearest lists, so the scoring join is an EQUI-join on
    ``centroid_id`` touching ~N·nprobe/K code rows per query instead of
    the flat crossJoin over all N. Divergence from full FAISS IVFADC:
    codes quantize the vector itself, not the residual (x − centroid) —
    residual encoding would couple the codebook to the coarse index and
    break the DuckDB one-shot; the recall cost at these K is measured,
    not assumed (tests/test_pq.py).

    ``emb`` needs (vec_id, embedding, norm2); ``coarse`` is the
    (centroid_id, centroid_vec, c_n2) frame ``similarity``'s IVF uses;
    the index frame (vec_id, centroid_id, codes) is scope-persisted —
    12 B per vector, the production index-on-write artifact."""
    from ._cachescope import begin_scope, scoped_persist
    from .similarity import _assign_buckets

    begin_scope("ivfpq")
    index = scoped_persist(
        "ivfpq",
        pq_encode(
            _assign_buckets(
                emb.filter(F.col("vec_id") >= N_QUERIES),
                coarse,
                n_keep=1,
            ),
            codebook,
            keep=("centroid_id",),
        ),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        _nrm(emb, "embedding").alias("_nrm"),
    )
    probes = _assign_buckets(
        emb.filter(F.col("vec_id") < N_QUERIES), coarse, n_keep=nprobe
    ).select(F.col("vec_id").alias("q_id"), "centroid_id")
    probe_luts = probes.join(_query_luts(q, codebook), "q_id")
    # each candidate has ONE list and a query's nprobe lists are
    # distinct, so a (q, c) pair joins at most once — no dedup needed
    # (same argument as similarity._ivf_topk, round-5 finding)
    scored = index.join(
        F.broadcast(probe_luts), "centroid_id"
    ).withColumn("adc", _adc_col())
    return _rank_topk(scored, top_k)


def topk_cosine_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed coarse centroids (``similarity.IVF_CENTROID_IDS``) + fixed
    PQ codebook — the DuckDB-oracled variant."""
    from ..sources.readers import load_table
    from .similarity import IVF_CENTROID_IDS, NPROBE, _emb_normed

    coarse = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .filter(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
            _norm2("embedding").alias("c_n2"),
        )
    )
    return topk_cosine_ivfpq_df(
        _emb_normed(spark, sf_dir),
        coarse,
        pq_codebook_fixed(spark, sf_dir),
        nprobe=NPROBE,
    )


def topk_cosine_ivfpq_trained(
    spark: SparkSession,
    sf_dir: str,
    k_coarse: int = 8,
    k_codes: int = PQ_K,
    nprobe: int = 2,
    max_iters: int = 3,
) -> DataFrame:
    """Fully-trained IVF-PQ: Lloyd's coarse centroids + per-subspace
    Lloyd's codebooks — the production index build (pytest-pinned;
    iterative, not a DuckDB one-shot). Both trainers bound their
    training sets at 256 points per centroid (the FAISS rule —
    constant k_coarse/k_codes make both caps constants, so index
    training touches O(k) rows while encode/assign still see every
    row; below the caps, bit-identical to unbounded training)."""
    from ..sources.readers import load_table
    from .kmeans import TRAIN_POINTS_PER_CENTROID, centroids_df, kmeans_fit
    from .similarity import _emb_normed

    emb = load_table(spark, sf_dir, "embeddings")
    # one stride-sizing count, on the UNSPREAD bare scan, shared by
    # both trainers
    n_total = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .select("vec_id")
        .count()
    )
    fitted, _ = kmeans_fit(
        emb,
        k=k_coarse,
        max_iters=max_iters,
        train_sample_rows=TRAIN_POINTS_PER_CENTROID * k_coarse,
        train_sample_n=n_total,
    )
    coarse = centroids_df(spark, fitted).withColumn(
        "c_n2", _norm2("centroid_vec")
    )
    books = pq_train_fused(
        emb,
        m=PQ_M,
        k=k_codes,
        max_iters=max_iters,
        train_sample_rows=TRAIN_POINTS_PER_CENTROID * k_codes,
        train_sample_n=n_total,
    )
    return topk_cosine_ivfpq_df(
        _emb_normed(spark, sf_dir),
        coarse,
        pq_codebook_from_trained(spark, books),
        nprobe=nprobe,
    )


def _unit_coarse(coarse: DataFrame) -> DataFrame:
    """(centroid_id, _cbar): coarse centroids unit-normalized — the
    decomposition anchor of the residual forms. Residuals are taken in
    the UNIT sphere (x̂ − c̄), so the ADC identity
    ``dot(q̂, x̂) = dot(q̂, c̄) + dot(q̂, x̂ − c̄)`` holds exactly and the
    reconstruction error the codebook must absorb is the residual, not
    the vector."""
    return coarse.select(
        "centroid_id",
        F.transform(
            "centroid_vec",
            lambda x: x.cast("double") / F.sqrt(F.col("c_n2")),
        ).alias("_cbar"),
    )


def _residual_frame(assigned: DataFrame, cbar: DataFrame) -> DataFrame:
    """(vec_id, centroid_id, embedding=x̂ − c̄_list, norm2=1.0) from an
    ``_assign_buckets(n_keep=1)`` frame. ``norm2`` is pinned to the
    IDENTITY DIVISOR 1.0 on purpose: residuals must NOT be
    re-normalized (they are already in scoring space — the unit sphere
    the ADC dot lives on), and ``_nrm`` reuses a present norm2 column,
    so the downstream trainer/encoder consume the residual bytes
    untouched. The K-row ``cbar`` join is broadcast — the residual
    transform stays inside the scan stage, shuffle-free like encode."""
    return assigned.join(F.broadcast(cbar), "centroid_id").select(
        "vec_id",
        "centroid_id",
        F.zip_with(
            "embedding",
            "_cbar",
            lambda x, y: x.cast("double") / F.sqrt(F.col("norm2")) - y,
        ).alias("embedding"),
        F.lit(1.0).alias("norm2"),
    )


def _probe_cdots(probes: DataFrame, cbar: DataFrame) -> DataFrame:
    """(q_id, centroid_id, c_dot): the residual ADC's per-(query, list)
    constant ``dot(q̂, c̄_list)`` — one 64-term fold per probed list per
    query (Q·nprobe rows), the whole extra cost residual scoring adds
    on the query side."""
    return probes.join(F.broadcast(cbar), "centroid_id").select(
        F.col("vec_id").alias("q_id"),
        "centroid_id",
        F.aggregate(
            F.zip_with(
                "embedding",
                "_cbar",
                lambda x, y: (x.cast("double") / F.sqrt(F.col("norm2"))) * y,
            ),
            F.lit(0.0),
            lambda acc, p: acc + p,
        ).alias("c_dot"),
    )


# Residual encoding pays only when the coarse centroids explain
# variance the PLAIN codebook could not absorb anyway. The round-12
# gate compared mean ||x̂ − c̄||² against the absolute 1.0 (= the unit
# vectors' own energy); the round-13 realistic document-derived
# fixture exposed its blind spot: an ANISOTROPIC SINGLE-BLOB corpus
# (one dominant shared direction — the shape real text embeddings
# have) measures residual energy ~0.32, far under 1.0, yet residual
# coding LOSES there (recall 0.30 vs plain 0.33): a plain codebook's
# per-subspace k-means absorbs the shared component for free, so
# subtracting a centroid removes nothing plain couldn't. What
# residual coding actually exploits is MULTI-MODALITY — centroids
# far apart, where a plain codebook must span the modes. The
# re-derived gate is therefore RELATIVE: residual codes ship only
# when  E_res < RATIO · E_ctr,  where E_ctr = 1 − ||mean(x̂)||² is
# the corpus' centered energy (what any mean-absorbing quantizer
# faces). Measured ratios (engine-computed at the reference k=8):
#   isotropic table     1.48 / 1.00 = 1.48  -> plain  (residual
#                                              degrades 0.22→0.13)
#   50 planted modes    1.23 / 0.99 = 1.24  -> plain  (plain wins
#                                              0.43 vs 0.37 at k=8)
#   realistic documents 0.32 / 0.37 = 0.88  -> plain  (plain wins
#                                              0.33 vs 0.30)
#   planted 6 clusters  0.43 / 0.93 = 0.46  -> residual (wins
#                                              0.27 vs 0.17)
# Round 13 set the threshold at 0.75 — splitting 0.88 from 0.46 with
# margin, but with NOTHING measured in between. Round 14 mapped the
# band with the lang-weighted document fixture (one blob per language
# — multi-blob geometry from real metadata, tests/realistic_emb.py),
# recall margin = residual − plain at equal budget:
#   ratio 0.894 -> +0.03   ratio 0.879 -> +0.01   (ties, ≤ noise)
#   ratio 0.841 -> +0.05   ratio 0.805 -> +0.05   (residual wins)
#   ratio 0.770 -> +0.13                          (residual wins big)
# Under 0.75 the 0.770 corpus shipped the 0.13-losing layout — the
# exact failure the gate exists to prevent, in the opposite
# direction from round 13's find. Every measured point below ~0.85
# wins-or-ties for residual; every plain-winning point sits at ≥0.88.
# 0.85 classifies ALL measured corpora within the ±0.05 noise floor
# (worst miss: the 0.879/0.894 ties cost ≤0.03). FAISS leaves the
# choice to the operator's judgment; at 100 TB an automated, measured
# gate is the safer default.
RESIDUAL_GATE_RATIO = 0.85

# The ratio is measured against a FIXED reference coarse fit, not the
# build's k_coarse: more centroids always explain more variance, so
# the build-k ratio drifts downward with k even when the corpus
# geometry (the thing that decides the winner) is unchanged —
# measured on the realistic 5000-doc fixture: ratio 0.91 at k=8 but
# 0.68 at the auto-K k=83, while the recall winner stays PLAIN at
# both (0.17 vs 0.16 and 0.23 vs 0.18 — the k=83 A/B in BASELINE.md).
# A build-k gate would flip to the losing layout at production K on
# every single-blob corpus. Known conservative direction, MEASURED on
# a 50-mode fixture (modes >> GATE_REF_K, ratio 1.24 -> plain): at a
# k=50 build residual would win by 0.04 (0.46 vs 0.42) and the gate
# ships plain — a small safe miss; at the default k=8 build plain
# genuinely wins there (0.43 vs 0.37), so the miss exists only when
# k_coarse is raised to ~the true mode count. Plain is never
# catastrophically wrong; residual on blob/isotropic geometry is the
# measured 0.22→0.13 degradation.
GATE_REF_K = 8


def _centered_energy(cands: DataFrame, cap: int, n: int) -> float:
    """E_ctr = 1 − ||mean(x̂)||² over the bounded training sample of
    candidate UNIT vectors — the centered energy a mean-absorbing
    quantizer must code (the gate's denominator). DETERMINISTIC like
    :func:`_residual_energy`: the ≤2·cap sampled vectors are collected
    and the mean is accumulated driver-side in vec_id order (a
    distributed per-dim avg would sum partials in partition order and
    a float wobble at the threshold must not flip the index layout).
    Empty sample -> 0.0: the ratio gate then reads
    ``anything < RATIO·0`` = False and deterministically selects the
    plain build (same safe direction as the numerator's inf guard)."""
    from .kmeans import train_sample

    rows = (
        train_sample(cands, "vec_id", cap, n=n)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: x.cast("double") / F.sqrt(F.col("norm2")),
            ).alias("u"),
        )
        .collect()
    )
    if not rows:
        return 0.0
    rows.sort(key=lambda r: r["vec_id"])
    dim = len(rows[0]["u"])
    acc = [0.0] * dim
    for r in rows:
        u = r["u"]
        for i in range(dim):
            acc[i] += u[i]
    m = [a / len(rows) for a in acc]
    return 1.0 - sum(x * x for x in m)


def _residual_energy(cand_res: DataFrame, cap: int, n: int) -> float:
    """Mean residual norm² over the bounded training sample —
    DETERMINISTIC: the ≤2·cap per-row energies are collected and
    reduced driver-side in vec_id order (a distributed avg would sum
    partials in partition order, and a run-to-run float wobble at the
    gate threshold must not flip the index layout). ``n`` is the
    caller-known candidate count — counting ``cand_res`` itself would
    run the whole coarse assignment just to size the thinning stride."""
    from .kmeans import train_sample

    rows = (
        train_sample(cand_res, "vec_id", cap, n=n)
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with("embedding", "embedding", lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, p: acc + p,
            ).alias("e"),
        )
        .collect()
    )
    es = [r["e"] for r in sorted(rows, key=lambda r: r["vec_id"])]
    if not es:
        # Empty probe (the caller-supplied n may overestimate the
        # derived frame's true count — the train_sample API permits a
        # near-exact n — or the candidate set is degenerate): fail to
        # the SAFE branch deterministically. inf >= any gate, so the
        # build selects the plain non-residual layout instead of
        # crashing with ZeroDivisionError (round-13 advisory).
        return float("inf")
    return sum(es) / len(es)


def _gate_energies(
    cands: DataFrame, coarse: DataFrame, cap: int, n: int
) -> tuple[float, float]:
    """(E_res, E_ctr) in ONE sample-sized job — the production gate
    probe. Round-13 stage attribution measured the two separate
    collects (:func:`_residual_energy` + :func:`_centered_energy`) at
    ~1.6 s of the residual bench row's 10.9 s; each sampled row can
    carry its residual energy AND its unit vector through the same
    broadcast-join select, so one collect serves both statistics.
    Values are identical to the separate jobs by construction — same
    hash-thinned stride sample (assignment is per-row, so sampling
    before assignment selects the same vec_ids as assigning then
    sampling), same element expressions, same driver-side vec_id-order
    accumulation — pinned by test_fused_gate_equals_separate_probes.
    Empty sample -> (inf, 0.0): the ratio gate deterministically
    selects the plain build (both safe directions)."""
    from .kmeans import train_sample
    from .similarity import _assign_buckets

    cbar = _unit_coarse(coarse)
    samp = _assign_buckets(
        train_sample(cands, "vec_id", cap, n=n), coarse, n_keep=1
    )

    def _res_vec():
        return F.zip_with(
            "embedding",
            "_cbar",
            lambda x, y: x.cast("double") / F.sqrt(F.col("norm2")) - y,
        )

    rows = (
        samp.join(F.broadcast(cbar), "centroid_id")
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(_res_vec(), _res_vec(), lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, p: acc + p,
            ).alias("e"),
            F.transform(
                "embedding",
                lambda x: x.cast("double") / F.sqrt(F.col("norm2")),
            ).alias("u"),
        )
        .collect()
    )
    if not rows:
        return float("inf"), 0.0
    rows.sort(key=lambda r: r["vec_id"])
    e_res = sum(r["e"] for r in rows) / len(rows)
    dim = len(rows[0]["u"])
    acc = [0.0] * dim
    for r in rows:
        u = r["u"]
        for i in range(dim):
            acc[i] += u[i]
    m = [a / len(rows) for a in acc]
    return e_res, 1.0 - sum(x * x for x in m)


def topk_cosine_ivfpq_residual_df(
    emb_raw: DataFrame,
    k_coarse: int = 8,
    k_codes: int = PQ_K,
    nprobe: int = 2,
    max_iters: int = 3,
    force_residual: bool | None = None,
    top_k: int = TOP_K,
    n_total: int | None = None,
) -> DataFrame:
    """IVF-PQ with energy-gated RESIDUAL encoding — full FAISS IVFADC
    (Jégou 2011 §IV: quantize x − q_coarse(x), not x) with a measured
    fallback. This closes :func:`topk_cosine_ivfpq_df`'s documented
    divergence — kept there because residual coupling breaks the
    DuckDB one-shot; this form is the iterative production build
    (pytest-pinned, like the other trained paths).

    Composition: trained coarse centroids (sample-bounded, 256·k rule)
    -> every candidate's residual against its UNIT-normalized list
    centroid (:func:`_residual_frame`, broadcast join, shuffle-free)
    -> the GATE: mean residual energy vs the corpus' centered energy
    on the bounded training sample (:func:`_gate_energies`; ONE
    sample-sized job serving both statistics). Below
    ``RESIDUAL_GATE_RATIO`` of the centered energy the codebooks train
    ON RESIDUALS and the index stores residual codes; at/above it
    residual coding would only add error (measured on the isotropic
    AND the realistic anisotropic-blob fixtures — see the constant's
    derivation table), so the build
    falls back to the plain trained composition — bit-identical to
    :func:`topk_cosine_ivfpq_trained` by construction (same trainer
    calls, same args; pinned by test). ``force_residual`` overrides
    the gate both ways (the tests' regime probe).

    Residual query side: the LUT machinery is unchanged — the codebook
    is shared across lists, so per-(query, list) scores differ only by
    the additive constant dot(q̂, c̄_list) (:func:`_probe_cdots`,
    Q·nprobe rows) and the score is ``round(c_dot + adc_raw, 6)``.
    Same shuffle shape as the non-residual form: one equi-join on
    centroid_id, codes never wider than 8 B + the list id."""
    from ._cachescope import begin_scope, scoped_persist
    from .kmeans import TRAIN_POINTS_PER_CENTROID, centroids_df, kmeans_fit
    from .similarity import _assign_buckets

    spark = emb_raw.sparkSession
    # ONE pruned count of the raw table sizes every thinning stride in
    # the build (coarse fit, energy probe, codebook fit) — the derived
    # frames' own counts would re-run the coarse assignment. Callers
    # holding a cheaper count (the wrapper's unspread bare scan) pass it.
    if n_total is None:
        n_total = emb_raw.select("vec_id").count()
    n_cand = n_total - N_QUERIES  # query ids < N_QUERIES by contract
    fitted, _ = kmeans_fit(
        emb_raw,
        k=k_coarse,
        max_iters=max_iters,
        train_sample_rows=TRAIN_POINTS_PER_CENTROID * k_coarse,
        train_sample_n=n_total,
    )
    coarse = centroids_df(spark, fitted).withColumn(
        "c_n2", _norm2("centroid_vec")
    )
    emb = (
        emb_raw
        if "norm2" in emb_raw.columns
        else emb_raw.withColumn("norm2", _norm2("embedding"))
    )

    cb_cap = TRAIN_POINTS_PER_CENTROID * k_codes
    if force_residual is None:
        # relative gate (round 13, see RESIDUAL_GATE_RATIO): ONE
        # sample-sized driver-side reduction serving both statistics —
        # residual energy vs the corpus' centered energy, ALWAYS
        # measured against GATE_REF_K reference centroids (a corpus
        # multi-modality statistic, decoupled from the build's
        # k_coarse — see the constant's derivation). At the default
        # k_coarse the build's own coarse fit IS the reference; a
        # non-default build pays one extra sample-bounded fit.
        if k_coarse == GATE_REF_K:
            gate_coarse = coarse
        else:
            ref_fitted, _ = kmeans_fit(
                emb_raw,
                k=GATE_REF_K,
                max_iters=max_iters,
                train_sample_rows=TRAIN_POINTS_PER_CENTROID * GATE_REF_K,
                train_sample_n=n_total,
            )
            gate_coarse = centroids_df(spark, ref_fitted).withColumn(
                "c_n2", _norm2("centroid_vec")
            )
        e_res, e_ctr = _gate_energies(
            emb.filter(F.col("vec_id") >= N_QUERIES),
            gate_coarse,
            cb_cap,
            n=n_cand,
        )
        use_residual = e_res < RESIDUAL_GATE_RATIO * e_ctr
    else:
        use_residual = force_residual

    if not use_residual:
        books = pq_train_fused(
            emb_raw,
            m=PQ_M,
            k=k_codes,
            max_iters=max_iters,
            train_sample_rows=cb_cap,
            train_sample_n=n_total,
        )
        return topk_cosine_ivfpq_df(
            emb,
            coarse,
            pq_codebook_from_trained(spark, books),
            nprobe=nprobe,
            top_k=top_k,
        )

    cbar = _unit_coarse(coarse)
    cand_res = _residual_frame(
        _assign_buckets(
            emb.filter(F.col("vec_id") >= N_QUERIES), coarse, n_keep=1
        ),
        cbar,
    )
    books = pq_train_fused(
        cand_res,
        m=PQ_M,
        k=k_codes,
        max_iters=max_iters,
        train_sample_rows=cb_cap,
        train_sample_n=n_cand,
    )
    codebook = pq_codebook_from_trained(spark, books)

    begin_scope("ivfpq_res")
    index = scoped_persist(
        "ivfpq_res", pq_encode(cand_res, codebook, keep=("centroid_id",))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        _nrm(emb, "embedding").alias("_nrm"),
    )
    probes = _assign_buckets(
        emb.filter(F.col("vec_id") < N_QUERIES), coarse, n_keep=nprobe
    )
    probe_luts = _probe_cdots(probes, cbar).join(
        _query_luts(q, codebook), "q_id"
    )
    scored = index.join(F.broadcast(probe_luts), "centroid_id").withColumn(
        "adc", F.round(F.col("c_dot") + _adc_raw(), 6)
    )
    return _rank_topk(scored, top_k)


def topk_cosine_ivfpq_residual(
    spark: SparkSession,
    sf_dir: str,
    k_coarse: int = 8,
    k_codes: int = PQ_K,
    nprobe: int = 2,
    max_iters: int = 3,
) -> DataFrame:
    """Registry/bench wrapper of :func:`topk_cosine_ivfpq_residual_df`
    over the embeddings table. On the isotropic synthetic fixture the
    gate measures residual/centered energy ~1.48/1.0 and selects the
    plain trained build (equality with
    :func:`topk_cosine_ivfpq_trained` pinned by test); on multi-modal
    clustered corpora (ratio under ``RESIDUAL_GATE_RATIO``) it selects
    residual codes."""
    from ..sources.readers import load_table

    return topk_cosine_ivfpq_residual_df(
        load_table(spark, sf_dir, "embeddings"),
        k_coarse=k_coarse,
        k_codes=k_codes,
        nprobe=nprobe,
        max_iters=max_iters,
        n_total=(
            load_table(spark, sf_dir, "embeddings", spread=False)
            .select("vec_id")
            .count()
        ),
    )


# ------------------------- SQ8 scalar quantization -------------------------

SQ8_LEVELS = 255  # 8-bit codes: 256 levels, max code 255 (FAISS SQ8)


def topk_cosine_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-k cosine — the third compression
    family member, filling the tradeoff gap between the exact index
    (256 B/vector) and PQ (8 B/vector, 32x, modest recall): one
    8-bit code PER DIMENSION (64 B/vector, 4x) quantized against
    per-dim [min, max] over the candidate unit vectors — FAISS's
    ScalarQuantizer QT_8bit. Unlike PQ the build is a ONE-SHOT
    deterministic computation (per-dim min/max + a rounding
    projection, no Lloyd's), so this form IS DuckDB-expressible and
    oracle-checked (``TOPK_COSINE_SQ8_SQL``) — the family's only
    trained-free high-recall compressed index.

    Score decomposition keeps scoring LUT-free and never re-touches
    the min/max arrays per pair::

        dot(q̂, dequant(c)) = Σ q̂_d·(mn_d + c_d·step_d)
                           = Σ q̂_d·mn_d  +  Σ (q̂_d·step_d)·c_d
                             \\_ qconst _/    \\_ w_d (per query) _/

    so a (query, candidate) pair costs one 64-term fold over int
    codes — same shape as the PQ ADC fold, with the per-query
    (qconst, w) row broadcast like the PQ LUT. FP-lockstep with the
    oracle: min/max are EXACT (no accumulation), the encode rounding
    is HALF_UP on non-negative values in both engines, and every
    chain (qconst, w, w·c fold) is left-associated with
    multiplications grouped identically.

    Scale shape: one tiny exchange (64-group min/max partial agg,
    64·2 doubles to the driver — a bounded sync point), then encode
    and scoring are pure broadcast projections; the only corpus-sized
    shuffle is the shared top-k rank window."""
    from ..sources.readers import load_table

    return topk_cosine_sq8_df(load_table(spark, sf_dir, "embeddings"))


def topk_cosine_sq8_df(emb: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """DF-level SQ8 core over any (vec_id, embedding) frame — extracted
    round 13 so the realistic-fixture quality tests drive the SAME
    build/score path the table wrapper ships (the labelqa
    ``knn_label_noise_df`` device)."""
    base = emb.select(
        "vec_id", "embedding", _nrm(emb, "embedding").alias("_nrm")
    )
    cands = base.filter(F.col("vec_id") >= N_QUERIES)
    mm_df = _sq8_mm_df(cands)
    enc = _sq8_encode(cands, mm_df)
    q = _sq8_query_weights(
        base.filter(F.col("vec_id") < N_QUERIES), mm_df
    )
    scored = enc.crossJoin(F.broadcast(q)).withColumn(
        "adc", _sq8_adc_col()
    )
    return _rank_topk(scored, top_k)


def _sq8_mm_df(cands: DataFrame) -> DataFrame:
    """One-row (mn, mx)-per-dim frame over the candidate unit vectors
    (``cands`` carries ``_nrm``). min/max are EXACT (no FP
    accumulation), so the 64-group partial agg matches the oracle's
    bit-for-bit; the 64·2 doubles land driver-side — a bounded sync
    point like the k-means centroid collects."""
    mm_rows = (
        cands.select(
            F.col("_nrm"), F.posexplode("embedding").alias("pos", "x")
        )
        .select(
            "pos", (F.col("x").cast("double") / F.col("_nrm")).alias("v")
        )
        .groupBy("pos")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    mm = [(float(r["mn"]), float(r["mx"])) for r in
          sorted(mm_rows, key=lambda r: r["pos"])]
    from .util import driver_rows_df

    return driver_rows_df(
        cands.sparkSession,
        [(mm,)],
        "_mm ARRAY<STRUCT<mn: DOUBLE, mx: DOUBLE>>",
    )


def _sq8_encode(
    cands: DataFrame, mm_df: DataFrame, keep: tuple[str, ...] = ()
) -> DataFrame:
    """(vec_id, *keep, codes): the SQ8 rounding projection. The
    per-dim CASE keeps a degenerate dim (mx == mn) at code 0 instead
    of a 0/0 NaN; values are >= 0 so HALF_UP == half-away (the DuckDB
    round) by construction."""
    return cands.crossJoin(F.broadcast(mm_df)).select(
        "vec_id",
        *keep,
        F.zip_with(
            "embedding",
            "_mm",
            lambda x, m: F.when(
                m["mx"] > m["mn"],
                F.round(
                    F.lit(255.0)
                    * (x.cast("double") / F.col("_nrm") - m["mn"])
                    / (m["mx"] - m["mn"]),
                    0,
                ).cast("int"),
            ).otherwise(F.lit(0)),
        ).alias("codes"),
    )


def _sq8_query_weights(q_base: DataFrame, mm_df: DataFrame) -> DataFrame:
    """(q_id, qconst, w): the per-query half of the score
    decomposition (see :func:`topk_cosine_sq8`); ``q_base`` carries
    ``_nrm``."""
    return q_base.crossJoin(F.broadcast(mm_df)).select(
        F.col("vec_id").alias("q_id"),
        F.aggregate(
            F.zip_with(
                "embedding",
                "_mm",
                lambda x, m: (x.cast("double") / F.col("_nrm")) * m["mn"],
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("qconst"),
        F.zip_with(
            "embedding",
            "_mm",
            lambda x, m: (x.cast("double") / F.col("_nrm"))
            * ((m["mx"] - m["mn"]) / F.lit(255.0)),
        ).alias("w"),
    )


def _sq8_adc_col():
    """round(qconst + Σ w_d·c_d, 6) — the fold mirrors the oracle's
    explicit left-associated chain."""
    return F.round(
        F.col("qconst")
        + F.aggregate(
            F.zip_with("codes", "w", lambda c, wv: wv * c),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ),
        6,
    )


def topk_cosine_ivfsq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF inverted lists + SQ8 codes — the compression family's
    high-recall PRUNED composition. Same shuffle shape as
    :func:`topk_cosine_ivfpq` (broadcast-HOF list assignment, one
    equi-join on centroid_id at query time), but the payload is SQ8's
    64 one-byte codes instead of PQ's 8 — 4x compression at the flat
    form's near-exact recall, with the scoring join touching only
    ~N·nprobe/K code rows per query. Coarse centroids are the FIXED
    deterministic ``similarity.IVF_CENTROID_IDS`` pick and the SQ8
    build is one-shot, so unlike IVF+PQ-trained this composition is
    fully DuckDB-expressible end-to-end and oracle-checked
    (``TOPK_COSINE_IVFSQ8_SQL``, bit-exact)."""
    from ..sources.readers import load_table
    from .similarity import (
        IVF_CENTROID_IDS,
        NPROBE,
        _assign_buckets,
        _emb_normed,
    )

    emb = _emb_normed(spark, sf_dir)
    coarse = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .filter(F.col("vec_id").isin(IVF_CENTROID_IDS))
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid_vec"),
            _norm2("embedding").alias("c_n2"),
        )
    )
    base = emb.select(
        "vec_id", "embedding", _nrm(emb, "embedding").alias("_nrm")
    )
    cands = base.filter(F.col("vec_id") >= N_QUERIES)
    mm_df = _sq8_mm_df(cands)
    assigned = _assign_buckets(
        emb.filter(F.col("vec_id") >= N_QUERIES), coarse, n_keep=1
    ).select(
        "vec_id",
        "embedding",
        F.sqrt("norm2").alias("_nrm"),
        "centroid_id",
    )
    enc = _sq8_encode(assigned, mm_df, keep=("centroid_id",))
    probes = _assign_buckets(
        emb.filter(F.col("vec_id") < N_QUERIES), coarse, n_keep=NPROBE
    ).select(F.col("vec_id").alias("q_id"), "centroid_id")
    qw = _sq8_query_weights(
        base.filter(F.col("vec_id") < N_QUERIES), mm_df
    )
    scored = enc.join(
        F.broadcast(probes.join(qw, "q_id")), "centroid_id"
    ).withColumn("adc", _sq8_adc_col())
    return _rank_topk(scored, TOP_K)


def _topk_cosine_sq8_sql() -> str:
    # every chain mirrors the Spark fold exactly: left-associated, the
    # same multiplication grouping ((q̂·step)·c, not q̂·(step·c))
    code_terms = ", ".join(
        f"CASE WHEN mm.maxs[{i}] > mm.mins[{i}] THEN "
        f"CAST(round(255.0 * (e.nemb[{i}] - mm.mins[{i}])"
        f" / (mm.maxs[{i}] - mm.mins[{i}])) AS INT) ELSE 0 END"
        for i in range(1, DIM + 1)
    )
    const_chain = " + ".join(
        f"q.nemb[{i}] * mm.mins[{i}]" for i in range(1, DIM + 1)
    )
    w_terms = ", ".join(
        f"q.nemb[{i}] * ((mm.maxs[{i}] - mm.mins[{i}]) / 255.0)"
        for i in range(1, DIM + 1)
    )
    wc_chain = " + ".join(
        f"qw.w[{i}] * e.codes[{i}]" for i in range(1, DIM + 1)
    )
    return f"""
WITH enorm AS MATERIALIZED ({_unit_sql()}),
dims AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, {DIM}) t(i)),
mm AS MATERIALIZED (
  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM (
    SELECT d.i AS i, min(e.nemb[d.i]) AS mn, max(e.nemb[d.i]) AS mx
    FROM enorm e CROSS JOIN dims d
    WHERE e.vec_id >= {N_QUERIES}
    GROUP BY d.i
  )
),
enc AS MATERIALIZED (
  SELECT e.vec_id, [{code_terms}] AS codes
  FROM enorm e CROSS JOIN mm WHERE e.vec_id >= {N_QUERIES}
),
qw AS MATERIALIZED (
  SELECT q.vec_id AS q_id, ({const_chain}) AS qconst, [{w_terms}] AS w
  FROM enorm q CROSS JOIN mm WHERE q.vec_id < {N_QUERIES}
)
SELECT q_id, c_id, adc, rn FROM (
  SELECT qw.q_id, e.vec_id AS c_id,
         round(qw.qconst + ({wc_chain}), 6) AS adc,
         row_number() OVER (
           PARTITION BY qw.q_id
           ORDER BY round(qw.qconst + ({wc_chain}), 6) DESC, e.vec_id
         ) AS rn
  FROM enc e CROSS JOIN qw
) WHERE rn <= {TOP_K} ORDER BY q_id, rn
"""


TOPK_COSINE_SQ8_SQL = _topk_cosine_sq8_sql()


def _topk_cosine_ivfsq8_sql() -> str:
    """IVF cand/qprobe CTEs from the IVFPQ twin + the SQ8 scoring
    CTEs — the coarse ranking is the same rounded cosine over raw
    embeddings `_assign_buckets` computes."""
    from .similarity import IVF_CENTROID_IDS, NPROBE, _cosine_sql

    ivf_ids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    cos_c = _cosine_sql("e.embedding", "c.embedding")
    code_terms = ", ".join(
        f"CASE WHEN mm.maxs[{i}] > mm.mins[{i}] THEN "
        f"CAST(round(255.0 * (e.nemb[{i}] - mm.mins[{i}])"
        f" / (mm.maxs[{i}] - mm.mins[{i}])) AS INT) ELSE 0 END"
        for i in range(1, DIM + 1)
    )
    const_chain = " + ".join(
        f"q.nemb[{i}] * mm.mins[{i}]" for i in range(1, DIM + 1)
    )
    w_terms = ", ".join(
        f"q.nemb[{i}] * ((mm.maxs[{i}] - mm.mins[{i}]) / 255.0)"
        for i in range(1, DIM + 1)
    )
    wc_chain = " + ".join(
        f"qw.w[{i}] * e.codes[{i}]" for i in range(1, DIM + 1)
    )
    return f"""
WITH enorm AS MATERIALIZED ({_unit_sql()}),
coarse AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id IN ({ivf_ids})
),
dims AS (SELECT CAST(i AS INT) AS i FROM generate_series(1, {DIM}) t(i)),
mm AS MATERIALIZED (
  SELECT list(mn ORDER BY i) AS mins, list(mx ORDER BY i) AS maxs FROM (
    SELECT d.i AS i, min(e.nemb[d.i]) AS mn, max(e.nemb[d.i]) AS mx
    FROM enorm e CROSS JOIN dims d
    WHERE e.vec_id >= {N_QUERIES}
    GROUP BY d.i
  )
),
cand AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_c} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN coarse c WHERE e.vec_id >= {N_QUERIES}
  ) WHERE crn = 1
),
enc AS MATERIALIZED (
  SELECT e.vec_id, a.centroid_id, [{code_terms}] AS codes
  FROM enorm e JOIN cand a ON a.vec_id = e.vec_id CROSS JOIN mm
),
qprobe AS (
  SELECT vec_id AS q_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_c} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN coarse c WHERE e.vec_id < {N_QUERIES}
  ) WHERE crn <= {NPROBE}
),
qw AS MATERIALIZED (
  SELECT q.vec_id AS q_id, ({const_chain}) AS qconst, [{w_terms}] AS w
  FROM enorm q CROSS JOIN mm WHERE q.vec_id < {N_QUERIES}
)
SELECT q_id, c_id, adc, rn FROM (
  SELECT qw.q_id, e.vec_id AS c_id,
         round(qw.qconst + ({wc_chain}), 6) AS adc,
         row_number() OVER (
           PARTITION BY qw.q_id
           ORDER BY round(qw.qconst + ({wc_chain}), 6) DESC, e.vec_id
         ) AS rn
  FROM enc e JOIN qprobe p USING (centroid_id) JOIN qw ON qw.q_id = p.q_id
) WHERE rn <= {TOP_K} ORDER BY q_id, rn
"""


TOPK_COSINE_IVFSQ8_SQL = _topk_cosine_ivfsq8_sql()


def _sub_dot_sql(q: str, v: str, s: str) -> str:
    """Explicit 8-term left-associated chain: dot of the query's
    subspace-``s`` slice with an 8-dim codebook entry."""
    return " + ".join(
        f"{q}[{s}*{PQ_SUB}+{i}] * {v}[{i}]"
        for i in range(1, PQ_SUB + 1)
    )


def _sub_sqdist_sql(e: str, v: str, s: str) -> str:
    return " + ".join(
        f"({e}[{s}*{PQ_SUB}+{i}] - {v}[{i}])"
        f" * ({e}[{s}*{PQ_SUB}+{i}] - {v}[{i}])"
        for i in range(1, PQ_SUB + 1)
    )


def _topk_cosine_pq_sql() -> str:
    ids = ", ".join(str(i) for i in PQ_CODE_IDS)
    ids_list = "[" + ids + "]"
    # score: m=8 lookups added in subspace order, left-associated —
    # lockstep with the Spark aggregate fold (0.0 + t1 == t1 exactly)
    score = " + ".join(
        f"l.lp[{s}*{PQ_K} + e.codes[{s + 1}] + 1]" for s in range(PQ_M)
    )
    return f"""
WITH enorm AS MATERIALIZED ({_unit_sql()}),
sub AS (SELECT CAST(s AS INT) AS s FROM generate_series(0, {PQ_M - 1}) AS t(s)),
cb AS MATERIALIZED (
  SELECT t.s, CAST(list_position({ids_list}, e.vec_id) - 1 AS INT) AS j,
         e.nemb[t.s*{PQ_SUB}+1 : t.s*{PQ_SUB}+{PQ_SUB}] AS v
  FROM enorm e CROSS JOIN sub t WHERE e.vec_id IN ({ids})
),
enc AS MATERIALIZED (
  SELECT vec_id, list(j ORDER BY s) AS codes FROM (
    SELECT e.vec_id, t.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, t.s
             ORDER BY {_sub_sqdist_sql('e.nemb', 'c.v', 't.s')}, c.j
           ) AS rn
    FROM enorm e CROSS JOIN sub t JOIN cb c ON c.s = t.s
    WHERE e.vec_id >= {N_QUERIES}
  ) WHERE rn = 1 GROUP BY vec_id
),
lut AS MATERIALIZED (
  SELECT q_id, list(p ORDER BY s, j) AS lp FROM (
    SELECT q.vec_id AS q_id, t.s, c.j,
           {_sub_dot_sql('q.nemb', 'c.v', 't.s')} AS p
    FROM enorm q CROSS JOIN sub t JOIN cb c ON c.s = t.s
    WHERE q.vec_id < {N_QUERIES}
  ) GROUP BY q_id
)
SELECT q_id, c_id, adc, rn FROM (
  SELECT l.q_id, e.vec_id AS c_id, round({score}, 6) AS adc,
         row_number() OVER (
           PARTITION BY l.q_id ORDER BY round({score}, 6) DESC, e.vec_id
         ) AS rn
  FROM enc e CROSS JOIN lut l
) WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


TOPK_COSINE_PQ_SQL = _topk_cosine_pq_sql()

TOPK_COSINE_PQ_TRAINED_ORACLE_SQL = _topk_cosine_pq_trained_oracle_sql()


def _topk_cosine_ivfpq_sql() -> str:
    from .similarity import IVF_CENTROID_IDS, NPROBE, _cosine_sql

    ivf_ids = ", ".join(str(i) for i in IVF_CENTROID_IDS)
    ids = ", ".join(str(i) for i in PQ_CODE_IDS)
    ids_list = "[" + ids + "]"
    cos_c = _cosine_sql("e.embedding", "c.embedding")
    score = " + ".join(
        f"l.lp[{s}*{PQ_K} + e.codes[{s + 1}] + 1]" for s in range(PQ_M)
    )
    return f"""
WITH enorm AS MATERIALIZED ({_unit_sql()}),
coarse AS (
  SELECT vec_id AS centroid_id, embedding FROM embeddings
  WHERE vec_id IN ({ivf_ids})
),
sub AS (SELECT CAST(s AS INT) AS s FROM generate_series(0, {PQ_M - 1}) AS t(s)),
cb AS MATERIALIZED (
  SELECT t.s, CAST(list_position({ids_list}, e.vec_id) - 1 AS INT) AS j,
         e.nemb[t.s*{PQ_SUB}+1 : t.s*{PQ_SUB}+{PQ_SUB}] AS v
  FROM enorm e CROSS JOIN sub t WHERE e.vec_id IN ({ids})
),
cand AS (
  SELECT vec_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_c} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN coarse c WHERE e.vec_id >= {N_QUERIES}
  ) WHERE crn = 1
),
enc AS MATERIALIZED (
  SELECT vec_id, centroid_id, list(j ORDER BY s) AS codes FROM (
    SELECT e.vec_id, a.centroid_id, t.s, c.j,
           row_number() OVER (
             PARTITION BY e.vec_id, t.s
             ORDER BY {_sub_sqdist_sql('e.nemb', 'c.v', 't.s')}, c.j
           ) AS rn
    FROM enorm e JOIN cand a ON a.vec_id = e.vec_id
    CROSS JOIN sub t JOIN cb c ON c.s = t.s
  ) WHERE rn = 1 GROUP BY vec_id, centroid_id
),
qprobe AS (
  SELECT vec_id AS q_id, centroid_id FROM (
    SELECT e.vec_id, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos_c} DESC, c.centroid_id) AS crn
    FROM embeddings e CROSS JOIN coarse c WHERE e.vec_id < {N_QUERIES}
  ) WHERE crn <= {NPROBE}
),
lut AS MATERIALIZED (
  SELECT q_id, list(p ORDER BY s, j) AS lp FROM (
    SELECT q.vec_id AS q_id, t.s, c.j,
           {_sub_dot_sql('q.nemb', 'c.v', 't.s')} AS p
    FROM enorm q CROSS JOIN sub t JOIN cb c ON c.s = t.s
    WHERE q.vec_id < {N_QUERIES}
  ) GROUP BY q_id
)
SELECT q_id, c_id, adc, rn FROM (
  SELECT l.q_id, e.vec_id AS c_id, round({score}, 6) AS adc,
         row_number() OVER (
           PARTITION BY l.q_id ORDER BY round({score}, 6) DESC, e.vec_id
         ) AS rn
  FROM enc e JOIN qprobe p USING (centroid_id) JOIN lut l ON l.q_id = p.q_id
) WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


TOPK_COSINE_IVFPQ_SQL = _topk_cosine_ivfpq_sql()


# ----------------- OPQ (optimized product quantization) -------------------

OPQ_ITERS = 8  # alternating-minimization rounds for the rotation


def opq_rotation(
    emb: DataFrame,
    cap: int,
    n: int,
    m: int = PQ_M,
    k: int = PQ_K,
    opq_iters: int = OPQ_ITERS,
    dim: int = DIM,
) -> list[list[float]]:
    """Train the OPQ orthogonal rotation R (Ge et al., CVPR 2013 — the
    construction behind FAISS's OPQMatrix) on the bounded training
    sample, driver-side: alternate (a) per-subspace Lloyd's codebooks
    on the rotated sample with (b) the orthogonal-Procrustes update
    R = U·Vᵀ from SVD(Xᵀ·Y), Y the sample's codebook reconstruction.
    The rotation redistributes variance so the m INDEPENDENT subspace
    codebooks absorb less error at the same bit budget.

    Driver cost is bounded: the hash-thinned sample is ≤2·cap rows ×
    DIM doubles (the same bounded-sync-point class as the centroid /
    codebook collects), and the numpy loop touches only that sample.
    DETERMINISTIC: sample collected and processed in vec_id order,
    stride-init Lloyd, LAPACK SVD on identical input. Empty sample ->
    identity (OPQ degrades to plain PQ, the safe no-op)."""
    import numpy as np

    from .kmeans import train_sample

    rows = (
        train_sample(emb, "vec_id", cap, n=n)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: x.cast("double") / F.col("_nrm"),
            ).alias("u"),
        )
        .collect()
    )
    if not rows:
        # ``dim`` sizes the identity no-op; callers with a non-DIM
        # corpus must pass their dimension or the rotation would be
        # shape-mismatched in _rotated_frame (round-13 advisory)
        return [
            [1.0 if i == j else 0.0 for j in range(dim)]
            for i in range(dim)
        ]
    rows.sort(key=lambda r: r["vec_id"])
    x = np.array([r["u"] for r in rows], dtype=np.float64)
    d = x.shape[1]
    sub = d // m

    def _dists(xs: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
        # per-centroid slices, NOT the (n, k, sub) broadcast: identical
        # per-(row, j) reduction tree (bit-equal distances — pinned by
        # the r15 A/B), ~10x faster for skipping the rank-3 temporary
        d_ = np.empty((xs.shape[0], c.shape[0]))
        for j in range(c.shape[0]):
            d_[:, j] = ((xs - c[j]) ** 2).sum(1)
        return d_

    def _lloyd(xs: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
        # stride init (the hash-bucket pick's numpy analog), 6 rounds —
        # this trains only the ROTATION; the shipped codebooks come
        # from the standard distributed trainer on the rotated frame.
        # Returns (centroids, final assignment): the caller previously
        # recomputed the last assignment with an identical distance
        # pass — one of seven paid twice (r15).
        idx = (np.arange(k) * max(len(xs) // k, 1)) % len(xs)
        c = xs[idx].copy()
        for _ in range(6):
            a = _dists(xs, c).argmin(1)
            for j in range(k):
                msk = a == j
                if msk.any():
                    c[j] = xs[msk].mean(0)
        return c, _dists(xs, c).argmin(1)

    r = np.eye(d)
    for _ in range(opq_iters):
        xr = x @ r
        # start from xr, not empty: when d % m != 0 the tail columns
        # beyond m·sub are never quantized below — copying keeps them
        # "perfectly reconstructed" (deterministic, biases R to leave
        # them alone) instead of feeding uninitialized memory to the
        # SVD (round-13 advisory; unreachable at the shipped DIM=64,
        # m=8, but the determinism contract must not depend on that)
        y = xr.copy()
        for s in range(m):
            xs = xr[:, s * sub:(s + 1) * sub]
            c, a = _lloyd(xs)
            y[:, s * sub:(s + 1) * sub] = c[a]
        u, _sv, vt = np.linalg.svd(x.T @ y)
        r = u @ vt
    return [[float(v) for v in row] for row in r]


def _rotated_frame(emb: DataFrame, rot: list[list[float]]) -> DataFrame:
    """(vec_id, embedding = x̂·R, norm2 = 1.0): the TRANSPOSED rotation
    travels as one broadcast array-of-columns row; output dim i is one
    DIM-term fold dot(x̂, R[:,i]) — DIM JVM-side folds per vector inside
    the scan stage, shuffle-free (the ``_residual_frame`` device; the
    HOF over the column array is ONE expression, not DIM unrolled
    ones, so codegen stays flat). ``norm2`` pinned to 1.0: R is
    orthogonal, rotation preserves the unit norm (pinned by test), and
    downstream ``_nrm`` reuses a present norm2 column."""
    spark = emb.sparkSession
    dim = len(rot)
    cols = [
        [float(rot[jj][ii]) for jj in range(dim)] for ii in range(dim)
    ]
    from .util import driver_rows_df

    rt_df = driver_rows_df(spark, [(cols,)], "_rt ARRAY<ARRAY<DOUBLE>>")
    base = emb.select(
        "vec_id", "embedding", _nrm(emb, "embedding").alias("_nrm")
    )
    return base.crossJoin(F.broadcast(rt_df)).select(
        "vec_id",
        F.transform(
            "_rt",
            lambda col: F.aggregate(
                F.zip_with(
                    "embedding",
                    col,
                    lambda x, rc: (x.cast("double") / F.col("_nrm")) * rc,
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        ).alias("embedding"),
        F.lit(1.0).alias("norm2"),
    )


def topk_cosine_opq_trained(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    k_codes: int = PQ_K,
    opq_iters: int = OPQ_ITERS,
    max_iters: int = 3,
    top_k: int = TOP_K,
) -> DataFrame:
    """OPQ top-k cosine — PQ behind a trained orthogonal rotation
    (Ge et al. 2013; FAISS ``OPQMatrix`` + PQ), completing the FAISS
    quantization family next to PQ / IVF+PQ / residual IVFADC / SQ8.
    Ranking is exactly dot-preserving (R orthogonal:
    dot(q̂R, x̂R) = dot(q̂, x̂)), so the rotation changes ONLY where the
    quantization error lands. Measured engine recall@5 at the same 32×
    compression (sf0.001): 0.30 vs plain PQ-trained's 0.29 on the
    isotropic table, 0.32 vs 0.29 on the realistic hashed-BoW fixture
    — modest consistent gains plus the structural NO-HARM invariant
    (orthogonality means OPQ can never rank worse than its own
    identity-rotation special case, up to trainer noise; both pinned
    in tests/test_pq_opq.py). FAISS ships the same construction as the
    default pretransform for exactly this reason: cheap, never harmful,
    occasionally decisive on covariance-skewed corpora.

    Composition: driver-side bounded-sample alternating minimization
    for R (:func:`opq_rotation`) -> broadcast rotation projection
    (:func:`_rotated_frame`, shuffle-free) -> the standard fused
    distributed codebook trainer on the ROTATED frame -> the standard
    PQ encode/ADC/rank path. Deterministic but iterative, hence
    pytest-pinned like the other trained paths."""
    from ..sources.readers import load_table
    from .kmeans import TRAIN_POINTS_PER_CENTROID

    emb = load_table(spark, sf_dir, "embeddings")
    n_total = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .select("vec_id")
        .count()
    )
    cap = TRAIN_POINTS_PER_CENTROID * k_codes
    base = emb.select(
        "vec_id", "embedding", _nrm(emb, "embedding").alias("_nrm")
    )
    rot = opq_rotation(
        base, cap, n_total, m=m, k=k_codes, opq_iters=opq_iters
    )
    rotated = _rotated_frame(emb, rot)
    books = pq_train_fused(
        rotated,
        m=m,
        k=k_codes,
        max_iters=max_iters,
        train_sample_rows=cap,
        train_sample_n=n_total,
    )
    return topk_cosine_pq_df(
        rotated, pq_codebook_from_trained(spark, books), top_k=top_k
    )


def topk_cosine_opq_ivfpq_trained(
    spark: SparkSession,
    sf_dir: str,
    m: int = PQ_M,
    k_coarse: int = 8,
    k_codes: int = PQ_K,
    nprobe: int = 2,
    opq_iters: int = OPQ_ITERS,
    max_iters: int = 3,
    top_k: int = TOP_K,
) -> DataFrame:
    """OPQ + IVF + PQ — FAISS's canonical production index string
    (``OPQ{m},IVF{K},PQ{m}``): the trained rotation in front of the
    fully-trained inverted-list PQ composition. Everything downstream
    of the rotation IS the existing machinery on the rotated frame
    (coarse Lloyd fit, fused codebooks, centroid_id-equi-join ADC
    scoring), and the rotation is dot-preserving, so the composition's
    plan shape and scale story are exactly
    :func:`topk_cosine_ivfpq_trained`'s plus one broadcast projection.
    Pytest-pinned (iterative) like every trained path
    (tests/test_pq_opq.py: no-harm vs plain IVF+PQ-trained at equal
    budget on both fixtures)."""
    from ..sources.readers import load_table
    from .kmeans import (
        TRAIN_POINTS_PER_CENTROID,
        centroids_df,
        kmeans_fit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_total = (
        load_table(spark, sf_dir, "embeddings", spread=False)
        .select("vec_id")
        .count()
    )
    cap = TRAIN_POINTS_PER_CENTROID * k_codes
    base = emb.select(
        "vec_id", "embedding", _nrm(emb, "embedding").alias("_nrm")
    )
    rot = opq_rotation(
        base, cap, n_total, m=m, k=k_codes, opq_iters=opq_iters
    )
    rotated = _rotated_frame(emb, rot)
    fitted, _ = kmeans_fit(
        rotated,
        k=k_coarse,
        max_iters=max_iters,
        train_sample_rows=TRAIN_POINTS_PER_CENTROID * k_coarse,
        train_sample_n=n_total,
    )
    coarse = centroids_df(spark, fitted).withColumn(
        "c_n2", _norm2("centroid_vec")
    )
    books = pq_train_fused(
        rotated,
        m=m,
        k=k_codes,
        max_iters=max_iters,
        train_sample_rows=cap,
        train_sample_n=n_total,
    )
    return topk_cosine_ivfpq_df(
        rotated,
        coarse,
        pq_codebook_from_trained(spark, books),
        nprobe=nprobe,
        top_k=top_k,
    )
