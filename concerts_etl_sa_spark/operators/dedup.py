"""Deduplication operators over ``documents`` (SURVEY §2.L1).

Generalizes the reference's fuzzy-matching theme (D2/D6 token-overlap and
similarity joins, concerts_etl/core/consolidate_events.py:91-104 /
matching.py:65-79) to training-data-pipeline scale:

- exact dedup        : content-hash groupBy, keep min doc_id
- MinHash + LSH      : k hash functions over 3-word shingles, banded into
                       LSH buckets; candidate pairs share >=1 bucket; then
                       exact Jaccard verify >= threshold
- SimHash            : 60-bit per-bit-vote signature; near-dup = small
                       hamming distance among candidates sharing a
                       15-bit block (classic 4-block simhash blocking)
- n-gram Jaccard     : exact shingle-set Jaccard on LSH candidates

Scale design (100 TB): every pairwise op is blocked — LSH band buckets or
signature bytes are the equi-keys the pair join shuffles on, so candidate
counts stay near-linear; no unbounded cross joins (SURVEY §4 rule). The
hash family is md5-based (seeded by concat) so the DuckDB oracle computes
identical signatures; a production deployment would swap in xxhash64 for
speed without changing the shape.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ._cachescope import begin_scope, scoped_persist
from .util import capped_candidates, sorted_small

N_MINHASH = 8          # minhash signature length
N_BANDS = 4            # LSH bands (2 rows per band)
ROWS_PER_BAND = N_MINHASH // N_BANDS
JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 6

# 60-bit simhash (15 hex chars of md5: the widest width whose unsigned
# value still fits a SIGNED BIGINT in both engines), blocked as 4 x
# 15-bit for candidate generation. Width is the simhash scale dial: the
# block-key space is SIMHASH_BLOCKS << SIMHASH_BLOCK_BITS buckets, and
# every bucket self-joins — the previous 32-bit/8-bit-block form had
# only 4*256 = 1024 buckets TOTAL, so at corpus scale every bucket held
# ~N/1024 docs and the join was effectively quadratic. 4*32768 buckets
# pushes that ceiling up 128x; widen further (multi-table 64-bit via
# two 30-bit halves) before it binds again.
SIMHASH_BITS = 60
SIMHASH_BLOCKS = 4
SIMHASH_BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS
_SIMHASH_HEX = SIMHASH_BITS // 4
_SIMHASH_BLOCK_MASK = (1 << SIMHASH_BLOCK_BITS) - 1


def _tokens(c):
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def _tokens_sql(e: str) -> str:
    return f"list_filter(string_split_regex(lower({e}), '\\s+'), t -> t <> '')"


def _shingles(toks):
    """Distinct 3-word shingles (a SET — deliberately unsorted: every
    consumer is order-insensitive (array_min for blocking/minhash,
    intersect/union SIZES for Jaccard), and sorting ~hundreds of strings
    per doc was measured at ~30% of the shingle pass)."""
    raw = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(2), F.lit(1))),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i),
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
        ),
    )
    return F.array_distinct(raw)


def _shingles_sql(toks_e: str) -> str:
    return (
        "list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks_e}) - 2, 1)), "
        f"i -> concat_ws(' ', {toks_e}[i], {toks_e}[i+1], {toks_e}[i+2])))"
    )


def _with_shingles(d: DataFrame) -> DataFrame:
    # STAGED: tokenize materializes as its own column first. HOFs are
    # CodegenFallback, so inlining `_tokens(...)` into the shingle
    # transform re-evaluates the regex split per consuming reference;
    # CollapseProject declines to inline a non-cheap expression
    # referenced more than once, so the two-projection shape sticks and
    # tokenization runs exactly once per row.
    toked = d.select("doc_id", _tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id", _shingles(F.col("toks")).alias("shingles")
    )


def _docs_with_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # repartition BEFORE the md5-heavy shingle/signature projections:
    # the documents file is tiny at test sf (1-2 input splits) but the
    # per-doc hash work is CPU-bound — spread it across all cores first.
    # At 100 TB the scan has natural parallelism and AQE elides the no-op.
    d = load_table(spark, sf_dir, "documents").repartition("doc_id")
    return _with_shingles(d)


_DOCS_SHINGLES_SQL = (
    "SELECT doc_id, "
    + _shingles_sql(_tokens_sql("text"))
    + " AS shingles FROM documents"
)


# ------------------------------------------------------------ exact dedup

def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash dedup: every doc mapped to its group representative
    (min doc_id with identical md5(text)) + group size.

    Group stats via ``groupBy(content_hash)`` + equi-join back, not a
    window over the hash (the duplicate_spans hot-key lesson): a
    corpus-degenerate document duplicated millions of times would land
    every copy in ONE window partition — a single-task straggler with
    no AQE remedy, since skew splitting only exists for joins. The
    aggregate partially combines map-side (a hot hash collapses to one
    row per partition BEFORE the exchange) and AQE skew-join covers the
    join-back's fat side."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.md5("text").alias("content_hash"))
    groups = h.groupBy("content_hash").agg(
        F.min("doc_id").alias("representative_id"),
        F.count(F.lit(1)).alias("group_size"),
    ).withColumnRenamed("content_hash", "g_hash")
    # NULL-SAFE join back: md5(NULL text) is NULL, and a plain equi-join
    # would silently drop every null-text doc (groupBy keeps NULL as a
    # key; the window form and the DuckDB twin both group them together)
    return (
        h.join(groups, h["content_hash"].eqNullSafe(groups["g_hash"]))
        .select(
            "doc_id",
            "content_hash",
            "representative_id",
            "group_size",
            (F.col("doc_id") != F.col("representative_id")).alias(
                "is_duplicate"
            ),
        )
    )


EXACT_DEDUP_SQL = """
SELECT doc_id, content_hash,
       min(doc_id) OVER w AS representative_id,
       count(*) OVER w AS group_size,
       doc_id <> min(doc_id) OVER w AS is_duplicate
FROM (SELECT doc_id, md5(text) AS content_hash FROM documents)
WINDOW w AS (PARTITION BY content_hash)
"""


def exact_dedup_selfunion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over documents UNION ALL documents — every text appears
    twice, so the collapse is actually exercised (the raw table has no
    exact duplicates at any sf). Output: one row per content group."""
    d = load_table(spark, sf_dir, "documents")
    both = d.select("doc_id", "text").unionAll(
        d.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    return (
        both.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("representative_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


EXACT_DEDUP_SELFUNION_SQL = """
SELECT md5(text) AS content_hash,
       min(doc_id) AS representative_id,
       count(*) AS group_size
FROM (SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents)
GROUP BY md5(text)
ORDER BY representative_id
"""


# ------------------------------------------------------- minhash signature

def _seeded_md5(j):
    # factory closure: a default-arg lambda (s, j=j) would be mis-read by
    # F.transform as an (element, index) two-parameter lambda
    return lambda s: F.md5(F.concat(F.lit(f"{j}:"), s))


def _minhash_exprs(shingles):
    """N_MINHASH min-hash EXPRESSIONS: min over shingles of
    md5(seed || shingle) — the single definition of the minhash formula
    (both the column-aliased signature frames and the stored
    index-on-write fingerprints derive from it)."""
    return [
        F.array_min(F.transform(shingles, _seeded_md5(j)))
        for j in range(N_MINHASH)
    ]


def _minhash_cols(shingles):
    """N_MINHASH min-hashes as aliased mh{j} columns."""
    return [
        e.alias(f"mh{j}") for j, e in enumerate(_minhash_exprs(shingles))
    ]


def _minhash_cols_sql(sh_e: str) -> list[str]:
    return [
        f"list_min(list_transform({sh_e}, s -> md5('{j}:' || s))) AS mh{j}"
        for j in range(N_MINHASH)
    ]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    ds = _docs_with_shingles(spark, sf_dir)
    return ds.select("doc_id", *_minhash_cols(F.col("shingles")))


MINHASH_SIGNATURES_SQL = (
    "SELECT doc_id, "
    + ", ".join(_minhash_cols_sql("shingles"))
    + f" FROM ({_DOCS_SHINGLES_SQL})"
)


# ------------------------------------------------------ minhash-LSH pairs

def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via banded LSH, verified with exact Jaccard.

    Plan shape (the 100 TB path): signatures -> explode to (band_key, doc)
    -> self-equi-join on band_key (shuffle on band hash, near-linear)
    -> distinct pairs -> exact Jaccard verify on the (small) candidate set.
    """
    return minhash_lsh_pairs_df(_docs_with_shingles(spark, sf_dir))


def minhash_lsh_pairs_df(
    docs: DataFrame,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
    heavy_bucket_mode: str = "star",
) -> DataFrame:
    """df-based core of :func:`minhash_lsh_pairs` — ``docs`` needs
    (doc_id, text) or a precomputed (doc_id, shingles). Used by the
    corpus-curation plan over already-filtered survivor sets.

    ``max_bucket_size`` is the 100 TB skew guard: a giant near-dup
    cluster puts thousands of docs into ONE band bucket, and the
    unguarded self-join materializes |bucket|^2/2 candidate pairs — the
    admitted scale pain point. Two bounded strategies for buckets over
    the cap (both deterministic under any partitioning):

    - ``"star"`` (default): over-cap buckets emit only (anchor, member)
      pairs, the anchor being the first doc in xxhash64 order — LINEAR
      in bucket size, and every member stays edge-connected to the
      cluster, so downstream connected-components still collapses the
      whole group (the property dedup actually needs). Non-anchor pairs
      inside a heavy bucket are not emitted (recall trade, documented).
    - ``"sample"``: keep only the first ``max_bucket_size`` docs per
      bucket in xxhash64 order — bounded-quadratic (cap^2/2) candidates;
      docs sampled out of every bucket they touch get no edges at all.

    Under-cap buckets are untouched in both modes. Capped mode replaces
    first-shared-band emission with an explicit pair ``dropDuplicates``:
    the first-band filter's invariant ("the pair was emitted at its
    lowest fingerprint-shared band") no longer holds when a bucket may
    decline to emit, so suppressing later-band matches by fingerprint
    equality alone would silently drop pairs."""
    ds = docs if "shingles" in docs.columns else _with_shingles(docs)
    begin_scope("minhash_lsh_pairs")
    ds = scoped_persist("minhash_lsh_pairs", ds)
    # cache the signature index too: the band self-join consumes it on
    # both legs and Spark's exchange-reuse doesn't fire across the two
    # differently-aliased subtrees — without the cache the md5 minhash
    # computation runs twice (an index build is materialized once at any
    # scale; this is that materialization). Scoped: released on the next
    # call, so registry re-runs don't accumulate cached RDDs.
    sig = scoped_persist(
        "minhash_lsh_pairs",
        ds.select("doc_id", *_minhash_cols(F.col("shingles"))),
    )
    # SLIM band join: the ~70-char string band key is folded to a 64-bit
    # xxhash64 fingerprint, so the self-join shuffles (doc_id, band_id,
    # 8-byte key, 4x8-byte fingerprint array) — slimmer than the string
    # form — and shingle arrays are re-attached to the (much smaller)
    # candidate set afterwards by doc_id equi-joins. Philosophically
    # consistent: the minhashes being banded are themselves md5s, so the
    # operator is already probabilistic-by-hash; a fingerprint collision
    # makes a spurious candidate the exact-Jaccard verify discards.
    bands = _band_frame(sig)

    if max_bucket_size is not None:
        cand = capped_candidates(
            bands.select("doc_id", F.col("band_fp")),
            max_bucket_size,
            heavy_bucket_mode,
        )
        return _verify_jaccard(
            cand, ds, jaccard_threshold, single_partition_sort=False
        )

    # FIRST-shared-band emission (same trick as simhash_near_pairs): a
    # pair sharing k bands matches the join k times; keep only the match
    # at the lowest shared band — per-row comparisons of the fingerprint
    # arrays already on the joined row — and the pair-dedup exchange
    # disappears. The residual risk (a 64-bit collision at an earlier
    # band making two DIFFERENT bands look shared, dropping a pair) is
    # p < 1e-15 at corpus-bucket cardinalities.
    first_band = [
        (F.col("band_id") <= bp)
        | (F.element_at("a_bfps", bp + 1) != F.element_at("b_bfps", bp + 1))
        for bp in range(N_BANDS - 1)
    ]
    cand = (
        bands.select(
            F.col("doc_id").alias("a_id"),
            F.col("bfps").alias("a_bfps"),
            "band_id",
            "band_fp",
        )
        .join(
            bands.select(
                F.col("doc_id").alias("b_id"),
                F.col("bfps").alias("b_bfps"),
                "band_fp",
            ),
            "band_fp",
        )
        .filter(F.col("a_id") < F.col("b_id"))
        # reduce over the whole list (not a hardcoded conjunct count): the
        # filter must cover every earlier band or raising N_BANDS would
        # silently re-admit duplicate pairs
        .filter(functools.reduce(_op.and_, first_band))
        .select("a_id", "b_id")
    )
    return _verify_jaccard(cand, ds, jaccard_threshold)


PROBE_MOD = 10   # parity split for the asymmetric join: doc_id % 10 == 3
PROBE_REM = 3


def _band_fp_array(mhs) -> "F.Column":
    """The N_BANDS 64-bit band fingerprints as ONE array column, from a
    list of N_MINHASH minhash expressions — the SINGLE definition of the
    banded fingerprint formula (xxhash64 seeded by band index over the
    band's minhashes). ``_band_frame`` (in-flight signatures) and
    :func:`band_fps_from_shingles` (stored index-on-write fingerprints)
    both derive from it, so the two representations cannot silently
    diverge and zero the persisted index."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[mhs[b * ROWS_PER_BAND + r] for r in range(ROWS_PER_BAND)],
            )
            for b in range(N_BANDS)
        ]
    )


def _band_frame(sig: DataFrame) -> DataFrame:
    """(doc_id, bfps, band_id, band_fp) band frame from a signature
    frame (doc_id, mh0..mhN) — what the self-join, the asymmetric probe
    join, and the capped path all shuffle on."""
    band_fps = _band_fp_array(
        [F.col(f"mh{j}") for j in range(N_MINHASH)]
    )
    return sig.select(
        "doc_id",
        band_fps.alias("bfps"),
        F.posexplode(band_fps).alias("band_id", "band_fp"),
    )


def _sig_bands(ds: DataFrame) -> DataFrame:
    """Band frame straight from a shingled frame."""
    return _band_frame(ds.select("doc_id", *_minhash_cols(F.col("shingles"))))


def band_fps_from_shingles(sh) -> "F.Column":
    """The N_BANDS 64-bit band fingerprints as ONE array column — the
    storable form of the LSH index (index-on-write: a sink that carries
    this column never needs re-shingling to serve as the corpus side of
    :func:`minhash_lsh_join_indexed`). ``sh`` must be a materialized
    shingle COLUMN (HOF staging rule). Derives from the same
    ``_minhash_exprs`` + ``_band_fp_array`` definitions as the
    in-flight band frames — one formula, two callers."""
    return _band_fp_array(_minhash_exprs(sh))


def minhash_lsh_join_indexed(
    corpus: DataFrame,
    probe: DataFrame,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """:func:`minhash_lsh_join_df` against a PRE-INDEXED corpus:
    ``corpus`` carries (doc_id, text, band_fps) where ``band_fps`` was
    stored at write time (:func:`band_fps_from_shingles`). Per call the
    corpus contributes only a read + explode of its stored fingerprints
    — no re-shingling, no re-minhashing — so a caller folding batch
    after batch (the streaming admission gate) pays O(|batch|) index
    work plus candidate verification; corpus text is re-shingled ONLY
    for the (small) candidate set.

    ``max_bucket_size`` caps the CORPUS side of each band bucket (rank
    by xxhash64, keep the first N — the same deterministic order as
    ``util.capped_candidates``). SAFE for admission semantics: a probe
    near a giant sink cluster still matches the cap's surviving members
    (hit/no-hit is what the gate consumes), while the unguarded join
    would fan |sink_bucket| x |probe_bucket| candidates under an
    identical-doc flood. Two capped-mode specifics:

    - ranking is PRUNED to buckets the probe actually touches (the
      probe's distinct band fingerprints — batch-sized by the gate
      contract — broadcast-semi-join the sink index BEFORE the window),
      so per-call cost is bounded by the touched buckets, never an
      O(|sink| x N_BANDS) full-index sort per micro-batch;
    - capping breaks the first-shared-band invariant (same argument as
      :func:`minhash_lsh_pairs_df`): a pair whose lowest shared band was
      capped away would be suppressed at every later band by the
      fingerprint-equality filter, silently dropping a qualifying hit —
      capped mode therefore pays the explicit pair ``dropDuplicates``
      instead."""
    begin_scope("minhash_lsh_join_indexed")
    pds = scoped_persist(
        "minhash_lsh_join_indexed",
        probe if "shingles" in probe.columns else _with_shingles(probe),
    )
    corpus_bands = corpus.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("band_fps").alias("c_bfps"),
        F.explode("band_fps").alias("band_fp"),
    )
    # a probe that already carries band_fps (the ingest computes the
    # index once per batch and reuses it for the write) skips the
    # N_MINHASH seeded-md5 signature passes entirely; shingles are still
    # required for the exact-Jaccard verify
    if "band_fps" in pds.columns:
        p_sig = pds.select(
            "doc_id",
            F.col("band_fps").alias("bfps"),
            F.posexplode("band_fps").alias("band_id", "band_fp"),
        )
    else:
        p_sig = _sig_bands(pds)
    p_bands = p_sig.select(
        F.col("doc_id").alias("probe_id"),
        F.col("bfps").alias("p_bfps"),
        "band_id",
        "band_fp",
    )
    if max_bucket_size is not None:
        from .util import capped_probe_bands

        p_bands = scoped_persist("minhash_lsh_join_indexed", p_bands)
        corpus_bands = capped_probe_bands(
            corpus_bands,
            p_bands,
            max_bucket_size,
            key_col="band_fp",
            id_col="corpus_id",
        )
        raw_cand = (
            p_bands.join(corpus_bands, "band_fp")
            .select("probe_id", "corpus_id")
            .dropDuplicates(["probe_id", "corpus_id"])
        )
    else:
        first_band = [
            (F.col("band_id") <= bp)
            | (
                F.element_at("p_bfps", bp + 1)
                != F.element_at("c_bfps", bp + 1)
            )
            for bp in range(N_BANDS - 1)
        ]
        raw_cand = (
            p_bands.join(corpus_bands, "band_fp")
            .filter(functools.reduce(_op.and_, first_band))
            .select("probe_id", "corpus_id")
        )
    cand = scoped_persist("minhash_lsh_join_indexed", raw_cand)
    # shingle only the candidate corpus docs (semi-join pruned)
    c_sh = _with_shingles(
        corpus.join(
            cand.select(F.col("corpus_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_semi",
        ).select("doc_id", "text")
    )
    pairs = cand.join(
        pds.select(
            F.col("doc_id").alias("probe_id"), F.col("shingles").alias("p_sh")
        ),
        "probe_id",
    ).join(
        c_sh.select(
            F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("c_sh")
        ),
        "corpus_id",
    )
    inter = F.size(F.array_intersect("p_sh", "c_sh"))
    union = F.size(F.array_union("p_sh", "c_sh"))
    return (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("probe_id", "corpus_id", "jaccard")
        .transform(lambda d: sorted_small(d, "probe_id", "corpus_id"))
    )


def minhash_lsh_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle wrapper for :func:`minhash_lsh_join_df` over a
    deterministic split of ``documents``: probe = doc_id % 10 == 3,
    corpus = the rest — the DuckDB twin reproduces the split exactly."""
    d = load_table(spark, sf_dir, "documents").repartition("doc_id")
    is_probe = (F.col("doc_id") % PROBE_MOD) == PROBE_REM
    return minhash_lsh_join_df(
        d.filter(~is_probe).select("doc_id", "text"),
        d.filter(is_probe).select("doc_id", "text"),
    )


def minhash_lsh_join_df(
    corpus: DataFrame,
    probe: DataFrame,
    jaccard_threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """ASYMMETRIC near-dup join: each PROBE doc vs the CORPUS index —
    the incremental-ingest shape (a new batch checked against the
    existing lake before admission; compose with ``corpus_ingest``'s
    merge-on-write exact dedup for the full admission gate). No
    self-join exists: candidates come from the probe bands equi-joined
    against the corpus band index. This from-scratch variant builds
    BOTH indexes per call (the one-shot / oracle-parity form); a caller
    probing the same corpus repeatedly should store the corpus
    fingerprints once (:func:`band_fps_from_shingles`) and use
    :func:`minhash_lsh_join_indexed`, which reads the stored index and
    re-shingles only candidate docs.

    Same physics as :func:`minhash_lsh_pairs_df`: banded 64-bit band
    fingerprints, FIRST-shared-band emission (a pair matching k bands
    is emitted only at its lowest shared band — works unchanged across
    two frames because both sides carry their full fingerprint array),
    exact-Jaccard verification on the candidate set. Output:
    (probe_id, corpus_id, jaccard)."""
    begin_scope("minhash_lsh_join")
    cds = scoped_persist(
        "minhash_lsh_join",
        corpus if "shingles" in corpus.columns else _with_shingles(corpus),
    )
    pds = scoped_persist(
        "minhash_lsh_join",
        probe if "shingles" in probe.columns else _with_shingles(probe),
    )
    first_band = [
        (F.col("band_id") <= bp)
        | (F.element_at("p_bfps", bp + 1) != F.element_at("c_bfps", bp + 1))
        for bp in range(N_BANDS - 1)
    ]
    cand = (
        _sig_bands(pds)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.col("bfps").alias("p_bfps"),
            "band_id",
            "band_fp",
        )
        .join(
            _sig_bands(cds).select(
                F.col("doc_id").alias("corpus_id"),
                F.col("bfps").alias("c_bfps"),
                "band_fp",
            ),
            "band_fp",
        )
        .filter(functools.reduce(_op.and_, first_band))
        .select("probe_id", "corpus_id")
    )
    pairs = cand.join(
        pds.select(
            F.col("doc_id").alias("probe_id"), F.col("shingles").alias("p_sh")
        ),
        "probe_id",
    ).join(
        cds.select(
            F.col("doc_id").alias("corpus_id"), F.col("shingles").alias("c_sh")
        ),
        "corpus_id",
    )
    inter = F.size(F.array_intersect("p_sh", "c_sh"))
    union = F.size(F.array_union("p_sh", "c_sh"))
    return (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("probe_id", "corpus_id", "jaccard")
        .transform(lambda d: sorted_small(d, "probe_id", "corpus_id"))
    )


def _minhash_lsh_join_sql() -> str:
    band_keys = ", ".join(
        "concat_ws('|', '"
        + str(b)
        + "', "
        + ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + ")"
        for b in range(N_BANDS)
    )
    return f"""
WITH sh AS ({_DOCS_SHINGLES_SQL}),
sig AS (
  SELECT doc_id, shingles, {', '.join(_minhash_cols_sql('shingles'))}
  FROM sh
),
bands AS (
  SELECT doc_id, shingles, unnest([{band_keys}]) AS band_key
  FROM sig
),
cand AS (
  SELECT DISTINCT p.doc_id AS probe_id, c.doc_id AS corpus_id
  FROM bands p JOIN bands c ON p.band_key = c.band_key
  WHERE p.doc_id % {PROBE_MOD} = {PROBE_REM}
    AND c.doc_id % {PROBE_MOD} <> {PROBE_REM}
)
SELECT probe_id, corpus_id,
  round(CAST(len(list_intersect(p.shingles, c.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(p.shingles || c.shingles)), 1), 6)
    AS jaccard
FROM cand
JOIN sh p ON cand.probe_id = p.doc_id
JOIN sh c ON cand.corpus_id = c.doc_id
WHERE round(CAST(len(list_intersect(p.shingles, c.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(p.shingles || c.shingles)), 1), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY probe_id, corpus_id
"""


MINHASH_LSH_JOIN_SQL = _minhash_lsh_join_sql()


def _verify_jaccard(
    cand: DataFrame, ds: DataFrame, jaccard_threshold: float,
    single_partition_sort: bool = True,
) -> DataFrame:
    """Re-attach shingles to the (slim) candidate pairs and keep exact
    Jaccard >= threshold.

    ``single_partition_sort=False`` is the CAPPED-path setting, and it
    changes two things the flood scale demands:

    - no ``sorted_small``: a capped flood's true pair volume is linear
      in N but large in absolute terms (the round-11 125x flood
      measured ~600k+ true pairs), and repartition(1) would funnel all
      of them through one sorting task — the simhash capped branch's
      ``sortWithinPartitions`` convention applies instead (consumers of
      the capped forms are components / ingest gates that need a set,
      not a total order).
    - ``shuffle_hash``-hinted re-attach joins: the candidate set is
      linear in N BY CONSTRUCTION, so broadcasting it is a scale bug
      regardless of what it happens to measure today — at 125x flood
      AQE saw it under the 64 MB threshold, broadcast it, and OOM'd the
      driver building the hashed relation. The hint pins a per-partition
      hash join (bounded build side) at every scale.
    - HASH-FINGERPRINTED shingles: the verify joins attach
      xxhash64(shingle) arrays (8 B/element) instead of the ~30-char
      strings, so the join payload shrinks ~4x and array_intersect/
      array_union compare longs — the dominant per-pair cost in the
      pre-saturation flood regime, where candidate volume is the
      designed bounded-quadratic buckets x C(min(R*m, cap), 2).
      Philosophically consistent with the operator (the band keys are
      already fingerprinted the same way): distinct shingles map to
      distinct longs w.h.p., so intersection/union COUNTS — and with
      them the rounded Jaccard — are unchanged; a collision inflates
      one pair's Jaccard by ~1/|union| with p ~ |sh|^2/2^64. The
      oracle path (single_partition_sort=True) keeps exact strings."""
    if single_partition_sort:
        cand_j, attach = cand, F.col("shingles")
    else:
        cand_j = cand.hint("shuffle_hash")
        attach = F.transform("shingles", lambda s: F.xxhash64(s))
    pairs = cand_j.join(
        ds.select(F.col("doc_id").alias("a_id"), attach.alias("a_sh")),
        "a_id",
    ).join(
        ds.select(F.col("doc_id").alias("b_id"), attach.alias("b_sh")),
        "b_id",
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    scored = (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )
    if single_partition_sort:
        return scored.transform(lambda d: sorted_small(d, "a_id", "b_id"))
    return scored.sortWithinPartitions("a_id", "b_id")


# the per-bucket skew guard (_capped_candidates in rounds <= 6) is now
# the shared util.capped_candidates — simhash blocks and the embedding
# sign buckets take the identical star/sample machinery


def _minhash_lsh_pairs_sql() -> str:
    band_keys = ", ".join(
        "concat_ws('|', '"
        + str(b)
        + "', "
        + ", ".join(f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND))
        + ")"
        for b in range(N_BANDS)
    )
    return f"""
WITH sh AS ({_DOCS_SHINGLES_SQL}),
sig AS (
  SELECT doc_id, shingles, {', '.join(_minhash_cols_sql('shingles'))}
  FROM sh
),
bands AS (
  SELECT doc_id, shingles, unnest([{band_keys}]) AS band_key
  FROM sig
),
cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
  FROM bands l JOIN bands r ON l.band_key = r.band_key
  WHERE l.doc_id < r.doc_id
)
SELECT a_id, b_id,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(a.shingles || b.shingles)), 1), 6) AS jaccard
FROM cand
JOIN sh a ON cand.a_id = a.doc_id
JOIN sh b ON cand.b_id = b.doc_id
WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(a.shingles || b.shingles)), 1), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY a_id, b_id
"""


MINHASH_LSH_PAIRS_SQL = _minhash_lsh_pairs_sql()


# -------------------------------------------------- n-gram Jaccard pairs

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs, blocked by the MIN shingle.

    Blocking rationale (100 TB): the min element of a shingle set is a
    1-band, 1-row minhash — any pair with Jaccard >= t shares the min
    shingle with probability >= t, so one equi-key join on ``min_sh``
    finds high-overlap pairs with no quadratic stage. (The LSH query
    covers the multi-band/high-recall variant; this is the cheap
    single-key member of the dedup family.)
    """
    return ngram_jaccard_pairs_df(_docs_with_shingles(spark, sf_dir))


def ngram_jaccard_pairs_df(
    docs: DataFrame,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
    heavy_bucket_mode: str = "star",
) -> DataFrame:
    """df-based core of :func:`ngram_jaccard_pairs` — ``docs`` needs
    (doc_id, text) or a precomputed (doc_id, shingles).

    ``max_bucket_size`` is the same per-bucket skew guard as the other
    LSH-family pair ops (shared ``util.capped_candidates``): a flooded
    corpus puts every copy of a document into ONE ``min_sh`` bucket, so
    the unguarded self-join is |bucket|^2/2 candidates AND shuffles the
    fat shingle arrays on both legs. Capped mode self-joins the slim
    (doc_id, min_sh) frame and re-attaches shingles to the bounded pair
    set by doc_id equi-joins; ``multi_band=False`` because each doc has
    exactly one min shingle, so a pair can only form once."""
    ds = docs if "shingles" in docs.columns else _with_shingles(docs)
    # cache the shingle index: BOTH self-join legs consume it, and
    # exchange reuse doesn't fire across differently-aliased legs —
    # uncached, the (expensive) shingle pass runs twice per query.
    # Scoped: released on the next call (no per-session accumulation).
    begin_scope("ngram_jaccard_pairs")
    ds = scoped_persist("ngram_jaccard_pairs", ds)
    keyed = ds.select(
        "doc_id", "shingles", F.array_min("shingles").alias("min_sh")
    )
    if max_bucket_size is not None:
        cand = capped_candidates(
            keyed.select("doc_id", F.col("min_sh").alias("band_fp")),
            max_bucket_size,
            heavy_bucket_mode,
            multi_band=False,
        )
        # shuffle_hash hint + hashed-shingle attach: the capped pair set
        # is linear in N by construction — never broadcast it — and the
        # verify compares xxhash64 fingerprints, not strings (the 125x
        # flood lessons, see _verify_jaccard)
        attach = F.transform("shingles", lambda s: F.xxhash64(s))
        pairs = cand.hint("shuffle_hash").join(
            ds.select(F.col("doc_id").alias("a_id"), attach.alias("a_sh")),
            "a_id",
        ).join(
            ds.select(F.col("doc_id").alias("b_id"), attach.alias("b_sh")),
            "b_id",
        )
    else:
        a = keyed.select(
            F.col("doc_id").alias("a_id"),
            F.col("shingles").alias("a_sh"),
            "min_sh",
        )
        b = keyed.select(
            F.col("doc_id").alias("b_id"),
            F.col("shingles").alias("b_sh"),
            "min_sh",
        )
        pairs = a.join(b, "min_sh").filter(F.col("a_id") < F.col("b_id"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    scored = (
        pairs.withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("a_id", "b_id", "jaccard")
    )
    if max_bucket_size is not None:
        # capped path: flood-scale true-pair volume through one sorting
        # task is the _verify_jaccard straggler; same convention there
        return scored.sortWithinPartitions("a_id", "b_id")
    return scored.transform(lambda d: sorted_small(d, "a_id", "b_id"))


NGRAM_JACCARD_PAIRS_SQL = f"""
WITH sh AS ({_DOCS_SHINGLES_SQL}),
keyed AS (SELECT doc_id, shingles, list_min(shingles) AS min_sh FROM sh)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(a.shingles || b.shingles)), 1), 6)
    AS jaccard
FROM keyed a JOIN keyed b ON a.min_sh = b.min_sh
WHERE a.doc_id < b.doc_id
  AND round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / greatest(len(list_distinct(a.shingles || b.shingles)), 1), 6)
      >= {JACCARD_THRESHOLD}
ORDER BY a_id, b_id
"""


# ----------------------------------------------------------------- simhash

def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simhash via explode -> per-bit vote aggregation.

    A single array-expression form would inline the token-hash array
    into all SIMHASH_BITS bit-count subexpressions — Catalyst does not
    CSE across them, so every token would get md5'd SIMHASH_BITS times.
    This formulation computes each token hash ONCE (explode -> one md5
    per token row), then aggregates SIMHASH_BITS cheap +1/-1 bit votes
    with map-side partial aggregation — the shape that scales: narrow
    (doc_id, hash) rows, one shuffle keyed on doc_id.
    """
    d = load_table(spark, sf_dir, "documents").repartition("doc_id")
    return simhash_signatures_df(d)


def simhash_signatures_df(d: DataFrame) -> DataFrame:
    """df-based core of :func:`simhash_signatures` over any (doc_id,
    text) frame — the skew stress tests and curation plan drive this."""
    # explode_outer: an empty/null token list yields ONE null-token row
    # instead of vanishing, so the aggregate covers every doc and no
    # doc-id frame needs re-joining afterwards to restore simhash=0 rows
    # (the null h votes -1 on every bit -> all-zero signature, exactly
    # the oracle's empty-input result).
    tok = d.select(
        "doc_id", F.explode_outer(_tokens(F.col("text"))).alias("t")
    ).withColumn(
        "h",
        F.conv(F.substring(F.md5("t"), 1, _SIMHASH_HEX), 16, 10).cast(
            "bigint"
        ),
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    return tok.groupBy("doc_id").agg(*votes).select(
        "doc_id",
        sum(
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
            for i in range(SIMHASH_BITS)
        ).cast("bigint").alias("simhash"),
    )


def _simhash_signatures_sql() -> str:
    hashes = (
        f"list_transform({_tokens_sql('text')}, "
        f"t -> CAST(('0x' || substr(md5(t), 1, {_SIMHASH_HEX})) AS BIGINT))"
    )
    parts = [
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h & {1 << i}) <> 0))"
        f" > len(hs) THEN {1 << i} ELSE 0 END)"
        for i in range(SIMHASH_BITS)
    ]
    return (
        f"SELECT doc_id, {' + '.join(parts)} AS simhash "
        f"FROM (SELECT doc_id, {hashes} AS hs FROM documents)"
    )


SIMHASH_SIGNATURES_SQL = _simhash_signatures_sql()


def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs: hamming(simhash) <= SIMHASH_MAX_HAMMING among
    candidates sharing at least one 15-bit signature block.

    The signature index is cached — both self-join legs consume it and
    exchange reuse doesn't fire across the aliased subtrees. Scoped:
    released on the next call (no per-session accumulation)."""
    d = load_table(spark, sf_dir, "documents").repartition("doc_id")
    return simhash_near_pairs_df(d)


def simhash_near_pairs_df(
    docs: DataFrame,
    max_bucket_size: int | None = None,
    heavy_bucket_mode: str = "star",
) -> DataFrame:
    """df-based core of :func:`simhash_near_pairs` over any (doc_id,
    text) frame.

    ``max_bucket_size`` is the same per-bucket skew guard as
    :func:`minhash_lsh_pairs_df` (shared ``util.capped_candidates``
    star/sample machinery): an identical-doc flood puts every flood doc
    into the SAME four 15-bit block buckets, and the unguarded
    self-join enumerates |bucket|^2/2 candidates. Capped mode bounds
    each heavy bucket (star: linear anchor edges that keep the cluster
    connected for components; sample: bounded-quadratic subset), then
    re-attaches signatures to the slim (a_id, b_id) pairs by doc_id
    equi-joins and applies the hamming verify — structurally the
    ``_verify_jaccard`` shape. Uncapped mode keeps the zero-extra-
    shuffle first-shared-block emission."""
    begin_scope("simhash_near_pairs")
    sig = scoped_persist("simhash_near_pairs", simhash_signatures_df(docs))
    blocks = sig.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.shiftright("simhash", SIMHASH_BLOCK_BITS * b)
                        .bitwiseAND(F.lit(_SIMHASH_BLOCK_MASK)),
                    )
                    for b in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("blk", "block_key"),
    )
    if max_bucket_size is not None:
        cand = capped_candidates(
            blocks.select("doc_id", F.col("block_key").alias("band_fp")),
            max_bucket_size,
            heavy_bucket_mode,
        )
        return (
            # shuffle_hash hint: the capped pair set is linear in N by
            # construction — never broadcast it (the 125x flood OOM
            # lesson, see _verify_jaccard)
            cand.hint("shuffle_hash")
            .join(
                sig.select(
                    F.col("doc_id").alias("a_id"),
                    F.col("simhash").alias("a_sig"),
                ),
                "a_id",
            )
            .join(
                sig.select(
                    F.col("doc_id").alias("b_id"),
                    F.col("simhash").alias("b_sig"),
                ),
                "b_id",
            )
            .withColumn("hamming", F.bit_count(F.expr("a_sig ^ b_sig")))
            .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
            .select("a_id", "b_id", "hamming")
            .sortWithinPartitions("a_id", "b_id")
        )

    l = blocks.select(
        F.col("doc_id").alias("a_id"),
        F.col("simhash").alias("a_sig"),
        "blk",
        "block_key",
    )
    r = blocks.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sig"), "block_key"
    )

    def _blk(sig_col: str, b: int):
        return F.shiftright(sig_col, SIMHASH_BLOCK_BITS * b).bitwiseAND(
            F.lit(_SIMHASH_BLOCK_MASK)
        )

    # FIRST-shared-block emission: a pair sharing k of the 4 blocks would
    # match the join k times; instead of shuffling the duplicates into a
    # dropDuplicates exchange (every blocked candidate, ~4x the near-pair
    # volume), emit the pair only from its lowest shared block — "no
    # earlier block b' also matches", a per-row filter computable straight
    # from the two signatures already on the joined row. Each qualifying
    # pair then appears EXACTLY once and the dedup shuffle disappears.
    first_match = [
        (F.col("blk") <= bp) | (_blk("a_sig", bp) != _blk("b_sig", bp))
        for bp in range(SIMHASH_BLOCKS - 1)
    ]
    return (
        l.join(r, "block_key")
        .filter(F.col("a_id") < F.col("b_id"))
        # reduce, not hardcoded conjuncts — covers every earlier block
        # even if the block count changes
        .filter(functools.reduce(_op.and_, first_match))
        # hamming is pair-deterministic, so filtering before the final
        # sort carries only near-pairs forward
        .withColumn(
            "hamming",
            F.bit_count(F.expr("a_sig ^ b_sig")),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("a_id", "b_id", "hamming")
        # NOT sorted_small: near-pair volume is fact-sized in general
        # (the 32-bit signature emitted ~900k pairs at sf0.1 before the
        # width change; ~9k after — still unbounded in the corpus size),
        # and the single-partition total sort was measured at ~1.1 s on
        # the fat output. In-partition sort keeps parallelism and
        # file-stat-friendly locally-ordered runs; the row SET is
        # deterministic, the driver's value hash is order-insensitive,
        # and the downstream consumer (connected components) is
        # order-independent.
        .sortWithinPartitions("a_id", "b_id")
    )


# ------------------------------------------------- simhash quality metric

SIMHASH_EVAL_MAX_ID = 1_000  # bounded eval sample: ground truth is quadratic


def _pair_quality(spark, sf_dir: str, pred_pairs: DataFrame, scope: str) -> DataFrame:
    """Shared precision/recall core for the dedup quality harnesses:
    ``pred_pairs`` (a_id, b_id) vs EXACT Jaccard >= JACCARD_THRESHOLD
    ground truth over docs with doc_id < SIMHASH_EVAL_MAX_ID.

    The truth side enumerates ALL pairs of the bounded sample — quadratic
    BY DEFINITION (evaluation, not production; same status as the ANN
    recall harness's brute-force baseline). The sample frame is broadcast
    so the enumeration never shuffles; the predicted side reuses the
    production blocked plan unchanged.

    One row: n_pred, n_truth, n_hit, precision, recall.
    """
    begin_scope(scope)
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < SIMHASH_EVAL_MAX_ID)
        .repartition("doc_id")
    )
    ds = scoped_persist(scope, _with_shingles(d))
    a = ds.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = ds.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    truth = scoped_persist(
        scope,
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "jaccard",
            F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("a_id", "b_id"),
    )
    pred = scoped_persist(
        scope,
        pred_pairs.filter(
            (F.col("a_id") < SIMHASH_EVAL_MAX_ID)
            & (F.col("b_id") < SIMHASH_EVAL_MAX_ID)
        ).select("a_id", "b_id"),
    )
    n_pred = pred.agg(F.count(F.lit(1)).alias("n_pred"))
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_hit = pred.join(truth, ["a_id", "b_id"]).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    return (
        n_pred.crossJoin(n_truth)
        .crossJoin(n_hit)
        .select(
            "n_pred",
            "n_truth",
            "n_hit",
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_pred"), F.lit(1)), 6
            ).alias("precision"),
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("recall"),
        )
    )


def simhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of simhash (hamming <= SIMHASH_MAX_HAMMING) vs
    exact-Jaccard truth — oracle-parity-tested as
    ``unreg_l1_simhash_quality``; recall lower bound pinned in pytest."""
    return _pair_quality(
        spark, sf_dir, simhash_near_pairs(spark, sf_dir), "simhash_quality"
    )


def minhash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding recall of minhash LSH vs exact-Jaccard truth. The pair
    operator verifies exact Jaccard on every candidate, so precision is
    1.0 BY CONSTRUCTION (pinned in pytest); the informative number is
    recall — the probability that a true pair shares at least one of the
    N_BANDS band fingerprints. Oracle-parity-tested as
    ``unreg_l1_minhash_quality``."""
    return _pair_quality(
        spark, sf_dir, minhash_lsh_pairs(spark, sf_dir), "minhash_quality"
    )


def _simhash_quality_sql() -> str:
    jacc = (
        "round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)"
        " / greatest(len(list_distinct(a.shingles || b.shingles)), 1), 6)"
    )
    return f"""
WITH sh AS (
  SELECT doc_id, shingles FROM ({_DOCS_SHINGLES_SQL})
  WHERE doc_id < {SIMHASH_EVAL_MAX_ID}
),
truth AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE {jacc} >= {JACCARD_THRESHOLD}
),
pred AS (
  SELECT a_id, b_id FROM ({{PAIRS}})
  WHERE a_id < {SIMHASH_EVAL_MAX_ID} AND b_id < {SIMHASH_EVAL_MAX_ID}
),
m AS (
  SELECT (SELECT count(*) FROM pred) AS n_pred,
         (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM pred JOIN truth USING (a_id, b_id)) AS n_hit
)
SELECT n_pred, n_truth, n_hit,
       round(CAST(n_hit AS DOUBLE) / greatest(n_pred, 1), 6) AS precision,
       round(CAST(n_hit AS DOUBLE) / greatest(n_truth, 1), 6) AS recall
FROM m
"""


_BLOCK_KEYS_SQL = ",\n           ".join(
    f"concat_ws(':', '{b}', (simhash >> {SIMHASH_BLOCK_BITS * b}) "
    f"& {_SIMHASH_BLOCK_MASK})"
    for b in range(SIMHASH_BLOCKS)
)

SIMHASH_NEAR_PAIRS_SQL = f"""
WITH sig AS ({_simhash_signatures_sql()}),
blocks AS (
  SELECT doc_id, simhash,
         unnest([
           {_BLOCK_KEYS_SQL}
         ]) AS block_key
  FROM sig
),
cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id,
         l.simhash AS a_sig, r.simhash AS b_sig
  FROM blocks l JOIN blocks r ON l.block_key = r.block_key
  WHERE l.doc_id < r.doc_id
)
SELECT a_id, b_id, bit_count(xor(a_sig, b_sig)) AS hamming
FROM cand
WHERE bit_count(xor(a_sig, b_sig)) <= {SIMHASH_MAX_HAMMING}
ORDER BY a_id, b_id
"""

SIMHASH_QUALITY_SQL = _simhash_quality_sql().format(
    PAIRS=SIMHASH_NEAR_PAIRS_SQL
)

MINHASH_QUALITY_SQL = _simhash_quality_sql().format(
    PAIRS=MINHASH_LSH_PAIRS_SQL
)
