"""Benchmark decontamination (SURVEY §2.L1 extension): flag corpus
documents that share n-grams with an evaluation set.

The standard training-data hygiene step (as in GPT-3/PaLM data cards):
a document is contaminated if it shares >= MIN_HITS distinct N_GRAM-word
n-grams with any benchmark/eval document. Here the eval set is a
deterministic split of ``documents`` (doc_id % 10 == 7) so the DuckDB
oracle reproduces it exactly; in production it would be a separate
benchmark table with the same shape.

Scale design (100 TB corpus, benchmark-sized eval set):
- The eval n-gram set is DISTINCT and typically tiny relative to the
  corpus (benchmarks are MBs, corpora are TBs) — it is explicitly
  ``broadcast()``, so the corpus postings NEVER shuffle on the n-gram
  key: the contamination join is map-side, and the only shuffle is the
  narrow (doc_id, count) aggregation. Drop the hint if the "eval" side
  is ever corpus-sized and AQE picks the strategy.
- Corpus n-grams are per-doc DISTINCT arrays exploded to slim
  (doc_id, gram) postings; no pairwise doc-doc join exists anywhere —
  contamination is doc-vs-set, linear in corpus size.

Reference parity: generalizes the token-overlap theme of
concerts_etl/core/consolidate_events.py:91-104 from event matching to
corpus-vs-benchmark set intersection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ._cachescope import begin_scope, scoped_persist
from .dedup import _tokens, _tokens_sql

N_GRAM = 5       # n-gram width (words)
MIN_HITS = 2     # distinct shared n-grams to flag contamination
EVAL_MOD = 10    # eval split: doc_id % EVAL_MOD == EVAL_REM
EVAL_REM = 7


def _ngram_fps(toks, n: int = N_GRAM):
    """Distinct 64-bit fingerprints of the ``n``-word shingles.

    The Spark side never materializes the n-gram STRINGS: each window is
    fingerprinted directly from its 5 token columns with ``xxhash64`` —
    the production decontamination representation (hashed n-gram sets /
    Bloom membership), ~10x cheaper than building + broadcasting 30-byte
    shingle strings. The DuckDB oracle counts exact string n-grams; the
    two agree unless a 64-bit collision occurs inside one doc's gram set
    or across the eval set (p < 1e-7 at benchmark scale, and the driver
    comparison is deterministic). Docs shorter than N_GRAM yield one
    ragged window — xxhash64 skips the out-of-range NULLs exactly like
    the oracle's concat_ws.
    """
    raw = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
        ),
        lambda i: F.xxhash64(
            *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.array_distinct(raw)


def _ngrams_sql(toks_e: str, n: int = N_GRAM) -> str:
    cols = ", ".join(f"{toks_e}[i+{j}]" for j in range(n))
    return (
        "list_distinct(list_transform("
        f"generate_series(1, greatest(len({toks_e}) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', {cols})))"
    )


MAX_EVAL_DOCS = 1_000_000  # broadcast-safety guard (see decontaminate_df)


def decontaminate_df(
    corpus: DataFrame,
    eval_docs: DataFrame,
    min_hits: int = MIN_HITS,
    max_eval_docs: int | None = MAX_EVAL_DOCS,
) -> DataFrame:
    """DataFrame form over arbitrary (doc_id, text) frames — the curation
    plan composes this with a real benchmark table; the registry query
    wraps it over the deterministic split.

    The plan BROADCASTS the distinct eval n-gram set — correct for real
    benchmarks (MBs of eval text vs TBs of corpus) but an executor/driver
    OOM if misused with a corpus-sized "eval" side. ``max_eval_docs`` is
    the loud-failure guard: an eager bounded count (``limit(n+1)`` — the
    probe short-circuits, it never scans the whole frame) raises
    ``ValueError`` before any broadcast is attempted. Eval GRAM volume is
    what actually bounds the broadcast (~ docs x tokens; 1M docs of
    benchmark-typical ~1e2-1e3 grams ≈ 1e8-1e9 hashed grams, the edge of
    the 8 GB broadcast ceiling at 8 bytes/gram) — doc count is the cheap
    observable proxy. Pass ``None`` to skip the probe job, or drop the
    ``broadcast`` hint instead if the eval side is legitimately huge
    (AQE then picks a shuffle join)."""
    if max_eval_docs is not None:
        probe = eval_docs.limit(max_eval_docs + 1).count()
        if probe > max_eval_docs:
            raise ValueError(
                f"decontaminate_df: eval_docs exceeds max_eval_docs="
                f"{max_eval_docs} (>= {probe} rows); the eval n-gram set "
                "is broadcast and would not be broadcast-sized. Shrink "
                "the eval set, raise max_eval_docs deliberately, or use "
                "a non-broadcast variant."
            )
    # filter/split happens in the callers BEFORE fingerprinting: the gram
    # projection is the CPU-heavy stage, each split runs it exactly once.
    # STAGED tokenize (see dedup._with_shingles): the token array
    # materializes as its own column so the n element_at references in
    # the fingerprint lambda read a column instead of re-inlining the
    # regex-split HOF.
    eval_grams = (
        eval_docs.select(_tokens(F.col("text")).alias("toks"))
        .select(F.explode(_ngram_fps(F.col("toks"))).alias("gram"))
        .distinct()
    )
    # The ragged window means the gram array is never null/empty: even a
    # null/empty text yields exactly ONE gram (xxhash64 over the
    # out-of-range NULLs is a non-null constant — the oracle's
    # concat_ws '' twin), so aggregating over ALL postings covers every
    # corpus doc — no separate corpus-keys frame re-joined at the end
    # (the previous form ran hits -> left join corpus.select(doc_id),
    # two extra corpus-sized exchanges). Degenerate (token-less) docs
    # can therefore share their constant gram with a degenerate eval
    # doc, contributing at most 1 hit — below MIN_HITS, never flagged.
    # explode_outer is a defensive no-op kept for shape stability.
    postings = corpus.select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        F.explode_outer(_ngram_fps(F.col("toks"))).alias("gram"),
    )
    # membership flag via broadcast LEFT join against the distinct eval
    # set (never duplicates a posting); grams are per-doc distinct, so
    # the flag sum IS the distinct shared-n-gram count
    hits = (
        postings.join(
            F.broadcast(eval_grams.withColumn("hit", F.lit(1))),
            "gram",
            "left",
        )
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hits"))
    )
    return hits.select(
        "doc_id",
        F.col("n_hits").alias("n_hit_ngrams"),
        (F.col("n_hits") >= min_hits).alias("is_contaminated"),
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-corpus-doc eval-overlap counts: (doc_id, n_hit_ngrams,
    is_contaminated) over every non-eval document.

    ``max_eval_docs=None``: this demo query's eval side is a FIXED
    1/EVAL_MOD fraction of the corpus by construction (so the DuckDB
    oracle reproduces it), which is proportional — not benchmark-sized
    — and would trip the absolute guard at large sf by design. The
    guard protects the real boundary: caller-supplied benchmark tables
    (the curation plan keeps the default cap). Skipping the probe also
    keeps the benched query free of an extra eager count job."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    return decontaminate_df(
        d.filter(~is_eval).select("doc_id", "text"),
        d.filter(is_eval).select("doc_id", "text"),
        max_eval_docs=None,
    )


DECONTAMINATE_SQL = f"""
WITH t AS (
  SELECT doc_id, {_tokens_sql('text')} AS toks FROM documents
),
g AS MATERIALIZED (
  SELECT doc_id, {_ngrams_sql('toks')} AS grams FROM t
),
eval_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g
  WHERE doc_id % {EVAL_MOD} = {EVAL_REM}
),
corpus AS (SELECT doc_id, grams FROM g WHERE doc_id % {EVAL_MOD} <> {EVAL_REM}),
hits AS (
  SELECT c.doc_id, count(*) AS n_hits
  FROM (SELECT doc_id, unnest(grams) AS gram FROM corpus) c
  JOIN eval_grams USING (gram)
  GROUP BY c.doc_id
)
SELECT corpus.doc_id,
       coalesce(hits.n_hits, 0) AS n_hit_ngrams,
       coalesce(hits.n_hits, 0) >= {MIN_HITS} AS is_contaminated
FROM corpus LEFT JOIN hits ON corpus.doc_id = hits.doc_id
ORDER BY corpus.doc_id
"""


# ------------------------------------------------ cross-doc duplicate spans

SPAN_TOKENS = 8  # window width for repeated-passage detection


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-passage detection (the exact-substring
    dedup signal of Lee et al. 2022, approximated with fixed
    ``SPAN_TOKENS``-word windows): per doc, how many of its distinct
    token windows also appear in at least one OTHER document.

    The per-doc ``shared_frac`` is the boilerplate score a curation
    pipeline thresholds on (license headers, navigation chrome, share
    buttons all repeat verbatim across pages).

    Scale design: per-doc-distinct window fingerprints explode to slim
    (doc_id, gram) postings; the cross-doc occurrence count is a
    ``groupBy(gram).count()`` — map-side partial combine collapses even
    a corpus-wide hot gram (a license header in 10% of documents) to
    one row per partition BEFORE the exchange, so no single task ever
    holds a gram's full posting list (the previous window-count form
    put every hot-gram posting in ONE window partition, a straggler
    with no AQE remedy — skew splitting only exists for joins). The
    count joins back to the postings on the gram key, where AQE
    skew-join handles the fat side. Because postings are per-doc
    distinct, count(*) per gram IS the distinct-document count — no
    self-join or doc-doc pair ever materializes. The postings frame is
    scoped-persisted: both the gram count and the join-back consume it,
    and the tokenize+fingerprint projection is the CPU-heavy stage (the
    standard materialize-the-index trade, same as the LSH signatures).

    Degenerate docs score zero BY CONSTRUCTION: the ragged window is
    gated on ``size(toks) >= 1``, so empty/null/whitespace-only
    documents emit no spans at all (previously every degenerate doc
    shared the identical all-NULL-window fingerprint and scored
    shared_frac = 1.0 — a thresholding artifact); they re-enter via the
    final left join with n_spans = 0, shared_frac = 0.
    """
    return duplicate_spans_df(load_table(spark, sf_dir, "documents"))


def duplicate_spans_df(d: DataFrame) -> DataFrame:
    """df-based core of :func:`duplicate_spans` over any (doc_id, text)
    frame — the hot-gram skew stress test drives this directly."""
    toks = F.col("toks")
    begin_scope("duplicate_spans")
    posts = scoped_persist(
        "duplicate_spans",
        # staged tokenize: same column-materialization as decontaminate
        d.select("doc_id", _tokens(F.col("text")).alias("toks")).select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(toks) >= 1, _ngram_fps(toks, n=SPAN_TOKENS)
                )
            ).alias("gram"),
        ),
    )
    gram_docs = posts.groupBy("gram").agg(
        F.count(F.lit(1)).alias("gram_docs")
    )
    per_doc = (
        posts.join(gram_docs, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("gram_docs") >= 2).cast("int")).alias(
                "n_shared_spans"
            ),
        )
    )
    return d.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_shared_spans", F.lit(0)).alias("n_shared_spans"),
        F.round(
            F.coalesce("n_shared_spans", F.lit(0)).cast("double")
            / F.greatest(F.coalesce("n_spans", F.lit(0)), F.lit(1)),
            6,
        ).alias("shared_frac"),
    )


DUPLICATE_SPANS_SQL = f"""
WITH posts AS MATERIALIZED (
  SELECT doc_id, unnest(grams) AS gram
  FROM (
    SELECT doc_id,
           CASE WHEN len(toks) >= 1
                THEN {_ngrams_sql('toks', SPAN_TOKENS)} END AS grams
    FROM (SELECT doc_id, {_tokens_sql('text')} AS toks FROM documents)
  )
),
gram_docs AS (SELECT gram, count(*) AS gram_docs FROM posts GROUP BY gram),
f AS (
  SELECT doc_id, count(*) AS n_spans,
         CAST(sum(CASE WHEN gram_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_shared_spans
  FROM posts JOIN gram_docs USING (gram)
  GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(f.n_spans, 0) AS n_spans,
  coalesce(f.n_shared_spans, 0) AS n_shared_spans,
  round(CAST(coalesce(f.n_shared_spans, 0) AS DOUBLE)
        / greatest(coalesce(f.n_spans, 0), 1), 6) AS shared_frac
FROM documents d
LEFT JOIN f ON d.doc_id = f.doc_id
"""
