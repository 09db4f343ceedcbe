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
from .dedup import _tokens, _tokens_sql
from .util import sorted_small

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


def decontaminate_df(
    corpus: DataFrame, eval_docs: DataFrame, min_hits: int = MIN_HITS
) -> DataFrame:
    """DataFrame form over arbitrary (doc_id, text) frames — the curation
    plan composes this with a real benchmark table; the registry query
    wraps it over the deterministic split."""
    # filter/split happens in the callers BEFORE fingerprinting: the gram
    # projection is the CPU-heavy stage, each split runs it exactly once
    eval_grams = (
        eval_docs.select(
            F.explode(_ngram_fps(_tokens(F.col("text")))).alias("gram")
        )
        .distinct()
    )
    # explode_outer: a null-text doc has a null gram array and must still
    # appear in the output with 0 hits. Every non-null text yields >= 1
    # gram (the ragged short-doc window), so aggregating over ALL
    # postings covers every corpus doc — no separate corpus-keys frame
    # re-joined at the end (the previous form ran hits -> left join
    # corpus.select(doc_id), two extra corpus-sized exchanges).
    postings = corpus.select(
        "doc_id",
        F.explode_outer(_ngram_fps(_tokens(F.col("text")))).alias("gram"),
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
    is_contaminated) over every non-eval document."""
    d = load_table(spark, sf_dir, "documents")
    is_eval = (F.col("doc_id") % EVAL_MOD) == EVAL_REM
    return decontaminate_df(
        d.filter(~is_eval).select("doc_id", "text"),
        d.filter(is_eval).select("doc_id", "text"),
    ).transform(lambda df: sorted_small(df, "doc_id"))


DECONTAMINATE_SQL = f"""
WITH t AS (
  SELECT doc_id, {_tokens_sql('text')} AS toks FROM documents
),
g AS (
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
    (doc_id, gram) postings; the cross-doc occurrence count is a WINDOW
    count over the gram key — because postings are per-doc distinct,
    count(*) over the gram partition IS the distinct-document count, so
    no self-join or doc-doc pair ever materializes. Two shuffles total
    (gram window + doc_id rollup), both on high-cardinality keys; a
    degenerate corpus-wide hot gram costs one fat window partition, not
    a quadratic join fan-out.
    """
    d = load_table(spark, sf_dir, "documents")
    posts = d.select(
        "doc_id",
        F.explode_outer(
            _ngram_fps(_tokens(F.col("text")), n=SPAN_TOKENS)
        ).alias("gram"),
    )
    from pyspark.sql.window import Window

    n_docs = F.count(F.lit(1)).over(Window.partitionBy("gram"))
    flagged = posts.withColumn(
        "is_shared",
        F.col("gram").isNotNull() & (n_docs >= 2),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_spans"),
            F.sum(F.col("is_shared").cast("int")).alias("n_shared_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_shared_spans",
            F.round(
                F.col("n_shared_spans").cast("double")
                / F.greatest(F.col("n_spans"), F.lit(1)),
                6,
            ).alias("shared_frac"),
        )
    )


DUPLICATE_SPANS_SQL = f"""
WITH posts AS (
  SELECT doc_id, unnest({_ngrams_sql(_tokens_sql('text'), SPAN_TOKENS)})
           AS gram
  FROM documents
),
flagged AS (
  SELECT doc_id, gram,
         count(*) OVER (PARTITION BY gram) >= 2 AS is_shared
  FROM posts
)
SELECT d.doc_id,
  coalesce(f.n_spans, 0) AS n_spans,
  coalesce(f.n_shared_spans, 0) AS n_shared_spans,
  round(CAST(coalesce(f.n_shared_spans, 0) AS DOUBLE)
        / greatest(coalesce(f.n_spans, 0), 1), 6) AS shared_frac
FROM documents d
LEFT JOIN (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN is_shared THEN 1 ELSE 0 END) AS n_shared_spans
  FROM flagged GROUP BY doc_id
) f ON d.doc_id = f.doc_id
"""
