"""Deterministic corpus sampling / domain mixing (SURVEY §2.L5).

Training-data pipelines mix domains at target rates ("2 parts web, 1
part code, 0.5 parts forums"). The operator is hash-gated Bernoulli
sampling: keep a row iff ``h(doc_id) < rate * 2^32`` where ``h`` is the
first 32 bits of md5 — deterministic, reproducible across engines and
runs, and embarrassingly parallel.

Scale design (100 TB): a pure scalar FILTER — no shuffle, no sort, no
state; predicate pushdown keeps the scan itself pruned, and the sample
is stable under any partitioning or re-run (md5 of the key, not
``rand()``). The emitted ``sample_weight`` (1/rate) makes downstream
token counts unbiased estimates of the unsampled corpus.

Per-source rates are derived from the source index so every engine (and
the DuckDB oracle) computes the identical mixture:
  src0, src1      -> 1.0   (keep all: high-value domains)
  even src index  -> 0.5
  odd  src index  -> 0.25
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .util import sorted_small

_FULL = 1 << 32          # hash space size
_HALF = 1 << 31          # rate 0.5 threshold
_QUARTER = 1 << 30       # rate 0.25 threshold


def _src_idx(source):
    return F.substring(source, 4, 10).cast("int")


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated stratified sample of ``documents`` by source mixture."""
    d = load_table(spark, sf_dir, "documents")
    idx = _src_idx(F.col("source"))
    threshold = (
        F.when(idx < 2, F.lit(_FULL))
        .when(idx % 2 == 0, F.lit(_HALF))
        .otherwise(F.lit(_QUARTER))
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    rate = threshold.cast("double") / F.lit(float(_FULL))
    return (
        d.filter(u32 < threshold)
        .select(
            "doc_id",
            "source",
            "lang",
            F.round(F.lit(1.0) / rate, 6).alias("sample_weight"),
        )
    )


MIXTURE_SAMPLE_SQL = f"""
SELECT doc_id, source, lang,
       round(1.0 / (CAST(threshold AS DOUBLE) / {_FULL}.0), 6)
         AS sample_weight
FROM (
  SELECT doc_id, source, lang,
    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      AS u32,
    CASE WHEN CAST(substr(source, 4, 10) AS INT) < 2 THEN {_FULL}
         WHEN CAST(substr(source, 4, 10) AS INT) % 2 = 0 THEN {_HALF}
         ELSE {_QUARTER} END AS threshold
  FROM documents
)
WHERE u32 < threshold
ORDER BY doc_id
"""


# --------------------------------------------------- stratified split

# hash-space thresholds for an 80/10/10 train/val/test split
_TRAIN_T = int(0.8 * _FULL)
_VAL_T = int(0.9 * _FULL)


def stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment for every doc.

    Same hash-gate machinery as :func:`mixture_sample` but SALTED
    ('split:' prefix) so membership is independent of the sampling gate
    — a doc's split never changes when the mixture rates do. Because
    doc_ids hash uniformly WITHIN each source, the split is stratified
    by construction: each source hits the 80/10/10 proportions in
    expectation with no per-source bookkeeping, shuffle, or state — a
    pure scalar projection at 100 TB, emitted UNORDERED (the output is
    corpus-sized, one row per document, so a total sort would violate
    ``sorted_small``'s dimension-sized contract; the parity harness is
    order-insensitive, like repetition_stats/tfidf). The assignment
    column (not three filtered outputs) lets one scan feed all three
    consumers.
    """
    d = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    return d.select(
        "doc_id",
        "source",
        "lang",
        F.when(u32 < _TRAIN_T, F.lit("train"))
        .when(u32 < _VAL_T, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


STRATIFIED_SPLIT_SQL = f"""
SELECT doc_id, source, lang,
  CASE WHEN u32 < {_TRAIN_T} THEN 'train'
       WHEN u32 < {_VAL_T} THEN 'val'
       ELSE 'test' END AS split
FROM (
  SELECT doc_id, source, lang,
    CAST(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))
      AS BIGINT) AS u32
  FROM documents
)
ORDER BY doc_id
"""


# --------------------------------------------- token-budget mixture planner

# target token budget for the planned mixture (a fraction of the corpus
# at every sf, so the rate computation is non-trivial in both engines)
PLAN_TOKEN_BUDGET = 100_000
# per-source mixture weights: high-value domains (src0/src1) get 2x
_W_HI = 2
_W_LO = 1


def _plan_weight(source):
    return F.when(_src_idx(source) < 2, F.lit(_W_HI)).otherwise(F.lit(_W_LO))


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling-rate PLAN from a global token budget — the
    step a production mixture runs BEFORE sampling: measure each
    source's actual token mass, split the budget by mixture weight, and
    emit ``rate = min(1, budget_share / n_tokens)`` (an over-budgeted
    source caps at keep-everything; rates feed the same hash gate as
    :func:`mixture_sample`).

    Scale design: one scan -> groupBy(source) token sums (map-side
    combine; source cardinality is tiny) -> one-row weight total
    joined back broadcast. Output is source-dimension sized.

    FP parity: the rate is a single double division (exact, same IEEE
    op in both engines) rounded to 9 dp only for display stability.
    """
    from .textstats import _tokens  # the one canonical tokenizer

    d = load_table(spark, sf_dir, "documents")
    toked = d.select(
        "source", F.size(_tokens(F.col("text"))).alias("n_toks")
    )
    from ._cachescope import begin_scope, scoped_persist

    begin_scope("mixture_plan")
    # persisted: wtot and the final select are two independent
    # consumers of per_src, and exchange reuse does not fire across the
    # differently-shaped subtrees (the tfidf_top_terms finding) —
    # unpersisted, the full-corpus tokenize scan behind this
    # source-dimension-sized frame executes twice per action
    per_src = scoped_persist(
        "mixture_plan",
        toked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
        .withColumn("weight", _plan_weight(F.col("source"))),
    )
    wtot = per_src.agg(F.sum("weight").alias("w_total"))
    return (
        per_src.crossJoin(F.broadcast(wtot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight",
            F.round(
                F.least(
                    F.lit(1.0),
                    (
                        F.lit(PLAN_TOKEN_BUDGET)
                        * F.col("weight").cast("double")
                        / F.col("w_total")
                    )
                    / F.col("n_tokens").cast("double"),
                ),
                9,
            ).alias("rate"),
        )
        .transform(lambda df: sorted_small(df, "source"))
    )


from .textstats import _tokens_sql as _toks_sql  # noqa: E402

_NTOKS_SQL = f"len({_toks_sql('text')})"

MIXTURE_PLAN_SQL = f"""
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum({_NTOKS_SQL}) AS BIGINT) AS n_tokens,
         CASE WHEN CAST(substr(source, 4, 10) AS INT) < 2
              THEN {_W_HI} ELSE {_W_LO} END AS weight
  FROM documents GROUP BY source
),
wtot AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM per_src)
SELECT source, n_docs, n_tokens, weight,
  round(least(1.0,
    ({PLAN_TOKEN_BUDGET} * CAST(weight AS DOUBLE) / w_total)
      / CAST(n_tokens AS DOUBLE)), 9) AS rate
FROM per_src CROSS JOIN wtot
ORDER BY source
"""


def mixture_sample_planned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gated sample under the PLANNED per-source rates: the same
    deterministic md5 gate as :func:`mixture_sample`, with thresholds
    derived from :func:`mixture_plan` instead of fixed constants. The
    plan frame is source-dimension sized — broadcast BY CONSTRUCTION —
    so the gate stays a map-side join + scalar filter (no corpus
    shuffle), and the emitted weight (1/rate) keeps downstream token
    counts unbiased."""
    d = load_table(spark, sf_dir, "documents")
    plan = mixture_plan(spark, sf_dir).select("source", "rate")
    u32 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    threshold = F.floor(F.col("rate") * F.lit(float(_FULL))).cast("bigint")
    return (
        d.join(F.broadcast(plan), "source")
        .filter(u32 < threshold)
        .select(
            "doc_id",
            "source",
            "lang",
            F.round(F.lit(1.0) / F.col("rate"), 6).alias("sample_weight"),
        )
    )


MIXTURE_SAMPLE_PLANNED_SQL = f"""
WITH plan AS ({MIXTURE_PLAN_SQL})
SELECT d.doc_id, d.source, d.lang,
       round(1.0 / plan.rate, 6) AS sample_weight
FROM documents d JOIN plan ON d.source = plan.source
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < CAST(floor(plan.rate * {_FULL}.0) AS BIGINT)
ORDER BY d.doc_id
"""


# ------------------------------------------- exact per-source eval sample

PER_SOURCE_N = 20        # docs kept per source
_EVAL_SALT = "evalsample:"
_N_SALT_BUCKETS = 16     # stage-1 fan-out for the few-fat-groups window


def per_source_sample(
    spark: SparkSession, sf_dir: str, n: int = PER_SOURCE_N
) -> DataFrame:
    """Deterministic uniform sample of EXACTLY ``n`` docs per source —
    eval-set construction ("20 random-but-reproducible docs from every
    domain"): the n lowest salted-md5 hashes per source, doc_id
    tiebreak, ranked 1..n.

    Scale design — exact top-n per group with FEW, FAT groups: a single
    row_number window partitioned by ``source`` would put an entire
    source (billions of rows at 100 TB) into ONE window partition — the
    single-task straggler class (window partitions get no AQE skew
    splitting). Instead the classic salted two-stage top-n:

      stage 1: rank within (source, doc_id % B) — B bounded parallel
               partitions per source — and keep each bucket's top-n;
      stage 2: rank the <= B*n survivors per source (a dimension-sized
               frame) and keep the top-n.

    Every global top-n row is its bucket's top-n too, so the two-stage
    result EQUALS the single-window answer (the DuckDB twin) at any
    scale. The hash is salted independently of the mixture and split
    gates, so eval membership is stable when rates change."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    u32 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(_EVAL_SALT), F.col("doc_id").cast("string"))
            ),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    h = d.withColumn("h", u32)
    w1 = Window.partitionBy(
        "source", F.pmod(F.col("doc_id"), F.lit(_N_SALT_BUCKETS))
    ).orderBy("h", "doc_id")
    stage1 = (
        h.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= n)
        .drop("rn1")
    )
    w2 = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        stage1.withColumn("sample_rank", F.row_number().over(w2))
        .filter(F.col("sample_rank") <= n)
        .select("doc_id", "source", "sample_rank")
        .transform(lambda df: sorted_small(df, "source", "sample_rank"))
    )


PER_SOURCE_SAMPLE_SQL = f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY u32, doc_id)
           AS sample_rank
  FROM (
    SELECT doc_id, source,
      CAST(('0x' || substr(md5('{_EVAL_SALT}' || CAST(doc_id AS VARCHAR)),
                           1, 8)) AS BIGINT) AS u32
    FROM documents
  )
) WHERE sample_rank <= {PER_SOURCE_N}
ORDER BY source, sample_rank
"""
