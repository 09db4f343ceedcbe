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
        .transform(lambda df: sorted_small(df, "doc_id"))
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
