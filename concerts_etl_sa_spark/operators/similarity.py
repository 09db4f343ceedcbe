"""Similarity search over the ``embeddings`` table (SURVEY §2.L2).

ANN over an ``array<float>`` column (dim=64):

- brute-force top-k cosine  : the exact baseline — Q query vectors
  (broadcast) x N candidates, window top-k per query
- sign-LSH bucketed top-k   : the scale path — 8-bit signature from the
  signs of the first 8 components buckets both sides; the pair join
  shuffles on the bucket key so the candidate set is ~N/256 per query
  (approximate: recall < 1 by design)
- embedding near-dup pairs  : cosine >= threshold among same-bucket pairs

Engine-parity design: the dot/norm sums are generated as explicit 64-term
expressions (identical order, float->double promotion per term) in both
the Spark Column form and the DuckDB oracle SQL, so IEEE results are
bit-identical; cosines are rounded to 6 dp before ranking so ordering and
tie-breaks (vec_id asc) agree.

Scale notes (100 TB): brute-force is the correct plan only when Q is
broadcastable; the bucketed variant is the shape that scales (equi-key
shuffle, no unbounded cross join). A production ANN would replace the
sign-LSH with trained IVF centroids or HNSW sharding — the plan shape
(bucket -> in-bucket scoring -> per-query top-k) is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

DIM = 64
N_QUERIES = 20       # vec_id < 20 are the query vectors
TOP_K = 5
NEAR_DUP_COSINE = 0.30  # synthetic embeddings: max pair cosine ~0.48, p99 ~0.29
SIGN_BITS = 8


def _dot(a: str, b: str):
    return sum(
        F.element_at(F.col(a), i + 1).cast("double")
        * F.element_at(F.col(b), i + 1).cast("double")
        for i in range(DIM)
    )


def _norm2(a: str):
    return sum(
        F.element_at(F.col(a), i + 1).cast("double")
        * F.element_at(F.col(a), i + 1).cast("double")
        for i in range(DIM)
    )


def _dot_sql(a: str, b: str) -> str:
    return " + ".join(
        f"CAST({a}[{i+1}] AS DOUBLE) * CAST({b}[{i+1}] AS DOUBLE)"
        for i in range(DIM)
    )


def _norm2_sql(a: str) -> str:
    return " + ".join(
        f"CAST({a}[{i+1}] AS DOUBLE) * CAST({a}[{i+1}] AS DOUBLE)"
        for i in range(DIM)
    )


def _cosine(a: str, b: str):
    return F.round(
        _dot(a, b) / F.sqrt(_norm2(a) * _norm2(b)),
        6,
    )


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"round(({_dot_sql(a, b)}) / sqrt(({_norm2_sql(a)}) * ({_norm2_sql(b)})), 6)"
    )


def topk_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k: broadcast the Q query vectors against all candidates."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", _cosine("q_vec", "c_vec")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine", "rn")
        .orderBy("q_id", "rn")
    )


TOPK_COSINE_BRUTEFORCE_SQL = f"""
SELECT q_id, c_id, cosine, rn FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
  FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
           {_cosine_sql('q.embedding', 'c.embedding')} AS cosine
    FROM embeddings q, embeddings c
    WHERE q.vec_id < {N_QUERIES} AND c.vec_id >= {N_QUERIES}
  )
) WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


def _sign_bucket(vec: str):
    """8-bit bucket from the signs of components 1..8."""
    b = F.lit(0)
    for i in range(SIGN_BITS):
        b = b + F.when(
            F.element_at(F.col(vec), i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return b


def _sign_bucket_sql(vec: str) -> str:
    parts = [
        f"(CASE WHEN {vec}[{i+1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(SIGN_BITS)
    ]
    return "(" + " + ".join(parts) + ")"


def _band_keys(vec: str):
    """Two banded sign-LSH keys: bits of dims 1-4 and dims 5-8.

    OR-combination of bands (explode + equi-join + distinct) is the
    standard LSH recall amplifier — same shape as the minhash bands."""
    keys = []
    for band in range(2):
        k = F.lit(band * 100)
        for i in range(4):
            dim = band * 4 + i
            k = k + F.when(
                F.element_at(F.col(vec), dim + 1) >= 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        keys.append(k)
    return F.array(*keys)


def topk_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates share >= 1 of two sign-LSH bands."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.explode(_band_keys("embedding")).alias("band_key"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("c_id"),
        F.col("embedding").alias("c_vec"),
        F.explode(_band_keys("embedding")).alias("band_key"),
    )
    scored = (
        c.join(F.broadcast(q), "band_key")
        .dropDuplicates(["q_id", "c_id"])
        .withColumn("cosine", _cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("q_id", "c_id", "cosine", "rn")
        .orderBy("q_id", "rn")
    )


def _band_keys_sql(vec: str) -> str:
    bands = []
    for band in range(2):
        parts = [str(band * 100)]
        for i in range(4):
            dim = band * 4 + i
            parts.append(
                f"(CASE WHEN {vec}[{dim+1}] >= 0 THEN {1 << i} ELSE 0 END)"
            )
        bands.append("(" + " + ".join(parts) + ")")
    return "[" + ", ".join(bands) + "]"


TOPK_COSINE_LSH_SQL = f"""
WITH qb AS (
  SELECT vec_id AS q_id, embedding AS q_vec,
         unnest({_band_keys_sql('embedding')}) AS band_key
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
cb AS (
  SELECT vec_id AS c_id, embedding AS c_vec,
         unnest({_band_keys_sql('embedding')}) AS band_key
  FROM embeddings WHERE vec_id >= {N_QUERIES}
),
cand AS (
  SELECT DISTINCT q_id, c_id FROM qb JOIN cb USING (band_key)
)
SELECT q_id, c_id, cosine, rn FROM (
  SELECT q_id, c_id, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rn
  FROM (
    SELECT cand.q_id, cand.c_id,
           {_cosine_sql('q.embedding', 'c.embedding')} AS cosine
    FROM cand
    JOIN embeddings q ON cand.q_id = q.vec_id
    JOIN embeddings c ON cand.c_id = c.vec_id
  )
) WHERE rn <= {TOP_K}
ORDER BY q_id, rn
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors: cosine >= threshold among same-bucket pairs."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _sign_bucket("embedding")
    )
    a = emb.select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"), "bucket"
    )
    b = emb.select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_vec"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", _cosine("a_vec", "b_vec"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
        .select("a_id", "b_id", "cosine")
        .orderBy("a_id", "b_id")
    )


EMBEDDING_NEAR_DUP_SQL = f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_cosine_sql('a.embedding', 'b.embedding')} AS cosine
FROM embeddings a JOIN embeddings b
  ON {_sign_bucket_sql('a.embedding')} = {_sign_bucket_sql('b.embedding')}
WHERE a.vec_id < b.vec_id
  AND {_cosine_sql('a.embedding', 'b.embedding')} >= {NEAR_DUP_COSINE}
ORDER BY a_id, b_id
"""
