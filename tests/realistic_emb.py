"""Deterministic REALISTIC clustered embedding fixture (round-13
verdict item #1): hashed bag-of-words projections of the real
``documents.text`` testdata — clustered geometry derived from real
data, zero RNG.

Why this exists: every ANN quality number shipped through round 12
(residual IVF-PQ 0.270-vs-0.170 margin, IVF 0.72, PQ 0.29, SQ8 0.99,
labelqa agreement) was pinned on either the ISOTROPIC synthetic
embeddings table — the regime where IVF pruning and residual coding
are at their worst — or a planted-Gaussian toy. This module gives the
quality tests one shared fixture whose geometry comes from real text:

- Each document's vector is a signed feature-hashed bag of words
  (Weinberger et al. 2009 hashing trick): token -> md5 -> bucket in
  [0, DIM), sign from an independent hash bit, counts accumulated,
  then L2-normalized. md5 (not Python ``hash``) keeps it stable
  across processes — PYTHONHASHSEED cannot perturb a single number.
- The testdata vocabulary is small (~31 tokens), so every document
  shares a strong common component: the corpus is ANISOTROPIC — one
  dominant direction plus frequency-noise spread, which is exactly
  the shape real sentence-embedding corpora have (and the opposite
  of the isotropic table). This fixture is what REFUTED the old
  absolute gate (E_res < 1.0): its raw residual energy ~0.29 looks
  "deep inside the residual regime", yet plain coding WINS here
  (0.33 vs 0.30 recall@5) because a plain codebook absorbs the one
  shared direction for free. The shipped gate is therefore RELATIVE
  (E_res < RESIDUAL_GATE_RATIO·E_ctr, operators/pq.py — 0.85 since
  the round-14 boundary mapping) and reads this fixture as plain
  territory: measured E_res/E_ctr ratios are isotropic 1.48 /
  realistic 0.88 / planted clusters 0.61 — only genuinely
  multi-modal geometry selects residual coding (regime + boundary
  tables in BASELINE.md; both failure directions pinned in
  tests/test_pq_residual.py).
- Labels for the labelqa agreement re-pin are the document ``lang``
  codes mapped to ints — real metadata, same join shape as the
  embeddings table's label column.

The ~500-row driver-side build is test-fixture plumbing, not an
operator: the production hashing path would be one
``F.transform``/``F.aggregate`` projection (no collect); these tests
need the numpy twin for exact ground truth anyway.
"""

from __future__ import annotations

import hashlib

import numpy as np

from concerts_etl_sa_spark.operators.similarity import (
    DIM,
    N_QUERIES,
    TOP_K,
    _norm2,
)

_CACHE: dict[str, tuple] = {}


def _tok_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest(), 16)


def embed_text(text: str, dim: int = DIM) -> np.ndarray:
    """Signed feature-hashed bag of words, L2-normalized."""
    v = np.zeros(dim)
    for tok in text.split():
        h = _tok_hash(tok)
        v[h % dim] += 1.0 if (h >> 7) % 2 == 0 else -1.0
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def realistic_embeddings(spark, sf_dir: str):
    """(df, X, labels): a Spark frame with the embeddings-table schema
    (vec_id, embedding, label, norm2 — vec_id = doc_id, label = lang
    code), the numpy matrix in vec_id order, and the label list.

    Cached per sf_dir for the test session (the build reads one small
    parquet and hashes ~500 short strings)."""
    if sf_dir in _CACHE:
        return _CACHE[sf_dir]
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    langs = sorted({r[2] for r in rows})
    lang_id = {lg: i for i, lg in enumerate(langs)}
    X = np.stack([embed_text(t) for _, t, _ in rows])
    labels = [lang_id[lg] for _, _, lg in rows]
    df = (
        spark.createDataFrame(
            [
                (int(r[0]), [float(x) for x in X[i]], labels[i])
                for i, r in enumerate(rows)
            ],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT",
        )
        .withColumn("norm2", _norm2("embedding"))
        .persist()
    )
    df.count()
    _CACHE[sf_dir] = (df, X, labels)
    return _CACHE[sf_dir]


# ---------------------------------------------------------------------------
# Near-threshold fixture (round-14 verdict #5). The relative gate's
# round-13 boundary (0.75) was validated at ratios 0.61 / 0.88 / 1.48
# — nothing between 0.61 and 0.88 exercised the band the boundary
# actually lives in. This variant adds ONE weighted feature — the
# document's real ``lang`` code, hashed like any other token — to the
# same signed hashed-BoW projection. The weight makes the corpus
# MULTI-BLOB (one blob per language: exactly the geometry of a
# multi-domain/multi-lingual embedding corpus) with blob separation
# dialed by LANG_WEIGHT. Engine-measured sweep (gate ratio → recall
# margin residual−plain): w=3 0.894→+0.03, w=3.5 0.879→+0.01,
# w=4 0.841→+0.05, w=4.5 0.805→+0.05, w=5 0.770→+0.13. The w=5 point
# REFUTED the 0.75 threshold (the gate shipped the 0.13-losing plain
# layout there) and drove the round-14 re-derivation to 0.85; the
# engine-measured ratio, the gate's choice, and its
# recall-consistency are pinned in tests/test_pq_residual.py. Still
# zero RNG: md5 token hashing + real metadata only.

LANG_WEIGHT = 5.0


def embed_text_lang(
    text: str, lang: str, dim: int = DIM, w: float = LANG_WEIGHT
) -> np.ndarray:
    """Signed hashed BoW + one w-weighted lang feature, L2-normalized."""
    v = np.zeros(dim)
    for tok in text.split():
        h = _tok_hash(tok)
        v[h % dim] += 1.0 if (h >> 7) % 2 == 0 else -1.0
    h = _tok_hash("lang:" + lang)
    v[h % dim] += w * (1.0 if (h >> 7) % 2 == 0 else -1.0)
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def langblob_embeddings(spark, sf_dir: str):
    """(df, X, labels) like :func:`realistic_embeddings`, but with the
    near-threshold multi-blob geometry (one blob per lang code)."""
    key = ("langblob", sf_dir)
    if key in _CACHE:
        return _CACHE[key]
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id"
    ).fetchall()
    langs = sorted({r[2] for r in rows})
    lang_id = {lg: i for i, lg in enumerate(langs)}
    X = np.stack([embed_text_lang(t, lg) for _, t, lg in rows])
    labels = [lang_id[lg] for _, _, lg in rows]
    df = (
        spark.createDataFrame(
            [
                (int(r[0]), [float(x) for x in X[i]], labels[i])
                for i, r in enumerate(rows)
            ],
            "vec_id BIGINT, embedding ARRAY<DOUBLE>, label INT",
        )
        .withColumn("norm2", _norm2("embedding"))
        .persist()
    )
    df.count()
    _CACHE[key] = (df, X, labels)
    return _CACHE[key]


def np_truth_pairs(X: np.ndarray, top_k: int = TOP_K) -> set[tuple[int, int]]:
    """Exact top-k cosine pairs (queries = ids < N_QUERIES, candidates
    = the rest), numpy-computed — the recall denominator. Ties broken
    by ascending candidate id, matching the engine's rank window."""
    xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = xn[:N_QUERIES] @ xn[N_QUERIES:].T
    truth: set[tuple[int, int]] = set()
    for qi in range(N_QUERIES):
        # stable sort on (-sim, id): argsort is stable, ids ascend
        top = np.argsort(-sims[qi], kind="stable")[:top_k]
        truth.update((qi, int(ci) + N_QUERIES) for ci in top)
    return truth


def recall_vs_truth(df, truth: set[tuple[int, int]]) -> float:
    got = {
        (r["q_id"], r["c_id"])
        for r in df.select("q_id", "c_id").collect()
    }
    return len(got & truth) / len(truth)
