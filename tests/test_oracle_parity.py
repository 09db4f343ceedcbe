"""Core correctness gate: every registered query vs its DuckDB oracle.

Mirrors the driver's CORRECTNESS check (row-count + sorted-column schema +
order-insensitive canonical value comparison) at sf0.001 for speed; the
driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb
import pytest

from .conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(round(v, 9))
    if isinstance(v, _dec.Decimal):
        return repr(round(float(v), 9))
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _all_queries():
    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    entries = [(name, qs[name], oracles.get(name)) for name in qs]
    # Oracle-backed ops NOT in the registry (the driver window holds 50
    # entries; these signature intermediates are consumed by their
    # *_pairs registry entries) still get pytest-level oracle parity.
    from concerts_etl_sa_spark.operators import analytics as A
    from concerts_etl_sa_spark.operators import dedup as D
    from concerts_etl_sa_spark.operators import multimodal as MM
    from concerts_etl_sa_spark.operators import pq as PQ
    from concerts_etl_sa_spark.operators import semdedup as SEM
    from concerts_etl_sa_spark.operators import similarity as S

    _sem_fixed, _SEM_FIXED_SQL = SEM.semdedup, SEM.SEMDEDUP_SQL

    from concerts_etl_sa_spark.operators import sampling as SP
    from concerts_etl_sa_spark.operators import scalar_suite as SS
    from concerts_etl_sa_spark.operators import textstats as TS

    entries += [
        # rotated out of the driver window (raw docs hold no exact
        # dupes; the selfunion row covers the collapse) — parity kept
        ("unreg_l1_exact_dedup", D.exact_dedup, D.EXACT_DEDUP_SQL),
        # round-9 rotation #6: fixed-K semdedup ceded its slot to the
        # auto-K form (same semdedup_df body, different centroid
        # derivation) — parity kept
        ("unreg_l2_semdedup_fixed", _sem_fixed, _SEM_FIXED_SQL),
        ("unreg_minhash_signatures", D.minhash_signatures,
         D.MINHASH_SIGNATURES_SQL),
        ("unreg_simhash_signatures", D.simhash_signatures,
         D.SIMHASH_SIGNATURES_SQL),
        ("unreg_l2_ivf_recall", S.ivf_recall, S.IVF_RECALL_SQL),
        ("unreg_l2_near_dup_quality", S.near_dup_quality,
         S.NEAR_DUP_QUALITY_SQL),
        # the oracle here is the FULL brute-force top-k: the incremental
        # merge must be algebraically equivalent to recomputation
        ("unreg_l2_topk_incremental", S.topk_cosine_incremental,
         S.TOPK_COSINE_INCREMENTAL_SQL),
        ("unreg_l1_simhash_quality", D.simhash_quality,
         D.SIMHASH_QUALITY_SQL),
        ("unreg_l1_minhash_quality", D.minhash_quality,
         D.MINHASH_QUALITY_SQL),
        ("unreg_l1_minhash_lsh_join", D.minhash_lsh_join,
         D.MINHASH_LSH_JOIN_SQL),
        ("unreg_l3_repetition_stats", TS.repetition_stats,
         TS.REPETITION_STATS_SQL),
        # round-10: the n-gram generalization of unigram_xent (Laplace
        # bigram over truncated broadcast tables) — window full, parity
        # pinned here like the rest of the l3 extras
        ("unreg_l3_bigram_xent", TS.bigram_xent, TS.BIGRAM_XENT_SQL),
        # round-11: the n=3 family member (two truncated broadcast
        # tables — trigram + bigram-context — row-side composed-zip_with
        # trigram build, logp clamped <= 0)
        ("unreg_l3_trigram_xent", TS.trigram_xent, TS.TRIGRAM_XENT_SQL),
        # round-15 rotation #12: suppliers_with_returns rotated OUT of
        # the driver window (slot ceded to pipeline_landing — the §3.1
        # lifecycle end-to-end); parity kept — the left-anti plan family
        # stays in-window via the retained d7_customers_without_urgent_orders
        ("unreg_d7_suppliers_with_returns", A.suppliers_with_returns,
         A.SUPPLIERS_WITH_RETURNS_SQL),
        # round-15 rotation #13: knn_label_noise rotated INTO the driver
        # window (l2_knn_label_noise); the slot's former occupant keeps
        # parity here — the inverted-list prune family stays in-window
        # via the retained l2_topk_cosine_ivfsq8
        ("unreg_l2_topk_cosine_ivf", S.topk_cosine_ivf,
         S.TOPK_COSINE_IVF_SQL),
        # round-12 rotation #9: f2 rotated out of the driver window
        # (slot ceded to e10_props_json_stats — the JSON plan family) —
        # parity kept; f1/f3 retain the orders/events window shapes
        ("unreg_f2_order_ranks", A.order_ranks, A.ORDER_RANKS_SQL),
        ("unreg_l3_vocab_topk", TS.vocab_topk, TS.VOCAB_TOPK_SQL),
        # rotated out of the driver window in round 8 (slot ceded to
        # l3_unigram_xent) — parity kept
        ("unreg_l3_pii_redact", TS.pii_redact, TS.PII_REDACT_SQL),
        ("unreg_l5_stratified_split", SP.stratified_split,
         SP.STRATIFIED_SPLIT_SQL),
        ("unreg_l5_per_source_sample", SP.per_source_sample,
         SP.PER_SOURCE_SAMPLE_SQL),
        # rotated INTO the driver window in round 9 (l3_quality_deciles)
        # — the unreg parity row for b18_nested_first took its place
        ("unreg_b18_nested_first", SS.nested_first, SS.NESTED_FIRST_SQL),
        # rotated out of the driver window in round 9 (slot ceded to
        # l2_topk_cosine_pq) — parity kept
        ("unreg_c4_stat_cell_pick", SS.stat_cell_pick,
         SS.STAT_CELL_PICK_SQL),
        # rotated out of the driver window in round 11 (slot ceded to
        # l1_dedup_clusters, rotation #8) — parity kept
        ("unreg_b20_defaults_bundle", SS.defaults_bundle,
         SS.DEFAULTS_BUNDLE_SQL),
        # round-15 (verdict #7): the ITERATIVE trained-codebook class
        # under a DuckDB oracle — the oracle-form fused Lloyd's (min-id
        # init, fixed iterations, per-iteration round-to-6dp centroids;
        # each contract change exists to make the trainer a DuckDB
        # one-shot, rationale in operators/pq.py) vs 3 UNROLLED Lloyd
        # iterations as chained CTEs. Bit-exact 10/10 at sf0.01+sf0.1
        # at derivation; the production trainer (hash init, early stop,
        # sample bound) stays pytest-pinned in tests/test_pq.py.
        ("unreg_l2_pq_trained_oracle", PQ.topk_cosine_pq_trained_oracle,
         PQ.TOPK_COSINE_PQ_TRAINED_ORACLE_SQL),
        # round-9 IVF+PQ composition (fixed coarse + fixed codebook):
        # the window is full, so the FAISS-style production shape is
        # parity-pinned here
        ("unreg_l2_topk_cosine_ivfpq", PQ.topk_cosine_ivfpq,
         PQ.TOPK_COSINE_IVFPQ_SQL),
        # round-13 rotation #10: sq8 rotated INTO the driver window
        # (l2_topk_cosine_sq8); the slot's former occupant keeps parity
        # here — e7's daily scan shape stays pinned by the retained e3
        ("unreg_e7_daily_distinct_users", A.daily_distinct_users,
         A.DAILY_DISTINCT_USERS_SQL),
        # round-14 rotation #11: ivfsq8 rotated INTO the driver window
        # (l2_topk_cosine_ivfsq8); the slot's former occupant keeps
        # parity here — the sign-LSH banding family stays in-window via
        # the retained l2_embedding_near_dup
        ("unreg_l2_topk_cosine_lsh", S.topk_cosine_lsh,
         S.TOPK_COSINE_LSH_SQL),
        ("unreg_l5_mixture_plan", SP.mixture_plan, SP.MIXTURE_PLAN_SQL),
        ("unreg_l5_mixture_sample_planned", SP.mixture_sample_planned,
         SP.MIXTURE_SAMPLE_PLANNED_SQL),
        # rotated OUT of the driver window in round 7 (stub-backed in
        # this container) — still oracle-parity-checked here
        ("unreg_l4_media_resize", MM.media_resize, MM.MEDIA_RESIZE_SQL),
        # round-10 rotation #7: the stub-decode features row ceded its
        # window slot to the real-codec l4_media_features_pgm — parity
        # kept (the stub table is still the multimodal plumbing contract
        # for containers without any codec)
        ("unreg_l4_media_features", MM.media_features,
         MM.MEDIA_FEATURES_SQL),
        ("unreg_l4_frame_sample", MM.frame_sample, MM.FRAME_SAMPLE_SQL),
        # round-9: REAL-codec resize — Spark decodes actual PGM bytes,
        # the oracle recomputes the resized payload from the closed-form
        # pixel function; parity proves the decoder decodes
        ("unreg_l4_media_resize_decoded", MM.media_resize_decoded,
         MM.MEDIA_RESIZE_DECODED_SQL),
    ]
    return entries


@pytest.mark.parametrize(
    "name,fn,sql", _all_queries(), ids=[n for n, _, _ in _all_queries()]
)
def test_query_matches_oracle(spark, oracle, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        assert srows is not None  # rows-only check (non-SQL-expressible op)
        return
    res = oracle.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column sets differ"
    assert len(srows) == len(orows), "row counts differ"
    order = sorted(range(len(ocols)), key=lambda i: sorted(sdf.columns)[i])
    idx_s = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    idx_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    slines = sorted("\x01".join(canon(r[i]) for i in idx_s) for r in srows)
    olines = sorted("\x01".join(canon(r[i]) for i in idx_o) for r in orows)
    assert slines == olines, f"value mismatch for {name}"
