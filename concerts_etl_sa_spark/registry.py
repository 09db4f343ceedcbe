"""Query registry: every oracle-checked operator query lives here.

Each entry maps a stable name to ``(spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` is the idiomatic-Spark
implementation and ``oracle_sql`` is the equivalent DuckDB SQL the driver
runs side-by-side (SURVEY §5.2). Names are grouped by SURVEY §2 operator
ids. Column names/aliases match between both forms (driver hash contract).

REGISTRATION ORDER IS PART OF THE CONTRACT: the driver's correctness gate
checks the first 50 insertion-order entries. The registry therefore holds
EXACTLY 50 oracle-backed entries, families interleaved so every operator
family lands early: fixtures/flagship, then the L-family north star
(dedup, similarity, multimodal, text analysis), then joins/analytics,
then the scalar suites (same-source scalar ops merged into one-scan
suites — each column is still a distinct §2 op with its own oracle
expression). Rows-only and signature-intermediate queries live in their
modules with pytest coverage instead of burning a window slot.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import dates as Fd
from .functions import ids as Fi
from .functions import money as Fm
from .functions import text as Ft
from .operators import consolidate as C
from .operators import fixtures as FX
from .sources.readers import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}

MAX_ENTRIES = 50  # driver correctness-window size; asserted in tests


def register(name: str, sql: str | None):
    def deco(fn: QueryFn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _sg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return FX.shotgun_events(load_table(spark, sf_dir, "events"))


def _dc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return FX.dice_events(load_table(spark, sf_dir, "events"))


_SG_SQL = FX.shotgun_events_sql()
_DC_SQL = FX.dice_events_sql()


# ===================================================================
# 1-3: Fixtures (FIXTURES.md §B derivations) + flagship (SURVEY §2.D1-D4)
# ===================================================================

@register("fixture_shotgun_events", _SG_SQL)
def q_fixture_sg(spark, sf_dir):
    return _sg(spark, sf_dir)


@register("fixture_dice_events", _DC_SQL)
def q_fixture_dc(spark, sf_dir):
    return _dc(spark, sf_dir)


@register("consolidate_flagship", C.consolidate_oracle_sql())
def q_consolidate(spark, sf_dir):
    return C.consolidate(_sg(spark, sf_dir), _dc(spark, sf_dir))


# round-15 rotation #12 (slot ceded by d7_suppliers_with_returns, see
# the ledger note at the joins block): the §3.1 lifecycle's query path
# end-to-end (generate + scan + A6 dedup + parse cascade + consolidate;
# the sink tail stays bench+pytest covered — see the fn docstring for
# why). Registered EARLY in the window deliberately: the row is
# flagship-sized PLUS the landing generation, and a 1g-heap plain
# session at sf0.1 OOMed when it sat mid-window behind a batch of
# accumulated JVM state (the f4 "keep it early" precedent). Insertion
# order only sequences execution; all 50 entries are gate-checked
# either way.
from .plans import pipeline as PL  # noqa: E402

register("pipeline_landing", PL.PIPELINE_LANDING_SQL)(PL.pipeline_landing)


# ===================================================================
# 4-20: North-star L-family (SURVEY §2.L) — dedup, ANN, multimodal, text
# ===================================================================

from .operators import components as CC  # noqa: E402
from .operators import decontam as DC  # noqa: E402
from .operators import dedup as D  # noqa: E402
from .operators import labelqa as LQ  # noqa: E402
from .operators import multimodal as MM  # noqa: E402
from .operators import pq as PQ  # noqa: E402
from .operators import sampling as SMP  # noqa: E402
from .operators import semdedup as SEM  # noqa: E402
from .operators import similarity as S  # noqa: E402
from .operators import textstats as TS  # noqa: E402

_L_FAMILY = [
    # round-7 rotation #2: l1_exact_dedup (raw documents hold NO exact
    # duplicates at any sf, so every group is size 1 — the collapse
    # mechanics are exercised by the selfunion row below and the
    # NULL-safety by pytest) cedes its slot to l2_semdedup, putting the
    # round's semantic-dedup operator under the driver gate; exact_dedup
    # keeps pytest oracle parity as unreg_* and stays benched
    ("l1_exact_dedup_selfunion", D.exact_dedup_selfunion,
     D.EXACT_DEDUP_SELFUNION_SQL),
    ("l1_minhash_lsh_pairs", D.minhash_lsh_pairs, D.MINHASH_LSH_PAIRS_SQL),
    ("l1_simhash_near_pairs", D.simhash_near_pairs, D.SIMHASH_NEAR_PAIRS_SQL),
    ("l1_ngram_jaccard_pairs", D.ngram_jaccard_pairs, D.NGRAM_JACCARD_PAIRS_SQL),
    ("l1_decontaminate", DC.decontaminate, DC.DECONTAMINATE_SQL),
    # round-7 rotation: duplicate_spans / tfidf_top_terms take the two
    # window slots of the stub-backed l4 resize/frame-sample rows (those
    # keep pytest oracle parity as unreg_*; rationale in SURVEY §8)
    ("l1_duplicate_spans", DC.duplicate_spans, DC.DUPLICATE_SPANS_SQL),
    # round-11 rotation #8: b20_defaults_bundle (single-scan
    # defaults/casts/constants projection — the lowest-information
    # remaining scalar row, same class as rotations 1-5) cedes its slot
    # to the ITERATIVE plan family: pointer-doubled connected components
    # over simhash near-pairs + cluster representatives. The DuckDB twin
    # computes the same fixpoint (min reachable id) via a recursive-CTE
    # transitive closure — structurally a different algorithm, so the
    # hash match checks the fixpoint, not the iteration. b20 keeps
    # pytest oracle parity as unreg_* (rationale in SURVEY §8).
    ("l1_dedup_clusters", CC.dedup_clusters, CC.DEDUP_CLUSTERS_SQL),
    ("l2_topk_cosine_bruteforce", S.topk_cosine_bruteforce,
     S.TOPK_COSINE_BRUTEFORCE_SQL),
    # round-14 rotation #11: l2_topk_cosine_lsh rotated OUT — its
    # sign-LSH banding family (random-hyperplane signs, band keys,
    # bucket equi-join) stays in-window via the RETAINED
    # l2_embedding_near_dup, the same near-redundancy criterion as
    # rotations #9/#10 — in favor of the IVF+SQ8 composition: bit-exact
    # DuckDB parity at three scale factors since round 12 but never
    # in-window, and the pruned plan family (IVF inverted-list equi-join
    # + SQ8 ADC decode-and-rank) was otherwise unexercised by the gate
    # (the in-window sq8 row is a single-scan projection+rank). lsh
    # keeps pytest oracle parity as unreg_* (rationale in SURVEY §8).
    ("l2_topk_cosine_ivfsq8", PQ.topk_cosine_ivfsq8,
     PQ.TOPK_COSINE_IVFSQ8_SQL),
    # round-15 rotation #13: l2_topk_cosine_ivf rotated OUT — its plain
    # list-prune family was in-window TWICE after rotation #11 (ivf and
    # ivfsq8 share the inverted-list equi-join prune; ivfsq8 adds the
    # SQ8 decode on top) — in favor of kNN label-noise detection
    # (Confident Learning neighborhood disagreement): the only operator
    # computing on embeddings.label and a genuinely multi-stage plan
    # (kNN rank window -> per-vector vote -> majority/tie-break
    # aggregation) the window otherwise never exercised. ivf keeps
    # pytest oracle parity as unreg_* and its bench name (rationale in
    # SURVEY §8).
    ("l2_knn_label_noise", LQ.knn_label_noise, LQ.KNN_LABEL_NOISE_SQL),
    ("l2_embedding_near_dup", S.embedding_near_dup_pairs,
     S.EMBEDDING_NEAR_DUP_SQL),
    ("l2_ann_recall", S.ann_recall, S.ANN_RECALL_SQL),
    # round-9 rotation #5: c4_stat_cell_pick (single-scan suffix-
    # exclusion projection, the same low-information class as rotations
    # 1-4) cedes its slot to product-quantized ANN — a multi-stage
    # operator (unit-normalize, per-subspace argmin encode, broadcast
    # ADC lookup scoring, per-query rank) whose driver-scale
    # correctness carries information; stat_cell_pick keeps pytest
    # oracle parity as unreg_* (rationale in SURVEY §8)
    ("l2_topk_cosine_pq", PQ.topk_cosine_pq, PQ.TOPK_COSINE_PQ_SQL),
    # round-9 rotation #6: fixed-K l2_semdedup cedes its slot to the
    # auto-K form — K = max(N//60, 8) derived from count(*), centroids
    # by a modular pick both engines reproduce. The round-9 scale probe
    # measured fixed-K as the ONE super-linear op in the sweep (alpha
    # 1.46 — the documented N^2/K pair growth); auto-K is the paper's
    # answer and the form a 100 TB run would use. Every code path the
    # fixed row exercised (assignment, normalize-once pair stage, keep
    # rule) runs identically here — only the centroid derivation (plus
    # the count() sizing step) differs; fixed keeps unreg_* pytest
    # parity and stays benched (rationale in SURVEY §8).
    ("l2_semdedup_auto", SEM.semdedup_auto, SEM.SEMDEDUP_AUTO_SQL),
    # round-10 rotation #7: l4_media_features (stub decode over the
    # raw-text media table — deterministic md5 + kind-mapped dim, i.e.
    # the oracle re-derives everything from documents.text without any
    # decoding happening on either side) cedes its slot to the REAL-codec
    # form: payloads are actual binary PGM images, the Spark side parses
    # header + raster (pgm_decode) and the DuckDB twin recomputes
    # width/height/mean-intensity arithmetically from the fixture's
    # closed form WITHOUT decoding — a hash match proves the decoder
    # decodes. The stub row keeps pytest oracle parity as unreg_*
    # (rationale in SURVEY §8).
    ("l4_media_features_pgm", MM.media_features_pgm,
     MM.MEDIA_FEATURES_PGM_SQL),
    # one-scan suite of every per-doc text projection (token stats,
    # BPE-ish counts, quality, lang-id, fingerprints) — the standalone
    # per-op queries remain exported and pytest-covered
    ("l3_text_suite", TS.text_suite, TS.TEXT_SUITE_SQL),
    # round-8 rotation #3: l3_pii_redact (single-scan regexp projection,
    # the lowest-information in-window row) cedes its slot to the
    # multi-stage unigram-LM cross-entropy scorer; pii_redact keeps
    # pytest oracle parity as unreg_* and stays benched under its
    # historical name (rationale in SURVEY §8)
    ("l3_unigram_xent", TS.unigram_xent, TS.UNIGRAM_XENT_SQL),
    ("l3_tfidf_top_terms", TS.tfidf_top_terms, TS.TFIDF_TOP_TERMS_SQL),
    # round-9 rotation #4: b18_nested_first (single-scan struct
    # extraction, already pinned by the scalar suites) cedes its slot to
    # the two-stage exact-percentile quality binning; nested_first keeps
    # pytest oracle parity as unreg_* (rationale in SURVEY §8)
    ("l3_quality_deciles", TS.quality_deciles, TS.QUALITY_DECILES_SQL),
    ("l5_mixture_sample", SMP.mixture_sample, SMP.MIXTURE_SAMPLE_SQL),
]

for _name, _fn, _sql in _L_FAMILY:
    register(_name, _sql)(_fn)


# ===================================================================
# 21-25: Join operators (SURVEY §2.D5-D9, D7 anti-joins)
# ===================================================================

from .operators import asof as AS  # noqa: E402
from .operators import legacy_match as L  # noqa: E402


@register(
    "d5d6_legacy_candidates",
    "SELECT ckey, dc_id, sg_name, dc_name, round(sim, 6) AS sim FROM ("
    + L.legacy_candidates_sql()
    + ")",
)
def q_legacy_candidates(spark, sf_dir):
    return L.legacy_candidates(_sg(spark, sf_dir), _dc(spark, sf_dir)).select(
        "ckey", "dc_id", "sg_name", "dc_name", F.round("sim", 6).alias("sim")
    )


@register("d8_legacy_merge", L.legacy_merge_sql())
def q_legacy_merge(spark, sf_dir):
    return L.legacy_merge(_sg(spark, sf_dir), _dc(spark, sf_dir))


register("d9_asof_purchase_state", AS.ASOF_PURCHASE_STATE_SQL)(
    AS.asof_purchase_state
)

from .operators import analytics as A  # noqa: E402

_JOINS_AND_ANALYTICS = [
    ("d7_customers_without_urgent_orders", A.customers_without_urgent_orders,
     A.CUSTOMERS_WITHOUT_URGENT_ORDERS_SQL),
    # round-15 rotation #12: d7_suppliers_with_returns rotated OUT (the
    # second of two same-plan-family anti-join rows — the retained
    # d7_customers_without_urgent_orders keeps the left-anti family
    # in-window) in favor of the §3.1 LIFECYCLE end-to-end
    # (pipeline_landing): deterministic landing JSONL (card dump + dice
    # GraphQL) -> scan -> A6 dedup -> full parse cascade -> consolidate,
    # with the DuckDB twin reading the SAME landing files via read_json
    # and recomputing the whole path. The one query a production user
    # actually runs, pytest+bench only through r14. The row itself is
    # registered near the top of the window (heap-freshness, see there);
    # suppliers_with_returns keeps pytest oracle parity as unreg_*
    # (rationale in SURVEY §8).
    # 26-27: sessionization pair (f4 regressed under the driver in r1 —
    # keep it early in the window)
    ("f4_user_sessions", A.user_sessions, A.USER_SESSIONS_SQL),
    ("f5_session_windows_native", A.session_windows_native,
     A.SESSION_WINDOWS_NATIVE_SQL),
    # 28-42: standard analytics surface (SURVEY §7.1 M5: E/F/G/H)
    ("e1_pricing_summary", A.pricing_summary, A.PRICING_SUMMARY_SQL),
    ("e2_revenue_by_nation", A.revenue_by_nation, A.REVENUE_BY_NATION_SQL),
    ("e3_events_daily_stats", A.events_daily_stats, A.EVENTS_DAILY_STATS_SQL),
    ("e4_rollup_order_stats", A.rollup_order_stats, A.ROLLUP_ORDER_STATS_SQL),
    ("e5_cube_lineitem_stats", A.cube_lineitem_stats, A.CUBE_LINEITEM_STATS_SQL),
    ("e9_grouping_sets_order_stats", A.grouping_sets_order_stats,
     A.GROUPING_SETS_ORDER_STATS_SQL),
    ("e6_price_percentiles", A.price_percentiles, A.PRICE_PERCENTILES_SQL),
    # round-13 rotation #10: e7_daily_distinct_users (daily scan +
    # distinct-count over events — the same daily-bucketed events scan
    # shape the RETAINED e3 row already pins, plus a distinct the h1/e4
    # rows cover) cedes its slot to the SQ8 scalar-quantized ANN index —
    # BIT-EXACT DuckDB parity at three scale factors but no in-window
    # slot until now, and the only compression-family member whose
    # whole build (per-dim min/max + rounding projection + weight-fold
    # scoring) is deterministic one-shot SQL. e7 keeps pytest oracle
    # parity as unreg_e7_daily_distinct_users (rationale in SURVEY §8).
    ("l2_topk_cosine_sq8", PQ.topk_cosine_sq8, PQ.TOPK_COSINE_SQ8_SQL),
    ("f1_running_order_total", A.running_order_total, A.RUNNING_ORDER_TOTAL_SQL),
    # round-12 rotation #9: f2_order_ranks (rank/dense_rank/ntile over
    # the same orders window shape the retained f1/f3 rows already pin)
    # cedes its slot to the JSON-function surface — e10 is the engine's
    # only operator over the semi-structured events.props column, a
    # plan family (from_json typed extraction) the window otherwise
    # never exercises. f2 keeps pytest oracle parity as
    # unreg_f2_order_ranks (rationale in SURVEY §8).
    ("e10_props_json_stats", A.props_json_stats, A.PROPS_JSON_STATS_SQL),
    ("f3_event_lag_lead", A.event_lag_lead, A.EVENT_LAG_LEAD_SQL),
    ("g1_top_customers", A.top_customers, A.TOP_CUSTOMERS_SQL),
    ("g3_topk_parts_per_brand", A.topk_parts_per_brand, A.TOPK_PARTS_PER_BRAND_SQL),
    ("g4_pivot_status_by_priority", A.pivot_status_by_priority,
     A.PIVOT_STATUS_BY_PRIORITY_SQL),
    ("h1_intersect_except", A.intersect_except_custkeys, A.INTERSECT_EXCEPT_SQL),
]

for _name, _fn, _sql in _JOINS_AND_ANALYTICS:
    register(_name, _sql)(_fn)


# ===================================================================
# 43-50: Scalar suites (SURVEY §2.B, C4) — same-source ops share one scan
# ===================================================================

@register(
    "b_sg_scalar_suite",
    "SELECT event_id_provider, "
    + Ft.norm_basic_sql("event_name")
    + " AS norm_name, coalesce(list_aggregate("
    + Ft.artist_tokens_sql("artist_name", "event_name")
    + ", 'string_agg', ' '), '') AS tokens_str, "
    + Ft.slugify_sql("event_name")
    + " AS slug, "
    + Fi.stable_event_id_sql(
        "event_name", "strftime(event_datetime_local, '%Y-%m-%dT%H:%M:%S')"
    )
    + " AS stable_id, round("
    + Ft.similarity_sql("artist_name", "event_name")
    + ", 6) AS name_sim, "
    + Ft.split_artist_sql("event_name")
    + " AS artist_part, "
    + Ft.split_venue_sql("event_name")
    + f" AS venue_part FROM ({_SG_SQL})",
)
def q_sg_scalar_suite(spark, sf_dir):
    """B2 normalize, B4 tokens (+C3/H3 filters), B8 slugify, B9 stable
    key, B16 similarity, B17 artist@venue split — one scan of the SG
    fixture."""
    return _sg(spark, sf_dir).select(
        "event_id_provider",
        Ft.norm_basic(F.col("event_name")).alias("norm_name"),
        F.array_join(
            Ft.artist_tokens(F.col("artist_name"), F.col("event_name")), " "
        ).alias("tokens_str"),
        Ft.slugify(F.col("event_name")).alias("slug"),
        Fi.stable_event_id(
            F.col("event_name"),
            F.date_format("event_datetime_local", "yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("stable_id"),
        F.round(
            Ft.similarity(F.col("artist_name"), F.col("event_name")), 6
        ).alias("name_sim"),
        Ft.split_artist(F.col("event_name")).alias("artist_part"),
        Ft.split_venue(F.col("event_name")).alias("venue_part"),
    )


@register(
    "b_dc_scalar_suite",
    "SELECT event_id_provider, "
    + Ft.norm_name_sql("event_name")
    + " AS canon_name, "
    + Fd.canonical_key_sql("event_name", "event_datetime_local")
    + f" AS canonical_key FROM ({_DC_SQL})",
)
def q_dc_scalar_suite(spark, sf_dir):
    """B1/B3 legacy name canonicalize + B15 canonical composite key over
    the Dice fixture."""
    return _dc(spark, sf_dir).select(
        "event_id_provider",
        Ft.norm_name(F.col("event_name")).alias("canon_name"),
        Fd.canonical_key(
            F.col("event_name"), F.col("event_datetime_local")
        ).alias("canonical_key"),
    )


from .operators import scalar_suite as SS  # noqa: E402

register("b_event_scalar_suite", SS.EVENT_SCALAR_SUITE_SQL)(
    SS.event_scalar_suite
)

register("b10_fr_datetime_cascade", SS.FR_DATETIME_CASCADE_SQL)(
    SS.fr_datetime_cascade
)


@register(
    "b_money_suite",
    f"""
SELECT l_orderkey, l_linenumber, money_text,
       {Fm.parse_money_eur_sql("money_text")} AS amount_eur,
       {Fm.parse_int_sql("int_text")} AS n_tickets
FROM (
  SELECT l_orderkey, l_linenumber,
         replace(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                 '.', ',') || ' €' AS money_text,
         'Vendus: ' || CAST(l_orderkey % 500 AS VARCHAR)
                    || ' billets' AS int_text
  FROM lineitem
)
""",
)
def q_money_suite(spark, sf_dir):
    """B6 fr-FR money parse + B7 int extraction (K3 try_* per-row
    isolation) — one scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    money_text = F.concat(
        F.regexp_replace(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            r"\.", ",",
        ),
        F.lit(" €"),
    )
    int_text = F.concat(
        F.lit("Vendus: "), (F.col("l_orderkey") % 500).cast("string"),
        F.lit(" billets"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money_text.alias("money_text"),
        Fm.parse_money_eur(money_text).alias("amount_eur"),
        Fm.parse_int(int_text).alias("n_tickets"),
    )


# b18_nested_first rotated out in round 9 (slot ceded to
# l3_quality_deciles), c4_stat_cell_pick rotated out in round 9 (slot
# ceded to l2_topk_cosine_pq), b20_defaults_bundle rotated out in round
# 11 (slot ceded to l1_dedup_clusters) — parity kept as unreg_* in
# tests/test_oracle_parity.py; SS.defaults_bundle / its SQL stay
# exported for that test and the bench.


assert len(_REGISTRY) <= MAX_ENTRIES, (
    f"registry has {len(_REGISTRY)} entries; the driver only "
    f"correctness-checks the first {MAX_ENTRIES}"
)
