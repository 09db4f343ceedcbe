"""Query registry: every oracle-checked operator query lives here.

Each entry maps a stable name to ``(spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame`` is the idiomatic-Spark
implementation and ``oracle_sql`` is the equivalent DuckDB SQL the driver
runs side-by-side (SURVEY §5.2). Names are grouped by SURVEY §2 operator
ids. Column names/aliases match between both forms (driver hash contract).
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
# Fixtures (FIXTURES.md §B derivations — oracle-checks the shared base)
# ===================================================================

@register("fixture_shotgun_events", _SG_SQL)
def q_fixture_sg(spark, sf_dir):
    return _sg(spark, sf_dir)


@register("fixture_dice_events", _DC_SQL)
def q_fixture_dc(spark, sf_dir):
    return _dc(spark, sf_dir)


# ===================================================================
# Flagship consolidation (SURVEY §2.D1-D4)
# ===================================================================

@register("consolidate_flagship", C.consolidate_oracle_sql())
def q_consolidate(spark, sf_dir):
    return C.consolidate(_sg(spark, sf_dir), _dc(spark, sf_dir))


# ===================================================================
# Scalar library (SURVEY §2.B) — each over the derived provider rows
# ===================================================================

@register(
    "b02_norm_basic",
    f"SELECT event_id_provider, {Ft.norm_basic_sql('event_name')} AS norm_name"
    f" FROM ({_SG_SQL})",
)
def q_norm_basic(spark, sf_dir):
    return _sg(spark, sf_dir).select(
        "event_id_provider", Ft.norm_basic(F.col("event_name")).alias("norm_name")
    )


@register(
    "b03_norm_name_legacy",
    f"SELECT event_id_provider, {Ft.norm_name_sql('event_name')} AS canon_name"
    f" FROM ({_DC_SQL})",
)
def q_norm_name(spark, sf_dir):
    return _dc(spark, sf_dir).select(
        "event_id_provider", Ft.norm_name(F.col("event_name")).alias("canon_name")
    )


@register(
    "b04_artist_tokens",
    "SELECT event_id_provider, coalesce(list_aggregate("
    + Ft.artist_tokens_sql("artist_name", "event_name")
    + ", 'string_agg', ' '), '') AS tokens_str"
    + f" FROM ({_SG_SQL})",
)
def q_artist_tokens(spark, sf_dir):
    return _sg(spark, sf_dir).select(
        "event_id_provider",
        F.array_join(
            Ft.artist_tokens(F.col("artist_name"), F.col("event_name")), " "
        ).alias("tokens_str"),
    )


@register(
    "b06_money_parse",
    f"""
SELECT l_orderkey, l_linenumber, money_text,
       {Fm.parse_money_eur_sql("money_text")} AS amount_eur
FROM (
  SELECT l_orderkey, l_linenumber,
         replace(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                 '.', ',') || ' \u20ac' AS money_text
  FROM lineitem
)
""",
)
def q_money(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    money_text = F.concat(
        F.regexp_replace(
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string"),
            r"\.", ",",
        ),
        F.lit(" €"),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money_text.alias("money_text"),
        Fm.parse_money_eur(money_text).alias("amount_eur"),
    )


@register(
    "b07_int_parse",
    f"""
SELECT o_orderkey, {Fm.parse_int_sql("int_text")} AS n_tickets
FROM (
  SELECT o_orderkey, 'Vendus: ' || CAST(o_orderkey % 500 AS VARCHAR)
         || ' billets' AS int_text
  FROM orders
)
""",
)
def q_int(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    int_text = F.concat(
        F.lit("Vendus: "), (F.col("o_orderkey") % 500).cast("string"),
        F.lit(" billets"),
    )
    return o.select(
        "o_orderkey", Fm.parse_int(int_text).alias("n_tickets")
    )


@register(
    "b08_slugify",
    f"SELECT event_id_provider, {Ft.slugify_sql('event_name')} AS slug"
    f" FROM ({_SG_SQL})",
)
def q_slug(spark, sf_dir):
    return _sg(spark, sf_dir).select(
        "event_id_provider", Ft.slugify(F.col("event_name")).alias("slug")
    )


@register(
    "b09_stable_event_id",
    "SELECT event_id_provider, "
    + Fi.stable_event_id_sql(
        "event_name", "strftime(event_datetime_local, '%Y-%m-%dT%H:%M:%S')"
    )
    + f" AS stable_id FROM ({_SG_SQL})",
)
def q_stable_id(spark, sf_dir):
    return _sg(spark, sf_dir).select(
        "event_id_provider",
        Fi.stable_event_id(
            F.col("event_name"),
            F.date_format("event_datetime_local", "yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("stable_id"),
    )


@register(
    "b14_round5",
    f"SELECT event_id, {Fd.round5_sql('ts')} AS ts5 FROM events",
)
def q_round5(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", Fd.round5(F.col("ts")).alias("ts5"))


@register(
    "b15_canonical_key",
    "SELECT event_id_provider, "
    + Fd.canonical_key_sql("event_name", "event_datetime_local")
    + f" AS canonical_key FROM ({_DC_SQL})",
)
def q_canonical_key(spark, sf_dir):
    return _dc(spark, sf_dir).select(
        "event_id_provider",
        Fd.canonical_key(
            F.col("event_name"), F.col("event_datetime_local")
        ).alias("canonical_key"),
    )


@register(
    "b16_similarity",
    "SELECT event_id_provider, round("
    + Ft.similarity_sql("artist_name", "event_name")
    + f", 6) AS name_sim FROM ({_SG_SQL})",
)
def q_similarity(spark, sf_dir):
    return _sg(spark, sf_dir).select(
        "event_id_provider",
        F.round(
            Ft.similarity(F.col("artist_name"), F.col("event_name")), 6
        ).alias("name_sim"),
    )


@register("b16_similarity_difflib", None)
def q_similarity_difflib(spark, sf_dir):
    """Bit-exact reference metric (pandas UDF) — rows-only by design:
    Ratcliff/Obershelp has no SQL analog (SURVEY §7.3.2); the levenshtein
    twin b16_similarity carries the oracle burden."""
    return _sg(spark, sf_dir).select(
        "event_id_provider",
        F.round(
            Ft.similarity_difflib(F.col("artist_name"), F.col("event_name")), 6
        ).alias("name_sim_difflib"),
    )


@register(
    "b17_artist_venue_split",
    "SELECT event_id_provider, "
    + Ft.split_artist_sql("event_name")
    + " AS artist_part, "
    + Ft.split_venue_sql("event_name")
    + f" AS venue_part FROM ({_SG_SQL})",
)
def q_split_av(spark, sf_dir):
    sg = _sg(spark, sf_dir)
    return sg.select(
        "event_id_provider",
        Ft.split_artist(F.col("event_name")).alias("artist_part"),
        Ft.split_venue(F.col("event_name")).alias("venue_part"),
    )


@register(
    "b19_status_derive",
    f"""
SELECT event_id, {Ft.derive_status_sql("card_text")} AS status
FROM (
  SELECT event_id, CASE WHEN event_id % 4 = 0
         THEN 'Complet — plus de places'
         ELSE 'Places disponibles' END AS card_text
  FROM events
)
""",
)
def q_status(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    card_text = F.when(
        F.col("event_id") % 4 == 0, F.lit("Complet — plus de places")
    ).otherwise(F.lit("Places disponibles"))
    return ev.select(
        "event_id", Ft.derive_status(card_text).alias("status")
    )


# ===================================================================
# Remaining scalar rows (SURVEY §2.B5, B10-B13, B18, B20-B27, C4)
# ===================================================================

from .operators import scalar_suite as SS  # noqa: E402

_SCALARS = [
    ("b05_date_extraction", SS.date_extraction, SS.DATE_EXTRACTION_SQL),
    ("b10_fr_datetime_cascade", SS.fr_datetime_cascade,
     SS.FR_DATETIME_CASCADE_SQL),
    ("b12_iso_roundtrip", SS.iso_roundtrip, SS.ISO_ROUNDTRIP_SQL),
    ("b18_nested_first", SS.nested_first, SS.NESTED_FIRST_SQL),
    ("b20_defaults_bundle", SS.defaults_bundle, SS.DEFAULTS_BUNDLE_SQL),
    ("c4_stat_cell_pick", SS.stat_cell_pick, SS.STAT_CELL_PICK_SQL),
]

for _name, _fn, _sql in _SCALARS:
    register(_name, _sql)(_fn)


# ===================================================================
# Legacy consolidation path (SURVEY §2.D5-D8)
# ===================================================================

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


# ===================================================================
# As-of join (custom operator beyond the reference; DuckDB-native oracle)
# ===================================================================

from .operators import asof as AS  # noqa: E402

register("d9_asof_purchase_state", AS.ASOF_PURCHASE_STATE_SQL)(
    AS.asof_purchase_state
)


# ===================================================================
# Standard analytics surface (SURVEY §7.1 M5: E/F/G/H operators)
# ===================================================================

from .operators import analytics as A  # noqa: E402

_ANALYTICS = [
    ("e1_pricing_summary", A.pricing_summary, A.PRICING_SUMMARY_SQL),
    ("e2_revenue_by_nation", A.revenue_by_nation, A.REVENUE_BY_NATION_SQL),
    ("e3_events_daily_stats", A.events_daily_stats, A.EVENTS_DAILY_STATS_SQL),
    ("e4_rollup_order_stats", A.rollup_order_stats, A.ROLLUP_ORDER_STATS_SQL),
    ("e5_cube_lineitem_stats", A.cube_lineitem_stats, A.CUBE_LINEITEM_STATS_SQL),
    ("e9_grouping_sets_order_stats", A.grouping_sets_order_stats,
     A.GROUPING_SETS_ORDER_STATS_SQL),
    ("f1_running_order_total", A.running_order_total, A.RUNNING_ORDER_TOTAL_SQL),
    ("f2_order_ranks", A.order_ranks, A.ORDER_RANKS_SQL),
    ("f3_event_lag_lead", A.event_lag_lead, A.EVENT_LAG_LEAD_SQL),
    ("f4_user_sessions", A.user_sessions, A.USER_SESSIONS_SQL),
    ("f5_session_windows_native", A.session_windows_native,
     A.SESSION_WINDOWS_NATIVE_SQL),
    ("e6_price_percentiles", A.price_percentiles, A.PRICE_PERCENTILES_SQL),
    ("e7_daily_distinct_users", A.daily_distinct_users,
     A.DAILY_DISTINCT_USERS_SQL),
    # sketch-based approximations: rows-only check by design (the exact
    # twins above carry the value-level correctness burden)
    ("e8_approx_daily_stats", A.approx_daily_stats, None),
    ("g4_pivot_status_by_priority", A.pivot_status_by_priority,
     A.PIVOT_STATUS_BY_PRIORITY_SQL),
    ("g1_top_customers", A.top_customers, A.TOP_CUSTOMERS_SQL),
    ("g3_topk_parts_per_brand", A.topk_parts_per_brand, A.TOPK_PARTS_PER_BRAND_SQL),
    ("h1_intersect_except", A.intersect_except_custkeys, A.INTERSECT_EXCEPT_SQL),
    ("d7_customers_without_urgent_orders", A.customers_without_urgent_orders,
     A.CUSTOMERS_WITHOUT_URGENT_ORDERS_SQL),
    ("d7_suppliers_with_returns", A.suppliers_with_returns,
     A.SUPPLIERS_WITH_RETURNS_SQL),
]

for _name, _fn, _sql in _ANALYTICS:
    register(_name, _sql)(_fn)


# ===================================================================
# North-star extensions (SURVEY §2.L): text analysis, dedup, ANN
# ===================================================================

from .operators import dedup as D  # noqa: E402
from .operators import similarity as S  # noqa: E402
from .operators import textstats as TS  # noqa: E402

_EXTENSIONS = [
    ("l3_token_stats", TS.token_stats, TS.TOKEN_STATS_SQL),
    ("l3_bpe_token_count", TS.bpe_token_count, TS.BPE_TOKEN_COUNT_SQL),
    ("l3_quality_score", TS.quality_score, TS.QUALITY_SCORE_SQL),
    ("l3_lang_id", TS.lang_id, TS.LANG_ID_SQL),
    ("l3_fingerprint", TS.fingerprint, TS.FINGERPRINT_SQL),
    ("l1_exact_dedup", D.exact_dedup, D.EXACT_DEDUP_SQL),
    ("l1_exact_dedup_selfunion", D.exact_dedup_selfunion,
     D.EXACT_DEDUP_SELFUNION_SQL),
    ("l1_minhash_signatures", D.minhash_signatures, D.MINHASH_SIGNATURES_SQL),
    ("l1_minhash_lsh_pairs", D.minhash_lsh_pairs, D.MINHASH_LSH_PAIRS_SQL),
    ("l1_simhash_signatures", D.simhash_signatures, D.SIMHASH_SIGNATURES_SQL),
    ("l1_simhash_near_pairs", D.simhash_near_pairs, D.SIMHASH_NEAR_PAIRS_SQL),
    ("l1_ngram_jaccard_pairs", D.ngram_jaccard_pairs, D.NGRAM_JACCARD_PAIRS_SQL),
    ("l2_topk_cosine_bruteforce", S.topk_cosine_bruteforce,
     S.TOPK_COSINE_BRUTEFORCE_SQL),
    ("l2_topk_cosine_lsh", S.topk_cosine_lsh, S.TOPK_COSINE_LSH_SQL),
    ("l2_topk_cosine_ivf", S.topk_cosine_ivf, S.TOPK_COSINE_IVF_SQL),
    ("l2_embedding_near_dup", S.embedding_near_dup_pairs,
     S.EMBEDDING_NEAR_DUP_SQL),
]

for _name, _fn, _sql in _EXTENSIONS:
    register(_name, _sql)(_fn)


# ===================================================================
# Multimodal binary columns (SURVEY §2.L4) — mapInPandas plumbing
# ===================================================================

from .operators import multimodal as MM  # noqa: E402

register("l4_media_features", MM.MEDIA_FEATURES_SQL)(MM.media_features)
register("l4_media_resize", MM.MEDIA_RESIZE_SQL)(MM.media_resize)
register("l4_frame_sample", MM.FRAME_SAMPLE_SQL)(MM.frame_sample)
