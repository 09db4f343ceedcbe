"""Flagship consolidation join (SURVEY §2.D1-D4, E1-E2, F1, G1, H1, C1-C2).

Reference: concerts_etl/core/consolidate_events.py:69-169 — a single-process
greedy loop: day-bucketed hash index (D1), per-DICE argmax on artist-token
overlap (D2), first-come-first-served 1:1 consumption (D3), three-way union
with heterogeneous columns (D4/H1), past-date filter (C2), sort (G1).

Spark re-spec (SURVEY §7.3.1): the greedy order-dependent matching becomes
**deterministic bidirectional best-match**: a (sg, dice) pair survives iff
it is rank-1 for the dice row AND rank-1 for the sg row, ranked by
(overlap DESC, id ASC). Order-independent, oracle-reproducible.

Scale design (100 TB):
- The fuzzy predicate (token overlap) is *always* pre-blocked by the day
  equi-key (exactly the reference's D1 trick) — the join shuffles both
  sides on ``day``, so there is no unbounded cross join anywhere; AQE
  handles skewed days (spark.sql.adaptive.skewJoin). At extreme per-day
  cardinality add city to the blocking key or salt the day key.
- Everything below is JVM builtins inside WholeStageCodegen: tokenization
  is a scalar projection, overlap is ``size(array_intersect(...))``, the
  1:1 constraint is two window functions over the (small) candidate-pair
  set, residuals are anti-joins on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import artist_tokens, artist_tokens_sql
from ._cachescope import begin_scope, scoped_persist
from .fixtures import AS_OF, dice_events_sql, shotgun_events_sql

# Per-day, per-side token document-frequency cap. A token appearing in
# more than DF_CAP same-day rows on either side ("festival", a city name
# that slipped the stopword filter) generates O(df²) candidate pairs in
# the inverted-index join — the one quadratic risk at 100×. Such tokens
# are discriminative-noise: they co-occur with nearly everything that
# day, so dropping them from pair GENERATION (both engines, identical
# semantics) bounds every (day, token) bucket at DF_CAP² pairs while
# leaving rank-1 matching driven by the rare tokens that actually
# identify an event. The cap is mirrored in the DuckDB oracle, so it is
# part of the operator's contract, not a scale-only approximation.
DF_CAP = 256


def _prep(df: DataFrame, side: str) -> DataFrame:
    """Add day key + token array; drop undated rows (C1); prefix columns.

    The tokenize projection stays in the scan stage deliberately: at real
    scale the scan has natural split parallelism, and the postings
    explode immediately repartitions on the blocking key anyway — an
    id-repartition before tokenizing was measured wall-neutral locally
    (the single-split scan overlaps other stages) and is a pure extra
    shuffle at scale."""
    out = (
        df.filter(F.col("event_datetime_local").isNotNull())
        .select(
            F.col("event_id_provider").alias(f"{side}_id"),
            F.col("event_name").alias(f"{side}_event_name"),
            F.col("city").alias(f"{side}_city"),
            F.col("venue_name").alias(f"{side}_venue_name"),
            F.col("artist_name").alias(f"{side}_artist_name"),
            F.col("tickets_sold_total").alias(f"{side}_tickets"),
            F.to_date("event_datetime_local").alias("day"),
            artist_tokens(F.col("artist_name"), F.col("event_name")).alias(
                f"{side}_toks"
            ),
        )
    )
    return out


def consolidate(
    sg: DataFrame, dc: DataFrame, as_of: str = AS_OF, df_cap: int = DF_CAP
) -> DataFrame:
    """Day-blocked token-overlap consolidation; returns CONSOLIDATED_EVENT rows.

    Physical strategy (100 TB hot path):
    - The pair phase is an **inverted token-index join**: explode each
      side's (distinct) token array and equi-join on ``(day, token)``,
      then ``groupBy(sg_id, dc_id).count()`` — the count over distinct
      tokens IS ``size(array_intersect(...))``, but only co-token pairs
      are ever materialized (a day-only block compares every same-day
      pair, quadratic in day size). Join-key cardinality is
      #days × #tokens, so shuffle parallelism survives any file layout;
      both sides are explicitly repartitioned on the blocking key.
    - **DF_CAP bounds bucket skew**: per-day heavy-hitter tokens (df >
      ``df_cap`` on either side) are anti-joined out of the postings
      before the pair join, so no (day, token) bucket can exceed
      df_cap² pairs. The hot-token set is heavy-hitters-only (tiny) →
      broadcast anti-join, no extra shuffle; the df aggregation reuses
      the postings' (day, tok) exchange. Mirrored in the oracle SQL.
    - Matching runs on SLIM rows (ids + overlap); matched ids are
      decorated afterwards by id-equi joins (high-cardinality keys,
      broadcast-able matched set, AQE decides).
    """
    begin_scope("consolidate")
    # The prepped sides are consumed twice each (token postings + final
    # assembly) and their lineage is the regex-heavy fixture derivation —
    # persist the slim prepped rows so it runs once per side. They are
    # dimension-sized (the events being consolidated, not the token
    # explosion), so this is a small cache at any scale.
    sgt = scoped_persist("consolidate", _prep(sg, "sg"))
    dct = scoped_persist("consolidate", _prep(dc, "dc"))

    # Heavy-hitter exclusion with ZERO extra scans/shuffles: a window
    # count over the postings' own (day, tok) shuffle partitioning. A
    # pair contribution for token t survives iff its per-day df is
    # ≤ df_cap on BOTH sides (dropping either side's posting kills the
    # pair), which is exactly the oracle's "hot on either side" token
    # exclusion. Cost is one in-partition sort — no broadcast barrier,
    # no second pass over the inputs.
    w_df = Window.partitionBy("day", "tok")

    def _capped_postings(side: DataFrame, id_col: str, toks: str) -> DataFrame:
        return (
            side.select(id_col, "day", F.explode(toks).alias("tok"))
            .repartition("day", "tok")
            .withColumn("df", F.count(F.lit(1)).over(w_df))
            .filter(F.col("df") <= df_cap)
            .drop("df")
        )

    sg_tok = _capped_postings(sgt, "sg_id", "sg_toks")
    dc_tok = _capped_postings(dct, "dc_id", "dc_toks")
    pairs = (
        # shuffle_hash: the per-partition token postings easily fit a hash
        # map and SMJ's sort of both exploded sides is pure overhead
        sg_tok.hint("shuffle_hash")
        .join(dc_tok, ["day", "tok"], "inner")
        .groupBy("sg_id", "dc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        # Both argmax legs consume the candidate set, and AQE's exchange
        # reuse does not reliably cover the whole pair lineage — persist
        # the SLIM (id, id, overlap) rows so the expensive postings join
        # runs once. MEMORY_AND_DISK: at 100 TB this spills rather than
        # recomputing two token-index joins. Scoped: released when the
        # next consolidate() call begins (no per-session accumulation).
    )
    pairs = scoped_persist("consolidate", pairs)

    # Bidirectional rank-1 as two ARGMAX aggregations, not rank windows:
    # min(struct(-overlap, id)) is exactly "ORDER BY overlap DESC, id ASC
    # LIMIT 1" per group, but a hash aggregate partially combines on the
    # map side — the candidate-pair set (quadratic-ish in per-day artist
    # frequency) collapses to one row per entity BEFORE the shuffle,
    # where a row_number window would shuffle and fully sort every pair
    # twice. The two argmax legs share the pairs exchange (identical
    # subplan → ReusedExchange).
    best_for_dc = (
        pairs.groupBy("dc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("overlap")).alias("neg_overlap"),
                    F.col("sg_id").alias("sg_id"),
                )
            ).alias("b")
        )
        .select("dc_id", F.col("b.sg_id").alias("sg_id"))
    )
    best_for_sg = (
        pairs.groupBy("sg_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("overlap")).alias("neg_overlap"),
                    F.col("dc_id").alias("dc_id"),
                )
            ).alias("b")
        )
        .select("sg_id", F.col("b.dc_id").alias("dc_id"))
    )
    matched = best_for_dc.join(best_for_sg, ["sg_id", "dc_id"], "inner")

    # D4/H1 assembly in ONE pass (matched ∪ SG-residual ∪ DICE-residual):
    # attach each SG row's matched dc_id (null if unmatched), then
    # full-outer against DICE on dc_id — unmatched SG rows carry a null
    # join key (never equal), unmatched DICE rows surface on the right
    # side. The expensive match lineage is consumed exactly once; no
    # anti-joins, no union re-scan.
    assembled = sgt.join(matched, "sg_id", "left").join(
        dct.withColumnRenamed("day", "dc_day"), "dc_id", "full_outer"
    )
    return (
        assembled.select(
            F.coalesce("sg_event_name", "dc_event_name", F.lit("")).alias(
                "event_name"
            ),
            F.coalesce("day", "dc_day").alias("event_datetime_local"),
            F.coalesce("sg_artist_name", "dc_artist_name", F.lit("")).alias(
                "artist"
            ),
            F.coalesce(
                "sg_venue_name", "dc_venue_name", "sg_city", "dc_city", F.lit("")
            ).alias("venue"),
            F.col("sg_tickets").alias("shotgun_tickets_sold"),
            F.col("dc_tickets").alias("dice_tickets_sold"),
            F.col("sg_id").alias("shotgun_event_id"),
            F.col("dc_id").alias("dice_event_id"),
        )
        .filter(F.col("event_datetime_local") >= F.lit(as_of))
        # G1 total order WITHOUT orderBy's range-sampling pass (which
        # recomputes the whole match lineage to pick partition bounds —
        # ~35% of query time). The consolidated snapshot is dimension-
        # sized output, so one explicit shuffle to a single partition +
        # in-partition sort gives the same total order in one pass; a
        # 100 TB-output variant would swap back to orderBy and eat the
        # sampling pass.
        .repartition(1)
        .sortWithinPartitions("event_datetime_local", F.lower("event_name"))
    )


def consolidate_oracle_sql(as_of: str = AS_OF, df_cap: int = DF_CAP) -> str:
    """DuckDB oracle: identical semantics over the same derived inputs,
    including the DF_CAP heavy-hitter token exclusion."""
    toks = artist_tokens_sql("artist_name", "event_name")
    return f"""
WITH sg_src AS ({shotgun_events_sql()}),
dc_src AS ({dice_events_sql()}),
sgt AS (
  SELECT event_id_provider AS sg_id, event_name AS sg_event_name,
         city AS sg_city, venue_name AS sg_venue_name,
         artist_name AS sg_artist_name, tickets_sold_total AS sg_tickets,
         CAST(event_datetime_local AS DATE) AS day, {toks} AS sg_toks
  FROM sg_src WHERE event_datetime_local IS NOT NULL
),
dct AS (
  SELECT event_id_provider AS dc_id, event_name AS dc_event_name,
         city AS dc_city, venue_name AS dc_venue_name,
         artist_name AS dc_artist_name, tickets_sold_total AS dc_tickets,
         CAST(event_datetime_local AS DATE) AS day, {toks} AS dc_toks
  FROM dc_src WHERE event_datetime_local IS NOT NULL
),
hot AS (
  SELECT day, tok FROM (
    SELECT day, unnest(sg_toks) AS tok FROM sgt
  ) GROUP BY day, tok HAVING count(*) > {df_cap}
  UNION
  SELECT day, tok FROM (
    SELECT day, unnest(dc_toks) AS tok FROM dct
  ) GROUP BY day, tok HAVING count(*) > {df_cap}
),
hot_by_day AS (SELECT day, list(tok) AS hot_toks FROM hot GROUP BY day),
pairs AS (
  SELECT * FROM (
    SELECT sgt.sg_id, sgt.sg_event_name, sgt.sg_city, sgt.sg_venue_name,
           sgt.sg_artist_name, sgt.sg_tickets, sgt.day,
           dct.dc_id, dct.dc_event_name, dct.dc_city, dct.dc_venue_name,
           dct.dc_artist_name, dct.dc_tickets,
           len(list_intersect(
             list_filter(sgt.sg_toks,
                         t -> NOT coalesce(list_contains(h.hot_toks, t),
                                           false)),
             dct.dc_toks)) AS overlap
    FROM sgt JOIN dct ON sgt.day = dct.day
    LEFT JOIN hot_by_day h ON h.day = sgt.day
  ) WHERE overlap > 0
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY dc_id ORDER BY overlap DESC, sg_id) AS rn_d,
         row_number() OVER (PARTITION BY sg_id ORDER BY overlap DESC, dc_id) AS rn_s
  FROM pairs
),
matched AS (SELECT * FROM ranked WHERE rn_d = 1 AND rn_s = 1),
unioned AS (
  SELECT coalesce(sg_event_name, dc_event_name, '') AS event_name,
         day AS event_datetime_local,
         coalesce(sg_artist_name, dc_artist_name, '') AS artist,
         coalesce(sg_venue_name, dc_venue_name, sg_city, dc_city, '') AS venue,
         sg_tickets AS shotgun_tickets_sold,
         dc_tickets AS dice_tickets_sold,
         sg_id AS shotgun_event_id,
         dc_id AS dice_event_id
  FROM matched
  UNION ALL
  SELECT coalesce(sg_event_name, ''), day,
         coalesce(sg_artist_name, ''),
         coalesce(sg_venue_name, sg_city, ''),
         sg_tickets, NULL, sg_id, NULL
  FROM sgt WHERE sg_id NOT IN (SELECT sg_id FROM matched)
  UNION ALL
  SELECT coalesce(dc_event_name, ''), day,
         coalesce(dc_artist_name, ''),
         coalesce(dc_venue_name, dc_city, ''),
         NULL, dc_tickets, NULL, dc_id
  FROM dct WHERE dc_id NOT IN (SELECT dc_id FROM matched)
)
SELECT * FROM unioned
WHERE event_datetime_local >= DATE '{as_of}'
ORDER BY event_datetime_local, lower(event_name)
"""
