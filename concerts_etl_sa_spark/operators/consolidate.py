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

    # ONE-SHUFFLE inverted index: union both sides' postings with a side
    # tag and group by (day, tok), collecting the per-side id lists. The
    # previous form repartitioned EACH side on (day, tok), window-counted
    # df, then shuffle-hash-joined — two exchanges plus two in-partition
    # sorts for the same bucket contents this single groupBy produces
    # (collect_list partially combines map-side via ObjectHashAggregate).
    # Heavy-hitter exclusion becomes a size() filter on the collected
    # lists: a pair contribution for token t survives iff its per-day df
    # is ≤ df_cap on BOTH sides — identical to the oracle's "hot on
    # either side" exclusion, and the cap also bounds bucket memory (a
    # pre-cap giant bucket spills via the sort-based fallback, then dies
    # at the filter instead of fanning out df² pairs).
    posts = (
        sgt.select(
            F.col("sg_id").alias("id"), "day", F.explode("sg_toks").alias("tok"),
            F.lit(0).alias("side"),
        )
        .unionByName(
            dct.select(
                F.col("dc_id").alias("id"), "day",
                F.explode("dc_toks").alias("tok"), F.lit(1).alias("side"),
            )
        )
    )
    buckets = (
        posts.groupBy("day", "tok")
        .agg(
            # collect_list skips nulls: each when() keeps only its side
            F.collect_list(
                F.when(F.col("side") == 0, F.col("id"))
            ).alias("sg_ids"),
            F.collect_list(
                F.when(F.col("side") == 1, F.col("id"))
            ).alias("dc_ids"),
        )
        .filter(
            (F.size("sg_ids") > 0)
            & (F.size("dc_ids") > 0)
            & (F.size("sg_ids") <= df_cap)
            & (F.size("dc_ids") <= df_cap)
        )
    )
    pairs = (
        # in-bucket pair fan-out is a narrow double explode (≤ df_cap²
        # rows per bucket by construction), no join
        buckets.select(F.explode("sg_ids").alias("sg_id"), "dc_ids")
        .select("sg_id", F.explode("dc_ids").alias("dc_id"))
        .groupBy("sg_id", "dc_id")
        .agg(F.count(F.lit(1)).alias("overlap"))
        # Both argmax legs consume the candidate set, and AQE's exchange
        # reuse does not reliably cover the whole pair lineage — persist
        # the SLIM (id, id, overlap) rows so the expensive postings pass
        # runs once. MEMORY_AND_DISK: at 100 TB this spills rather than
        # recomputing the token-index build. Scoped: released when the
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
    # matched is consumed three times below (matched leg + two residual
    # anti-joins) — persist so the argmax legs run once, and broadcast:
    # it is a slim (sg_id, dc_id) set bounded by the SMALLER side's
    # cardinality, i.e. dimension-sized in this domain (events being
    # consolidated), far under executor memory even at full corpus scale.
    matched = scoped_persist(
        "consolidate", best_for_dc.join(best_for_sg, ["sg_id", "dc_id"], "inner")
    )

    # D4/H1 assembly as three SHUFFLE-FREE legs (matched ∪ SG-residual ∪
    # DICE-residual). The previous one-pass full_outer on dc_id shuffled
    # AND sorted both full prepped sides (full outer cannot broadcast in
    # Spark); with matched broadcast, every leg is a broadcast/anti join
    # against data that never leaves its partitions, and the token
    # arrays are dropped before any join so no leg moves fat rows. If
    # the matched set ever outgrew broadcast (fact-scale consolidation),
    # drop the hints and AQE reverts to shuffle joins — same plan shape.
    sgs = sgt.drop("sg_toks")
    dcs = dct.drop("dc_toks").withColumnRenamed("day", "dc_day")
    m_sg = sgs.join(F.broadcast(matched), "sg_id", "inner")
    matched_leg = dcs.join(F.broadcast(m_sg), "dc_id", "inner").select(
        F.coalesce("sg_event_name", "dc_event_name", F.lit("")).alias(
            "event_name"
        ),
        F.col("day").alias("event_datetime_local"),
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
    sg_leg = sgs.join(
        F.broadcast(matched.select("sg_id")), "sg_id", "left_anti"
    ).select(
        F.coalesce("sg_event_name", F.lit("")).alias("event_name"),
        F.col("day").alias("event_datetime_local"),
        F.coalesce("sg_artist_name", F.lit("")).alias("artist"),
        F.coalesce("sg_venue_name", "sg_city", F.lit("")).alias("venue"),
        F.col("sg_tickets").alias("shotgun_tickets_sold"),
        F.lit(None).cast("bigint").alias("dice_tickets_sold"),
        F.col("sg_id").alias("shotgun_event_id"),
        F.lit(None).cast("string").alias("dice_event_id"),
    )
    dc_leg = dcs.join(
        F.broadcast(matched.select("dc_id")), "dc_id", "left_anti"
    ).select(
        F.coalesce("dc_event_name", F.lit("")).alias("event_name"),
        F.col("dc_day").alias("event_datetime_local"),
        F.coalesce("dc_artist_name", F.lit("")).alias("artist"),
        F.coalesce("dc_venue_name", "dc_city", F.lit("")).alias("venue"),
        F.lit(None).cast("bigint").alias("shotgun_tickets_sold"),
        F.col("dc_tickets").alias("dice_tickets_sold"),
        F.lit(None).cast("string").alias("shotgun_event_id"),
        F.col("dc_id").alias("dice_event_id"),
    )
    return (
        matched_leg.unionByName(sg_leg)
        .unionByName(dc_leg)
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


def consolidate_oracle_sql(
    as_of: str = AS_OF,
    df_cap: int = DF_CAP,
    sg_sql: str | None = None,
    dc_sql: str | None = None,
) -> str:
    """DuckDB oracle: identical semantics over the same derived inputs,
    including the DF_CAP heavy-hitter token exclusion. ``sg_sql`` /
    ``dc_sql`` override the source subqueries (default: the flagship's
    fixture derivations) — the landing-lifecycle oracle (rotation #12)
    passes the landing-JSONL parse twins instead; each must yield
    event_id_provider, event_name, city, venue_name, artist_name,
    tickets_sold_total, event_datetime_local."""
    toks = artist_tokens_sql("artist_name", "event_name")
    return f"""
WITH sg_src AS ({sg_sql or shotgun_events_sql()}),
dc_src AS ({dc_sql or dice_events_sql()}),
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
