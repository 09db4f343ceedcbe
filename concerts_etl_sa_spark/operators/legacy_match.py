"""Legacy consolidation path (SURVEY §2.D5-D8, B14-B16, E4).

Reference: concerts_etl/core/matching.py:46-99 — the older merge algorithm
(no in-repo caller, but part of the operator inventory):

1. index SG rows by canonical key (norm_name + 5-min-floored ts); dict
   insertion dedups, last row wins (D8 / E4, matching.py:51-62)
2. for each DICE row, scan SG entries: same-day guard + 30-minute band
   (D5, matching.py:70-75), normalized-name similarity >= 0.90 argmax
   (D6, matching.py:77-79)
3. winner gets the dice ticket count attached (matching.py:81-86);
   losers become independent rows upserted by their own canonical key —
   overwriting any SG row that shares the key (D7/D8, matching.py:87-97)

Deterministic re-spec (SURVEY §7.3/7.4):
- "last wins" (dict overwrite / ticket re-attach) is input-order-dependent
  in the reference; the engine orders by the numeric suffix of
  event_id_provider (the ingest order key) — same result for in-order
  input, deterministic under any partitioning.
- similarity is normalized Levenshtein, not difflib (SURVEY §7.3.2).
- the reference lets NULL-dated rows skip the day/band guards entirely,
  which is an unbounded cross join at scale; the engine requires both
  sides dated for candidate pairs (undated DICE rows go straight to the
  independent-row path; undated SG rows key as '...|na' and never match).
  Documented divergence — at 100 TB every fuzzy join must be blocked by
  an equi key (here: calendar day), per SURVEY §4.

Scale notes: candidate generation shuffles both sides on ``day`` (equi
key) and applies the band + similarity as post-join predicates within
day-buckets; windows partition by row keys (high cardinality, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dates import (
    canonical_key,
    canonical_key_from_norm,
    canonical_key_sql,
)
from ..functions.text import norm_name, similarity_norm, similarity_sql
from ._cachescope import begin_scope, scoped_persist
from .fixtures import dice_events_sql, shotgun_events_sql

BAND_SECONDS = 30 * 60  # hour_tolerance_min=30 (matching.py:47)
SIM_THRESHOLD = 0.90    # name_threshold (matching.py:47)

import os as _os

# A/B instrumentation for the assembly-leg broadcast hints (matched-set
# frames; see legacy_merge). Default ON; SPARK_GRAFT_D8_BROADCAST=0
# reproduces the shuffle-join variant for matched-conditions comparisons
# — the documented fallback if matches ever outgrow broadcast.
_HINT_BROADCAST = _os.environ.get("SPARK_GRAFT_D8_BROADCAST", "1") == "1"


def _bc(df: DataFrame) -> DataFrame:
    return F.broadcast(df) if _HINT_BROADCAST else df


def _ord(id_col):
    """Numeric ingest-order key from 'sg-<n>' / 'dc-<n>' ids."""
    return F.substring(id_col, 4, 18).cast("bigint")


def _sg_indexed(sg: DataFrame) -> DataFrame:
    """SG rows deduped by canonical key, last (highest-ord) wins (D8).

    ARGMAX aggregate, not a rank window (the round-5 IVF-assignment
    template): ``max(struct(ord, payload...))`` picks the identical row —
    ``ord`` is unique per provider row, so the payload fields never
    decide, and a null ord loses to any non-null exactly like the
    window's default nulls-last DESC — but a hash aggregate partially
    combines map-side, collapsing each key's rows BEFORE the exchange,
    where the window form shuffled and fully sorted every input row."""
    keyed = sg.select(
        canonical_key(F.col("event_name"), F.col("event_datetime_local")).alias("ckey"),
        F.struct(
            _ord(F.col("event_id_provider")).alias("ord"),
            F.col("event_name").alias("sg_name"),
            F.col("event_datetime_local").alias("sg_dt"),
            F.col("tickets_sold_total").alias("sg_tickets"),
        ).alias("row"),
    )
    return (
        keyed.groupBy("ckey")
        .agg(F.max("row").alias("b"))
        .select(
            "ckey",
            # every row in a ckey group shares the same norm_name (it IS
            # the key's name component, and norm output never contains
            # '|'), so the winner's normalized name is recoverable from
            # the key itself — downstream consumers (the candidate join)
            # reuse it instead of re-running the regex cascade, the
            # dominant per-row CPU of this path
            F.element_at(F.split("ckey", r"\|"), 1).alias("sg_norm"),
            "b.sg_name",
            "b.sg_dt",
            "b.sg_tickets",
        )
    )


def legacy_candidates(
    sg: DataFrame,
    dc: DataFrame,
    sgi: DataFrame | None = None,
    dcd: DataFrame | None = None,
) -> DataFrame:
    """D5+D6 candidate pairs: same day, |Δt| <= 30 min, sim >= 0.90.

    ``sgi`` / ``dcd`` let :func:`legacy_merge` pass its already-persisted
    SG index and slim dice projection so neither the dedup aggregate nor
    the regex-heavy dice fixture derivation is re-derived as a second
    lineage (``dcd`` needs dc_id, dc_name, dc_dt, dc_tickets).

    Physical strategy (100 TB hot path):
    - Block the band join on 30-min epoch buckets, not just the calendar
      day: SG keeps its own bucket, DICE fans out to {b-1, b, b+1} so any
      pair within ±30 min shares exactly one join key. Candidate volume
      drops from |day-bucket|² to ~|30min-bucket|² × 3 (≈16× fewer pairs
      when events spread across a day) and the shuffle key cardinality
      rises from #days to #days×48, fixing shuffle parallelism too.
    - ``norm_name`` (a 3-regex cascade) is computed ONCE per row before
      the join; the per-pair work is a single levenshtein.
    """
    sgi = _sg_indexed(sg) if sgi is None else sgi
    if "sg_norm" not in sgi.columns:
        sgi = sgi.withColumn("sg_norm", norm_name(F.col("sg_name")))
    sgi = sgi.filter(F.col("sg_dt").isNotNull()).withColumn(
        "bkt", F.floor(F.col("sg_dt").cast("double") / BAND_SECONDS)
    )
    if dcd is None:
        dcd = dc.select(
            F.col("event_id_provider").alias("dc_id"),
            F.col("event_name").alias("dc_name"),
            F.col("event_datetime_local").alias("dc_dt"),
            F.col("tickets_sold_total").alias("dc_tickets"),
        )
    if "dc_norm" not in dcd.columns:
        dcd = dcd.withColumn("dc_norm", norm_name(F.col("dc_name")))
    dcd = (
        dcd.filter(F.col("dc_dt").isNotNull())
        .select(
            "dc_id",
            "dc_name",
            "dc_dt",
            "dc_tickets",
            "dc_norm",
            F.floor(
                F.col("dc_dt").cast("double") / BAND_SECONDS
            ).alias("dc_bkt"),
        )
        # fan DICE out to its bucket and both neighbors: a |Δt|<=band pair
        # lands in exactly one (sg.bkt == dc fan-out) key — no duplicates
        .withColumn(
            "bkt",
            F.explode(
                F.array(
                    F.col("dc_bkt") - 1, F.col("dc_bkt"), F.col("dc_bkt") + 1
                )
            ),
        )
        .drop("dc_bkt")
    )
    return (
        sgi.hint("shuffle_hash").join(dcd, "bkt", "inner")
        .filter(
            (F.to_date("sg_dt") == F.to_date("dc_dt"))
            & (
                F.abs(
                    F.col("sg_dt").cast("double") - F.col("dc_dt").cast("double")
                )
                <= BAND_SECONDS
            )
        )
        # sound levenshtein prefilter: sim >= t implies the length gap is
        # <= (1-t) * max_len (an edit is needed per missing char), so the
        # O(len^2) levenshtein runs only on length-compatible pairs —
        # cheap integer guard first, quadratic similarity second.
        # Exact integer arithmetic: (1.0 - 0.90) is 0.09999… in IEEE
        # double, which drops pairs whose gap is EXACTLY (1-t)*max_len
        # (sim exactly t, kept by the threshold). Scale both sides by 100.
        .filter(
            F.abs(F.length("sg_norm") - F.length("dc_norm")) * 100
            <= int(round((1.0 - SIM_THRESHOLD) * 100))
            * F.greatest(F.length("sg_norm"), F.length("dc_norm"))
        )
        .withColumn("sim", similarity_norm(F.col("sg_norm"), F.col("dc_norm")))
        .filter(F.col("sim") >= SIM_THRESHOLD)
        .drop("bkt", "sg_norm", "dc_norm")
    )


def legacy_merge(sg: DataFrame, dc: DataFrame) -> DataFrame:
    """Full legacy merge -> one row per canonical_event_key (matching.py:46-99)."""
    # cached: the candidate join (via legacy_candidates -> _sg_indexed)
    # and the SG-side assembly both consume the deduped index, and the
    # canonical_key regex cascade + dedup window are the per-row-heavy
    # part of this plan. Scoped: released when the next legacy_merge()
    # call begins, so registry re-runs don't accumulate cached RDDs.
    begin_scope("legacy_merge")
    sgi = scoped_persist("legacy_merge", _sg_indexed(sg))
    # dcd is consumed by the candidate join, the ticket-attach join AND
    # the D7 anti-join, and its lineage is the regex-heavy dice fixture
    # derivation — persist the slim projection so that derivation runs
    # once. dc_norm is computed HERE (inside the persist) so the
    # normalization cascade runs one single time per dice row: the
    # candidate join and the unmatched-row canonical key both reuse it.
    dcd = scoped_persist(
        "legacy_merge",
        dc.select(
            F.col("event_id_provider").alias("dc_id"),
            F.col("event_name").alias("dc_name"),
            F.col("event_datetime_local").alias("dc_dt"),
            F.col("tickets_sold_total").alias("dc_tickets"),
            _ord(F.col("event_id_provider")).alias("dc_ord"),
            norm_name(F.col("event_name")).alias("dc_norm"),
        ),
    )

    cand = legacy_candidates(sg, dc, sgi=sgi, dcd=dcd)

    # best SG per dice: sim desc, then canonical key asc (deterministic).
    # ARGMAX aggregate, not a rank window: min(struct(-sim, ckey)) is the
    # same rank-1 row (tie-break identical), but partially combines
    # map-side so the candidate-pair set collapses to one row per dc_id
    # BEFORE the exchange — the window form shuffled and sorted every
    # candidate pair. Cached: both the ticket-attach join and the D7
    # anti-join consume it, and without materialization the whole
    # candidate lineage (bucket join + levenshtein) re-executes per
    # consumer.
    best = scoped_persist(
        "legacy_merge",
        cand.groupBy("dc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("sim")).alias("neg_sim"),
                    F.col("ckey").alias("ckey"),
                )
            ).alias("b")
        )
        .select("dc_id", F.col("b.ckey").alias("ckey")),
    )

    # attach: last (highest-ord) matched dice per SG key wins the ticket
    # slot — argmax again (dc_ord is unique, so dc_tickets never decides).
    # ``best`` is the MATCHED-pair frame (bounded by the fuzzy-match hit
    # count, far below either input); broadcasting it keeps the slim dcd
    # side un-shuffled here and in the D7 anti-join below. Fallback if
    # matches ever outgrow broadcast: drop the hints — every join is
    # already key-equi and AQE picks shuffle strategies (the flagship
    # assembly documents the same trade).
    attached = (
        _bc(best).join(dcd, "dc_id")
        .groupBy("ckey")
        .agg(
            F.max(
                F.struct(
                    F.col("dc_ord").alias("ord"),
                    F.col("dc_tickets").alias("dc_tickets"),
                )
            ).alias("b")
        )
        .select("ckey", F.col("b.dc_tickets").alias("attached_dc_tickets"))
    )

    sg_rows = sgi.join(_bc(attached), "ckey", "left").select(
        F.col("ckey").alias("canonical_event_key"),
        F.col("sg_name").alias("event_name"),
        F.col("sg_dt").alias("event_datetime_local"),
        F.col("sg_tickets").alias("tickets_sold_total_shotgun"),
        F.col("attached_dc_tickets").alias("tickets_sold_total_dice"),
        F.lit(0).alias("prio"),
        F.lit(0).cast("bigint").alias("ord"),
    )

    # D7: unmatched dice -> independent rows keyed by their canonical key
    # (built from the persisted dc_norm — no second normalization pass)
    dice_rows = (
        dcd.join(_bc(best), "dc_id", "left_anti")
        .select(
            canonical_key_from_norm(
                F.col("dc_norm"), F.col("dc_dt")
            ).alias("canonical_event_key"),
            F.col("dc_name").alias("event_name"),
            F.col("dc_dt").alias("event_datetime_local"),
            F.lit(None).cast("bigint").alias("tickets_sold_total_shotgun"),
            F.col("dc_tickets").alias("tickets_sold_total_dice"),
            F.lit(1).alias("prio"),
            F.col("dc_ord").alias("ord"),
        )
    )

    # D8 upsert: dice rows inserted after SG rows win key collisions;
    # among dice rows the later (higher ord) wins. Argmax over the union:
    # (prio, ord) is unique within a key group — the SG side contributes
    # at most one row per ckey (deduped index, prio=0/ord=0) and dice
    # ords are distinct — so max(struct(prio, ord, payload...)) is
    # exactly the rank-1 row and the payload fields never decide; the
    # union's fat rows collapse map-side instead of being shuffled and
    # fully sorted by the window.
    return (
        sg_rows.unionByName(dice_rows)
        .groupBy("canonical_event_key")
        .agg(
            F.max(
                F.struct(
                    "prio",
                    "ord",
                    "event_name",
                    "event_datetime_local",
                    "tickets_sold_total_shotgun",
                    "tickets_sold_total_dice",
                )
            ).alias("b")
        )
        .select(
            "canonical_event_key",
            "b.event_name",
            "b.event_datetime_local",
            "b.tickets_sold_total_shotgun",
            "b.tickets_sold_total_dice",
        )
    )


# ------------------------------------------------------------- oracle SQL

def _sg_indexed_sql() -> str:
    ck = canonical_key_sql("event_name", "event_datetime_local")
    return f"""
SELECT ckey, sg_name, sg_dt, sg_tickets FROM (
  SELECT {ck} AS ckey, event_name AS sg_name,
         event_datetime_local AS sg_dt,
         tickets_sold_total AS sg_tickets,
         row_number() OVER (
           PARTITION BY {ck}
           ORDER BY CAST(substr(event_id_provider, 4, 18) AS BIGINT) DESC
         ) AS rn
  FROM ({shotgun_events_sql()})
) WHERE rn = 1
"""


def legacy_candidates_sql() -> str:
    sim = similarity_sql("sg_name", "dc_name")
    return f"""
SELECT * FROM (
  SELECT sgi.ckey, sgi.sg_name, sgi.sg_dt, sgi.sg_tickets,
         dcd.dc_id, dcd.dc_name, dcd.dc_dt, dcd.dc_tickets,
         {sim} AS sim
  FROM ({_sg_indexed_sql()}) sgi
  JOIN (
    SELECT event_id_provider AS dc_id, event_name AS dc_name,
           event_datetime_local AS dc_dt, tickets_sold_total AS dc_tickets
    FROM ({dice_events_sql()})
    WHERE event_datetime_local IS NOT NULL
  ) dcd
    ON CAST(sgi.sg_dt AS DATE) = CAST(dcd.dc_dt AS DATE)
   AND abs(epoch(sgi.sg_dt) - epoch(dcd.dc_dt)) <= {BAND_SECONDS}
  WHERE sgi.sg_dt IS NOT NULL
) WHERE sim >= {SIM_THRESHOLD}
"""


def legacy_merge_sql() -> str:
    dc_ck = canonical_key_sql("dc_name", "dc_dt")
    return f"""
WITH sgi AS ({_sg_indexed_sql()}),
dcd AS (
  SELECT event_id_provider AS dc_id, event_name AS dc_name,
         event_datetime_local AS dc_dt, tickets_sold_total AS dc_tickets,
         CAST(substr(event_id_provider, 4, 18) AS BIGINT) AS dc_ord
  FROM ({dice_events_sql()})
),
cand AS ({legacy_candidates_sql()}),
best AS (
  SELECT dc_id, ckey FROM (
    SELECT dc_id, ckey,
           row_number() OVER (PARTITION BY dc_id ORDER BY sim DESC, ckey) AS rn
    FROM cand
  ) WHERE rn = 1
),
attached AS (
  SELECT ckey, dc_tickets AS attached_dc_tickets FROM (
    SELECT best.ckey, dcd.dc_tickets, dcd.dc_ord,
           row_number() OVER (PARTITION BY best.ckey ORDER BY dcd.dc_ord DESC) AS rn
    FROM best JOIN dcd USING (dc_id)
  ) WHERE rn = 1
),
sg_rows AS (
  SELECT sgi.ckey AS canonical_event_key, sg_name AS event_name,
         sg_dt AS event_datetime_local,
         sg_tickets AS tickets_sold_total_shotgun,
         attached.attached_dc_tickets AS tickets_sold_total_dice,
         0 AS prio, CAST(0 AS BIGINT) AS ord
  FROM sgi LEFT JOIN attached ON sgi.ckey = attached.ckey
),
dice_rows AS (
  SELECT {dc_ck} AS canonical_event_key, dc_name AS event_name,
         dc_dt AS event_datetime_local,
         NULL AS tickets_sold_total_shotgun,
         dc_tickets AS tickets_sold_total_dice,
         1 AS prio, dc_ord AS ord
  FROM dcd WHERE dc_id NOT IN (SELECT dc_id FROM best)
)
SELECT canonical_event_key, event_name, event_datetime_local,
       tickets_sold_total_shotgun, tickets_sold_total_dice
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY canonical_event_key ORDER BY prio DESC, ord DESC
  ) AS rn
  FROM (SELECT * FROM sg_rows UNION ALL SELECT * FROM dice_rows)
) WHERE rn = 1
"""
