"""As-of (point-in-time) join — a custom operator Spark lacks natively.

The task-class example from SURVEY §2 scope ("as-of join, range join"):
for each left event, attach the most recent right-side state at-or-before
its timestamp, per key. The legacy band join (legacy_match) covers the
range-join shape; this covers the as-of shape.

Spark has no ASOF JOIN; the composed form is the classic union + ordered
window carry-forward:

1. tag both sides, union on (key, ts)
2. one window per key ordered by (ts, right-first-on-ties) carrying the
   last non-null right payload forward (``last(..., ignorenulls=True)``
   with an unbounded-preceding frame)
3. keep left rows — each now holds the latest right state with
   ``r.ts <= l.ts`` (inclusive, matching DuckDB ASOF semantics)

The DuckDB oracle uses its NATIVE ``ASOF LEFT JOIN`` — the two very
different implementations agreeing row-for-row is the strongest
correctness check in the suite.

Scale: ONE shuffle on the key, per-key sort, linear state — strictly
better than the naive per-left-row subquery (quadratic) and equivalent to
what a native as-of physical operator would do. Right side is pre-reduced
to unique (key, ts) so tie behavior is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table
from .util import sorted_small


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """Generic as-of left join: latest right payload with right.ts <=
    left.ts per key. ``right`` must be unique on (key, ts); the payload
    columns come back as ``asof_<col>`` plus ``asof_ts``."""
    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    l_tag = left.select(
        *left.columns,
        F.lit(0).alias("__is_r"),
        *[F.lit(None).cast(r_types[c]).alias(c) for c in payload_cols],
        F.lit(None).cast(r_types[ts]).alias("__r_ts"),
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).cast(l_types[c]).alias(c)
            for c in left.columns
        ],
        F.lit(1).alias("__is_r"),
        *payload_cols,
        F.col(ts).alias("__r_ts"),
    )
    u = l_tag.unionByName(r_tag)
    # right rows sort BEFORE left rows on equal ts => inclusive (<=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *left.columns,
        "__is_r",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
    )
    return carried.filter(F.col("__is_r") == 0).drop("__is_r")


def asof_purchase_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the user's most recent purchase state
    (at-or-before the click)."""
    ev = load_table(spark, sf_dir, "events", spread=False)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, purchases, "user_id", "ts", ["purchase_value"])
    return sorted_small(
        out.select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof_ts").alias("last_purchase_ts"),
            F.col("asof_purchase_value").alias("last_purchase_value"),
        ),
        "event_id",
    )


ASOF_PURCHASE_STATE_SQL = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, max(value) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts,
       r.ts AS last_purchase_ts,
       r.purchase_value AS last_purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
ORDER BY l.event_id
"""
