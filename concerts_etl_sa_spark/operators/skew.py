"""Skew-handling join/aggregate utilities (SURVEY §4 item 3).

AQE's skew-join split (spark.sql.adaptive.skewJoin, on in session.py)
handles most runtime skew; these are the EXPLICIT tools for the cases AQE
can't fix at 100 TB:

- ``salted_join``      : a shuffle join whose key has pathological hot
  values (one key = 30% of a 100 TB fact table won't fit one task even
  after AQE splits — the matching dimension rows must be replicated).
  Fact side gets a deterministic salt (xxhash64 of stable row columns),
  dim side is exploded across all salts; the join key becomes
  (key, salt) so one hot key spreads over ``n_salt`` tasks.
- ``salted_distinct_count`` : two-phase distinct on a skewed group key —
  partial distinct on (key, salt-of-value), then final merge. The same
  shape Spark uses internally for count(distinct); exposed for composed
  pipelines that need it under a custom aggregation.

Both are semantics-preserving (results identical to the unsalted form) —
asserted in tests/test_skew.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    salt_from: Sequence[str] | None = None,
    n_salt: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join fact⋈dim on ``on`` with a salted key.

    ``salt_from``: fact columns hashed into the salt (defaults to every
    fact column — deterministic, no ``rand()``, so retries/speculative
    tasks recompute identical salts and the plan stays reproducible).
    The dim side is replicated ``n_salt`` times — only viable when dim is
    the small side (the usual skew scenario: huge fact, modest dim whose
    broadcast threshold is exceeded).
    """
    cols = list(salt_from or fact.columns)
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, value: str, n_salt: int = DEFAULT_SALTS
) -> DataFrame:
    """count(DISTINCT value) per group_key via two-phase salted dedup:
    stage 1 dedups (key, salt(value), value) — hot groups spread over
    n_salt reducers; stage 2 sums per-salt distinct counts (exact,
    because salting partitions the value space)."""
    salted = df.select(
        group_key,
        value,
        F.pmod(F.xxhash64(F.col(value)), F.lit(n_salt)).alias("__salt"),
    )
    partial = (
        salted.groupBy(group_key, "__salt")
        .agg(F.countDistinct(value).alias("__partial"))
    )
    return partial.groupBy(group_key).agg(
        F.sum("__partial").alias(f"n_distinct_{value}")
    )
