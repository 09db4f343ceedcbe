"""Money / integer extraction (SURVEY §2.B6-B7).

Reference: concerts_etl/adapters/shotgun.py:33-45 (fr-FR money strings,
nbsp-tolerant int extraction). Reference stores money as float; the engine
standardizes on ``DecimalType(18,2)`` at rest (SURVEY §7.3.5) and exposes a
double variant for oracle-compared expressions.

Both forms (Spark Column / DuckDB SQL) are lookahead-free — DuckDB's RE2
has no lookahead, so thousand-dots are dropped by plain replacement (valid
for fr-FR where ',' is the decimal separator).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"(-?\d+(?:\.\d+)?)"

# €, nbsp, narrow-nbsp, regular space, thousand-dot — all dropped
_STRIP_CHARS = "€   ."


def parse_money_eur(c: Column) -> Column:
    """First signed amount in an fr-FR money string -> double (null if none).

    Pipeline mirrors shotgun.py:33-39: strip €/nbsp/narrow-nbsp/space,
    drop thousand-dots, comma -> decimal point, first number.
    """
    t = F.translate(F.coalesce(c, F.lit("")), _STRIP_CHARS, "")
    t = F.translate(t, ",", ".")
    m = F.regexp_extract(t, _NUM, 1)
    return F.when(m == "", F.lit(None).cast("double")).otherwise(m.cast("double"))


def parse_money_eur_sql(e: str) -> str:
    t = f"translate(coalesce({e}, ''), '€   .', '')"
    t = f"translate({t}, ',', '.')"
    m = f"regexp_extract({t}, '{_NUM}', 1)"
    return f"CASE WHEN {m} = '' THEN NULL ELSE CAST({m} AS DOUBLE) END"


def parse_money_eur_decimal(c: Column) -> Column:
    """DecimalType(18,2) variant for at-rest storage (§7.3.5) — the
    landing-path normalization (sources/shotgun_cards.py) stores money
    through this; the plain double form above is for oracle-compared
    expressions only."""
    return parse_money_eur(c).cast("decimal(18,2)")


def parse_int(c: Column) -> Column:
    """First digit run (nbsp treated as space) -> bigint (shotgun.py:41-45)."""
    t = F.translate(F.coalesce(c, F.lit("")), "  ", "  ")
    m = F.regexp_extract(t, r"(\d+)", 1)
    return F.when(m == "", F.lit(None).cast("bigint")).otherwise(m.cast("bigint"))


def parse_int_sql(e: str) -> str:
    t = f"translate(coalesce({e}, ''), '  ', '  ')"
    m = f"regexp_extract({t}, '(\\d+)', 1)"
    return f"CASE WHEN {m} = '' THEN NULL ELSE CAST({m} AS BIGINT) END"
