"""Unit tests for the scalar Column library (SURVEY §2.B semantics).

Each case pins reference behavior (file:line in the function docstrings)
on hand-picked inputs, including the FIXTURES.md §B edge cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.functions import dates as Fd
from concerts_etl_sa_spark.functions import ids as Fi
from concerts_etl_sa_spark.functions import money as Fm
from concerts_etl_sa_spark.functions import text as Ft


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_norm_basic_accents_and_whitespace(spark):
    assert _one(spark, Ft.norm_basic(F.lit("  Désiré   MÜLLER  "))) == "desire muller"
    assert _one(spark, Ft.norm_basic(F.lit(None))) == ""


def test_artist_tokens_separators(spark):
    cases = {
        "Angèle feat Stromae": ["angele", "stromae"],
        "Polo & Pan": ["pan", "polo"],
        "A x B x Camille": ["camille"],  # a, b too short; x is separator
        "Christine and the Queens": ["christine", "queens"],
        "DJ Snake @ Olympia": ["olympia", "snake"],  # dj len<=2? 'dj' len 2 dropped
        "La Femme - Trabendo": ["femme", "trabendo"],
    }
    for raw, expected in cases.items():
        got = _one(spark, Ft.artist_tokens(F.lit(raw)))
        assert got == expected, f"{raw}: {got} != {expected}"


def test_artist_tokens_stopword_only_name(spark):
    # FIXTURES edge 4: stopword/short-token-only names produce no tokens
    assert _one(spark, Ft.artist_tokens(F.lit("The X"))) == []
    assert _one(spark, Ft.artist_tokens(F.lit("Le On"))) == []


def test_norm_name_legacy_stopwords(spark):
    assert _one(spark, Ft.norm_name(F.lit("Angèle LIVE Concert"))) == "angele"
    assert _one(spark, Ft.norm_name(F.lit("The Tour"))) == "the"


def test_similarity_bounds(spark):
    assert _one(spark, Ft.similarity(F.lit("Angèle"), F.lit("Angele"))) == 1.0
    s = _one(spark, Ft.similarity(F.lit("Angèle"), F.lit("Angèle Live")))
    assert s == 1.0  # 'live' is a legacy stopword
    s2 = _one(spark, Ft.similarity(F.lit("Phoenix"), F.lit("Justice")))
    assert 0.0 <= s2 < 0.9


def test_legacy_prefilter_length_band_boundary(spark):
    """Pin the D5/D6 prefilter's exact-boundary arithmetic (round-2 bug).

    A pair whose length gap is EXACTLY (1-t)*max_len has sim exactly t and
    must survive both the prefilter and the threshold: with float
    arithmetic (1.0-0.90)*20 = 1.9999... < 2 drops it (the
    'Rone x Désiré Dubois' / 'Rone & Désiré Dubois' regression); the
    integer-scaled guard keeps it.
    """
    from concerts_etl_sa_spark.operators.legacy_match import SIM_THRESHOLD

    # norm lengths 20 vs 18: gap 2 == (1-0.9)*20, levenshtein 2 => sim 0.90
    a, b = F.lit("rone x desire dubois"), F.lit("rone desire dubois")
    la, lb = F.length(a), F.length(b)
    guard = _one(
        spark,
        (
            F.abs(la - lb) * 100
            <= int(round((1.0 - SIM_THRESHOLD) * 100)) * F.greatest(la, lb)
        ),
    )
    assert guard is True
    sim = _one(spark, Ft.similarity_norm(a, b))
    assert sim == SIM_THRESHOLD
    # and the float form really is broken on this input (regression pin)
    broken = _one(spark, F.abs(la - lb) <= (1.0 - SIM_THRESHOLD) * F.greatest(la, lb))
    assert broken is False


def test_money_parse_fr_formats(spark):
    cases = {
        "1 234,56 €": 1234.56,
        "12.345 €": 12345.0,
        "1 234,56 €": 1234.56,
        "1 234€": 1234.0,
        "-45,5": -45.5,
        "gratuit": None,
    }
    for raw, expected in cases.items():
        got = _one(spark, Fm.parse_money_eur(F.lit(raw)))
        assert got == expected, f"{raw}: {got} != {expected}"


def test_int_parse(spark):
    assert _one(spark, Fm.parse_int(F.lit("Vendus: 1 234 billets"))) == 1
    assert _one(spark, Fm.parse_int(F.lit("842 tickets"))) == 842
    assert _one(spark, Fm.parse_int(F.lit("aucun"))) is None


def test_slugify_and_stable_id(spark):
    assert _one(spark, Ft.slugify(F.lit("Désiré @ L'Olympia!"))) == "desire-l-olympia"
    sid1 = _one(
        spark, Fi.stable_event_id(F.lit("Angèle"), F.lit("2024-01-15T20:00:00"))
    )
    sid2 = _one(
        spark, Fi.stable_event_id(F.lit("Angèle"), F.lit("2024-01-15T20:00:00"))
    )
    assert sid1 == sid2 and sid1.startswith("angele-") and len(sid1.split("-")[-1]) == 8
    # empty name falls back to 'event' (shotgun.py:51)
    sid3 = _one(spark, Fi.stable_event_id(F.lit(""), F.lit(None)))
    assert sid3.startswith("event-")


def test_round5_and_canonical_key(spark):
    got = _one(
        spark, Fd.round5(F.to_timestamp(F.lit("2024-01-15 20:03:59")))
    )
    assert got.minute == 0 and got.second == 0
    key = _one(
        spark,
        Fd.canonical_key(
            F.lit("Angèle Live"), F.to_timestamp(F.lit("2024-01-15 20:07:00"))
        ),
    )
    assert key == "angele|2024-01-15T20:05"
    key_null = _one(spark, Fd.canonical_key(F.lit("Angèle"), F.lit(None)))
    assert key_null == "angele|na"


def test_artist_venue_split(spark):
    # FIXTURES edge 3
    assert _one(spark, Ft.split_artist(F.lit("Angèle @ Olympia"))) == "Angèle"
    assert _one(spark, Ft.split_venue(F.lit("Angèle @ Olympia"))) == "Olympia"
    assert _one(spark, Ft.split_artist(F.lit("La Femme - Trabendo"))) == "La Femme"
    assert _one(spark, Ft.split_venue(F.lit("Justice"))) is None
    assert _one(spark, Ft.split_artist(F.lit("Justice"))) == "Justice"


def test_fr_datetime_cascade(spark):
    # FIXTURES edge 14: ISO fast path + FR pattern (shotgun.py:56-84, 307-373)
    iso = _one(spark, Fd.parse_event_datetime(F.lit("2025-11-29T19:00")))
    assert iso is not None and iso.year == 2025 and iso.hour == 19
    fr = _one(spark, Fd.parse_event_datetime(F.lit("ven. 10 oct. 2025 19:30")))
    assert fr is not None and (fr.month, fr.day, fr.hour, fr.minute) == (10, 10, 19, 30)
    aout = _one(spark, Fd.parse_event_datetime(F.lit("15 août 2025 21:00")))
    assert aout is not None and aout.month == 8
    assert _one(spark, Fd.parse_event_datetime(F.lit("bientôt"))) is None


def test_status_derive(spark):
    assert _one(spark, Ft.derive_status(F.lit("COMPLET — sold out"))) == "sold out"
    assert _one(spark, Ft.derive_status(F.lit("complet"))) == "sold out"
    assert _one(spark, Ft.derive_status(F.lit("places dispo"))) == "on sale"


def test_similarity_difflib_vs_levenshtein(spark):
    """B16 divergence pin: both metrics are 1.0 on identical names, both in
    [0,1], and they agree within 0.35 on the fixture domain (the reference
    threshold shape survives the metric swap — SURVEY §7.3.2)."""
    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.functions.text import (
        similarity,
        similarity_difflib,
    )

    df = spark.createDataFrame(
        [
            ("Angèle", "Angèle"),
            ("Angèle", "angele "),
            ("Justice Live", "Justice"),
            ("Phoenix", "Stromae"),
            (None, "x"),
        ],
        "a string, b string",
    )
    rows = df.select(
        similarity(F.col("a"), F.col("b")).alias("lev"),
        similarity_difflib(F.col("a"), F.col("b")).alias("difflib"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["lev"] <= 1.0 and 0.0 <= r["difflib"] <= 1.0
        assert abs(r["lev"] - r["difflib"]) <= 0.35
    assert rows[0]["lev"] == rows[0]["difflib"] == 1.0
    assert rows[1]["lev"] == rows[1]["difflib"] == 1.0  # norm_name collapses
    assert rows[2]["lev"] == rows[2]["difflib"] == 1.0  # stopword 'live'


def test_parse_event_datetime_nl_fallback(spark):
    """B10 NL fallback degrades to the deterministic cascade when
    dateparser is absent (which it is in this container)."""
    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.functions.dates import parse_event_datetime_nl

    df = spark.createDataFrame(
        [("ven. 10 oct. 2025 19:30",), ("2024-01-05T10:00:00",), ("garbage",)],
        "t string",
    )
    got = [r[0] for r in df.select(parse_event_datetime_nl(F.col("t"))).collect()]
    assert got[0].isoformat() == "2025-10-10T19:30:00"
    assert got[1].isoformat() == "2024-01-05T10:00:00"
    assert got[2] is None
