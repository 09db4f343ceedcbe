"""Property-based tests (hypothesis) for the parser layer (SURVEY §5.2.3).

Run against a single reusable Spark session; strategies kept small so the
suite stays fast (each property collects one batched DataFrame).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from concerts_etl_sa_spark.functions import dates as Fd
from concerts_etl_sa_spark.functions import money as Fm
from concerts_etl_sa_spark.functions import text as Ft

_SETTINGS = dict(max_examples=20, deadline=None)


def _batch(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], ["raw"])
    return [r.out for r in df.select(col_fn(F.col("raw")).alias("out")).collect()]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.decimals(
            min_value=-999999, max_value=999999, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_money_roundtrip(spark, amounts):
    """B6 property: any fr-FR-formatted 2-dp amount parses back exactly."""
    formatted = [
        f"{str(a).replace('.', ',')} €" for a in amounts
    ]
    got = _batch(spark, formatted, Fm.parse_money_eur)
    assert got == [float(a) for a in amounts]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet="abcdefghijklmnopqrstuvwxyzéèàç @-&+/",
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_tokens_invariants(spark, names):
    """B4 properties: tokens are >2 chars, stopword-free, sorted, distinct,
    and tokenization is idempotent on its own output."""
    toks_list = _batch(spark, names, Ft.artist_tokens)
    for toks in toks_list:
        assert all(len(t) > 2 for t in toks)
        assert not (set(toks) & set(Ft.TOKEN_STOPWORDS))
        assert toks == sorted(set(toks))
    rejoined = [" ".join(t) if t else "" for t in toks_list]
    again = _batch(spark, rejoined, Ft.artist_tokens)
    assert again == toks_list


@settings(**_SETTINGS)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(2000, 1, 1), max_value=dt.datetime(2030, 1, 1)
        ),
        min_size=1,
        max_size=20,
    )
)
def test_round5_fixpoint_and_error_bound(spark, stamps):
    """B14 properties: floor-to-5min is idempotent and within 5 minutes."""
    stamps = [s.replace(microsecond=0) for s in stamps]
    df = spark.createDataFrame([(s,) for s in stamps], "raw timestamp")
    once = [
        r.out for r in df.select(Fd.round5(F.col("raw")).alias("out")).collect()
    ]
    twice = _batch(spark, once, Fd.round5)
    assert twice == once
    for raw, r5 in zip(stamps, once):
        delta = (raw - r5).total_seconds()
        assert 0 <= delta < 300
        assert r5.minute % 5 == 0 and r5.second == 0
