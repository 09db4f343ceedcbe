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


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghijklmnopqrstuvwxyzéè @-", min_size=0,
                    max_size=30),
            st.datetimes(min_value=dt.datetime(2020, 1, 1),
                         max_value=dt.datetime(2030, 1, 1)),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_stable_id_deterministic_and_distinct(spark, pairs):
    """B9 properties: same (name, dt) -> same id across evaluations; ids
    carry the slug prefix; distinct (slug, dt) inputs -> distinct ids."""
    from concerts_etl_sa_spark.functions import ids as Fi

    df = spark.createDataFrame(
        [(n, d.replace(microsecond=0)) for n, d in pairs], "name string, d timestamp"
    )
    key = F.date_format("d", "yyyy-MM-dd'T'HH:mm:ss")
    out = df.select(
        Fi.stable_event_id(F.col("name"), key).alias("id1"),
        Fi.stable_event_id(F.col("name"), key).alias("id2"),
        Ft.slugify(F.coalesce(F.nullif(F.col("name"), F.lit("")), F.lit("event"))).alias("slug"),
    ).collect()
    for r in out:
        assert r["id1"] == r["id2"]
        assert r["id1"].startswith((r["slug"] + "-") if r["slug"] else "")
    # distinct (slug, dt) inputs must yield distinct ids (md5/8-hex
    # collision on <=20 rows is ~impossible); same-(slug, dt) inputs
    # legitimately share an id, so dedup the key space first
    from collections import Counter

    # the id key is SECOND-resolution (date_format to ss, and the frame
    # truncates microseconds) — dedup the key space at the same
    # resolution, or a microsecond-only-differing pair legitimately
    # shares an id and falsifies the distinctness claim
    key_counts = Counter(
        (r["slug"], p[1].replace(microsecond=0)) for r, p in zip(out, pairs)
    )
    if all(v == 1 for v in key_counts.values()):
        ids = [r["id1"] for r in out]
        assert len(set(ids)) == len(ids)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefghij éè-", min_size=0, max_size=25),
            st.text(alphabet="abcdefghij éè-", min_size=0, max_size=25),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_similarity_metric_laws(spark, pairs):
    """B16 properties: bounded [0,1], symmetric, reflexive (==1 on equal
    normalized forms)."""
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        Ft.similarity(F.col("a"), F.col("b")).alias("ab"),
        Ft.similarity(F.col("b"), F.col("a")).alias("ba"),
        Ft.similarity(F.col("a"), F.col("a")).alias("aa"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["ab"] <= 1.0
        assert abs(r["ab"] - r["ba"]) < 1e-12
        assert r["aa"] == 1.0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.text(alphabet="ABCdefGHIé è\t -ÀÇ", min_size=0, max_size=40),
        min_size=1,
        max_size=20,
    )
)
def test_norm_basic_idempotent(spark, texts):
    """B2 property: normalization is a projection (idempotent)."""
    once = _batch(spark, texts, Ft.norm_basic)
    twice = _batch(spark, once, Ft.norm_basic)
    assert twice == once


def test_consolidate_invariant_to_input_partitioning(spark):
    """The D3 re-spec's selling point: bidirectional argmax matching is
    order- and partitioning-independent, unlike the reference's greedy
    first-come-first-served loop. Re-run the flagship over reshuffled /
    coalesced inputs and require the identical row MULTISET (the output
    sort key (day, lower(name)) admits ties, so row order among tied
    rows is partition-dependent — exactly what the order-insensitive
    oracle hash accepts)."""
    from collections import Counter

    from concerts_etl_sa_spark.operators import consolidate as C
    from concerts_etl_sa_spark.operators import fixtures as FX
    from concerts_etl_sa_spark.sources.readers import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    base = Counter(
        tuple(r)
        for r in C.consolidate(
            FX.shotgun_events(ev), FX.dice_events(ev)
        ).collect()
    )
    assert sum(base.values()) > 0

    for mangle in (
        lambda d: d.repartition(17),
        lambda d: d.coalesce(1),
        lambda d: d.repartition(7, "event_id"),
    ):
        ev2 = mangle(load_table(spark, SF_DIR, "events"))
        out = Counter(
            tuple(r)
            for r in C.consolidate(
                FX.shotgun_events(ev2), FX.dice_events(ev2)
            ).collect()
        )
        assert out == base


def test_legacy_merge_invariant_to_input_partitioning(spark):
    """The D8 'last wins' re-spec (legacy_match.py module docstring)
    claims determinism under any partitioning — pin it like the flagship:
    identical row multiset under repartition(1/7/32) and input shuffling."""
    from collections import Counter

    from concerts_etl_sa_spark.operators import fixtures as FX
    from concerts_etl_sa_spark.operators.legacy_match import legacy_merge
    from concerts_etl_sa_spark.sources.readers import load_table
    from .conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    base = Counter(
        tuple(r)
        for r in legacy_merge(FX.shotgun_events(ev), FX.dice_events(ev)).collect()
    )
    assert sum(base.values()) > 0

    for mangle in (
        lambda d: d.repartition(1),
        lambda d: d.repartition(7, "event_id"),
        lambda d: d.repartition(32).sortWithinPartitions("event_type"),
    ):
        ev2 = mangle(load_table(spark, SF_DIR, "events"))
        out = Counter(
            tuple(r)
            for r in legacy_merge(
                FX.shotgun_events(ev2), FX.dice_events(ev2)
            ).collect()
        )
        assert out == base


def test_minhash_lsh_pairs_invariant_to_input_partitioning(spark):
    """minhash_lsh_pairs_df is pure per-row hashing + equi-joins, so its
    pair set must not depend on input partitioning — the one L-family
    join without this pin (flagship/legacy_merge have it). Multiset
    compare under repartition(1/7/32), mirroring those pins."""
    from collections import Counter

    from concerts_etl_sa_spark.operators.dedup import minhash_lsh_pairs_df
    from concerts_etl_sa_spark.sources.readers import load_table
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    base = Counter(tuple(r) for r in minhash_lsh_pairs_df(docs).collect())
    assert sum(base.values()) > 0

    for mangle in (
        lambda d: d.repartition(1),
        lambda d: d.repartition(7, "doc_id"),
        lambda d: d.repartition(32).sortWithinPartitions("text"),
    ):
        docs2 = mangle(
            load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        )
        out = Counter(
            tuple(r) for r in minhash_lsh_pairs_df(docs2).collect()
        )
        assert out == base


def test_scoped_persist_releases_previous_run(spark):
    """Repeated operator runs in one session must not accumulate cached
    RDDs (round-2 judge finding): each begin_scope releases the previous
    invocation's persists, and release_all drops whatever is left."""
    from concerts_etl_sa_spark.operators import _cachescope as CS
    from concerts_etl_sa_spark.operators import fixtures as FX
    from concerts_etl_sa_spark.operators.legacy_match import legacy_merge
    from concerts_etl_sa_spark.sources.readers import load_table
    from .conftest import SF_DIR

    CS.release_all()
    sc = spark.sparkContext
    baseline = len(sc._jsc.getPersistentRDDs())

    ev = load_table(spark, SF_DIR, "events")
    sg, dc = FX.shotgun_events(ev), FX.dice_events(ev)
    legacy_merge(sg, dc).count()
    first = len(sc._jsc.getPersistentRDDs())
    assert first > baseline  # the operator does persist its intermediates

    for _ in range(3):
        legacy_merge(sg, dc).count()
    # each run released the previous run's persists: no growth beyond one
    # invocation's worth of caches
    assert len(sc._jsc.getPersistentRDDs()) <= first

    CS.release_all()
    assert len(sc._jsc.getPersistentRDDs()) <= baseline


def test_round7_ops_invariant_to_input_partitioning(spark):
    """The round-7 corpus operators claim determinism under any
    partitioning (hash-keyed aggregates/joins, no order dependence) —
    pin the row multiset under repartition mangling, like the flagship
    and legacy-merge pins."""
    from collections import Counter

    from concerts_etl_sa_spark.operators.decontam import duplicate_spans_df
    from concerts_etl_sa_spark.operators.dedup import minhash_lsh_join_df
    from concerts_etl_sa_spark.sources.readers import load_table
    from pyspark.sql import functions as F
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_probe = (F.col("doc_id") % 10) == 3

    def spans(d):
        return Counter(tuple(r) for r in duplicate_spans_df(d).collect())

    def lsh_join(d):
        return Counter(
            tuple(r)
            for r in minhash_lsh_join_df(
                d.filter(~is_probe), d.filter(is_probe)
            ).collect()
        )

    base_spans, base_join = spans(docs), lsh_join(docs)
    assert sum(base_spans.values()) > 0
    for mangle in (
        lambda d: d.repartition(1),
        lambda d: d.repartition(13, "text"),
    ):
        assert spans(mangle(docs)) == base_spans
        assert lsh_join(mangle(docs)) == base_join


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.binary(min_size=0, max_size=200),
)
def test_pgm_codec_roundtrip_property(w, h, noise):
    """PGM codec property (pure Python, no Spark): encode->decode is the
    identity for any (w, h, raster), and decode either raises ValueError
    or returns a raster of exactly w*h bytes — never a silently
    mis-offset one (the round-9 separator fix) — on arbitrary
    byte-noise payloads."""
    from concerts_etl_sa_spark.operators import multimodal as MM

    px = bytes((i * 37 + w) % 256 for i in range(w * h))
    assert MM.pgm_decode(MM.pgm_encode(w, h, px)) == (w, h, px)
    try:
        dw, dh, draster = MM.pgm_decode(b"P5" + noise)
    except ValueError:
        pass
    else:
        assert len(draster) == dw * dh
