"""Edge-input robustness: empty sides, all-null dates, single rows.

The reference degrades gracefully per-source (K2) and per-row (K3); the
engine's join operators must do the same — an empty or degenerate side
yields the correct residual output, never an error or a dropped side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import consolidate as C
from concerts_etl_sa_spark.operators import fixtures as FX
from concerts_etl_sa_spark.operators import legacy_match as L
from concerts_etl_sa_spark.schemas import NORMALIZED_EVENT
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _frames(spark):
    ev = load_table(spark, SF_DIR, "events")
    return FX.shotgun_events(ev), FX.dice_events(ev)


def _empty(spark):
    return spark.createDataFrame([], NORMALIZED_EVENT)


def test_consolidate_empty_dice_side(spark):
    sg, _ = _frames(spark)
    out = C.consolidate(sg, _empty(spark))
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["dice_event_id"] is None for r in rows)  # all SG residuals


def test_consolidate_empty_shotgun_side(spark):
    _, dc = _frames(spark)
    out = C.consolidate(_empty(spark), dc)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["shotgun_event_id"] is None for r in rows)


def test_consolidate_both_empty(spark):
    assert C.consolidate(_empty(spark), _empty(spark)).count() == 0


def test_consolidate_all_null_dates_dropped(spark):
    sg, dc = _frames(spark)
    sg_nulled = sg.withColumn(
        "event_datetime_local", F.lit(None).cast("timestamp")
    )
    out = C.consolidate(sg_nulled, dc)
    # C1: every undated SG row dropped; only dice residuals remain
    assert all(r["shotgun_event_id"] is None for r in out.collect())


def test_legacy_merge_empty_sides(spark):
    sg, dc = _frames(spark)
    assert L.legacy_merge(sg, _empty(spark)).count() > 0   # SG rows survive
    assert L.legacy_merge(_empty(spark), dc).count() > 0   # D7 independents
    assert L.legacy_merge(_empty(spark), _empty(spark)).count() == 0


def test_consolidate_matched_ids_unique(spark):
    """1:1 constraint (D3): no sg_id or dc_id appears in two matched rows."""
    sg, dc = _frames(spark)
    out = C.consolidate(sg, dc)
    matched = out.filter(
        F.col("shotgun_event_id").isNotNull()
        & F.col("dice_event_id").isNotNull()
    )
    n = matched.count()
    assert matched.select("shotgun_event_id").distinct().count() == n
    assert matched.select("dice_event_id").distinct().count() == n


def test_simhash_signatures_cover_degenerate_docs(spark, tmp_path):
    # explode_outer coverage: empty/null/whitespace text must still get a
    # (doc_id, 0) signature row with no doc-frame re-join in the plan
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    from concerts_etl_sa_spark.operators.dedup import simhash_signatures

    out = {
        r.doc_id: r.simhash
        for r in simhash_signatures(spark, str(tmp_path)).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[2] == out[3] == out[4] == 0
    assert out[1] != 0


def test_corpus_df_ops_tolerate_empty_inputs(spark):
    """The L-family df cores must yield empty results on empty corpora,
    never error (the same K2-style degradation as the join operators)."""
    from concerts_etl_sa_spark.operators.decontam import (
        decontaminate_df,
        duplicate_spans_df,
    )
    from concerts_etl_sa_spark.operators.dedup import (
        minhash_lsh_pairs_df,
        simhash_near_pairs_df,
    )
    from concerts_etl_sa_spark.operators.similarity import (
        embedding_near_dup_pairs_df,
    )

    docs = spark.createDataFrame([], "doc_id BIGINT, text STRING")
    assert duplicate_spans_df(docs).count() == 0
    assert minhash_lsh_pairs_df(docs).count() == 0
    assert minhash_lsh_pairs_df(docs, max_bucket_size=4).count() == 0
    assert simhash_near_pairs_df(docs).count() == 0
    assert decontaminate_df(docs, docs, max_eval_docs=None).count() == 0
    emb = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>")
    assert embedding_near_dup_pairs_df(emb).count() == 0
    assert embedding_near_dup_pairs_df(emb, max_bucket_size=4).count() == 0


def test_fingerprint_short_docs_match_oracle(spark, tmp_path):
    """Docs with < 3 tokens must neither crash (Spark 4 ANSI element_at
    throws past the array end — round-9 regression, fixed with
    try_element_at) nor diverge from the DuckDB twin's NULL-skipping
    partial shingles."""
    import duckdb

    from concerts_etl_sa_spark.operators.textstats import (
        FINGERPRINT_SQL,
        fingerprint,
        text_suite,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "one"), (3, ""), (4, "three tokens here")],
        "doc_id long, text string",
    ).select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    got = sorted(tuple(r) for r in fingerprint(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(FINGERPRINT_SQL).fetchall())
    assert got == want
    # the suite shares the shingle expression — must cover every doc
    assert text_suite(spark, str(tmp_path)).count() == 4
