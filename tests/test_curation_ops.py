"""Semantics tests for the round-2 curation operators: benchmark
decontamination, PII redaction, mixture sampling, ANN recall, and the
one-scan text suite."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import decontam as DC
from concerts_etl_sa_spark.operators import sampling as SMP
from concerts_etl_sa_spark.operators import similarity as S
from concerts_etl_sa_spark.operators import textstats as TS
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


# ------------------------------------------------------------ decontam

def test_decontaminate_excludes_eval_and_counts_real_overlap(spark):
    out = DC.decontaminate(spark, SF_DIR).collect()
    corpus_n = (
        load_table(spark, SF_DIR, "documents")
        .filter((F.col("doc_id") % DC.EVAL_MOD) != DC.EVAL_REM)
        .count()
    )
    assert len(out) == corpus_n
    assert all(r.doc_id % DC.EVAL_MOD != DC.EVAL_REM for r in out)
    # flag agrees with the count everywhere
    assert all(
        r.is_contaminated == (r.n_hit_ngrams >= DC.MIN_HITS) for r in out
    )


def test_decontaminate_hit_counts_match_python_ngrams(spark):
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }

    def grams(text):
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        n = max(len(toks) - (DC.N_GRAM - 1), 1)
        return {
            " ".join(toks[i : i + DC.N_GRAM]) for i in range(n)
        }

    eval_grams = set()
    for did, text in docs.items():
        if did % DC.EVAL_MOD == DC.EVAL_REM:
            eval_grams |= grams(text)
    out = DC.decontaminate(spark, SF_DIR).collect()
    for r in out:
        expected = len(grams(docs[r.doc_id]) & eval_grams)
        assert r.n_hit_ngrams == expected, r.doc_id


def test_decontaminate_eval_side_broadcasts(spark):
    plan = (
        DC.decontaminate(spark, SF_DIR)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the corpus postings must never shuffle on the n-gram key: the eval
    # set joins as a broadcast hint in the logical plan
    assert "BROADCAST" in plan.upper()


# ------------------------------------------------------------ sampling

def test_mixture_sample_matches_hash_gate(spark):
    rows = SMP.mixture_sample(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "source"
    ).collect()

    def threshold(source):
        idx = int(source[3:])
        if idx < 2:
            return 1 << 32
        return (1 << 31) if idx % 2 == 0 else (1 << 30)

    expected = set()
    for r in docs:
        u32 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:8], 16)
        if u32 < threshold(r.source):
            expected.add(r.doc_id)
    got = {r.doc_id for r in rows}
    assert got == expected
    weights = {r.sample_weight for r in rows}
    assert weights <= {1.0, 2.0, 4.0}
    # src0/src1 are keep-all
    assert all(
        r.sample_weight == 1.0 for r in rows if r.source in ("src0", "src1")
    )


def test_mixture_sample_deterministic(spark):
    a = [tuple(r) for r in SMP.mixture_sample(spark, SF_DIR).collect()]
    b = [tuple(r) for r in SMP.mixture_sample(spark, SF_DIR).collect()]
    assert a == b


# ------------------------------------------------------------ PII redact

def test_pii_redact_scrubs_everything(spark):
    rows = TS.pii_redact(spark, SF_DIR).collect()
    email = re.compile(TS.PII_EMAIL)
    ip = re.compile(TS.PII_IP)
    phone = re.compile(TS.PII_PHONE)
    for r in rows:
        assert not email.search(r.redacted_text), r.doc_id
        assert not ip.search(r.redacted_text), r.doc_id
        assert not phone.search(r.redacted_text), r.doc_id
        # every counted hit left a placeholder behind
        assert r.redacted_text.count("<EMAIL>") == r.n_emails
        assert r.redacted_text.count("<IP>") == r.n_ips
        assert r.redacted_text.count("<PHONE>") == r.n_phones
        if r.doc_id % 3 == 0:
            assert r.n_emails >= 1
        if r.doc_id % 5 == 0:
            assert r.n_ips >= 1
        if r.doc_id % 7 == 0:
            assert r.n_phones >= 1


def test_pii_redact_stays_jvm_side(spark):
    plan = (
        TS.pii_redact(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------ ANN recall

def test_ann_recall_bounds_and_coverage(spark):
    rows = S.ann_recall(spark, SF_DIR).collect()
    assert len(rows) == S.N_QUERIES
    for r in rows:
        assert 0 <= r.n_hits <= S.TOP_K
        assert abs(r.recall_at_k - r.n_hits / S.TOP_K) < 1e-9
    # the sign-LSH index should find SOMETHING at this sf — an all-zero
    # recall means the bucketing broke, not that the data is hard
    assert sum(r.n_hits for r in rows) > 0


# ------------------------------------------------------------ text suite

def test_text_suite_matches_standalone_ops(spark):
    suite = {r.doc_id: r for r in TS.text_suite(spark, SF_DIR).collect()}
    for r in TS.token_stats(spark, SF_DIR).collect():
        s = suite[r.doc_id]
        assert (s.n_tokens, s.n_distinct, s.avg_token_len) == (
            r.n_tokens, r.n_distinct, r.avg_token_len
        )
    for r in TS.lang_id(spark, SF_DIR).collect():
        s = suite[r.doc_id]
        assert (s.lang_detected, s.marker_hits) == (
            r.lang_detected, r.marker_hits
        )
    for r in TS.quality_score(spark, SF_DIR).collect():
        assert suite[r.doc_id].quality == r.quality
    for r in TS.fingerprint(spark, SF_DIR).collect():
        s = suite[r.doc_id]
        assert (s.content_hash, s.min_shingle_hash) == (
            r.content_hash, r.min_shingle_hash
        )


# ------------------------------------------------------- media embeddings

def test_media_near_dup_finds_exactly_payload_duplicates(spark):
    """The stub embedding is a function of the payload, so near-dup at
    threshold ~1.0 must recover exactly the identical-payload pairs.
    The base table has no duplicate payloads, so inject some: relabeled
    copies of a doc_id slice unioned onto the media frame."""
    from itertools import combinations

    from concerts_etl_sa_spark.operators import multimodal as MM

    base = MM.media_table(spark, SF_DIR)
    dup = base.filter(F.col("doc_id") % 50 == 1).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    media = base.unionByName(dup)

    by_md5 = {}
    for r in media.select("doc_id", F.md5("payload").alias("h")).collect():
        by_md5.setdefault(r.h, []).append(r.doc_id)
    expected = set()
    for ids in by_md5.values():
        for a, b in combinations(sorted(ids), 2):
            expected.add((a, b))
    assert expected, "injected duplicates must exist"

    got = {
        (r.a_id, r.b_id)
        for r in MM.media_near_dup_df(media, threshold=0.999999).collect()
    }
    assert got == expected


def test_embed_media_shape_and_determinism(spark):
    from concerts_etl_sa_spark.operators import multimodal as MM

    emb = MM.embed_media(MM.media_table(spark, SF_DIR))
    rows = emb.collect()
    assert all(len(r.embedding) == MM.EMBED_DIM for r in rows)
    assert all(-1.0 <= v <= 1.0 for r in rows for v in r.embedding)
    again = {r.doc_id: r.embedding for r in emb.collect()}
    assert all(again[r.doc_id] == r.embedding for r in rows)
    # no model backend in this container: provenance says stub, model
    # column is all-null — the environment-independent schema holds
    assert all(r.embed_model == "stub" for r in rows)
    assert all(r.model_embedding is None for r in rows)


def _embed_pdf():
    import pandas as pd

    return pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [b"alpha", b"beta"],
            "kind": ["image", "audio"],
        }
    )


def _reset_embed_state(monkeypatch, backend):
    from concerts_etl_sa_spark.operators import multimodal as MM

    monkeypatch.setattr(MM, "EMBED_BACKEND", backend)
    monkeypatch.setattr(MM, "_WORKER_EMBEDDER", False)
    return MM


def test_embed_gate_uses_fake_model(monkeypatch):
    """A present backend populates model_embedding + provenance while the
    deterministic stub column is unchanged (oracle contract)."""
    calls = {}

    def fake_factory():
        calls["built"] = calls.get("built", 0) + 1

        def embed(payloads, kinds):
            calls["kinds"] = list(kinds)
            return [[float(len(p))] * 4 for p in payloads]

        return embed

    MM = _reset_embed_state(monkeypatch, ("fake-clip", fake_factory))
    stub_rows = None
    out = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(out["embed_model"]) == ["fake-clip", "fake-clip"]
    assert list(out["model_embedding"]) == [[5.0] * 4, [4.0] * 4]
    assert calls == {"built": 1, "kinds": ["image", "audio"]}
    stub_rows = list(out["embedding"])

    # second batch through the same process: factory NOT rebuilt
    list(MM._embed_batches(iter([_embed_pdf()])))
    assert calls["built"] == 1

    # stub column identical to the no-backend run (oracle determinism)
    MM = _reset_embed_state(monkeypatch, None)
    base = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(base["embedding"]) == stub_rows
    assert list(base["embed_model"]) == ["stub", "stub"]


def test_embed_gate_degrades_on_failure(monkeypatch):
    """A backend whose factory or batch call raises degrades to stub rows
    instead of failing the job (K2/K3)."""

    def broken_factory():
        raise RuntimeError("model file missing on executor")

    MM = _reset_embed_state(monkeypatch, ("broken", broken_factory))
    out = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(out["embed_model"]) == ["stub", "stub"]
    assert list(out["model_embedding"]) == [None, None]

    def flaky_factory():
        def embed(payloads, kinds):
            raise ValueError("OOM on batch")

        return embed

    MM = _reset_embed_state(monkeypatch, ("flaky", flaky_factory))
    out = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(out["embed_model"]) == ["stub", "stub"]
    assert list(out["model_embedding"]) == [None, None]
    assert all(len(v) == MM.EMBED_DIM for v in out["embedding"])

    # wrong ROW COUNT from the backend is caught inside the guard and
    # degrades like a failed batch — previously it surfaced later in the
    # Arrow conversion and failed the task (round-5 ADVICE finding)
    def short_factory():
        def embed(payloads, kinds):
            return [[1.0, 2.0]]  # one vector for a two-row batch

        return embed

    MM = _reset_embed_state(monkeypatch, ("short", short_factory))
    out = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(out["embed_model"]) == ["stub", "stub"]
    assert list(out["model_embedding"]) == [None, None]


def test_embed_factory_env_probe(monkeypatch, tmp_path):
    """SPARK_GRAFT_EMBED_FACTORY=module:callable is discovered by the
    probe and built lazily by the worker memo."""
    import sys

    mod = tmp_path / "fake_embed_mod.py"
    mod.write_text(
        "def build():\n"
        "    return lambda payloads, kinds: [[1.0, 2.0] for _ in payloads]\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_EMBED_FACTORY", "fake_embed_mod:build")
    sys.modules.pop("fake_embed_mod", None)

    from concerts_etl_sa_spark.operators import multimodal as MM

    backend = MM._probe_embed_backend()
    assert backend is not None
    name, factory = backend
    assert name == "factory:fake_embed_mod:build"
    assert factory()([b"x"], ["image"]) == [[1.0, 2.0]]

    MM = _reset_embed_state(monkeypatch, backend)
    out = list(MM._embed_batches(iter([_embed_pdf()])))[0]
    assert list(out["embed_model"]) == [name, name]
    assert list(out["model_embedding"]) == [[1.0, 2.0], [1.0, 2.0]]


def test_decode_media_real_path_gate(monkeypatch):
    """The import-gated real decoder is used when present, stub fields are
    always retained, and undecodable bytes fall back per-row (K3)."""
    from concerts_etl_sa_spark.operators import multimodal as MM

    # real decoder present and succeeding
    monkeypatch.setitem(
        MM.REAL_DECODERS, "image",
        lambda p: {"width": 8, "height": 4, "channels": 3, "decoder": "fake"},
    )
    out = MM.decode_media(b"pretend-png", "image")
    assert out["decoder"] == "fake"
    assert (out["width"], out["height"], out["channels"]) == (8, 4, 3)
    assert out["feature_dim"] == 2048  # stub fields retained
    assert out["payload_md5"]

    # real decoder present but the bytes don't parse -> per-row fallback
    def _boom(p):
        raise ValueError("not an image")

    monkeypatch.setitem(MM.REAL_DECODERS, "image", _boom)
    out = MM.decode_media(b"junk", "image")
    assert out["decoder"] == "stub"
    assert out["width"] is None

    # no decoder for the kind -> stub
    out = MM.decode_media(b"vid", "video")
    assert out["decoder"] == "stub"


def test_extract_decoded_stub_in_this_container(spark):
    """No PIL/soundfile here: every row comes back decoder='stub' with
    null real-decode fields, same md5/dim as the oracle-checked stub."""
    from concerts_etl_sa_spark.operators import multimodal as MM

    media = MM.media_table(spark, SF_DIR)
    rows = MM.extract_decoded(media).collect()
    assert rows
    stub = {r.doc_id: r for r in MM.extract_features(media).collect()}
    for r in rows:
        assert r.decoder == "stub"
        assert r.width is None and r.sample_rate is None
        assert r.payload_md5 == stub[r.doc_id].payload_md5
        assert r.feature_dim == stub[r.doc_id].feature_dim


def test_minhash_lsh_join_probe_vs_index(spark):
    """Asymmetric batch-vs-index near-dup: a probe doc near-identical to
    one corpus doc is flagged against it; unrelated probes pass; no
    corpus-corpus or probe-probe pairs exist by construction."""
    from concerts_etl_sa_spark.operators.dedup import minhash_lsh_join_df

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, base + " lambda"),
            (2, "totally different corpus text with no shared words at all"),
        ],
        "doc_id BIGINT, text STRING",
    )
    probe = spark.createDataFrame(
        [
            (100, base + " mu"),
            (101, "a separate unrelated probe document entirely its own"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = minhash_lsh_join_df(corpus, probe).collect()
    assert {(r.probe_id, r.corpus_id) for r in out} == {(100, 1)}
    assert all(r.jaccard >= 0.5 for r in out)


def test_minhash_lsh_join_indexed_matches_from_scratch(spark):
    """Index-on-write equivalence: joining against a corpus with STORED
    band fingerprints gives exactly the from-scratch result."""
    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.operators.dedup import (
        _shingles,
        _tokens,
        band_fps_from_shingles,
        minhash_lsh_join_df,
        minhash_lsh_join_indexed,
    )
    from concerts_etl_sa_spark.sources.readers import load_table
    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    is_probe = (F.col("doc_id") % 10) == 3
    corpus, probe = docs.filter(~is_probe), docs.filter(is_probe)
    indexed = (
        corpus.withColumn("_toks", _tokens(F.col("text")))
        .withColumn("_sh", _shingles(F.col("_toks")))
        .withColumn("band_fps", band_fps_from_shingles(F.col("_sh")))
        .drop("_toks", "_sh")
    )
    want = {tuple(r) for r in minhash_lsh_join_df(corpus, probe).collect()}
    got = {
        tuple(r) for r in minhash_lsh_join_indexed(indexed, probe).collect()
    }
    assert got == want and want
    # a probe that ALSO carries precomputed band_fps + shingles (the
    # ingest's single-signature-pass path) gives the identical result
    probe_idx = (
        probe.withColumn("_toks", _tokens(F.col("text")))
        .withColumn("shingles", _shingles(F.col("_toks")))
        .withColumn("band_fps", band_fps_from_shingles(F.col("shingles")))
        .drop("_toks")
    )
    got_pre = {
        tuple(r)
        for r in minhash_lsh_join_indexed(indexed, probe_idx).collect()
    }
    assert got_pre == want


def test_capped_indexed_join_keeps_pair_when_first_band_capped(spark):
    """Capping the corpus side of a band bucket must not suppress a
    qualifying pair whose LOWEST shared band got capped away: capped
    mode dedupes pairs explicitly instead of relying on the
    first-shared-band filter (whose invariant breaks under capping).

    Crafted stored index: corpus doc C shares bands 0 AND 1 with probe
    P, but C is chosen (by computing the cap window's own xxhash rank
    order) to rank DEAD LAST in the band-0 bucket behind a 20-doc
    flood, so under max_bucket_size=8 its only surviving join match is
    band 1 — which the old first-band filter suppressed because the
    band-0 fingerprints still compare equal."""
    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.operators.dedup import (
        _shingles,
        _tokens,
        band_fps_from_shingles,
        minhash_lsh_join_indexed,
    )

    words = [f"tok{k}" for k in range(30)]
    p_text = " ".join(words)
    c_text = " ".join(words[:-1] + ["changed"])
    p_fps = (
        spark.createDataFrame([(p_text,)], "text STRING")
        .withColumn("_t", _tokens(F.col("text")))
        .withColumn("_s", _shingles(F.col("_t")))
        .select(band_fps_from_shingles(F.col("_s")).alias("fps"))
        .collect()[0]
        .fps
    )
    # rank candidate corpus ids by the SAME order the cap window uses
    # within the band-0 bucket: (xxhash64(corpus_id, band_fp), corpus_id)
    ranked = (
        spark.createDataFrame(
            [(i,) for i in range(1, 41)], "corpus_id BIGINT"
        )
        .select(
            "corpus_id",
            F.xxhash64(F.col("corpus_id"), F.lit(p_fps[0])).alias("h"),
        )
        .orderBy("h", "corpus_id")
        .collect()
    )
    flood_ids = [r.corpus_id for r in ranked[:20]]  # always inside the cap
    c_id = ranked[-1].corpus_id                     # always capped out
    junk = iter(range(-10_000, 0))                  # never collide with fps
    assert not set(p_fps) & set(range(-10_000, 0))
    rows = [(c_id, c_text, [p_fps[0], p_fps[1], next(junk), next(junk)])] + [
        (
            i,
            "unrelated text " + " ".join(f"x{i}_{k}" for k in range(10)),
            [p_fps[0], next(junk), next(junk), next(junk)],
        )
        for i in flood_ids
    ]
    corpus = spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, band_fps ARRAY<BIGINT>"
    )
    probe = spark.createDataFrame(
        [(100, p_text)], "doc_id BIGINT, text STRING"
    )
    got = minhash_lsh_join_indexed(
        corpus, probe, jaccard_threshold=0.5, max_bucket_size=8
    ).collect()
    assert {(r.probe_id, r.corpus_id) for r in got} == {(100, c_id)}


def test_exact_dedup_keeps_null_text_docs_grouped(spark, tmp_path):
    """md5(NULL) is NULL; the groupBy+join-back must be NULL-safe so
    null-text docs stay in the output as one group (the window form and
    the DuckDB twin both group them together)."""
    from pyspark.sql import functions as F

    from concerts_etl_sa_spark.operators.dedup import exact_dedup

    rows = [(1, "real body one"), (2, None), (3, None), (4, "real body two")]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("src0").alias("source"),
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("n_chars"),
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in exact_dedup(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[2].representative_id == 2 and out[3].representative_id == 2
    assert out[3].group_size == 2 and out[3].is_duplicate


def test_pgm_codec_roundtrip_and_errors():
    """Pure-Python netpbm P5 codec: encode/decode roundtrip, comment
    lines per the spec, loud errors on junk/truncation (K3 feeds on
    these raises)."""
    import pytest

    from concerts_etl_sa_spark.operators import multimodal as MM

    px = bytes(range(12))
    payload = MM.pgm_encode(4, 3, px)
    assert MM.pgm_decode(payload) == (4, 3, px)
    # comment line between header tokens is legal P5
    commented = b"P5\n# a comment\n4 3\n255\n" + px
    assert MM.pgm_decode(commented) == (4, 3, px)
    with pytest.raises(ValueError):
        MM.pgm_decode(b"not a pgm")
    with pytest.raises(ValueError):
        MM.pgm_decode(b"P5\n4 3\n255\n" + px[:-1])  # truncated raster
    with pytest.raises(ValueError):
        # non-whitespace right after maxval (trailing comment): skipping
        # it would silently shift every raster offset — must raise
        MM.pgm_decode(b"P5\n4 3\n255# c\n" + px)
    with pytest.raises(ValueError):
        MM.pgm_encode(4, 4, px)  # wrong buffer size
    # nearest-neighbor resize of a constant image is constant
    const = MM.pgm_encode(4, 3, bytes([7] * 12))
    assert MM.pgm_decode(MM.pgm_resize_nn(const, 2, 2)) == (
        2, 2, bytes([7] * 4),
    )


def test_extract_decoded_real_pgm_path(spark):
    """The PGM fixture exercises the REAL decode slot in this container:
    every row comes back decoder='pgm' with width/height parsed from the
    actual payload header (not the stub's nulls)."""
    from concerts_etl_sa_spark.operators import multimodal as MM

    media = MM.media_table_pgm(spark, SF_DIR)
    rows = MM.extract_decoded(media).collect()
    assert rows
    for r in rows:
        assert r.decoder == "pgm", r
        assert (r.width, r.height) == MM._pgm_dims(r.doc_id)
        assert r.channels == 1
        assert r.payload_md5  # stub fields still retained
