"""Corpus curation plan: the training-data L-family composed end-to-end.

The canonical large-scale pretraining-data pipeline over the
``documents`` table (SURVEY §2.L1/L3 operators as stages):

1. **annotate** — one scan adds quality heuristics (L3), language ID
   (L3), whitespace token count, and the exact-dedup content hash. All
   scalar projections: whole-stage codegen, no shuffle.
2. **rule filter** — quality floor + language allowlist (C4/Gopher-style
   rule filtering).
3. **exact dedup** — min-doc_id representative per content hash (one
   hash-partitioned window).
4. **decontamination** (optional) — drop documents sharing >=
   ``decontam_min_hits`` distinct 5-gram fingerprints with an eval frame
   (``operators.decontam.decontaminate_df``: broadcast eval-gram set,
   doc-vs-set, no pairwise join). Runs on exact-dedup survivors so the
   n-gram pass sees each retained text once.
5. **near-dup collapse** — MinHash-LSH pairs among the survivors
   (``dedup.minhash_lsh_pairs_df``), then either greedy keep-lowest-id
   (the higher id of every verified pair is dropped — single-pass, the
   standard LSH-dedup compromise) or, with ``transitive_dedup=True``,
   a full connected-components collapse (``operators.components``) that
   keeps exactly one representative per transitive near-dup group.
5b. **semantic dedup** (optional, ``embeddings=``) — SemDeDup over the
   lexical survivors (``operators.semdedup``): paraphrase-class
   duplicates minhash cannot see. Runs AFTER the token-level stages so
   the expensive cluster/pair machinery only touches already-deduped
   text; docs with no embedding row are kept (un-judgeable, flagged in
   the count). Centroids: caller-supplied frame, else kmeans-trained on
   the survivor embeddings (the production build).
6. **token budget** (optional) — cap total retained tokens. Scale-aware:
   a single global running-sum window would serialize on one partition,
   so docs are hash-bucketed into ``n_budget_buckets`` and each bucket
   keeps a running sum up to ``budget / n_buckets`` under a
   bucket-partitioned window — parallel, deterministic, within one doc
   per bucket of the exact cap.

Every stage is a flag column over one lineage; the report's counts come
from a single aggregation over the (cached, slim) flagged frame, not a
``.count()`` per stage.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.components import connected_components
from ..operators.decontam import decontaminate_df
from ..operators.dedup import minhash_lsh_pairs_df
from ..operators.textstats import _tokens, lang_cols, quality_cols
from ..sources.readers import load_table

N_BUDGET_BUCKETS = 32


@dataclass
class CurationReport:
    n_input: int
    n_after_rules: int
    n_after_exact: int
    n_after_decontam: int
    n_after_near: int
    n_after_sem: int
    n_final: int
    tokens_final: int
    curated: DataFrame


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    *,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    token_budget: int | None = None,
    jaccard_threshold: float = 0.5,
    n_budget_buckets: int = N_BUDGET_BUCKETS,
    eval_docs: DataFrame | None = None,
    decontam_min_hits: int = 2,
    transitive_dedup: bool = False,
    max_bucket_size: int | None = None,
    heavy_bucket_mode: str = "star",
    embeddings: DataFrame | None = None,
    sem_tau: float | None = None,
    sem_centroids: DataFrame | None = None,
    sem_k: int = 8,
    sem_max_cluster: int | None = None,
) -> CurationReport:
    # NO repartition here: the first stage is pure scalar projections,
    # the exact-dedup window partitions by content_hash and the budget
    # window by hash bucket — none benefit from doc_id partitioning, so
    # a corpus-wide exchange of raw text would buy nothing. Input-split
    # parallelism carries the annotate scan; every later stage gets its
    # parallelism from its own (needed) exchange.
    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus_df(
        docs,
        min_quality=min_quality,
        keep_langs=keep_langs,
        token_budget=token_budget,
        jaccard_threshold=jaccard_threshold,
        n_budget_buckets=n_budget_buckets,
        eval_docs=eval_docs,
        decontam_min_hits=decontam_min_hits,
        transitive_dedup=transitive_dedup,
        max_bucket_size=max_bucket_size,
        heavy_bucket_mode=heavy_bucket_mode,
        embeddings=embeddings,
        sem_tau=sem_tau,
        sem_centroids=sem_centroids,
        sem_k=sem_k,
        sem_max_cluster=sem_max_cluster,
    )


def curate_corpus_df(
    docs: DataFrame,
    *,
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
    token_budget: int | None = None,
    jaccard_threshold: float = 0.5,
    n_budget_buckets: int = N_BUDGET_BUCKETS,
    eval_docs: DataFrame | None = None,
    decontam_min_hits: int = 2,
    transitive_dedup: bool = False,
    max_bucket_size: int | None = None,
    heavy_bucket_mode: str = "star",
    embeddings: DataFrame | None = None,
    sem_tau: float | None = None,
    sem_centroids: DataFrame | None = None,
    sem_k: int = 8,
    sem_max_cluster: int | None = None,
) -> CurationReport:
    """``docs`` needs (doc_id, text); extra columns ride along.

    ``max_bucket_size`` / ``heavy_bucket_mode`` plumb the LSH per-bucket
    skew guard into the near-dup stage (the 100 TB giant-cluster
    defense; see ``util.capped_candidates``). With ``star`` mode prefer
    ``transitive_dedup=True``: star edges guarantee cluster
    CONNECTIVITY, so the components closure still collapses the whole
    flood to one representative (the bucket anchor under greedy, the
    min id under transitive).

    ``embeddings`` (vec_id = doc_id, embedding) arms the SemDeDup stage
    over the lexical survivors: tau = ``sem_tau`` (default
    ``semdedup.SEMDEDUP_TAU``), centroids = ``sem_centroids`` or a
    ``sem_k``-means fit on the survivor embeddings, giant clusters
    bounded by ``sem_max_cluster`` through the shared skew guard.
    Survivor docs with NO embedding row are kept — an un-judgeable doc
    is not silently dropped."""
    from ..operators._cachescope import begin_scope, scoped_persist

    begin_scope("curate_corpus")
    # staged tokenize (see textstats.text_suite): materialize the token
    # array once; quality/lang/count expressions read the column instead
    # of re-inlining the regex-split HOF per consuming expression
    toked = docs.select(
        "doc_id", "text", _tokens(F.col("text")).alias("toks")
    )
    qc = quality_cols(toks=F.col("toks"))
    lc = lang_cols(toks=F.col("toks"))
    ann = toked.select(
        "doc_id",
        "text",
        qc["quality"].alias("quality"),
        lc["lang_detected"].alias("lang_detected"),
        F.size("toks").alias("n_tokens"),
        F.md5("text").alias("content_hash"),
    )
    rule_pass = F.col("quality") >= min_quality
    if keep_langs is not None:
        rule_pass = rule_pass & F.col("lang_detected").isin(*keep_langs)
    # persisted for the WHOLE run: the annotate scan (regex tokenize +
    # quality + lang + md5 over every document — the pipeline's
    # CPU-dominant per-row stage) has MANY independent consumers (the
    # report's pre/exact counts, the optional decontam/sem pre-counts,
    # the near-dup stage, the final flagged frame). Unpersisted, each
    # eager action re-executed it from the source — 3-5 full corpus
    # scans per curation run for report integers. MEMORY_AND_DISK
    # spills rather than evicts at corpus scale (the standard
    # materialize-the-index trade).
    #
    # The A6 exact-dedup flag is folded INTO the cached frame (r15):
    # the content_hash window previously re-executed once per consumer
    # (the near-dup lineage, the flagged fill, and its own report
    # count — three shuffles of the same key). Computing it over the
    # full frame — min is taken over rule-passing ids only, so the
    # flag is identical on every rule-passing row to the old
    # filtered-frame window — moves that one shuffle into the cache
    # fill, and the exact count becomes a column sum in the `pre`
    # aggregation instead of its own job (guide §2.4: operations keyed
    # the same way share one exchange).
    w_hash = Window.partitionBy("content_hash")
    min_pass_id = F.min(F.when(rule_pass, F.col("doc_id"))).over(w_hash)
    ann = scoped_persist(
        "curate_corpus",
        ann.withColumn("rule_pass", rule_pass).withColumn(
            "exact_kept", rule_pass & (F.col("doc_id") == min_pass_id)
        ),
    )

    exact_kept = ann.filter("exact_kept")

    if eval_docs is not None:
        contam = decontaminate_df(
            exact_kept.select("doc_id", "text"),
            eval_docs.select("doc_id", "text"),
            min_hits=decontam_min_hits,
        ).select("doc_id", "is_contaminated")
        clean = (
            exact_kept.join(contam, "doc_id", "left")
            .withColumn(
                "decontam_pass",
                ~F.coalesce("is_contaminated", F.lit(False)),
            )
            .drop("is_contaminated")
            .filter("decontam_pass")
        )
        n_after_decontam = clean.count()
    else:
        clean = exact_kept
        n_after_decontam = None

    near_pairs = minhash_lsh_pairs_df(
        clean.select("doc_id", "text"),
        jaccard_threshold=jaccard_threshold,
        max_bucket_size=max_bucket_size,
        heavy_bucket_mode=heavy_bucket_mode,
    )
    if transitive_dedup:
        # full transitive closure: keep only each component's min-id
        # representative — A~B, B~C drops BOTH B and C even when A!~C
        comp = connected_components(near_pairs)
        near_dropped = (
            comp.filter(F.col("vertex") != F.col("component"))
            .select(F.col("vertex").alias("doc_id"))
            .withColumn("near_dropped", F.lit(True))
        )
    else:
        near_dropped = (
            near_pairs.select(F.col("b_id").alias("doc_id"))
            .distinct()
            .withColumn("near_dropped", F.lit(True))
        )
    near = (
        clean.join(near_dropped, "doc_id", "left")
        .withColumn("near_kept", F.col("near_dropped").isNull())
        .drop("near_dropped")
    )
    survivors = near.filter("near_kept")

    if embeddings is not None:
        from ..operators.semdedup import SEMDEDUP_TAU, semdedup_df

        # eager pre-count so the report can show the stage's effect
        # (same one-extra-job trade as the decontam stage)
        n_after_near_pre = survivors.count()
        emb_sub = embeddings.join(
            survivors.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        )
        # degradation contract: with NO judgeable survivor (id-space
        # mismatch, or every embedded doc already filtered) the stage is
        # a no-op — everything is kept — rather than crashing the
        # trained-centroid path (kmeans cannot fit on an empty frame)
        if emb_sub.limit(1).count() > 0:
            if sem_centroids is None:
                from ..operators.kmeans import (
                    TRAIN_POINTS_PER_CENTROID,
                    centroids_df,
                    kmeans_fit,
                )
                from ..operators.similarity import _norm2

                # fixed sem_k: training bounded at 256 pts/centroid
                # (round 12 — bit-identical below the cap)
                # train_sample_n: without it the stride-sizing count
                # re-executes the whole upstream dedup DAG (minhash
                # pairs, CC, joins) once more per curate run — the trap
                # train_sample's own docstring warns about. The
                # already-computed survivor count is a near-exact upper
                # bound on emb_sub's rows (left-semi can only shrink
                # it), and a near-exact n is all the stride needs
                # (round-13 advisory). VALID WHILE embeddings are 1:1
                # with documents (they are, in every shipped testdata
                # sf): if embeddings ever cover far fewer docs than the
                # survivor set, the stride oversizes and k-means trains
                # on fewer than 256 pts/centroid — then pass a count of
                # the semi-joined frame here instead (one cheap
                # vec_id-projection count) rather than reverting to the
                # full-DAG recount.
                fitted, _ = kmeans_fit(
                    emb_sub,
                    k=sem_k,
                    max_iters=3,
                    train_sample_rows=TRAIN_POINTS_PER_CENTROID * sem_k,
                    train_sample_n=n_after_near_pre,
                )
                sem_centroids = centroids_df(
                    emb_sub.sparkSession, fitted
                ).withColumn("c_n2", _norm2("centroid_vec"))
            sem_dropped = (
                semdedup_df(
                    emb_sub,
                    sem_centroids,
                    tau=sem_tau if sem_tau is not None else SEMDEDUP_TAU,
                    max_cluster_size=sem_max_cluster,
                )
                .filter(~F.col("is_kept"))
                .select(F.col("vec_id").alias("doc_id"))
                .withColumn("sem_dropped", F.lit(True))
            )
            # left join + null flag: a survivor with no embedding row
            # joins nothing and stays kept
            survivors = (
                survivors.join(sem_dropped, "doc_id", "left")
                .withColumn("sem_kept", F.col("sem_dropped").isNull())
                .drop("sem_dropped")
                .filter("sem_kept")
            )
    else:
        n_after_near_pre = None

    if token_budget is not None:
        per_bucket = max(1, token_budget // n_budget_buckets)
        w_budget = (
            Window.partitionBy("bucket")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        flagged = (
            survivors.withColumn(
                "bucket", F.pmod(F.hash("doc_id"), F.lit(n_budget_buckets))
            )
            .withColumn("run_tokens", F.sum("n_tokens").over(w_budget))
            .withColumn("in_budget", F.col("run_tokens") <= per_bucket)
            .drop("bucket", "run_tokens")
        )
    else:
        flagged = survivors.withColumn("in_budget", F.lit(True))

    # slim cache: one lineage execution serves the report aggregation AND
    # the curated output (text column is re-read only for final rows).
    # Same scope as the ann cache above — both release when the next
    # curation run begins.
    flagged = scoped_persist("curate_corpus", flagged)
    curated = flagged.filter("in_budget").select(
        "doc_id", "text", "quality", "lang_detected", "n_tokens"
    )
    # count(flagged) is the post-near count with the sem stage off, and
    # the post-sem count with it armed (the stage filters before the
    # budget flags); n_after_near_pre holds the pre-sem count then
    stats = flagged.agg(
        F.count(F.lit(1)).alias("n_after_near"),
        F.sum(F.when(F.col("in_budget"), 1).otherwise(0)).alias("n_final"),
        F.sum(F.when(F.col("in_budget"), F.col("n_tokens")).otherwise(0)).alias(
            "tokens_final"
        ),
    ).collect()[0]
    pre = ann.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(F.col("rule_pass"), 1).otherwise(0)).alias("n_after_rules"),
        # exact_kept is a cached column now (see the ann fill) — the
        # count is part of this aggregation instead of its own job
        F.sum(F.when(F.col("exact_kept"), 1).otherwise(0)).alias(
            "n_after_exact"
        ),
    ).collect()[0]
    n_after_exact = pre["n_after_exact"]
    return CurationReport(
        n_input=pre["n_input"],
        n_after_rules=pre["n_after_rules"],
        n_after_exact=n_after_exact,
        n_after_decontam=(
            n_after_decontam if n_after_decontam is not None else n_after_exact
        ),
        n_after_near=(
            n_after_near_pre
            if n_after_near_pre is not None
            else stats["n_after_near"]
        ),
        n_after_sem=stats["n_after_near"],
        n_final=stats["n_final"] or 0,
        tokens_final=stats["tokens_final"] or 0,
        curated=curated,
    )


def corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) data-card statistics — the reporting rollup a
    training-data release ships: volume, token mass, quality, exact-dup
    rate, and benchmark-contamination rate per stratum.

    One annotation scan (scalar projections) + one content-hash window +
    one broadcast-gated contamination pass + ONE groupBy — no per-metric
    re-scans. At 100 TB every input is touched once; the output is
    strata-sized (sources x langs).
    """
    from ..operators.decontam import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    qc = quality_cols()
    ann = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(_tokens(F.col("text"))).alias("n_tokens"),
        qc["quality"].alias("quality"),
        F.md5("text").alias("content_hash"),
    )
    w_hash = Window.partitionBy("content_hash")
    ann = ann.withColumn(
        "is_exact_dup", F.col("doc_id") != F.min("doc_id").over(w_hash)
    )
    contam = decontaminate(spark, sf_dir).select("doc_id", "is_contaminated")
    return (
        ann.join(contam, "doc_id", "left")
        .withColumn(
            "is_contaminated", F.coalesce("is_contaminated", F.lit(False))
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
            F.sum(F.col("is_exact_dup").cast("int")).alias("n_exact_dups"),
            F.sum(F.col("is_contaminated").cast("int")).alias(
                "n_contaminated"
            ),
        )
        .orderBy("source", "lang")
    )


def materialize_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    *,
    max_tokens: int = 2048,
    n_shard_dirs: int = 16,
    **curate_kwargs,
) -> DataFrame:
    """End of the line: curate -> pack -> write trainer-ready shards.

    Composes the full pipeline (rules, exact dedup, optional
    decontamination, near-dup collapse, optional token budget) with
    sequence packing, then writes:
    - ``{out_dir}/shards/`` — curated docs + shard_id, parquet
      partitioned by ``shard_dir = shard_id % n_shard_dirs`` (bounded
      directory fan-out; a trainer streams one dir per worker), and
    - ``{out_dir}/manifest/`` — per-shard doc/token totals.

    Returns the manifest frame. One curation lineage feeds both writes
    (the curated frame is already cached by ``curate_corpus``).
    """
    from ..operators.packing import pack_sequences, shard_stats

    report = curate_corpus(spark, sf_dir, **curate_kwargs)
    packed = pack_sequences(report.curated, max_tokens)
    packed = packed.withColumn(
        "shard_dir", F.pmod("shard_id", F.lit(n_shard_dirs))
    )
    (
        packed.write.mode("overwrite")
        .partitionBy("shard_dir")
        .parquet(f"{out_dir}/shards")
    )
    manifest = shard_stats(
        spark.read.parquet(f"{out_dir}/shards")
    )
    manifest.write.mode("overwrite").parquet(f"{out_dir}/manifest")
    return spark.read.parquet(f"{out_dir}/manifest")
