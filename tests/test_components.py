"""Connected-components / dedup-cluster tests: parity against a driver-
side union-find on the same edges, convergence, and cluster invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from concerts_etl_sa_spark.operators import components as CC
from concerts_etl_sa_spark.operators.dedup import simhash_near_pairs
from concerts_etl_sa_spark.sources.readers import load_table

from .conftest import SF_DIR


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_matches_union_find(spark):
    edges_df = simhash_near_pairs(spark, SF_DIR).select("a_id", "b_id")
    edges = [(r.a_id, r.b_id) for r in edges_df.collect()]
    expected = _union_find(edges)
    got = {
        r.vertex: r.component
        for r in CC.connected_components(edges_df).collect()
    }
    assert got == expected


def test_connected_components_chain_converges(spark):
    # worst-case shape for label propagation: a single long chain
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["a_id", "b_id"]
    )
    out = CC.connected_components(edges).collect()
    assert len(out) == n + 1
    assert all(r.component == 0 for r in out)


def test_dedup_clusters_invariants(spark):
    rows = CC.dedup_clusters(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(rows) == n_docs                      # every doc assigned
    by_id = {r.doc_id: r for r in rows}
    reps = {r.cluster_rep for r in rows}
    for r in rows:
        assert r.cluster_rep <= r.doc_id            # rep is the min id
        assert r.is_representative == (r.doc_id == r.cluster_rep)
    # each cluster's representative is a member of its own cluster
    for rep in reps:
        assert by_id[rep].cluster_rep == rep
    # sizes consistent
    from collections import Counter

    sizes = Counter(r.cluster_rep for r in rows)
    assert all(r.cluster_size == sizes[r.cluster_rep] for r in rows)
