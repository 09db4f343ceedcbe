"""Oracle-side SQL form pins (round-14 mmap-flake fix).

The unrolled 64-term dot-product SQL made DuckDB allocate tens of
thousands of transient mmaps per cross-join execute, crossing the
kernel's vm.max_map_count and failing verify batches with spurious
OOMs (full diagnosis: BASELINE.md round-14, tools/duck_maps_probe.py).
These pins keep the fix from being silently reintroduced and keep the
replacement bit-exact with the chain the Spark fold matches.
No Spark session needed — pure duckdb."""

from __future__ import annotations

import random

import duckdb

from concerts_etl_sa_spark.operators.similarity import (
    DIM,
    _dot_sql,
    _norm2_sql,
)


def test_dot_sql_is_single_call_not_unrolled():
    s = _dot_sql("a.embedding", "b.embedding")
    assert "list_inner_product" in s
    # the unrolled form had 64 '*' terms; a regression to per-term SQL
    # re-opens the mmap flake
    assert s.count("*") == 0, s
    assert "list_inner_product" in _norm2_sql("a.embedding")


def test_list_inner_product_bitexact_vs_chain():
    """DuckDB's list_inner_product must equal the explicit
    left-associated chain (the order Spark's zip_with fold uses) on
    adversarial mixed-exponent doubles — the property that keeps every
    cosine oracle bit-comparable after the round-14 rewrite."""
    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(200):
        a = [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 8) for _ in range(DIM)]
        b = [rng.uniform(-1, 1) * 10 ** rng.randint(-8, 8) for _ in range(DIM)]
        al = "[" + ",".join(repr(x) for x in a) + "]::DOUBLE[]"
        bl = "[" + ",".join(repr(x) for x in b) + "]::DOUBLE[]"
        chain = " + ".join(
            f"({a[i]!r}::DOUBLE * {b[i]!r}::DOUBLE)" for i in range(DIM)
        )
        eq = con.execute(
            f"SELECT list_inner_product({al}, {bl}) = ({chain})"
        ).fetchall()[0][0]
        assert eq, (a, b)
