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


def test_round_away_matches_duckdb_round():
    """pq._round_away (the oracle-form trainer's per-iteration centroid
    rounding, round-15) must be bit-exact with DuckDB's
    round(DOUBLE, dp) — half away from zero — on dense uniform doubles
    AND on exact-grid/near-half adversarial values. A drift here makes
    the two engines enter a Lloyd iteration with different books and
    the trained-oracle parity row flakes."""
    from concerts_etl_sa_spark.operators.pq import (
        PQ_ORACLE_ROUND_DP,
        _round_away,
    )

    con = duckdb.connect()
    rng = random.Random(15)
    vals = [rng.uniform(-1, 1) for _ in range(5000)]
    vals += [rng.uniform(-1, 1) * 10 ** rng.randint(-9, 3) for _ in range(2000)]
    # adversarial: values on and around the rounding grid
    vals += [i * 5e-7 for i in range(-20, 21)]
    vals += [i * 5e-7 + 1e-13 for i in range(-20, 21)]
    vals += [i * 5e-7 - 1e-13 for i in range(-20, 21)]
    lit = "[" + ",".join(repr(v) for v in vals) + "]::DOUBLE[]"
    duck = con.execute(
        f"SELECT list_transform({lit}, x -> round(x, {PQ_ORACLE_ROUND_DP}))"
    ).fetchall()[0][0]
    ours = [_round_away(v, PQ_ORACLE_ROUND_DP) for v in vals]
    assert duck == ours
