"""Skew regimes of candidate_pairs_from_buckets: plain, salted, star."""

from __future__ import annotations

import pandas as pd
import pytest

from deduplication_and_compression_spark.config import DedupConfig
from deduplication_and_compression_spark.operators.minhash_lsh import (
    candidate_pairs_from_buckets,
)
from tests.conftest import pairs_set


CFG = DedupConfig(hot_bucket_threshold=16, salt_buckets=4)
# salt_floor = 16 // 4 = 4


def _bucket_df(spark, sizes: dict[int, int]):
    rows = []
    for key, k in sizes.items():
        for i in range(k):
            rows.append((f"k{key:02d}_m{i:03d}", 0, key))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "band_idx", "band_hash"])
    )


def _expected_all_pairs(sizes, key):
    ids = sorted(f"k{key:02d}_m{i:03d}" for i in range(sizes[key]))
    return {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}


def test_small_bucket_all_pairs(spark):
    sizes = {1: 3}
    got = pairs_set(candidate_pairs_from_buckets(_bucket_df(spark, sizes), CFG).toPandas())
    assert got == _expected_all_pairs(sizes, 1)


def test_salted_medium_bucket_all_pairs_exactly_once(spark):
    sizes = {2: 10}  # salt_floor(4) < 10 <= hot(16) → salted regime
    df = candidate_pairs_from_buckets(_bucket_df(spark, sizes), CFG)
    pdf = df.toPandas()
    got = pairs_set(pdf)
    assert got == _expected_all_pairs(sizes, 2)
    assert len(pdf) == len(got)  # exactly once, no salt-induced dups


def test_hot_bucket_star_only(spark):
    sizes = {3: 40}  # > hot(16) → star around min id
    pdf = candidate_pairs_from_buckets(_bucket_df(spark, sizes), CFG).toPandas()
    hub = f"k03_m000"
    assert len(pdf) == 39
    assert (pdf["a"] == hub).all()


def test_mixed_regimes_union(spark):
    sizes = {1: 2, 2: 8, 3: 30}
    pdf = candidate_pairs_from_buckets(_bucket_df(spark, sizes), CFG).toPandas()
    got = pairs_set(pdf)
    expect = (
        _expected_all_pairs(sizes, 1)
        | _expected_all_pairs(sizes, 2)
        | {(f"k03_m000", f"k03_m{i:03d}") for i in range(1, 30)}
    )
    assert got == expect
