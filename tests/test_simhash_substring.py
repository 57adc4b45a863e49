"""SimHash/phash tier + substring tier vs brute-force oracles."""

from __future__ import annotations

import numpy as np
import pytest

from deduplication_and_compression_spark.functions import hashing as H
from deduplication_and_compression_spark.functions.text import lcs_length
from deduplication_and_compression_spark.operators.simhash import phash_hamming_pairs
from deduplication_and_compression_spark.operators.substring import substring_pairs
from tests.conftest import pairs_set, transitive_closure_pairs


@pytest.fixture(scope="module")
def hamming_oracle(fixture_pdf, cfg):
    images, _ = fixture_pdf
    ids = images["image_id"].to_numpy()
    ph = images["phash"].to_numpy()
    out = set()
    for i in range(len(ids)):
        d = H.hamming64(np.full(len(ids) - i - 1, ph[i]), ph[i + 1 :])
        for j in np.flatnonzero(d <= cfg.hamming_threshold):
            jj = i + 1 + j
            out.add((min(ids[i], ids[jj]), max(ids[i], ids[jj])))
    return out


@pytest.fixture(scope="module")
def substring_oracle(fixture_pdf, cfg):
    images, _ = fixture_pdf
    ids = images["image_id"].tolist()
    caps = images["caption"].tolist()
    L = cfg.min_substring_len
    grams = [set(H.char_kgram_hashes(c, L).tolist()) for c in caps]
    out = set()
    for i in range(len(ids)):
        gi = grams[i]
        if not gi:
            continue
        for j in range(i + 1, len(ids)):
            if gi & grams[j] and lcs_length(caps[i], caps[j]) >= L:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


@pytest.fixture(scope="module")
def phash_pairs_got(images_df, cfg):
    return pairs_set(phash_hamming_pairs(images_df, cfg).toPandas())


@pytest.fixture(scope="module")
def substring_pairs_got(images_df, cfg):
    return pairs_set(substring_pairs(images_df, cfg).toPandas())


def test_phash_pairs_exact_vs_oracle(phash_pairs_got, hamming_oracle, cfg):
    got = phash_pairs_got
    # no false positives (verified by bit_count) ...
    assert got <= hamming_oracle
    # ... and pigeonhole keying is EXACT up to hot-bucket star capping:
    # closure must cover the full oracle closure
    assert transitive_closure_pairs(got) == transitive_closure_pairs(hamming_oracle)


def test_simhash_tier_recall(phash_pairs_got, fixture_pdf, cfg):
    _, truth = fixture_pdf
    planted = pairs_set(truth[truth.tier == "simhash"])
    got = transitive_closure_pairs(phash_pairs_got)
    recall = len(planted & got) / len(planted)
    assert recall >= 0.99, f"simhash tier recall {recall:.4f}"


def test_substring_pairs_vs_oracle(substring_pairs_got, substring_oracle, cfg):
    got = substring_pairs_got
    assert got <= substring_oracle  # LCS-verified → no false positives
    assert transitive_closure_pairs(got) == transitive_closure_pairs(substring_oracle)


def test_substring_tier_recall(substring_pairs_got, fixture_pdf, cfg):
    _, truth = fixture_pdf
    planted = pairs_set(truth[truth.tier == "substring"])
    got = transitive_closure_pairs(substring_pairs_got)
    recall = len(planted & got) / len(planted)
    assert recall >= 0.99, f"substring tier recall {recall:.4f}"
