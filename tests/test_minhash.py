"""MinHash/LSH tier vs brute-force O(n²) Jaccard oracle."""

from __future__ import annotations

import numpy as np
import pytest

from deduplication_and_compression_spark.functions import hashing as H
from deduplication_and_compression_spark.operators.minhash_lsh import (
    band_keys, minhash_pairs, minhash_signatures,
)
from tests.conftest import pairs_set, transitive_closure_pairs


@pytest.fixture(scope="module")
def jaccard_oracle(fixture_pdf, cfg):
    """All (a,b) pairs with TRUE shingle-Jaccard ≥ threshold."""
    images, _ = fixture_pdf
    ids = images["image_id"].tolist()
    sets = [
        frozenset(H.char_kgram_hashes(t, cfg.shingle_k).tolist())
        for t in images["caption"]
    ]
    out = set()
    for i in range(len(ids)):
        si = sets[i]
        for j in range(i + 1, len(ids)):
            sj = sets[j]
            u = len(si | sj)
            jac = (len(si & sj) / u) if u else 1.0
            if jac >= cfg.jaccard_threshold:
                out.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    return out


def test_signature_estimates_jaccard(fixture_pdf, cfg):
    """MinHash lane-agreement ≈ true Jaccard (error bound ~3σ)."""
    images, truth = fixture_pdf
    near = truth[truth.tier == "minhash"].head(30)
    caps = images.set_index("image_id")["caption"]
    seeds = H.make_seeds(cfg.num_perm, cfg.minhash_seed)
    for r in near.itertuples():
        sa = H.minhash_signature(H.char_kgram_hashes(caps[r.a], cfg.shingle_k), seeds)
        sb = H.minhash_signature(H.char_kgram_hashes(caps[r.b], cfg.shingle_k), seeds)
        est = float(np.mean(sa == sb))
        ta = set(H.char_kgram_hashes(caps[r.a], cfg.shingle_k).tolist())
        tb = set(H.char_kgram_hashes(caps[r.b], cfg.shingle_k).tolist())
        true = len(ta & tb) / len(ta | tb)
        sigma = (true * (1 - true) / cfg.num_perm) ** 0.5
        assert abs(est - true) <= max(3.5 * sigma, 0.06)


def test_minhash_pairs_recall_and_precision(images_df, fixture_pdf, jaccard_oracle, cfg):
    got = pairs_set(minhash_pairs(images_df, cfg).toPandas())
    # no false positives: every emitted edge really has J >= threshold
    assert got <= jaccard_oracle
    # recall vs planted minhash-tier truth (all planted at >= plant_jaccard)
    _, truth = fixture_pdf
    planted = pairs_set(truth[truth.tier == "minhash"])
    closure = transitive_closure_pairs(got)
    recall = len(planted & closure) / len(planted)
    assert recall >= 0.99, f"minhash tier recall {recall:.4f}"
    # exact-dup captions are trivially J=1 pairs; LSH must catch them too
    planted_exact = pairs_set(truth[truth.tier == "exact"])
    exact_recall = len(planted_exact & closure) / len(planted_exact)
    assert exact_recall >= 0.99, f"exact-via-minhash recall {exact_recall:.4f}"


def test_band_count(images_df, cfg):
    sigs = minhash_signatures(images_df, cfg)
    bk = band_keys(sigs, cfg)
    n = images_df.count()
    assert bk.count() == n * cfg.lsh_bands
