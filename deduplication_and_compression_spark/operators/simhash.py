"""SimHash / phash Hamming-distance tier (SURVEY.md §7 step 4).

Finds image near-duplicates: pairs whose 64-bit perceptual hash
(``phash`` input column) differ in ≤ d bits.  The reference can only
equate byte-identical chunks (/root/reference/Dedup/Dedup.cpp:16-22);
this tier is the image analog of "similar but not identical".

Scale design — generalized pigeonhole (Manku, Jain & Sarma, WWW'07,
"Detecting Near-Duplicates for Web Crawling"): split the 64 bits into
m blocks; any pair within Hamming distance d agrees on at least
q = m - d whole blocks, so keying on every q-block combination
(C(m, q) keys of q*64/m bits each) finds all such pairs exactly.
With m=8, d=3 → C(8,5)=56 keys of 40 bits: at 10^12 rows the expected
random bucket is small, and real-world phash skew (flat images →
identical hashes) is exactly the hot-bucket case handled by
candidate_pairs_from_buckets' star fallback + AQE skew join.

Everything here is JVM-side bit arithmetic — no Python at all until
(optionally) SimHash-from-features for text, which is Arrow-batched.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..config import DedupConfig, DEFAULT_CONFIG
from ..functions import hashing as H
from .minhash_lsh import candidate_pairs_from_buckets

_NUM_BLOCKS = 8  # m; block width = 64/m = 8 bits


def _block(col, i: int):
    """Extract 8-bit block i of a 64-bit long, JVM-side."""
    return F.shiftrightunsigned(col, i * 8).bitwiseAND(F.lit(0xFF))


def hamming_block_keys(
    df: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "image_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id, band_idx, band_hash): one row per q-block combination.

    band_idx identifies the combination; band_hash packs the selected
    blocks' values (xxhash64-mixed with the combination index so
    different combinations never share buckets).
    """
    m, d = _NUM_BLOCKS, cfg.hamming_threshold
    q = m - d
    combos = list(combinations(range(m), q))
    # Two-step select: materialize the 8 block columns once, then hash
    # each combination with ONE variadic xxhash64 — keeps the codegen
    # tree ~10x smaller than inlining a shift/mask chain per combo.
    # Also prune to (id, hash) FIRST: never drag the image `bytes`
    # column through a 56-way explode.
    blocks = df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("_vhash"),  # full phash drives value collapse
        *[_block(F.col(hash_col), i).alias(f"_b{i}") for i in range(m)],
    )
    cols = [
        F.xxhash64(F.lit(ci), *[F.col(f"_b{bi}") for bi in combo])
        for ci, combo in enumerate(combos)
    ]
    return blocks.select(
        "id", F.posexplode(F.array(*cols)).alias("band_idx", "band_hash"), "_vhash"
    )


def verify_hamming(
    candidates: DataFrame,
    df: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "image_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Keep candidate (a,b) pairs with popcount(phash_a XOR phash_b) ≤ d.
    Pure JVM: bit_count is a built-in in Spark 3.5+."""
    ph = df.select(F.col(id_col).alias("_pid"), F.col(hash_col).alias("_ph"))
    joined = (
        candidates.join(ph.withColumnRenamed("_pid", "a").withColumnRenamed("_ph", "_pa"), "a")
        .join(ph.withColumnRenamed("_pid", "b").withColumnRenamed("_ph", "_pb"), "b")
    )
    return (
        joined.withColumn("hamming", F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb"))))
        .filter(F.col("hamming") <= F.lit(cfg.hamming_threshold))
        .select("a", "b", "hamming")
    )


def phash_hamming_pairs(
    df: DataFrame,
    cfg: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "image_id",
    hash_col: str = "phash",
) -> DataFrame:
    """Full image tier: verified (a, b, hamming) edges with Hamming ≤ d.

    Contract: a CLUSTER-PRESERVING edge set, not the full ≤d pair
    enumeration — identical-phash groups contribute O(k) star edges
    rather than O(k²) pairs (their closure is identical, and a k-clique
    enumeration would be quadratic output at web scale).  Every true
    ≤d pair is connected through emitted verified edges: pigeonhole
    guarantees bucket sharing, identical phashes star around a
    distance-0 representative that verification can never sever, and
    distinct-value representatives go through all-pairs/salted
    regimes.  The only approximation is a bucket with more than
    cfg.hot_bucket_threshold DISTINCT phash values (star-over-reps;
    rep edges > d apart are dropped there — see
    candidate_pairs_from_buckets).  False positives pruned by
    verify_hamming.
    """
    # materialize: the candidate generator consumes the key table in
    # three branches; without this the 56-way explode runs three times
    keys = hamming_block_keys(df, cfg, id_col, hash_col).persist()
    cands = candidate_pairs_from_buckets(keys, cfg, val_col="_vhash")
    return verify_hamming(cands, df, cfg, id_col, hash_col)


def simhash_from_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, simhash): classic Charikar SimHash over whitespace-token
    features — Arrow-batched, numpy inside, with ZERO per-row Python:
    the whole batch's tokens are hashed in one padded-matrix polynomial
    fold and the bit-vote sums come from one unpackbits+reduceat pass
    (functions/hashing.py:simhash_batch)."""

    @F.pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        return pd.Series(
            H.simhash_batch(texts.fillna("").tolist()), dtype="int64"
        )

    return df.select(F.col(id_col).alias("id"), _sh(F.col(text_col)).alias("simhash"))
