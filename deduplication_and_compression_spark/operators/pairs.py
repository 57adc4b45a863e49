"""Candidate-pair union across detector tiers (SURVEY.md §7 step 6).

The reference's single dedup verdict vector
(/root/reference/App/Host.cpp:63 DuplicateChunkId) generalizes to a
tagged edge table: (a, b, tier) with a < b canonical, one row per
detected relation, deduplicated keeping tier priority
exact > simhash > minhash > substring (highest-confidence evidence
wins when several detectors find the same pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window

TIER_PRIORITY = {"exact": 1, "simhash": 2, "minhash": 3, "substring": 4}


def union_pairs(**tier_pairs: DataFrame) -> DataFrame:
    """union_pairs(exact=df1, minhash=df2, ...) → (a, b, tier)."""
    tagged = []
    for tier, df in tier_pairs.items():
        if df is None:
            continue
        tagged.append(
            df.select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                F.lit(tier).alias("tier"),
                F.lit(TIER_PRIORITY.get(tier, 99)).alias("_prio"),
            )
        )
    if not tagged:
        raise ValueError("no tiers given")
    allp = tagged[0]
    for t in tagged[1:]:
        allp = allp.union(t)
    w = Window.partitionBy("a", "b").orderBy("_prio")
    return (
        allp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("a", "b", "tier")
    )
