#!/usr/bin/env python
"""Signature+banding stage throughput at a given parallelism.

Usage: python bench_stage.py <cores> [replicate]

Measures the compute-dominated part of the pipeline (MinHash signature
UDF + JVM banding + bucket write) on the cached 100k-caption fixture
replicated `replicate` times (default 4 → 400k rows) so fixed stage
latency amortizes.  Prints one JSON line.
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
from deduplication_and_compression_spark.operators.minhash_lsh import (
    band_keys, minhash_signatures,
)
from deduplication_and_compression_spark.session import build_session


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cache = REPO / ".bench_cache" / f"images_100000_seed42_{CFG.fingerprint()}"
    img_path, _ = write_fixture(cache, 100_000, seed=42, cfg=CFG)

    spark = build_session(app_name="sig-stage-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet(str(img_path)).select("image_id", "caption")
    df = base
    for i in range(1, replicate):
        df = df.union(base.select(F.concat(F.lit(f"r{i}_"), "image_id").alias("image_id"), "caption"))
    df = df.repartition(cores * 4).cache()
    n = df.count()

    t0 = time.perf_counter()
    sigs = minhash_signatures(df, CFG).localCheckpoint()
    out = band_keys(sigs, CFG)
    out.write.mode("overwrite").parquet(tempfile.mkdtemp() + "/bands")
    wall = time.perf_counter() - t0
    print(json.dumps({
        "stage": "signature+banding", "cores": cores, "rows": n,
        "wall_sec": round(wall, 2), "rows_per_sec": round(n / wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
