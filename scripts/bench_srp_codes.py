#!/usr/bin/env python
"""Measured comparison of the two SRP code kernels (VERDICT r4 Next
#4): the JVM literal-plane fold (interpreted higher-order functions,
~L·b·dim ops per row) vs the Arrow-batched numpy matmul
((rows, dim) @ (dim, L·b), BLAS).  1M vectors x dim 64, b=16, L=8 —
the action is sum(bucket) so both plans must compute every code
(count() alone lets Catalyst prune the code expressions under the
Generate).  Interleaved best-of-3; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from deduplication_and_compression_spark.operators.similarity import (
    _srp_code_table, srp_planes,
)
from deduplication_and_compression_spark.session import build_session

N, DIM, BITS, TABLES, SEED = 1_000_000, 64, 16, 8, 0xB17_5EED


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cache = REPO / ".bench_cache" / f"srpvec_{N}_{DIM}"
    if not (cache / "_SUCCESS").exists():
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(77)
        cache.mkdir(parents=True, exist_ok=True)
        for part in range(8):
            n = N // 8
            vecs = rng.standard_normal((n, DIM)).astype(np.float32)
            tbl = pa.table({
                "vec_id": pa.array(np.arange(part * n, (part + 1) * n)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(vecs.reshape(-1)), DIM
                ).cast(pa.list_(pa.float32())),
            })
            pq.write_table(tbl, cache / f"part{part}.parquet")
        (cache / "_SUCCESS").touch()

    spark = build_session(app_name="srp-codes-bench", cores=cpus,
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(str(cache)).repartition(cpus).cache()
    emb.count()
    planes = srp_planes(TABLES, BITS, DIM, SEED)

    def timed(impl: str) -> tuple[float, int]:
        t0 = time.perf_counter()
        s = (
            _srp_code_table(emb, planes, BITS, TABLES, "vec_id", "embedding",
                            code_impl=impl)
            .agg(F.sum("bucket").alias("s")).collect()[0]["s"]
        )
        return round(time.perf_counter() - t0, 3), int(s)

    walls = {"fold": [], "arrow": []}
    sums = {}
    for _ in range(3):
        for impl in ("fold", "arrow"):
            w, s = timed(impl)
            walls[impl].append(w)
            sums[impl] = s

    print(json.dumps({
        "n": N, "dim": DIM, "bits": BITS, "tables": TABLES, "cpus": cpus,
        "walls": walls, "best": {k: min(v) for k, v in walls.items()},
        "sums_equal": sums["fold"] == sums["arrow"], "sums": sums,
        "speedup_best": round(min(walls["fold"]) / min(walls["arrow"]), 2),
        "load1": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
