#!/usr/bin/env python
"""Best-of-3 INTERLEAVED pin of the r5 regression cluster (VERDICT r5
Next #1 and #4): ``minhash_pairs_docs`` and
``simhash_hamming_pairs_docs`` at sf0.1 — each run both WITH and
WITHOUT ``normalize_parallelism`` on the driver docs fixture, to rule
the r5 repartition(cores) in or out as the regression cause — plus the
``image_pipeline`` wall on the bench-cache images fixture.

Interleaving (mh_norm, mh_raw, sh_norm, sh_raw, pipeline) x3 makes
host-steal drift hit every variant equally (the only comparison
protocol that has held on this host — r5 finding: a single-shot sweep
inverted the ppjoin/allpairs order).  A pure-CPU multiprocessing
calibration brackets the run so the walls carry their own load
context.  Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from deduplication_and_compression_spark.config import DEFAULT_CONFIG as CFG
from deduplication_and_compression_spark.fixtures.generator import write_fixture
from deduplication_and_compression_spark.operators.minhash_lsh import minhash_pairs
from deduplication_and_compression_spark.operators.simhash import (
    phash_hamming_pairs, simhash_from_text,
)
from deduplication_and_compression_spark.persistence import (
    persist_scope, scoped_persist,
)
from deduplication_and_compression_spark.session import build_session
from deduplication_and_compression_spark.sources.tables import (
    normalize_parallelism,
)


def _calibrate(workers=(1, 8, 32)):
    from bench_scaling import calibrate_host

    return calibrate_host(workers)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_PIN_ROUNDS", "3"))
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "20000"))

    cal_before = _calibrate()
    spark = build_session(app_name="pin-contract-walls", cores=cpus,
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    cache = Path(
        os.environ.get("SPARK_GRAFT_BENCH_CACHE", str(REPO / ".bench_cache"))
    ) / f"images_{n_images}_seed42_{CFG.fingerprint()}"
    img_path, _ = write_fixture(cache, n_images, seed=42, cfg=CFG)
    from deduplication_and_compression_spark.plans.pipeline import run_pipeline

    images = spark.read.parquet(str(img_path)).repartition(max(cpus, 8)).cache()
    images.count()  # materialize outside every timed region

    def docs(norm: bool):
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return normalize_parallelism(df) if norm else df

    def mh(norm):
        return minhash_pairs(
            docs(norm), CFG, id_col="doc_id", text_col="text"
        ).select("a", "b").count()

    def sh(norm):
        sims = scoped_persist(simhash_from_text(docs(norm)))
        return phash_hamming_pairs(
            sims, CFG, id_col="id", hash_col="simhash", scheme="chunk4"
        ).select("a", "b", "hamming").count()

    def pipeline():
        workdir = tempfile.mkdtemp(prefix="pin_pipe_")
        try:
            run_pipeline(spark, images, workdir, CFG, resume=False)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    variants = {
        "minhash_norm": lambda: mh(True),
        "minhash_raw": lambda: mh(False),
        "simhash_norm": lambda: sh(True),
        "simhash_raw": lambda: sh(False),
        "image_pipeline": pipeline,
    }
    walls: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            with persist_scope():
                fn()
            walls[name].append(round(time.perf_counter() - t0, 3))

    cal_after = _calibrate()
    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "rounds": rounds,
        "n_images": n_images,
        "walls": walls,
        "best": {k: min(w) for k, w in walls.items()},
        "cal_before": cal_before, "cal_after": cal_after,
        "load1": round(os.getloadavg()[0], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
