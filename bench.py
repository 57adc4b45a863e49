#!/usr/bin/env python
"""Benchmark harness.

Runs the headline jobs at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", ...extras}.

The flagship job is the full 4-tier image dedup pipeline over a
deterministically synthesized images table in the BASELINE.json
input_hint shape (image_id, bytes, w, h, fmt, caption, phash), sized
proportionally to the scale factor and cached on disk across runs
(generation is NOT timed).  images/sec over signature+cluster is the
north-star throughput metric.

Scaling-efficiency evidence (N vs 4N cores) is produced by
bench_scaling.py, which shells out to this file at two parallelism
levels; results land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

from deduplication_and_compression_spark.config import DEFAULT_CONFIG as CFG
from deduplication_and_compression_spark.fixtures.generator import (
    write_fixture, write_zipf_docs,
)
from deduplication_and_compression_spark.session import build_session


def sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def images_rows_for_sf(sf: float) -> int:
    return max(1000, int(round(200_000 * sf)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_from_dir(sf_dir)
    n_images = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "0")) or images_rows_for_sf(sf)
    skip_docs = os.environ.get("SPARK_GRAFT_BENCH_SKIP_DOCS") == "1"

    # fixture generation is cached and NOT part of the timed region
    cache = Path(
        os.environ.get("SPARK_GRAFT_BENCH_CACHE", str(REPO / ".bench_cache"))
    ) / f"images_{n_images}_seed42_{CFG.fingerprint()}"
    img_path, truth_path = write_fixture(cache, n_images, seed=42, cfg=CFG)

    spark = build_session(
        app_name="dedup-bench", cores=cpus, shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from deduplication_and_compression_spark.plans.pipeline import run_pipeline

    from deduplication_and_compression_spark.persistence import persist_scope

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        # each timed job runs in a persist scope: operator-internal
        # caches are released once the job's action completes, so
        # later queries measure their own work, not a warm predecessor
        t0 = time.perf_counter()
        with persist_scope():
            out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # --- flagship: full image dedup pipeline (signature → cluster) ---
    images = spark.read.parquet(str(img_path))
    images = images.repartition(max(cpus, 8)).cache()
    images.count()  # materialize cache outside the timed region
    workdir = tempfile.mkdtemp(prefix="dedup_bench_")
    try:
        res = timed(
            "image_pipeline",
            lambda: run_pipeline(spark, images, workdir, CFG, resume=False),
        )
        # the pipeline runs twice: single-shot walls on this host drift
        # 2-4x with co-tenant steal invisible to the guest
        # (BENCH/BASELINE.md round-4 notes), and the second run removes
        # the one-time Python-worker spawn / first-touch cost a
        # 1000-executor deployment amortizes across hours.  Per ADVICE
        # r4 the SUITE TOTAL and queries dict stay single-shot (first
        # wall) so `value` keeps one methodology across every query and
        # round; both walls + the best are reported in dedicated fields
        # (image_pipeline_walls / image_pipeline_best), and the
        # images_per_sec north-star uses the best (steal-resistant) wall
        # with the single-shot twin alongside.
        w1 = timings["image_pipeline"]
        workdir2 = tempfile.mkdtemp(prefix="dedup_bench2_")
        try:
            timed(
                "image_pipeline",
                lambda: run_pipeline(spark, images, workdir2, CFG, resume=False),
            )
        finally:
            shutil.rmtree(workdir2, ignore_errors=True)
        pipeline_walls = [w1, timings["image_pipeline"]]
        timings["image_pipeline"] = w1
        n_dups = res.assignments.where("is_duplicate").count()
        # north-star gate at bench scale: planted-pair recall = fraction
        # of truth pairs whose endpoints share a cluster label
        from pyspark.sql import functions as F
        truth = spark.read.parquet(str(truth_path))
        lab = res.assignments.select("image_id", "cluster_id")
        hit = (
            truth.join(lab.withColumnRenamed("image_id", "a")
                       .withColumnRenamed("cluster_id", "_ca"), "a")
            .join(lab.withColumnRenamed("image_id", "b")
                  .withColumnRenamed("cluster_id", "_cb"), "b")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("_ca") == F.col("_cb")).cast("int")).alias("hits"),
            )
            .collect()[0]
        )
        recall = round(hit["hits"] / max(1, hit["n"]), 4)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # --- headline table queries from the driver contract ---
    if not skip_docs:
        qs = entrymod.queries()
        for name in (
            "exact_dedup_docs",
            "bigram_jaccard_pairs",
            "bigram_jaccard_ppjoin",
            "cc_bigram_clusters",
            "cosine_neighbor_stats",
            "minhash_pairs_docs",
            "simhash_hamming_pairs_docs",
            "srp_topk_embeddings",
            "ivf_topk_embeddings",
            "ivf_pq_topk_embeddings",
            # r6 additions (~4-5s combined at sf0.1): suite `value` is
            # not directly comparable to r5's — compare per-query or
            # the shared-subset sum
            "token_heavy_hitters_docs",
            "train_val_split_docs",
        ):
            timed(name, lambda name=name: qs[name](spark, sf_dir).count())

        # --- PPJoin in its WINNING regime (VERDICT r3 Next #2): the
        # driver docs fixture is a tiny-vocab corpus where the prefix
        # filter prunes nothing (bigram_jaccard_ppjoin above measures
        # that documented worst case); Zipfian token frequencies are
        # the regime the plan exists for, so both exact plans are
        # tracked on a Zipf fixture too — a regression in the prefix
        # filter's pruning now shows up as zipf_ppjoin ~ zipf_allpairs
        from deduplication_and_compression_spark.operators.textops import (
            bigram_jaccard_pairs, bigram_jaccard_pairs_allpairs,
        )
        # 30k docs at sf0.1: the measured crossover regime where the
        # prefix filter's pruning beats raw join throughput on this
        # host (18.6s vs 46.2s at first pinning; at ≤10k docs the JVM
        # hash join eats the dense-posting volume faster than ppjoin's
        # extra stages amortize — that small-corpus regime is exactly
        # what the auto-pick's discriminator exists for)
        n_zipf = max(1000, int(round(300_000 * sf)))
        zcache = Path(
            os.environ.get("SPARK_GRAFT_BENCH_CACHE", str(REPO / ".bench_cache"))
        ) / f"zipf_{n_zipf}_seed11"
        z_path, _zt = write_zipf_docs(zcache, n_zipf, seed=11)
        zdocs = spark.read.parquet(str(z_path)).repartition(max(cpus, 8)).cache()
        zdocs.count()  # materialize outside the timed region
        timed("zipf_bigram_ppjoin",
              lambda: bigram_jaccard_pairs(zdocs).count())
        timed("zipf_bigram_allpairs",
              lambda: bigram_jaccard_pairs_allpairs(zdocs).count())
        # record the auto-pick per regime: the driver-fixture pick was
        # made inside the bigram_jaccard_pairs timed query (auto path);
        # the Zipf corpus gets the same cost stats + discriminator call
        # (untimed — observability, not a benchmarked query)
        from deduplication_and_compression_spark.operators import textops as TX
        from deduplication_and_compression_spark.persistence import scoped_persist
        plan_picks = {"driver_docs": (TX.LAST_PLAN_PICK or {}).get("plan")}
        with persist_scope():
            zbg = scoped_persist(TX.word_bigrams(zdocs))
            plan_picks["zipf_docs"] = TX.choose_jaccard_plan(
                *TX.jaccard_plan_stats(zbg))
        zdocs.unpersist()

        # srp_topk re-pin (VERDICT r3 Next #7): its r3 sweep number
        # (22.6s) vs README's light-load spot run (11.8s) straddled
        # this host's documented 2-4x shuffle variance, so the suite
        # records a best-of-3 (the timed run above + two repeats, NOT
        # added to the suite total) so drift and regression separate
        srp_walls = [timings["srp_topk_embeddings"]]
        for _ in range(2):
            # the contract row memoizes its materialized result (r6);
            # evict it or the repeat legs time a cache read (~0.1s),
            # not the query
            entrymod.evict_query_memo("srp_topk")
            t0 = time.perf_counter()
            with persist_scope():
                qs["srp_topk_embeddings"](spark, sf_dir).count()
            srp_walls.append(round(time.perf_counter() - t0, 3))

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "dedup_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_images": n_images,
        # north-star throughput from the best (steal-resistant) wall;
        # the single-shot twin is alongside for methodology continuity
        "images_per_sec": round(n_images / min(pipeline_walls), 1),
        "images_per_sec_single": round(n_images / pipeline_walls[0], 1),
        "duplicates_found": n_dups,
        "dup_pair_recall": recall,
        "cpus": cpus,
    }
    payload["image_pipeline_walls"] = pipeline_walls
    payload["image_pipeline_best"] = min(pipeline_walls)
    if not skip_docs:
        payload["srp_topk_walls"] = srp_walls
        payload["srp_topk_best3"] = min(srp_walls)
        # which exact-Jaccard plan the cost-based pick chose per corpus
        # regime (VERDICT r4 Next #1 done-criterion: the auto must pick
        # the measured-faster plan on BOTH fixtures — allpairs on the
        # tiny-vocab driver docs, ppjoin on the Zipf corpus)
        payload["jaccard_plan_picks"] = plan_picks
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
