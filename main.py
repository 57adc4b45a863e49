#!/usr/bin/env python
"""spark-submit entrypoint.

    spark-submit --py-files pkg.zip main.py \
        --input <images table/path> --output <dir> \
        [--tiers exact,minhash,simhash,substring] [--no-resume]
    # text corpora (any read_documents format):
    ... --mode docs --format json [--rep-policy quality] [--emit-split 0.9]

Replaces the reference's CLI (-b blocksize -f filename,
/root/reference/Server/encoder.cpp:492-511) with the batch analog:
read the input table, run the tiered dedup pipeline, write
assignments/savings/metrics checkpoint tables under --output, print
the one-line accounting report (the App/Host.cpp:500-507 analog).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="PySpark dedup/clustering pipeline")
    p.add_argument("--input", required=True, help="input table: parquet path or catalog.db.table")
    p.add_argument("--output", required=True, help="checkpoint/output directory")
    p.add_argument("--mode", choices=("images", "docs"), default="images",
                   help="images: tiered image pipeline; docs: text-corpus "
                        "near-dup dedup over any read_documents format")
    p.add_argument("--tiers", default="exact,minhash,simhash,substring")
    p.add_argument("--format", default="parquet",
                   help="docs mode input format: parquet|orc|json|csv|text")
    def _frac(v: str) -> float:
        f = float(v)
        if not 0.0 < f < 1.0:
            raise argparse.ArgumentTypeError(
                f"train fraction must be in (0,1), got {v}")
        return f

    p.add_argument("--emit-split", type=_frac, default=None, dest="emit_split",
                   metavar="FRAC",
                   help="docs mode: also write a leakage-safe train/val "
                        "split table (train fraction FRAC; every member "
                        "of a near-dup cluster shares a split)")
    p.add_argument("--rep-policy", choices=("first", "quality"),
                   default="first", dest="rep_policy",
                   help="docs mode: cluster representative election — "
                        "'first' keeps the min doc_id, 'quality' keeps "
                        "the highest-quality member (min id on ties)")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (omit on a cluster)")
    return p.parse_args(argv)


def run_docs_mode(spark, args) -> dict:
    """Document-corpus dedup: read_documents (any format) → the full
    tiered pair union (exact/minhash/simhash/substring, --tiers
    selectable, priority election) → connected components →
    assignments + character-savings accounting, written under
    --output.  The text analog of the image pipeline's report — a
    captions-only corpus gets the same detector chain the image table
    gets (reference: /root/reference/Test/Testbench.cpp:81-123)."""
    from pyspark.sql import functions as F

    from deduplication_and_compression_spark.config import DEFAULT_CONFIG
    from deduplication_and_compression_spark.operators.assign import (
        assignments_from_labels,
    )
    from deduplication_and_compression_spark.operators.components import (
        connected_components,
    )
    from deduplication_and_compression_spark.persistence import (
        persist_scope, scoped_persist,
    )
    from deduplication_and_compression_spark.plans.docs import docs_tier_pairs
    from deduplication_and_compression_spark.sources.tables import (
        normalize_parallelism, read_documents,
    )

    out = Path(args.output)
    with persist_scope():
        # scoped: released on scope exit even if the write/collect
        # throws (a bare persist + manual unpersist leaked on error)
        docs = scoped_persist(normalize_parallelism(
            read_documents(spark, args.input, fmt=args.format)
        ))
        # materialize the cache and capture the count once: every tier
        # scans the corpus, and the SimHash tier's size-adaptive keying
        # needs the row count without an action of its own
        n_docs = docs.count()
        pairs = docs_tier_pairs(
            docs, DEFAULT_CONFIG, tiers=tuple(args.tiers.split(",")),
            n_docs=n_docs,
        ).select("a", "b")
        labels = connected_components(pairs, DEFAULT_CONFIG)
        asg = assignments_from_labels(docs, labels, id_col="doc_id")
        if args.rep_policy == "quality":
            from deduplication_and_compression_spark.operators.assign import (
                elect_representatives,
            )
            from deduplication_and_compression_spark.operators.textops import (
                quality_scores,
            )

            scores = quality_scores(docs).select("doc_id", "quality_bp")
            asg = elect_representatives(
                asg, scores, id_col="doc_id", score_col="quality_bp"
            ).withColumnRenamed("rep_id", "representative_id")
        asg.write.mode("overwrite").parquet(str(out / "assignments"))
        asg = spark.read.parquet(str(out / "assignments"))
        split_counts = None
        if args.emit_split is not None:
            from deduplication_and_compression_spark.operators.assign import (
                leakage_safe_split,
            )

            split = leakage_safe_split(
                asg, frac_train=args.emit_split, id_col="doc_id"
            )
            split.write.mode("overwrite").parquet(str(out / "split"))
            split_counts = {
                r["split"]: r["n"]
                for r in spark.read.parquet(str(out / "split"))
                .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
            }
        stats = (
            asg.join(docs.select("doc_id", "n_chars"), "doc_id")
            .agg(
                F.count(F.lit(1)).alias("rows_total"),
                F.sum((~F.col("is_duplicate")).cast("int")).alias("rows_unique"),
                F.sum("n_chars").alias("chars_total"),
                F.sum(F.when(F.col("is_duplicate"), F.col("n_chars"))
                      .otherwise(F.lit(0))).alias("chars_dupes"),
            )
            .collect()[0]
        )
    # sums are NULL on an empty corpus — report zeros, not a TypeError
    chars_total = int(stats["chars_total"] or 0)
    chars_saved = int(stats["chars_dupes"] or 0)
    report = {
        "rows_total": stats["rows_total"],
        "rows_unique": int(stats["rows_unique"] or 0),
        "chars_total": chars_total,
        "chars_saved": chars_saved,
        "dedup_pct": round(100.0 * chars_saved / max(1, chars_total), 3),
    }
    if split_counts is not None:
        report["split_train"] = int(split_counts.get("train", 0))
        report["split_val"] = int(split_counts.get("val", 0))
    return report


def main(argv=None) -> None:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from deduplication_and_compression_spark.config import DEFAULT_CONFIG
    from deduplication_and_compression_spark.plans.pipeline import run_pipeline
    from deduplication_and_compression_spark.session import build_session
    from deduplication_and_compression_spark.sources.tables import read_table

    active = SparkSession.getActiveSession()
    spark = active or build_session(app_name="dedup-pipeline", cores=args.cores)
    if args.mode == "docs":
        # loud rejection beats a silent no-op: docs mode has no
        # checkpoint stages, so a user passing --no-resume would
        # believe resume existed to disable
        if args.no_resume:
            raise ValueError("--no-resume applies to --mode images only "
                             "(docs mode always recomputes and overwrites)")
        t0 = time.perf_counter()
        report = run_docs_mode(spark, args)
        report["wall_sec"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(report))
        return
    # loud rejections (the --no-resume precedent, inverted): these
    # stages run over the document contract only
    if args.emit_split is not None:
        raise ValueError("--emit-split applies to --mode docs only")
    if args.rep_policy != "first":
        raise ValueError("--rep-policy applies to --mode docs only")
    images = read_table(spark, args.input)
    t0 = time.perf_counter()
    res = run_pipeline(
        spark,
        images,
        args.output,
        DEFAULT_CONFIG,
        tiers=tuple(args.tiers.split(",")),
        resume=not args.no_resume,
    )
    ratio = res.ratio.collect()[0].asDict()
    wall = time.perf_counter() - t0
    report = {
        "rows_total": ratio["rows_total"],
        "rows_unique": ratio["rows_unique"],
        "bytes_total": ratio["bytes_total"],
        "bytes_after_dedup": ratio["bytes_after_dedup"],
        "compression_pct": round(ratio["compression_pct"], 3),
        "wall_sec": round(wall, 1),
        "images_per_sec": round(ratio["rows_total"] / wall, 1),
        "config_fingerprint": DEFAULT_CONFIG.fingerprint(),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
