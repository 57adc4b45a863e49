#!/usr/bin/env python
"""spark-submit entrypoint.

    spark-submit --py-files pkg.zip main.py \
        --input <images table/path> --output <dir> \
        [--tiers exact,minhash,simhash,substring] [--no-resume]

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
    p.add_argument("--input", required=True, help="images table: parquet path or catalog.db.table")
    p.add_argument("--output", required=True, help="checkpoint/output directory")
    p.add_argument("--tiers", default="exact,minhash,simhash,substring")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (omit on a cluster)")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    from pyspark.sql import SparkSession

    from deduplication_and_compression_spark.config import DEFAULT_CONFIG
    from deduplication_and_compression_spark.plans.pipeline import run_pipeline
    from deduplication_and_compression_spark.session import build_session
    from deduplication_and_compression_spark.sources.tables import read_table

    active = SparkSession.getActiveSession()
    spark = active or build_session(app_name="dedup-pipeline", cores=args.cores)
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
