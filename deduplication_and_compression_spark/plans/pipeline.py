"""Pipeline orchestration: signature → candidates → pairs → components
→ assignments → savings, with per-stage checkpoint tables and resume.

The reference's pipeline is compile-time-fixed thread topology
(/root/reference/App/Host.cpp:254-340 spawning core_1/core_2); its only
resumability is "re-run the whole stream".  Here every stage writes an
idempotent checkpoint table (Iceberg when a catalog is configured;
parquet fallback in this sandbox, see sources/tables.py) tagged with
the config fingerprint, so any stage can resume mid-run
(BASELINE.json north_rule) and a finished stage is never recomputed.

Metrics mirror the reference's per-stage stopwatch report
(/root/reference/App/Host.cpp:500-543): per-stage wall_ms, rows_out,
plus per-partition row counts (lineage) for the key stages.  Since r7
the four tier stages run CONCURRENTLY (see run_pipeline), so a tier
stage's wall_ms includes cross-tier contention — compare tier walls
only against other concurrent runs, or use the pipeline wall; the
post-union stages (cc_labels onward) remain sequential and their
walls attribute cleanly.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import DedupConfig, DEFAULT_CONFIG
from ..operators.assign import (
    assignments_from_labels, dedup_ratio, payload_bytes, savings,
)
from ..operators.components import connected_components
from ..operators.exact import exact_pairs
from ..operators.minhash_lsh import minhash_pairs, minhash_signatures
from ..operators.pairs import union_pairs
from ..operators.simhash import phash_hamming_pairs
from ..operators.substring import substring_pairs, winnow_keys
from ..persistence import persist_scope

ALL_TIERS = ("exact", "minhash", "simhash", "substring")

# Bumped whenever any stage's OUTPUT SCHEMA changes (e.g. r3 added the
# bands column to minhash signatures): a checkpoint written under an
# older token is not resumed from, even if the config fingerprint
# matches — resuming across a schema change would fail deep inside a
# downstream operator instead of here (ADVICE r3).  Belt-and-braces,
# the stored schema JSON is compared too.
CHECKPOINT_SCHEMA_VERSION = 2


def _parquet_rows(data_dir: Path) -> int:
    """Row count from the written files' parquet footers — the footers
    already hold num_rows per file, so no job and no table scan (the
    post-write ``out.count()`` used through r3 re-read every stage
    output once per run; at 100 TB that is a full scan per stage,
    VERDICT r3 "what's wrong" #4)."""
    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows for f in sorted(data_dir.glob("*.parquet"))
    )


@dataclass
class PipelineResult:
    assignments: DataFrame
    savings: DataFrame
    ratio: DataFrame
    pairs: DataFrame
    metrics: list[dict]


class _Checkpointer:
    def __init__(self, spark: SparkSession, out_dir: str | Path,
                 cfg: DedupConfig, resume: bool):
        self.spark = spark
        self.out = Path(out_dir)
        self.cfg_fp = cfg.fingerprint()
        self.resume = resume
        self.metrics: list[dict] = []

    def _meta_path(self, stage: str) -> Path:
        return self.out / f"chk_{stage}" / "_dedup_meta.json"

    def _data_path(self, stage: str) -> Path:
        return self.out / f"chk_{stage}" / "data"

    def stage(self, name: str, fn: Callable[[], DataFrame],
              lineage: bool = False) -> DataFrame:
        """Run-or-resume one stage; always returns the checkpointed
        (re-read) DataFrame so downstream lineage starts at the table."""
        meta_p, data_p = self._meta_path(name), self._data_path(name)
        if self.resume and meta_p.exists():
            meta = json.loads(meta_p.read_text())
            if (
                meta.get("config_fp") == self.cfg_fp
                and meta.get("complete")
                and meta.get("schema_version") == CHECKPOINT_SCHEMA_VERSION
            ):
                out = self.spark.read.parquet(str(data_p))
                if meta.get("schema") in (None, out.schema.json()):
                    self.metrics.append(
                        {"stage": name, "partition_id": -1,
                         "rows_out": meta["rows_out"], "wall_ms": 0.0,
                         "resumed": True}
                    )
                    return out
                # schema drift with a matching version token: fall
                # through and recompute rather than hand downstream a
                # frame that no longer matches the operator contract
        t0 = time.perf_counter()
        # operator-internal persists (signatures, key tables, candidate
        # sets) are released as soon as the checkpoint write — the
        # consuming action — completes; the stage output is re-read
        # from the checkpoint table, so nothing downstream depends on
        # the released cache blocks (VERDICT r2 "what's wrong" #4)
        with persist_scope():
            df = fn()
            df.write.mode("overwrite").parquet(str(data_p))
        out = self.spark.read.parquet(str(data_p))
        rows = _parquet_rows(data_p)
        wall_ms = (time.perf_counter() - t0) * 1000
        self.metrics.append(
            {"stage": name, "partition_id": -1, "rows_out": rows,
             "wall_ms": wall_ms, "resumed": False}
        )
        if lineage:
            for r in (
                out.groupBy(F.spark_partition_id().alias("pid"))
                .count().collect()
            ):
                self.metrics.append(
                    {"stage": name, "partition_id": int(r["pid"]),
                     "rows_out": int(r["count"]), "wall_ms": 0.0,
                     "resumed": False}
                )
        meta_p.parent.mkdir(parents=True, exist_ok=True)
        meta_p.write_text(json.dumps(
            {"config_fp": self.cfg_fp, "rows_out": rows, "complete": True,
             "schema_version": CHECKPOINT_SCHEMA_VERSION,
             "schema": out.schema.json()}
        ))
        return out

    def write_metrics(self) -> None:
        p = self.out / "metrics"
        import pandas as pd
        pdf = pd.DataFrame(self.metrics)
        pdf["extra"] = ""
        self.spark.createDataFrame(pdf).write.mode("append").parquet(str(p))


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    out_dir: str | Path,
    cfg: DedupConfig = DEFAULT_CONFIG,
    tiers: tuple[str, ...] = ALL_TIERS,
    resume: bool = True,
) -> PipelineResult:
    unknown = set(tiers) - set(ALL_TIERS)
    if unknown:
        raise ValueError(f"unknown tiers {sorted(unknown)}; valid: {ALL_TIERS}")
    ck = _Checkpointer(spark, out_dir, cfg, resume)

    # Normalize input parallelism and cache: every tier scans the images
    # table, and a single-file parquet input would otherwise cap the
    # whole pipeline at a handful of input splits.
    from ..sources.tables import normalize_parallelism

    images = normalize_parallelism(images).persist()
    # materialize the cache AND capture the row count once: the phash
    # tier's auto keying scheme needs it, and counting here means no
    # tier ever runs a plan-build-time df.count() of its own
    n_images = images.count()

    # The four tiers are INDEPENDENT jobs over the same cached input, so
    # they run from a small driver thread pool (guide §2.6): each tier's
    # tail of straggler tasks is back-filled by the next tier's work
    # instead of leaving most cores idle, and the one-time JVM/codegen/
    # Python-worker warm-up of one tier overlaps another tier's compute
    # (measured: warm tier-stage sum ~14.9 s sequential vs ~max-chain
    # wall overlapped; cold first-run wins are larger because every
    # tier's JIT warm-up was serialized).  Correctness is unaffected:
    # each stage writes its own checkpoint table, persist scopes are
    # per-thread (persistence.py), and FIFO scheduling keeps the
    # earlier-submitted tier's tasks first in line.
    def _tier_exact() -> DataFrame:
        return ck.stage("pairs_exact", lambda: exact_pairs(images))

    def _tier_minhash() -> DataFrame:
        # signatures are their own checkpoint: the expensive Arrow UDF
        # runs exactly once, and a resumed run skips it entirely
        sigs = ck.stage("sig_minhash", lambda: minhash_signatures(images, cfg))
        return ck.stage(
            "pairs_minhash",
            lambda: minhash_pairs(images, cfg, sigs=sigs).select("a", "b"),
        )

    def _tier_simhash() -> DataFrame:
        return ck.stage(
            "pairs_simhash",
            lambda: phash_hamming_pairs(
                images, cfg, n_rows=n_images
            ).select("a", "b"),
        )

    def _tier_substring() -> DataFrame:
        wkeys = ck.stage("winnow_keys", lambda: winnow_keys(images, cfg))
        return ck.stage(
            "pairs_substring",
            lambda: substring_pairs(images, cfg, keys=wkeys).select("a", "b"),
        )

    tier_fns = {
        "exact": _tier_exact,
        "minhash": _tier_minhash,
        "simhash": _tier_simhash,
        "substring": _tier_substring,
    }
    active = [t for t in ALL_TIERS if t in tiers]
    tier_dfs: dict[str, DataFrame] = {}
    if len(active) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from pyspark import inheritable_thread_target

        # submit the longest chain (minhash: two chained stages) first
        # so FIFO gives it executors first — it is the critical path
        order = sorted(active, key=lambda t: t != "minhash")
        with ThreadPoolExecutor(max_workers=len(order)) as pool:
            futs = {
                t: pool.submit(inheritable_thread_target(tier_fns[t]))
                for t in order
            }
            tier_dfs = {t: futs[t].result() for t in active}
    elif active:
        tier_dfs = {active[0]: tier_fns[active[0]]()}

    pairs = ck.stage("pairs_union", lambda: union_pairs(**tier_dfs), lineage=True)
    labels = ck.stage(
        "cc_labels", lambda: connected_components(pairs, cfg), lineage=True
    )
    asg = ck.stage(
        "assignments", lambda: assignments_from_labels(images, labels), lineage=True
    )
    pay = payload_bytes(images)
    sav = ck.stage("savings", lambda: savings(asg, pay))
    ratio = dedup_ratio(asg, pay)
    ck.write_metrics()
    images.unpersist()
    return PipelineResult(asg, sav, ratio, pairs, ck.metrics)
