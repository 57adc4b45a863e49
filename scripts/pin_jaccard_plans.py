#!/usr/bin/env python
"""Best-of-3 INTERLEAVED pin of the two exact-Jaccard plans on the
sf0.1 driver docs fixture (VERDICT r4 Next #1): the r4 persist fix cut
forced-PPJoin from 68.9s to 31.8s, so the tiny-vocab rule in
choose_jaccard_plan is calibrated against obsolete data.  Interleaving
(pp, ap, pp, ap, ...) makes host-steal drift hit both plans equally.

Prints one JSON line with all walls + the fixture's cost stats
(v = distinct bigrams, d = approx distinct docs, sumsq = est join rows).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from deduplication_and_compression_spark.operators.textops import (
    bigram_jaccard_pairs, bigram_jaccard_pairs_allpairs, jaccard_plan_stats,
    word_bigrams,
)
from deduplication_and_compression_spark.persistence import (
    persist_scope, scoped_persist,
)
from deduplication_and_compression_spark.session import build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="pin-jaccard", cores=cpus,
                          shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(max(cpus, 8)).cache()
    n_docs = docs.count()  # materialize outside timed regions

    # cost stats the discriminator would see on this fixture — the
    # same shared helper the auto-pick and bench.py use
    with persist_scope():
        v, d, sumsq = jaccard_plan_stats(scoped_persist(word_bigrams(docs)))

    def timed(fn):
        t0 = time.perf_counter()
        with persist_scope():
            n = fn()
        return round(time.perf_counter() - t0, 3), n

    walls = {"ppjoin": [], "allpairs": []}
    rows = {}
    for _ in range(3):
        w, rows["ppjoin"] = timed(lambda: bigram_jaccard_pairs(docs).count())
        walls["ppjoin"].append(w)
        w, rows["allpairs"] = timed(
            lambda: bigram_jaccard_pairs_allpairs(docs).count())
        walls["allpairs"].append(w)

    print(json.dumps({
        "sf_dir": sf_dir, "cpus": cpus, "n_docs": n_docs,
        "v": v, "d": d, "sumsq": sumsq, "rows": rows,
        "walls": walls,
        "best": {k: min(w) for k, w in walls.items()},
        "load1": os.getloadavg()[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
