"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship near-dup clustering over the
sf0.001 ``documents`` table.  ``queries()`` exposes each implemented
operator from SURVEY.md §2 / §7 over the driver-generated tables;
``oracle_sql()`` gives the DuckDB-runnable ANSI twin for EVERY query —
including the winnowed-substring tier (cluster-preserving star-within-
identical-texts + rep-level L-gram join), SRP top-k (seed-derived
hyperplanes embedded as SQL literals), the full MinHash/LSH tier
replayed in HUGEINT mod-2⁶⁴ SQL (signatures, banding, skew-aware pair
generation, estimate prefilter, Jaccard verify — the band keys are the
repo's public poly-fold + splitmix64 hash, so no Spark-internal
hashing remains anywhere in the contract), BOTH streaming-screen
dataflows (the stateless full-carry plan and the keys-only foreachBatch
plan), and since round 5 the IVF-flat ANN tier (unit-norm quantizer
centroids embedded as SQL literals) and the SemDeDup-style
embedding-space dedup (SRP pair predicate + recursive-CTE connected
components + assignment contract, end to end).

Column names and arithmetic order match between the Spark plans and
the SQL strings so the driver's order-insensitive value-hash agrees;
ratios are floored to basis points (jaccard_bp etc.) to dodge
round-half divergence between engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from deduplication_and_compression_spark.config import DEFAULT_CONFIG as CFG
from deduplication_and_compression_spark.operators import textops
from deduplication_and_compression_spark.operators.assign import (
    assignments_from_labels, elect_representatives, leakage_safe_split,
)
from deduplication_and_compression_spark.operators.components import (
    connected_components,
)
from deduplication_and_compression_spark.operators.minhash_lsh import minhash_pairs
from deduplication_and_compression_spark.operators.similarity import (
    brute_force_topk, cosine_neighbor_stats, embedding_cosine_pairs,
    srp_bucket_topk, srp_cosine_pairs,
)
from deduplication_and_compression_spark.operators.simhash import (
    phash_hamming_pairs, simhash_from_text,
)
from deduplication_and_compression_spark.operators.substring import substring_pairs
from deduplication_and_compression_spark.persistence import scoped_persist

_STOP_SQL = "('a','the','of','and','to','in','is')"
_TOKS = "string_split_regex(trim(text), '\\s+')"


# input parallelism normalization: the driver parquet files are
# single-split (sf0.1 documents scans as ONE partition), so without
# this every pre-shuffle stage (signature/SRP/IVF kernels, bigram
# explodes) ran on a single task regardless of cores (r5 finding:
# forced ppjoin 32s in-suite vs 11.7s with normalized input)
from deduplication_and_compression_spark.sources.tables import (  # noqa: E402
    normalize_parallelism,
)


# PLAN memo for the two input tables (r7): normalize_parallelism costs
# ~0.6-1.0 s of driver time per call (the .rdd partition probe runs
# physical planning), and every contract query rebuilt it — several
# queries more than once through the shared _cc_labels chain.  The
# memo holds the immutable DataFrame PLAN object only; nothing is
# persisted and no action runs here, so every query still computes
# from the parquet inputs (this is lazy-plan reuse, not result
# caching).  Keyed on the session object like _QUERY_MEMO below.
_TABLE_MEMO: dict = {}


def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark, sf_dir, name)
    if key not in _TABLE_MEMO:
        _TABLE_MEMO[key] = normalize_parallelism(
            spark.read.parquet(f"{sf_dir}/{name}.parquet")
        )
    return _TABLE_MEMO[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _table(spark, sf_dir, "embeddings")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MinHash/LSH near-dup clustering of sf0.001 documents →
    (doc_id, cluster_id, is_duplicate, representative_id)."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    pairs = minhash_pairs(docs, CFG, id_col="doc_id", text_col="text").select("a", "b")
    labels = connected_components(pairs, CFG)
    return assignments_from_labels(docs, labels, id_col="doc_id")


# ---------------------------------------------------------------- queries

def _q_exact_dedup(spark, sf):
    return textops.exact_dedup_docs(_docs(spark, sf))


def _q_token_counts(spark, sf):
    return textops.token_counts(_docs(spark, sf))


def _q_heavy_hitters(spark, sf):
    return textops.token_heavy_hitters(_docs(spark, sf), k=50)


def _q_pii_scrub(spark, sf):
    return textops.scrub_pii(_docs(spark, sf))


def _q_quality(spark, sf):
    return textops.quality_scores(_docs(spark, sf))


def _q_lang(spark, sf):
    return textops.lang_id(_docs(spark, sf))


def _q_fp(spark, sf):
    return textops.doc_fingerprints(_docs(spark, sf))


# Memoized, MATERIALIZED query results, per (session, sf_dir, name) —
# for contract rows whose operators scoped-persist intermediates: the
# driver calls queries() outside any persist_scope, where those
# persists would degrade to bare session-long caches (VERDICT r4
# "what's wrong" #2).  The builder runs inside its own scope and
# materializes there, so every intermediate is released on exit and
# the ONLY surviving cache is the (small) result table, whose bare
# persist is intentionally session-lifetime — exactly a materialized
# checkpoint table.  Keyed on the SESSION OBJECT (not id(spark): ids
# alias after GC, handing back a DataFrame bound to a stopped session
# — ADVICE r2); the strong reference is intentional.
_QUERY_MEMO: dict = {}


def _memo_query(spark, sf, name, builder):
    key = (spark, sf, name)
    if key not in _QUERY_MEMO:
        from deduplication_and_compression_spark.persistence import persist_scope

        with persist_scope():
            out = builder().persist()
            out.count()  # materialize while the intermediates are live
        _QUERY_MEMO[key] = out
    return _QUERY_MEMO[key]


def evict_query_memo(name: str | None = None) -> int:
    """Unpersist and drop memoized contract-row results (all rows, or
    those whose memo name contains ``name``).  For benchmarks that
    re-time a memoized query: without eviction a repeat leg reads the
    persisted result table in ~0.1s and records a cache hit, not a
    compute wall (observed r6: srp_topk walls [5.58, 0.12, 0.12])."""
    hit = [k for k in _QUERY_MEMO if name is None or name in k[2]]
    for k in hit:
        try:
            _QUERY_MEMO[k].unpersist()
        except Exception:
            pass  # session may already be stopped
        del _QUERY_MEMO[k]
    if name is None:
        # full eviction also drops the input-table PLAN memo, so a
        # regenerated fixture directory (new part-file listing) or a
        # stopped session is not pinned forever (r7 code review); the
        # table memo holds no cached data, only plan objects
        _TABLE_MEMO.clear()
    return len(hit)


# the verified bigram-Jaccard pair set feeds three queries (pairs, CC
# clusters, savings); a production pipeline computes it once, so the
# contract layer does too.  The pair table itself is tiny
# (threshold-surviving pairs only).
def _bigram_pairs(spark, sf):
    return _memo_query(
        spark, sf, "bigram_pairs",
        lambda: textops.bigram_jaccard_pairs_auto(_docs(spark, sf),
                                                  threshold_bp=5000),
    )


def _cc_labels(spark, sf):
    """Memoized connected-components labels over the verified bigram
    pair table: four contract rows (clusters, train/val split, quality
    reps, savings) consume the SAME labels, and the iterative CC pass
    previously re-ran once per row (r6 code review)."""
    return _memo_query(
        spark, sf, "cc_labels",
        lambda: connected_components(
            _bigram_pairs(spark, sf).select("a", "b"), CFG),
    )


def _q_bigram_jaccard(spark, sf):
    # cost-based plan pick (allpairs on this tiny-vocab corpus,
    # prefix-filtered PPJoin on Zipfian text) — both oracled against
    # the SAME SQL (identical semantics)
    return _bigram_pairs(spark, sf)


def _q_bigram_jaccard_ppjoin(spark, sf):
    return textops.bigram_jaccard_pairs(_docs(spark, sf), threshold_bp=5000)


def _q_lgram_substring(spark, sf):
    return textops.lgram_substring_pairs(_docs(spark, sf), L=24)


def _q_cc_clusters(spark, sf):
    labels = _cc_labels(spark, sf)
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def _q_train_val_split(spark, sf):
    """Leakage-safe train/val split over the document near-dup graph:
    CC labels from the verified bigram-Jaccard pairs, singletons their
    own cluster, split decided by md5(cluster_id) bucket — so near-dup
    documents always share a split (Lee et al. ACL'22 §6)."""
    docs = _docs(spark, sf)
    asg = assignments_from_labels(docs, _cc_labels(spark, sf),
                                  id_col="doc_id")
    return leakage_safe_split(asg, frac_train=0.9, id_col="doc_id")


def _q_quality_reps(spark, sf):
    """Quality-aware rep election over the bigram near-dup graph: each
    cluster keeps its highest-quality member (min-id on ties), the
    "keep the best duplicate" policy."""
    docs = _docs(spark, sf)
    asg = assignments_from_labels(docs, _cc_labels(spark, sf),
                                  id_col="doc_id")
    scores = textops.quality_scores(docs).select("doc_id", "quality_bp")
    return elect_representatives(asg, scores, id_col="doc_id",
                                 score_col="quality_bp")


def _q_cluster_savings(spark, sf):
    docs = _docs(spark, sf)
    asg = assignments_from_labels(docs, _cc_labels(spark, sf),
                                  id_col="doc_id")
    joined = asg.join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        joined.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("members"),
            F.sum("n_chars").alias("chars_total"),
            (
                F.sum("n_chars")
                - F.max(F.when(~F.col("is_duplicate"), F.col("n_chars")))
            ).cast("long").alias("chars_saved"),
        )
        .where(F.col("members") > 1)
    )


def _q_cosine_stats(spark, sf):
    return cosine_neighbor_stats(_embs(spark, sf), n_queries=20, threshold=0.3)


def _q_embedding_pairs(spark, sf):
    return embedding_cosine_pairs(_embs(spark, sf), threshold=0.3)


def _q_minhash_pairs_docs(spark, sf):
    # no global sort: the driver hashes order-insensitively, and a
    # total order on pair output is dead weight at scale
    return minhash_pairs(
        _docs(spark, sf), CFG, id_col="doc_id", text_col="text"
    ).select("a", "b")


def _q_simhash_docs(spark, sf):
    return simhash_from_text(_docs(spark, sf))


def _q_simhash_pairs_docs(spark, sf):
    # doc-level near-dup pairs over the SimHash kernel: the image
    # tier's pigeonhole keying + value collapse reused verbatim on a
    # (doc_id, simhash) table; scheme pinned so plan-build stays
    # action-free at any scale.  The simhash UDF output feeds the
    # keying explode AND both verify joins — persist it or the UDF
    # recomputes per branch (released by the caller's persist scope)
    sims = scoped_persist(simhash_from_text(_docs(spark, sf)))
    return phash_hamming_pairs(
        sims, CFG, id_col="id", hash_col="simhash", scheme="chunk4"
    ).select("a", "b", "hamming")


def _q_winnow_pairs_docs(spark, sf):
    return substring_pairs(
        _docs(spark, sf), CFG, id_col="doc_id", text_col="text"
    ).select("a", "b")


def _q_screen_near_dups(spark, sf):
    """Batch rehearsal of the STREAMING near-dup screen
    (streaming/ingest.py:streaming_near_dup_screen): the documents
    table screened against itself as the static reference.  Runs the
    exact plan every micro-batch runs (signature → band explode →
    stream-static band join → estimate prefilter → Arrow-batched
    exact-Jaccard verify), so the driver's oracle now gates the
    screen's dataflow, not just the batch tiers.  Per-band duplicate
    edges collapsed as run_screen_once does; jaccard floored to bp
    for engine-stable value hashing."""
    from deduplication_and_compression_spark.streaming.ingest import (
        streaming_near_dup_screen,
    )

    from deduplication_and_compression_spark.streaming.ingest import (
        build_screen_reference,
    )

    def build():
        docs = _docs(spark, sf)
        ref_side = build_screen_reference(docs, CFG, id_col="doc_id",
                                          text_col="text")
        # materialize the static side before the two consuming branches
        # so the reference signature UDF runs once (released with the
        # memo scope; only the small edge table survives)
        scoped_persist(ref_side.base).count()
        edges = streaming_near_dup_screen(
            docs, cfg=CFG, id_col="doc_id", text_col="text", ref_side=ref_side
        )
        return edges.dropDuplicates(["id", "ref_id"]).select(
            "id", "ref_id",
            F.floor(F.col("jaccard") * 10000.0).cast("long").alias("jaccard_bp"),
        )

    return _memo_query(spark, sf, "screen_near_dups", build)


def _q_screen_batch_near_dups(spark, sf):
    """The KEYS-ONLY foreachBatch screen plan (streaming/ingest.py:
    screen_batch_edges — the exact dataflow run_screen_once executes
    per micro-batch since r5: keys-only band explode, exact (id,
    ref_id) dedupe BEFORE the verify, caption+signature re-attached by
    id).  Same semantics as the stateless variant above, so both rows
    share one oracle — the driver now gates both screen dataflows."""
    from deduplication_and_compression_spark.streaming.ingest import (
        build_screen_reference, screen_batch_edges,
    )

    def build():
        docs = _docs(spark, sf)
        ref_side = build_screen_reference(docs, CFG, id_col="doc_id",
                                          text_col="text")
        scoped_persist(ref_side.base).count()  # sig UDF once per ref row
        edges = screen_batch_edges(docs, ref_side, CFG, id_col="doc_id",
                                   text_col="text")
        return edges.select(
            "id", "ref_id",
            F.floor(F.col("jaccard") * 10000.0).cast("long").alias("jaccard_bp"),
        )

    return _memo_query(spark, sf, "screen_batch_near_dups", build)


_EMB_DIM = 64  # driver embeddings.parquet schema (fixed-width array<float>)
# FIXTURE-LOCAL SRP config: the fixture's true top-5 neighbors sit at
# cos ≈ 0.32 (θ ≈ 71°) on uniform-random vectors, so recall needs wide
# shallow tables — b=4, L=12, no probing gives measured recall@5 ≈ 0.82
# (gated ≥ 0.7 in tests/test_similarity.py).  This is NOT the operator
# default: srp_bucket_topk defaults to deep codes (b=16) with radius-1
# multi-probe, the sub-quadratic scale path (candidate bound in its
# docstring, clustered-fixture recall gate in tests/test_similarity.py).
_SRP_BITS, _SRP_TABLES, _SRP_K = 4, 12, 5


def _q_srp_topk(spark, sf):
    # Memoized (ADVICE r5): srp_bucket_topk scoped-persists the SRP
    # code table; under driver conditions (no ambient persist_scope)
    # that would degrade to a session-lifetime cache leaked once per
    # call.  _memo_query builds inside its own scope instead.
    def build():
        # dim passed explicitly: no driver .first() at plan-build time
        return srp_bucket_topk(
            _embs(spark, sf), n_bits=_SRP_BITS, k=_SRP_K, dim=_EMB_DIM,
            n_tables=_SRP_TABLES, probe_radius=0,
        ).select("query_id", "neighbor_id", "rank")

    return _memo_query(spark, sf, "srp_topk", build)


def _q_srp_cosine_pairs(spark, sf):
    # the bucketed scale-path twin of embedding_cosine_pairs: same
    # threshold + bp floor, candidates restricted to the SRP
    # d_H <= 1 multi-probe predicate (deterministic in the seed, so
    # the oracle replicates the approximation exactly; at the fixture
    # config the per-pair hit probability at cos 0.3 is ~0.9995).
    # Memoized for the same scoped-persist reason as _q_srp_topk.
    def build():
        return srp_cosine_pairs(
            _embs(spark, sf), threshold=0.3, n_bits=_SRP_BITS, dim=_EMB_DIM,
            n_tables=_SRP_TABLES, probe_radius=1,
        )

    return _memo_query(spark, sf, "srp_cosine_pairs", build)


def _q_brute_topk(spark, sf):
    emb = _embs(spark, sf)
    q = emb.where(F.col("vec_id") < 10)
    return brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id", "rank")


def _q_semantic_dedup(spark, sf):
    """SemDeDup tier: SRP cosine pairs (the srp_cosine_pairs_embeddings
    predicate, bit-for-bit) → connected components → min-id reps, over
    the full embeddings table.  Memoized: CC scoped-persists its
    per-round frontier and the pair tier its code tables."""
    from deduplication_and_compression_spark.operators.similarity import (
        semantic_dedup,
    )

    def build():
        return semantic_dedup(
            _embs(spark, sf), threshold=0.3, cfg=CFG, dim=_EMB_DIM,
            n_bits=_SRP_BITS, n_tables=_SRP_TABLES, probe_radius=1,
        )

    return _memo_query(spark, sf, "semantic_dedup", build)


# IVF coarse-quantizer config for the driver fixture: 32 cells over
# 2500 uniform-random vectors (~78/cell), 6 probes ≈ 19% of the corpus
# scanned per query.  Seed-derived centroids (ivf_centroids) so the
# DuckDB oracle embeds them as literals; fit_ivf_centroids is the
# data-adapted path, recall-gated in tests/test_similarity.py.
_IVF_CELLS, _IVF_PROBES = 32, 6


def _q_ivf_topk(spark, sf):
    # Memoized (ADVICE r5): ivf_topk scoped-persists the cell-assignment
    # table — same driver-conditions leak class as _q_srp_topk.
    from deduplication_and_compression_spark.operators.similarity import ivf_topk

    def build():
        return ivf_topk(
            _embs(spark, sf), n_cells=_IVF_CELLS, k=_SRP_K, dim=_EMB_DIM,
            n_probes=_IVF_PROBES,
        ).select("query_id", "neighbor_id", "rank")

    return _memo_query(spark, sf, "ivf_topk", build)


_IVF_FIT_SEED = 0x1CF_5EED
_IVF_FIT_SAMPLE = 65_536


def _q_ivf_topk_fitted(spark, sf):
    """The data-adapted IVF path as a contract row (VERDICT r5
    "what's missing" #3): fit_ivf_centroids is deterministic in
    (seed, sample), and the sample at contract scale is the whole
    corpus ordered by id, so the DuckDB oracle refits the SAME
    centroids from the same parquet via the shared numpy core
    (fit_ivf_kmeans) and embeds them as literals — the fitted path
    gets the full hash gate, not just the recall test."""
    from deduplication_and_compression_spark.operators.similarity import (
        fit_ivf_centroids, ivf_topk,
    )

    def build():
        emb = _embs(spark, sf)
        C = fit_ivf_centroids(
            emb, n_cells=_IVF_CELLS, seed=_IVF_FIT_SEED,
            sample_rows=_IVF_FIT_SAMPLE,
        )
        return ivf_topk(
            emb, k=_SRP_K, dim=_EMB_DIM, n_probes=_IVF_PROBES, centroids=C,
        ).select("query_id", "neighbor_id", "rank")

    return _memo_query(spark, sf, "ivf_topk_fitted", build)


# IVF-PQ contract config: seed-derived coarse cells (same quantizer as
# ivf_topk_embeddings), FITTED PQ codebooks (m_sub=8 subspaces of
# dim 8, 16 codewords each — 8 small ints replace 64 floats in the
# candidate shuffle), refine·k = _PQ_REFINE·_SRP_K = 40 shortlist,
# exact re-rank.
_PQ_M, _PQ_KSUB, _PQ_SEED, _PQ_REFINE = 8, 16, 0x90_5EED, 8


def _q_ivf_pq_topk(spark, sf):
    """IVF-PQ ANN: codes-instead-of-vectors candidate scoring (ADC
    lookup tables in a cogrouped applyInPandas), deterministic in
    (seed, pq_seed) so the DuckDB oracle replays cells, codes, ADC
    scores, shortlist and re-rank from literals."""
    from deduplication_and_compression_spark.operators.similarity import (
        ivf_pq_topk,
    )

    def build():
        return ivf_pq_topk(
            _embs(spark, sf), n_cells=_IVF_CELLS, k=_SRP_K, m_sub=_PQ_M,
            k_sub=_PQ_KSUB, pq_seed=_PQ_SEED, dim=_EMB_DIM,
            n_probes=_IVF_PROBES, refine=_PQ_REFINE,
        ).select("query_id", "neighbor_id", "rank")

    return _memo_query(spark, sf, "ivf_pq_topk", build)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "exact_dedup_docs": _q_exact_dedup,
        "token_counts_docs": _q_token_counts,
        "token_heavy_hitters_docs": _q_heavy_hitters,
        "pii_scrub_docs": _q_pii_scrub,
        "quality_scores_docs": _q_quality,
        "lang_id_docs": _q_lang,
        "doc_fingerprints": _q_fp,
        "bigram_jaccard_pairs": _q_bigram_jaccard,
        "bigram_jaccard_ppjoin": _q_bigram_jaccard_ppjoin,
        "lgram_substring_pairs": _q_lgram_substring,
        "cc_bigram_clusters": _q_cc_clusters,
        "train_val_split_docs": _q_train_val_split,
        "quality_rep_election_docs": _q_quality_reps,
        "cluster_savings_docs": _q_cluster_savings,
        "cosine_neighbor_stats": _q_cosine_stats,
        "brute_topk_embeddings": _q_brute_topk,
        "embedding_cosine_pairs": _q_embedding_pairs,
        "winnow_substring_pairs_docs": _q_winnow_pairs_docs,
        "screen_near_dups_docs": _q_screen_near_dups,
        "screen_batch_near_dups_docs": _q_screen_batch_near_dups,
        "srp_topk_embeddings": _q_srp_topk,
        "ivf_topk_embeddings": _q_ivf_topk,
        "ivf_topk_fitted_embeddings": _q_ivf_topk_fitted,
        "ivf_pq_topk_embeddings": _q_ivf_pq_topk,
        "semantic_dedup_embeddings": _q_semantic_dedup,
        "srp_cosine_pairs_embeddings": _q_srp_cosine_pairs,
        "simhash_docs": _q_simhash_docs,  # oracled via HUGEINT-mod-2^64 SQL
        "simhash_hamming_pairs_docs": _q_simhash_pairs_docs,
        # oracled since r3: band keys are the repo's public splitmix64
        # band hash, replayed (with the whole LSH tier) in HUGEINT SQL
        "minhash_pairs_docs": _q_minhash_pairs_docs,
    }


_BIGRAM_CTE = f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
),
bg AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS bigram FROM pos),
sz AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM bg x JOIN bg y ON x.bigram = y.bigram AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT a, b,
    CAST(floor(CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) * 10000.0) AS BIGINT) AS jaccard_bp
  FROM inter JOIN sz sa ON sa.doc_id = a JOIN sz sb ON sb.doc_id = b
),
pairs AS (SELECT a, b, jaccard_bp FROM jac WHERE jaccard_bp >= 5000)
"""

_CC_CTE = f"""
{_BIGRAM_CTE},
edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
nodes AS (SELECT DISTINCT u FROM edges),
reach(u, lbl) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT edges.v, reach.lbl FROM reach JOIN edges ON edges.u = reach.u
  WHERE reach.lbl < edges.v
),
lab AS (SELECT u AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY u)
"""


def _srp_oracle_sql(n_bits: int = _SRP_BITS, n_tables: int = _SRP_TABLES,
                    k: int = _SRP_K, dim: int = _EMB_DIM,
                    seed: int = 0xB17_5EED) -> str:
    """DuckDB twin of the multi-table srp_bucket_topk: the hyperplanes
    are seed-derived numpy constants, so they embed as double literals
    (Python repr is shortest-round-trip, so DuckDB parses the exact
    same doubles Spark folds into its plan).  Table index is mixed into
    the bucket id (tb = t*2^b + code) so one unnest covers all L
    tables — set-identical to Spark's join on (t, bucket)."""
    from deduplication_and_compression_spark.operators.similarity import srp_planes

    planes = srp_planes(n_tables, n_bits, dim, seed)

    def bucket_expr(t: int) -> str:
        bits = " + ".join(
            f"(CASE WHEN list_inner_product(v, [{', '.join(repr(float(x)) for x in planes[t, i])}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(n_bits)
        )
        return f"({bits} + {t * (1 << n_bits)})"

    tb_list = ", ".join(bucket_expr(t) for t in range(n_tables))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id, unnest([{tb_list}]) AS tb FROM e),
        cand AS (
          SELECT DISTINCT x.vec_id AS query_id, y.vec_id AS neighbor_id
          FROM c x JOIN c y ON x.tb = y.tb AND x.vec_id <> y.vec_id),
        s AS (
          SELECT query_id, neighbor_id,
                 list_inner_product(q.v, n.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(n.v, n.v))) AS cos
          FROM cand JOIN e q ON q.vec_id = query_id JOIN e n ON n.vec_id = neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}
    """


# --- simhash oracle: splitmix64 + polynomial token hash in ANSI-ish SQL ---
# DuckDB has no wrapping 64-bit ops, so everything runs in HUGEINT mod
# 2^64: xor via 32-bit halves (xor() is BIGINT-only), multiply via a
# 32-bit split so no intermediate exceeds 2^96, shifts as floor-div by
# powers of two.  The polynomial token hash avoids a sequential fold by
# the identity hash = len*B^L + Σ byte_i * B^(L-i), with B^j mod 2^64
# precomputed as literals.
_M64 = "18446744073709551616::HUGEINT"
_SM_GAMMA_I = 0x9E3779B97F4A7C15
_SM_M1_I = 0xBF58476D1CE4E5B9
_SM_M2_I = 0x94D049BB133111EB
_POLY_B_I = 0x100000001B3
_MAX_TOK_BYTES = 64  # POW table width; fixture tokens are <= 8 bytes


def _sql_xor64(a: str, b: str) -> str:
    return (
        f"(CAST(xor(CAST(({a}) // 4294967296 AS BIGINT), CAST(({b}) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296"
        f" + CAST(xor(CAST(({a}) % 4294967296 AS BIGINT), CAST(({b}) % 4294967296 AS BIGINT)) AS HUGEINT))"
    )


def _sql_mulmod64(x: str, c: int) -> str:
    return (
        f"(((({x}) % 4294967296) * {c}::HUGEINT"
        f" + ((({x}) // 4294967296) * {c}::HUGEINT % 4294967296) * 4294967296)"
        f" % {_M64})"
    )


def _sm_steps() -> list[str]:
    """The six splitmix64 finalizer stages over a HUGEINT column z,
    each an independent mod-2⁶⁴ expression (shifts as floor-div)."""
    return [
        f"((z + {_SM_GAMMA_I}::HUGEINT) % {_M64})",
        _sql_xor64("z", "z // 1073741824"),   # z ^= z >> 30
        _sql_mulmod64("z", _SM_M1_I),
        _sql_xor64("z", "z // 134217728"),    # z ^= z >> 27
        _sql_mulmod64("z", _SM_M2_I),
        _sql_xor64("z", "z // 2147483648"),   # z ^= z >> 31
    ]


def _sm_chain(prefix: str, src: str, carry: tuple[str, ...]) -> str:
    """CTE chain applying splitmix64 to column ``z`` of CTE ``src``,
    carrying ``carry`` columns through; the final CTE is {prefix}6.
    Chained CTEs (not one nested expression) keep each stage evaluated
    once per row — a fully inlined splitmix duplicates the input
    subtree ~256x."""
    cols = "".join(c + ", " for c in carry)
    out = []
    prev = src
    for i, expr in enumerate(_sm_steps(), start=1):
        out.append(f"{prefix}{i} AS (SELECT {cols}{expr} AS z FROM {prev})")
        prev = f"{prefix}{i}"
    return ",\n".join(out)


def _simhash_cte() -> str:
    """CTE body computing ``sim(id, simhash)`` — the DuckDB twin of
    simhash_from_text: tokenize on ASCII whitespace, length-prefixed
    polynomial hash per token, splitmix64 finalizer, majority vote per
    bit (2*ones > n_tokens), uint64→int64 reinterpret.  Mirrors
    functions/hashing.py:token_hashes_batch + simhash_batch.  Shared by
    the per-doc simhash oracle and the doc-pair Hamming oracle.

    Byte-semantics caveat: strlen() counts UTF-8 bytes while
    substr()/ord() index characters, and tokens longer than
    _MAX_TOK_BYTES would index past the POW list — both are guarded by
    test_entry_oracle.py::test_fixture_is_ascii_with_short_tokens,
    which pins the driver fixture to ASCII tokens ≤ 64 bytes."""
    pow_list = ", ".join(
        str(pow(_POLY_B_I, j, 1 << 64)) for j in range(_MAX_TOK_BYTES + 1)
    )
    pw2_list = ", ".join(str(1 << i) for i in range(64))
    step_ctes = _sm_chain("s", "s0", ("doc_id",))
    ws_class = "[ \t\n\x0b\x0c\r]+"
    return f"""
        pw AS (SELECT [{pow_list}]::HUGEINT[] AS p, [{pw2_list}]::HUGEINT[] AS p2),
        tk AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(text, '{ws_class}'), x -> x <> '')) AS tok
          FROM documents),
        s0 AS (
          SELECT doc_id,
                 (strlen(tok)::HUGEINT * p[strlen(tok) + 1]
                  + list_sum(list_transform(range(1, strlen(tok)::BIGINT + 1),
                                            i -> ord(substr(tok, CAST(i AS INT), 1))::HUGEINT * p[strlen(tok) - i + 1]))
                 ) % {_M64} AS z
          FROM tk CROSS JOIN pw),
        {step_ctes},
        bits AS (
          SELECT doc_id, i, sum((z // p2[i + 1]) % 2) AS ones, count(*) AS n
          FROM s6 CROSS JOIN pw CROSS JOIN (SELECT unnest(range(64)) AS i)
          GROUP BY 1, 2),
        u AS (
          SELECT b.doc_id,
                 sum(CASE WHEN 2 * b.ones > b.n THEN p2[b.i + 1] ELSE 0::HUGEINT END) AS uh
          FROM bits b CROSS JOIN pw
          GROUP BY 1),
        sim AS (
          SELECT d.doc_id AS id,
                 CAST(CASE WHEN coalesce(u.uh, 0::HUGEINT) >= 9223372036854775808::HUGEINT
                           THEN coalesce(u.uh, 0::HUGEINT) - {_M64}
                           ELSE coalesce(u.uh, 0::HUGEINT) END AS BIGINT) AS simhash
          FROM documents d LEFT JOIN u ON u.doc_id = d.doc_id)
    """


def _simhash_oracle_sql() -> str:
    return f"WITH {_simhash_cte()} SELECT id, simhash FROM sim"


def _simhash_pairs_oracle_sql(d: int = CFG.hamming_threshold) -> str:
    """DuckDB twin of the doc-level SimHash Hamming tier
    (phash_hamming_pairs over simhash_from_text output) — the
    cluster-preserving contract: identical-simhash groups collapse to
    their min-id rep (star edges at Hamming 0), and representatives
    pair when bit_count(xor) ≤ d (pigeonhole keying guarantees every
    such pair is a candidate).  DuckDB's BIGINT xor + bit_count equal
    the uint64-view popcount the Spark side computes."""
    return f"""
        WITH {_simhash_cte()},
        rep AS (
          SELECT id, simhash, min(id) OVER (PARTITION BY simhash) AS rep
          FROM sim),
        intra AS (
          SELECT rep AS a, id AS b, CAST(0 AS INT) AS hamming
          FROM rep WHERE id <> rep),
        reps AS (SELECT id, simhash FROM rep WHERE id = rep),
        cross_reps AS (
          SELECT x.id AS a, y.id AS b,
                 CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
          FROM reps x JOIN reps y ON x.id < y.id
          WHERE bit_count(xor(x.simhash, y.simhash)) <= {d})
        SELECT a, b, hamming FROM (
          SELECT * FROM intra UNION ALL SELECT * FROM cross_reps)
    """


def _srp_pairs_oracle_sql(n_bits: int = _SRP_BITS, n_tables: int = _SRP_TABLES,
                          probe_radius: int = 1, threshold: float = 0.3,
                          dim: int = _EMB_DIM, seed: int = 0xB17_5EED) -> str:
    """DuckDB twin of srp_cosine_pairs: per-table SRP codes from the
    same seed-derived literal hyperplanes, candidate pairs where ANY
    table's codes sit within ``probe_radius`` bit flips
    (bit_count(xor) ≤ r — the multi-probe predicate), then the exact
    cosine ≥ threshold filter and bp floor of embedding_cosine_pairs."""
    from deduplication_and_compression_spark.operators.similarity import srp_planes

    planes = srp_planes(n_tables, n_bits, dim, seed)

    def code_expr(t: int) -> str:
        return "(" + " + ".join(
            f"(CASE WHEN list_inner_product(v, [{', '.join(repr(float(x)) for x in planes[t, i])}]) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(n_bits)
        ) + ")"

    codes_list = ", ".join(code_expr(t) for t in range(n_tables))
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        c AS (SELECT vec_id, [{codes_list}] AS codes FROM e),
        ct AS (
          SELECT vec_id, t.i AS t, codes[t.i + 1] AS code
          FROM c, (SELECT unnest(range({n_tables})) AS i) t(i)),
        cand AS (
          SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
          FROM ct x JOIN ct y ON x.t = y.t AND x.vec_id < y.vec_id
          WHERE bit_count(xor(x.code::BIGINT, y.code::BIGINT)) <= {probe_radius}),
        s AS (
          SELECT cand.a, cand.b,
                 list_inner_product(p.v, q.v)
                   / (sqrt(list_inner_product(p.v, p.v)) * sqrt(list_inner_product(q.v, q.v))) AS cos
          FROM cand JOIN e p ON p.vec_id = cand.a JOIN e q ON q.vec_id = cand.b)
        SELECT a, b, CAST(floor(cos * 10000.0) AS BIGINT) AS cos_bp
        FROM s WHERE cos >= {threshold!r}
    """


def _fitted_ivf_centroids(sf_dir: str = "/root/testdata/sf0.01"):
    """Refit the data-adapted quantizer WITHOUT Spark for the oracle:
    pyarrow reads the same parquet the query reads, the sample is the
    whole corpus ordered by vec_id (the contract pins
    corpus ≤ 2·sample_rows, where fit_ivf_centroids applies no hash
    filter), and the shared numpy core reproduces the Spark-side
    centroids bit-for-bit.  sf_dir defaults to the driver's
    correctness scale — the only scale oracle_sql() strings run at."""
    import numpy as np
    import pyarrow.parquet as pq

    from deduplication_and_compression_spark.operators.similarity import (
        fit_ivf_kmeans,
    )

    pdf = (
        pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id")
    )
    if len(pdf) > 2 * _IVF_FIT_SAMPLE:
        raise ValueError(
            f"fitted-IVF oracle pins corpus <= {2 * _IVF_FIT_SAMPLE} rows"
            " (beyond that fit_ivf_centroids hash-filters the sample,"
            " which this pyarrow twin does not replicate)"
        )
    X = np.stack(pdf.head(_IVF_FIT_SAMPLE)["embedding"].to_numpy())
    return fit_ivf_kmeans(X, _IVF_CELLS, _IVF_FIT_SEED)


def _ivf_oracle_sql(n_cells: int = _IVF_CELLS, n_probes: int = _IVF_PROBES,
                    k: int = _SRP_K, dim: int = _EMB_DIM,
                    seed: int = 0x1CF_5EED, C=None) -> str:
    """DuckDB twin of ivf_topk: the unit-norm centroids embed as
    double literals (repr round-trips exactly); cell assignment =
    argmax centroid dot with ties to the LOWER cell index (ORDER BY
    dot DESC, cell ASC — matching numpy's first-max argmax / stable
    argsort), probes = top-n_probes cells, then the shared
    exact-cosine re-rank.  ``C`` overrides the seed-derived quantizer
    with explicit centroids (the fitted path)."""
    from deduplication_and_compression_spark.operators.similarity import (
        ivf_centroids,
    )

    if C is None:
        C = ivf_centroids(n_cells, dim, seed)
    n_cells = C.shape[0]
    dots = ", ".join(
        f"list_inner_product(v, [{', '.join(repr(float(x)) for x in C[j])}])"
        for j in range(n_cells)
    )
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        d AS (SELECT vec_id, [{dots}] AS dots FROM e),
        dt AS (
          SELECT vec_id, t.i AS cell, dots[t.i + 1] AS dot
          FROM d, (SELECT unnest(range({n_cells})) AS i) t(i)),
        rk AS (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dot DESC, cell ASC) AS rn
          FROM dt),
        cells AS (SELECT vec_id, cell FROM rk WHERE rn = 1),
        probes AS (SELECT vec_id, cell FROM rk WHERE rn <= {n_probes}),
        cand AS (
          SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id
          FROM probes x JOIN cells y
            ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        s AS (
          SELECT query_id, neighbor_id,
                 list_inner_product(q.v, n.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(n.v, n.v))) AS cos
          FROM cand JOIN e q ON q.vec_id = query_id JOIN e n ON n.vec_id = neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}
    """


def _fitted_pq_codebooks(sf_dir: str = "/root/testdata/sf0.01"):
    """Refit the PQ codebooks WITHOUT Spark for the oracle — the
    pyarrow twin of fit_pq_codebooks on the same bounded sample (see
    _fitted_ivf_centroids for the sample-parity contract)."""
    import numpy as np
    import pyarrow.parquet as pq

    from deduplication_and_compression_spark.operators.similarity import (
        fit_pq_kmeans,
    )

    pdf = (
        pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
        .to_pandas().sort_values("vec_id")
    )
    if len(pdf) > 2 * _IVF_FIT_SAMPLE:
        raise ValueError(
            "fitted-PQ oracle pins corpus <= 2*sample_rows"
            " (the pyarrow twin does not replicate the hash filter)"
        )
    X = np.stack(pdf.head(_IVF_FIT_SAMPLE)["embedding"].to_numpy())
    return fit_pq_kmeans(X, _PQ_M, _PQ_KSUB, _PQ_SEED)


def _ivf_pq_oracle_sql(n_probes: int = _IVF_PROBES, k: int = _SRP_K,
                       dim: int = _EMB_DIM, seed: int = 0x1CF_5EED) -> str:
    """DuckDB twin of ivf_pq_topk: seed-derived coarse cells (reusing
    the ivf_topk literal recipe), PQ code assignment per subspace
    (first-max argmax over the 16 codeword scores — list_position of
    the list max picks the LOWER code on ties, matching numpy), ADC
    scoring as an explicit per-subspace chain (the same left-to-right
    association the Arrow kernel's einsum + row-sum uses; codeword
    squared norms embed as literals computed by the SAME numpy line as
    the kernel's), shortlist row_number <= refine·k by (score DESC,
    neighbor ASC), then the shared exact-cosine re-rank."""
    import numpy as np

    from deduplication_and_compression_spark.operators.similarity import (
        ivf_centroids,
    )

    C = ivf_centroids(_IVF_CELLS, dim, seed)
    cb = _fitted_pq_codebooks()
    m_sub, k_sub, dsub = cb.shape
    rnorm_sq = (cb * cb).sum(axis=2)  # same numpy reduction as the kernel

    def vec(x) -> str:
        return "[" + ", ".join(repr(float(v)) for v in x) + "]"

    cell_dots = ", ".join(
        f"list_inner_product(v, {vec(C[j])})" for j in range(_IVF_CELLS)
    )
    # per-subspace code: 0-based first-max argmax over the 16 codeword
    # scores s·c - |c|^2/2 (identical linearization to the kernel)
    code_exprs = []
    for m in range(m_sub):
        lo, hi = m * dsub + 1, (m + 1) * dsub
        terms = ", ".join(
            f"list_inner_product(v[{lo}:{hi}], {vec(cb[m][j])})"
            f" - {float(0.5 * (cb[m][j] * cb[m][j]).sum())!r}"
            for j in range(k_sub)
        )
        code_exprs.append(
            f"list_position([{terms}], list_aggregate([{terms}], 'max')) - 1"
        )
    codes_list = "[" + ", ".join(code_exprs) + "]"
    # ADC score: sum over subspaces of q_sub · codeword(code_m), over
    # sqrt of the summed codeword norms — both as explicit left-assoc
    # chains so the association matches the kernel's sequential sums
    cw = [
        f"({'[' + ', '.join(vec(cb[m][j]) for j in range(k_sub)) + ']'})"
        f"[c.nc[{m + 1}] + 1]"
        for m in range(m_sub)
    ]
    dot_chain = " + ".join(
        f"list_inner_product(q.v[{m * dsub + 1}:{(m + 1) * dsub}], {cw[m]})"
        for m in range(m_sub)
    )
    norm_chain = " + ".join(
        f"({vec(rnorm_sq[m])})[c.nc[{m + 1}] + 1]" for m in range(m_sub)
    )
    shortlist = _PQ_REFINE * k
    return f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        d AS (SELECT vec_id, [{cell_dots}] AS dots FROM e),
        dt AS (
          SELECT vec_id, t.i AS cell, dots[t.i + 1] AS dot
          FROM d, (SELECT unnest(range({_IVF_CELLS})) AS i) t(i)),
        rk AS (
          SELECT vec_id, cell,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dot DESC, cell ASC) AS rn
          FROM dt),
        cells AS (SELECT vec_id, cell FROM rk WHERE rn = 1),
        probes AS (SELECT vec_id, cell FROM rk WHERE rn <= {n_probes}),
        codes AS (SELECT vec_id, {codes_list} AS nc FROM e),
        cand AS (
          SELECT x.vec_id AS query_id, y.vec_id AS neighbor_id
          FROM probes x JOIN cells y
            ON x.cell = y.cell AND x.vec_id <> y.vec_id),
        sc AS (
          SELECT query_id, neighbor_id,
                 ({dot_chain}) / greatest(sqrt({norm_chain}), 1e-30) AS score
          FROM cand
          JOIN e q ON q.vec_id = query_id
          JOIN codes c ON c.vec_id = neighbor_id),
        sl AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, neighbor_id ASC) AS srn
          FROM sc),
        short AS (SELECT query_id, neighbor_id FROM sl WHERE srn <= {shortlist}),
        s AS (
          SELECT query_id, neighbor_id,
                 list_inner_product(q.v, n.v)
                   / (sqrt(list_inner_product(q.v, q.v)) * sqrt(list_inner_product(n.v, n.v))) AS cos
          FROM short JOIN e q ON q.vec_id = query_id JOIN e n ON n.vec_id = neighbor_id),
        r AS (
          SELECT query_id, neighbor_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, neighbor_id ASC) AS rank
          FROM s)
        SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {k}
    """


def _semantic_dedup_oracle_sql() -> str:
    """DuckDB twin of semantic_dedup over embeddings: the
    srp_cosine_pairs oracle as the pair predicate (identical literals
    and config as srp_cosine_pairs_embeddings), the generic
    min-label-propagation recursive CTE for components, then the
    assignment contract (singletons = own cluster, rep = cluster
    min id)."""
    pairs_sql = _srp_pairs_oracle_sql()
    return f"""
        WITH RECURSIVE pairs AS (SELECT a, b FROM ({pairs_sql}) q),
        edges AS (SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs),
        nodes AS (SELECT DISTINCT u FROM edges),
        reach(u, lbl) AS (
          SELECT u, u FROM nodes
          UNION
          SELECT edges.v, reach.lbl FROM reach JOIN edges ON edges.u = reach.u
          WHERE reach.lbl < edges.v
        ),
        lab AS (SELECT u AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY u)
        SELECT e.vec_id,
               coalesce(l.cluster_id, e.vec_id) AS cluster_id,
               e.vec_id <> coalesce(l.cluster_id, e.vec_id) AS is_duplicate,
               coalesce(l.cluster_id, e.vec_id) AS representative_id
        FROM embeddings e LEFT JOIN lab l ON e.vec_id = l.vec_id
    """


def _winnow_oracle_sql(table: str = "documents", L: int = 32) -> str:
    """DuckDB twin of substring_pairs — the CLUSTER-PRESERVING contract,
    not the raw all-positions L-gram join (ADVICE r2, medium):
    substring_pairs runs value collapse on xxhash64(text), so members
    of an identical-text group pair only with their min-id
    representative (star edges), and only REPRESENTATIVES pair across
    groups.  The r2 oracle asserted set-equality with the all-positions
    join, which holds only on fixtures with zero duplicate texts; this
    SQL states the real contract and is exercised against a
    planted-duplicate fixture in
    tests/test_entry_oracle.py::test_winnow_oracle_with_duplicate_texts.

    intra: (min-id, member) within each identical-text group — kept by
    verify iff the shared run can be ≥ L, i.e. len(text) ≥ L.
    cross: representatives sharing a verbatim L-gram (winnowing
    guarantees every such pair shares a fingerprint bucket; verify
    keeps exactly shared-L-gram pairs, so the rep-level relation IS the
    L-gram join over reps).  The star-over-reps approximation beyond
    16·hot_bucket_threshold distinct texts per fingerprint bucket is
    not replicated (unreachable at driver fixture scale).
    """
    return f"""
        WITH d AS (
          SELECT doc_id, text, min(doc_id) OVER (PARTITION BY text) AS rep
          FROM {table}),
        intra AS (
          SELECT rep AS a, doc_id AS b FROM d
          WHERE doc_id <> rep AND length(text) >= {L}),
        reps AS (SELECT doc_id, text FROM d WHERE doc_id = rep),
        gp AS (
          SELECT doc_id, text, unnest(generate_series(1, length(text) - {L - 1})) AS i
          FROM reps WHERE length(text) >= {L}),
        g AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {L}) AS gram
          FROM gp),
        cross_reps AS (
          SELECT x.doc_id AS a, y.doc_id AS b
          FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id)
        SELECT DISTINCT a, b FROM (
          SELECT a, b FROM intra UNION ALL SELECT a, b FROM cross_reps)
    """


_FNV_OFFSET_I = 1469598103934665603  # band-fold init (hashing.band_hashes)


def _sig_band_ctes(cfg=CFG, table: str = "documents") -> str:
    """Shared HUGEINT CTE prefix of the LSH-tier oracles: k-shingle
    polynomial fold → splitmix64 → per-lane minhash → signatures
    (sentinel-filtered ``sigok``) → public band keys (``bk``: id,
    band_idx, bh, sig); also leaves ``pos`` defined for the exact
    k-gram Jaccard verify.  Used by _minhash_oracle_sql (full
    pair-gen regimes on top) and _screen_oracle_sql (raw directed
    band join on top — the stream-static screen's shape)."""
    k = cfg.shingle_k
    import deduplication_and_compression_spark.functions.hashing as _H

    seeds = _H.make_seeds(cfg.num_perm, cfg.minhash_seed)
    seed_rows = ", ".join(f"({i}, {int(s)}::HUGEINT)" for i, s in enumerate(seeds))
    pows = [pow(_POLY_B_I, j, 1 << 64) for j in range(k)]
    poly_terms = " + ".join(
        f"ord(substr(text, CAST(i + {j} AS INT), 1))::HUGEINT * {pows[k - 1 - j]}::HUGEINT"
        for j in range(k)
    )
    r, nb = cfg.lsh_rows, cfg.lsh_bands
    band_fold = (
        f"list_reduce(list_prepend({_FNV_OFFSET_I}::HUGEINT, "
        f"sig[band_idx*{r}+1 : band_idx*{r}+{r}]), "
        f"(h, x) -> ({_sql_xor64('h', 'x')} * {_POLY_B_I}::HUGEINT) % {_M64})"
    )
    return f"""
WITH seeds(lane, seed) AS (VALUES {seed_rows}),
docs AS (SELECT doc_id, text FROM {table} WHERE strlen(text) >= {k}),
pos AS (SELECT doc_id, text, unnest(generate_series(1, strlen(text) - {k - 1})) AS i FROM docs),
poly AS (SELECT DISTINCT doc_id, ({poly_terms}) % {_M64} AS z FROM pos),
upoly AS (SELECT DISTINCT z AS z0, z FROM poly),
{_sm_chain("u", "upoly", ("z0",))},
ush AS (SELECT z0 AS pz, z AS sh FROM u6),
lz AS (SELECT sh AS sh0, lane, {_sql_xor64("sh", "seed")} AS z FROM ush CROSS JOIN seeds),
{_sm_chain("l", "lz", ("sh0", "lane"))},
lmix AS (SELECT sh0, lane, z AS lv FROM l6),
sigv AS (
  SELECT p.doc_id, l.lane, min(l.lv) AS v
  FROM poly p JOIN ush u ON u.pz = p.z JOIN lmix l ON l.sh0 = u.sh
  GROUP BY 1, 2),
sig AS (SELECT doc_id, list(v ORDER BY lane) AS sig FROM sigv GROUP BY 1),
sigok AS (SELECT * FROM sig WHERE sig[1] <> {(1 << 64) - 1}::HUGEINT),
bandf AS (SELECT doc_id, unnest(range({nb})) AS band_idx FROM sigok),
bandz AS (
  SELECT f.doc_id, f.band_idx, {band_fold} AS z
  FROM bandf f JOIN sigok s USING (doc_id)),
{_sm_chain("b", "bandz", ("doc_id", "band_idx"))},
bk AS (
  SELECT b6.doc_id AS id, b6.band_idx, b6.z AS bh, s.sig
  FROM b6 JOIN sigok s ON s.doc_id = b6.doc_id)"""


def _screen_oracle_sql(cfg=CFG, table: str = "documents") -> str:
    """DuckDB twin of the near-dup screen's batch shape
    (streaming/ingest.py:streaming_near_dup_screen applied to the
    documents table against itself): DIRECTED (id, ref_id) edges for
    every ordered pair sharing ≥1 LSH band bucket, passing the
    lane-agreement estimate prefilter, with true k-shingle Jaccard ≥
    threshold; jaccard floored to basis points.  No value collapse or
    skew regimes — the screen is a raw stream-static band join."""
    k = cfg.shingle_k
    t = cfg.jaccard_threshold
    slack = 3.0 * (t * (1.0 - t) / cfg.num_perm) ** 0.5
    return _sig_band_ctes(cfg, table) + f""",
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM bk x JOIN bk y ON x.band_idx = y.band_idx AND x.bh = y.bh AND x.id <> y.id),
est AS (
  SELECT c.a, c.b
  FROM cand c JOIN sigok sa ON sa.doc_id = c.a JOIN sigok sb ON sb.doc_id = c.b
  WHERE CAST(list_sum(list_transform(range(1, {cfg.num_perm + 1}),
          i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
        / {float(cfg.num_perm)!r} >= {t - slack!r}),
gk AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS g FROM pos),
nk AS (SELECT doc_id, count(*) AS n FROM gk GROUP BY 1),
inter AS (
  SELECT e.a, e.b, count(*) AS i
  FROM est e JOIN gk x ON x.doc_id = e.a JOIN gk y ON y.doc_id = e.b AND y.g = x.g
  GROUP BY 1, 2)
SELECT e.a AS id, e.b AS ref_id,
       CAST(floor(CAST(t.i AS DOUBLE) / CAST(na.n + nb.n - t.i AS DOUBLE)
                  * 10000.0) AS BIGINT) AS jaccard_bp
FROM est e
JOIN inter t ON t.a = e.a AND t.b = e.b
JOIN nk na ON na.doc_id = e.a
JOIN nk nb ON nb.doc_id = e.b
WHERE CAST(t.i AS DOUBLE) / CAST(na.n + nb.n - t.i AS DOUBLE) >= {float(t)!r}
"""


def _minhash_oracle_sql(cfg=CFG, table: str = "documents") -> str:
    """DuckDB twin of the FULL MinHash/LSH tier (minhash_pairs):

      1. k-shingle hashes: polynomial fold of the k UTF-8 bytes
         (h = Σ byte_j·B^(k-1-j) mod 2⁶⁴), splitmix64-mixed —
         functions/hashing.py:char_kgram_hashes.  Computed once per
         GLOBALLY distinct shingle (the hash is text-independent), so
         the expensive lane mixing below runs on |distinct shingles|
         rows, not |positions|.
      2. signature lane p = min over the doc's shingles of
         splitmix64(shingle XOR seed_p); seeds are make_seeds literals
         — hashing.minhash_signature.  Docs shorter than k produce no
         shingles and never appear (the Spark side's all-max sentinel
         filter); the sentinel guard sig[1] <> 2⁶⁴-1 is replicated for
         completeness.
      3. band key b = splitmix64(FNV-fold of lanes b·r..b·r+r-1) —
         hashing.band_hashes, replayed with list_reduce.
      4. skew-aware pair generation, including the value collapse:
         bucket members are grouped BY THE SIGNATURE LIST (the Spark
         side groups on xxhash64(sig) — identical grouping up to the
         documented 2⁻⁶⁴ hash-collision caveat), star edges
         (min-id rep → member) within each group, then all-pairs among
         reps for buckets ≤ 16·hot_bucket_threshold distinct
         signatures (the salted medium regime emits the same pair SET
         as plain all-pairs) and star-around-bmin above —
         minhash_lsh.candidate_pairs_from_buckets.
      5. estimate prefilter: signature lane agreement ≥ t − 3σ.
      6. exact verify: true k-shingle Jaccard ≥ t, computed over
         distinct k-gram STRINGS (equal to the Spark side's hash-set
         Jaccard absent 2⁻⁶⁴ collisions).

    Reference analog: the decoder-as-oracle discipline
    (/root/reference/Decoder/Decoder.cpp:63-118) — every emitted pair
    independently checkable by an external engine.
    """
    k = cfg.shingle_k
    t = cfg.jaccard_threshold
    slack = 3.0 * (t * (1.0 - t) / cfg.num_perm) ** 0.5
    hot = cfg.hot_bucket_threshold * 16  # collapse active → 16x floor
    return _sig_band_ctes(cfg, table) + f""",
grp AS (
  SELECT band_idx, bh, sig, min(id) AS rep, count(*) AS gsz
  FROM bk GROUP BY 1, 2, 3),
intra AS (
  SELECT DISTINCT g.rep AS a, k.id AS b
  FROM bk k JOIN grp g ON g.band_idx = k.band_idx AND g.bh = k.bh AND g.sig = k.sig
  WHERE g.gsz > 1 AND k.id <> g.rep),
reps AS (SELECT band_idx, bh, rep AS id FROM grp),
sizes AS (
  SELECT band_idx, bh, count(*) AS bsz, min(id) AS bmin
  FROM reps GROUP BY 1, 2 HAVING count(*) > 1),
tag AS (
  SELECT r.id, r.band_idx, r.bh, s.bsz, s.bmin
  FROM reps r JOIN sizes s USING (band_idx, bh)),
allp AS (
  SELECT DISTINCT x.id AS a, y.id AS b
  FROM tag x JOIN tag y ON x.band_idx = y.band_idx AND x.bh = y.bh AND x.id < y.id
  WHERE x.bsz <= {hot}),
star AS (
  SELECT DISTINCT least(id, bmin) AS a, greatest(id, bmin) AS b
  FROM tag WHERE bsz > {hot} AND id <> bmin),
cand AS (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM allp UNION ALL SELECT a, b FROM star
    UNION ALL SELECT a, b FROM intra)),
est AS (
  SELECT c.a, c.b
  FROM cand c JOIN sigok sa ON sa.doc_id = c.a JOIN sigok sb ON sb.doc_id = c.b
  WHERE CAST(list_sum(list_transform(range(1, {cfg.num_perm + 1}),
          i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
        / {float(cfg.num_perm)!r} >= {t - slack!r}),
gk AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), {k}) AS g FROM pos),
nk AS (SELECT doc_id, count(*) AS n FROM gk GROUP BY 1),
inter AS (
  SELECT e.a, e.b, count(*) AS i
  FROM est e JOIN gk x ON x.doc_id = e.a JOIN gk y ON y.doc_id = e.b AND y.g = x.g
  GROUP BY 1, 2)
SELECT e.a AS a, e.b AS b
FROM est e
JOIN inter t ON t.a = e.a AND t.b = e.b
JOIN nk na ON na.doc_id = e.a
JOIN nk nb ON nb.doc_id = e.b
WHERE CAST(t.i AS DOUBLE) / CAST(na.n + nb.n - t.i AS DOUBLE) >= {float(cfg.jaccard_threshold)!r}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dedup_docs": """
            SELECT doc_id, md5(text) AS content_hash,
                   min(doc_id) OVER (PARTITION BY md5(text)) AS rep_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
            FROM documents
        """,
        "token_counts_docs": f"""
            SELECT doc_id,
                   len({_TOKS}) AS n_tokens,
                   len(list_distinct({_TOKS})) AS n_distinct_tokens,
                   len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS n_pieces
            FROM documents
        """,
        # PII patterns imported from textops so operator and twin can
        # never drift; DuckDB RE2 verified byte-identical to Java regex
        # on this pattern subset (no lookaround, explicit [0-9])
        # staged counts mirror the operator: each pattern is counted on
        # the text already scrubbed by the earlier passes, so counts
        # reconcile with the placeholders (overlaps never double-count)
        "pii_scrub_docs": """
            WITH s1 AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '{em}'))::INT AS n_emails,
                     regexp_replace(text, '{em}', '[EMAIL]', 'g') AS t
              FROM documents),
            s2 AS (
              SELECT doc_id, n_emails,
                     len(regexp_extract_all(t, '{ip}'))::INT AS n_ips,
                     regexp_replace(t, '{ip}', '[IP]', 'g') AS t
              FROM s1)
            SELECT doc_id,
                   regexp_replace(t, '{ph}', '[PHONE]', 'g') AS text_clean,
                   n_emails, n_ips,
                   len(regexp_extract_all(t, '{ph}'))::INT AS n_phones
            FROM s2
        """.format(em=textops.PII_EMAIL, ip=textops.PII_IPV4,
                   ph=textops.PII_PHONE),
        "token_heavy_hitters_docs": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
            pd AS (
              SELECT token, doc_id, count(*) AS c FROM tok
              WHERE length(token) > 0 GROUP BY 1, 2)
            SELECT token,
                   CAST(sum(c) AS BIGINT) AS occurrences,
                   CAST(count(*) AS BIGINT) AS doc_freq
            FROM pd GROUP BY token
            ORDER BY occurrences DESC, token ASC LIMIT 50
        """,
        "quality_scores_docs": f"""
            WITH c AS (
              SELECT doc_id, length(text) AS text_chars,
                     CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
                     CAST(len(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE) AS n_stop,
                     CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_dis
              FROM documents)
            SELECT doc_id, text_chars,
                   CAST(floor(n_stop / n_tok * 10000.0) AS BIGINT) AS stopword_bp,
                   CAST(floor(n_dis / n_tok * 10000.0) AS BIGINT) AS diversity_bp,
                   CAST(floor(least(1.0, n_tok / 100.0) * (1.0 - n_stop / n_tok) * (n_dis / n_tok) * 10000.0) AS BIGINT) AS quality_bp
            FROM c
        """,
        "lang_id_docs": f"""
            WITH c AS (
              SELECT doc_id,
                     CAST(len(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE)
                       / CAST(len({_TOKS}) AS DOUBLE) AS score
              FROM documents)
            SELECT doc_id,
                   CAST(floor(score * 10000.0) AS BIGINT) AS stop_density_bp,
                   CASE WHEN score >= 0.02 THEN 'en' ELSE 'unk' END AS lang_pred
            FROM c
        """,
        "doc_fingerprints": """
            SELECT doc_id,
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        """,
        "bigram_jaccard_pairs": f"WITH {_BIGRAM_CTE} SELECT a, b, jaccard_bp FROM pairs",
        "bigram_jaccard_ppjoin": f"WITH {_BIGRAM_CTE} SELECT a, b, jaccard_bp FROM pairs",
        "lgram_substring_pairs": """
            WITH gp AS (
              SELECT doc_id, text, unnest(generate_series(1, length(text) - 23)) AS i
              FROM documents WHERE length(text) >= 24),
            g AS (
              SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 24) AS gram
              FROM gp)
            SELECT x.doc_id AS a, y.doc_id AS b
            FROM g x JOIN g y ON x.gram = y.gram AND x.doc_id < y.doc_id
            GROUP BY 1, 2
        """,
        "cc_bigram_clusters": f"WITH RECURSIVE {_CC_CTE} SELECT doc_id, cluster_id FROM lab",
        # md5-bucket split replayed exactly: DuckDB parses the same 15
        # hex chars Spark's conv(substr(md5,1,15),16,10) does, via a
        # list_reduce hex fold (no conv() in DuckDB)
        "train_val_split_docs": f"""
            WITH RECURSIVE {_CC_CTE},
            asg AS (
              SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
            bk AS (
              SELECT doc_id, cluster_id,
                     CAST(list_reduce(
                       list_transform(split(substr(md5(CAST(cluster_id AS VARCHAR)), 1, 15), ''),
                                      c -> strpos('0123456789abcdef', c) - 1),
                       (a, b) -> a * 16 + b) % 10000 AS BIGINT) AS split_bucket
              FROM asg)
            SELECT doc_id, cluster_id, split_bucket,
                   CASE WHEN split_bucket < 9000 THEN 'train' ELSE 'val' END AS split
            FROM bk
        """,
        # quality formula duplicated from quality_scores_docs (the
        # shared-corpus hash gate on BOTH rows catches divergence);
        # NULL-safe best-score match mirrors eqNullSafe
        "quality_rep_election_docs": f"""
            WITH RECURSIVE {_CC_CTE},
            q AS (
              SELECT doc_id,
                     CAST(floor(least(1.0, n_tok / 100.0) * (1.0 - n_stop / n_tok)
                                * (n_dis / n_tok) * 10000.0) AS BIGINT) AS quality_bp
              FROM (
                SELECT doc_id, CAST(len({_TOKS}) AS DOUBLE) AS n_tok,
                       CAST(len(list_filter({_TOKS}, w -> w IN {_STOP_SQL})) AS DOUBLE) AS n_stop,
                       CAST(len(list_distinct({_TOKS})) AS DOUBLE) AS n_dis
                FROM documents)),
            asg AS (
              SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
              FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id),
            jq AS (
              SELECT a.doc_id, a.cluster_id, q.quality_bp
              FROM asg a JOIN q ON a.doc_id = q.doc_id),
            rep AS (
              SELECT jq.cluster_id, min(jq.doc_id) AS rep_id
              FROM jq JOIN (
                SELECT cluster_id, max(quality_bp) AS b FROM jq GROUP BY 1) m
                ON jq.cluster_id = m.cluster_id
               AND jq.quality_bp IS NOT DISTINCT FROM m.b
              GROUP BY 1)
            SELECT a.doc_id, a.cluster_id,
                   coalesce(r.rep_id, a.doc_id) AS rep_id,
                   a.doc_id <> coalesce(r.rep_id, a.doc_id) AS is_duplicate
            FROM asg a LEFT JOIN rep r ON a.cluster_id = r.cluster_id
        """,
        "cluster_savings_docs": f"""
            WITH RECURSIVE {_CC_CTE},
            fullt AS (
              SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cid, d.n_chars
              FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id)
            SELECT cid AS cluster_id, count(*) AS members,
                   CAST(sum(n_chars) AS BIGINT) AS chars_total,
                   CAST(sum(n_chars) - max(CASE WHEN doc_id = cid THEN n_chars END)
                        AS BIGINT) AS chars_saved
            FROM fullt GROUP BY 1 HAVING count(*) > 1
        """,
        "cosine_neighbor_stats": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 20),
            s AS (
              SELECT qid AS query_id, e.vec_id AS neighbor_id,
                     list_inner_product(qv, v)
                       / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))) AS cos
              FROM q, e WHERE qid <> e.vec_id)
            SELECT query_id, count(*) AS n_neighbors,
                   CAST(floor(avg(cos) * 10000.0) AS BIGINT) AS avg_cos_bp
            FROM s WHERE cos >= 0.3 GROUP BY 1
        """,
        "embedding_cosine_pairs": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            s AS (
              SELECT x.vec_id AS a, y.vec_id AS b,
                     list_inner_product(x.v, y.v)
                       / (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v))) AS cos
              FROM e x, e y WHERE x.vec_id < y.vec_id)
            SELECT a, b, CAST(floor(cos * 10000.0) AS BIGINT) AS cos_bp
            FROM s WHERE cos >= 0.3
        """,
        "brute_topk_embeddings": """
            WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
            s AS (
              SELECT qid AS query_id, e.vec_id AS neighbor_id,
                     list_inner_product(qv, v)
                       / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))) AS cos
              FROM q, e WHERE qid <> e.vec_id),
            r AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM s)
            SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5
        """,
        "winnow_substring_pairs_docs": _winnow_oracle_sql(),
        "screen_near_dups_docs": _screen_oracle_sql(),
        "screen_batch_near_dups_docs": _screen_oracle_sql(),
        "srp_topk_embeddings": _srp_oracle_sql(),
        "ivf_topk_embeddings": _ivf_oracle_sql(),
        "ivf_topk_fitted_embeddings": _ivf_oracle_sql(C=_fitted_ivf_centroids()),
        "ivf_pq_topk_embeddings": _ivf_pq_oracle_sql(),
        "semantic_dedup_embeddings": _semantic_dedup_oracle_sql(),
        "srp_cosine_pairs_embeddings": _srp_pairs_oracle_sql(),
        "simhash_docs": _simhash_oracle_sql(),
        "simhash_hamming_pairs_docs": _simhash_pairs_oracle_sql(),
        "minhash_pairs_docs": _minhash_oracle_sql(),
    }
