"""Unit/property tests for the numpy text kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from deduplication_and_compression_spark.functions import hashing as H
from deduplication_and_compression_spark.functions.text import (
    lcs_length, suffix_array, winnow_fingerprints,
)


def _scalar_token_hashes(text: str) -> np.ndarray:
    """Independent per-token scalar reference for the batched kernel:
    ASCII-whitespace split over UTF-8 bytes, length-prefixed polynomial
    fold, splitmix64."""
    ws = set(b"\t\n\x0b\x0c\r ")
    buf = text.encode("utf-8")
    toks, cur = [], []
    for ch in buf:
        if ch in ws:
            if cur:
                toks.append(bytes(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        toks.append(bytes(cur))
    out = np.empty(len(toks), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(toks):
            acc = np.uint64(len(t))
            for c in t:
                acc = acc * H._POLY_BASE + np.uint64(c)
            out[i] = acc
    return H.splitmix64(out)


@given(st.lists(st.text(alphabet="abcdé漢 \t\n", max_size=80), max_size=20))
@settings(max_examples=60, deadline=None)
def test_token_hashes_batch_matches_scalar(texts):
    flat, counts = H.token_hashes_batch(texts)
    assert counts.sum() == flat.shape[0]
    pos = 0
    for i, t in enumerate(texts):
        ref = _scalar_token_hashes(t)
        got = flat[pos : pos + counts[i]]
        pos += counts[i]
        assert ref.shape == got.shape and (ref == got).all(), repr(t)


@given(st.lists(st.text(alphabet="abcdef \t", max_size=120), max_size=15))
@settings(max_examples=40, deadline=None)
def test_simhash_batch_matches_per_row_reference(texts):
    got = H.simhash_batch(texts)
    ref = np.array(
        [H.simhash_from_features(_scalar_token_hashes(t)) for t in texts],
        dtype=np.int64,
    )
    assert (got == ref).all()


def test_token_hashes_long_token_fallback():
    """Tokens past the vectorized width take the scalar path — outputs
    must be identical either way."""
    texts = ["x" * (H._LONG_TOKEN + 37) + " short", "y" * 500]
    flat, counts = H.token_hashes_batch(texts)
    assert counts.tolist() == [2, 1]
    ref = np.concatenate([_scalar_token_hashes(t) for t in texts])
    assert (flat == ref).all()


def _naive_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


@given(st.binary(min_size=0, max_size=60))
@settings(max_examples=60, deadline=None)
def test_suffix_array_sorts_suffixes(data):
    s = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(data[i:]) for i in sa]
    assert suffixes == sorted(bytes(data[i:]) for i in range(len(data)))


@given(
    st.text(alphabet="abcd ", min_size=0, max_size=50),
    st.text(alphabet="abcd ", min_size=0, max_size=50),
)
@settings(max_examples=80, deadline=None)
def test_lcs_matches_naive(a, b):
    assert lcs_length(a, b) == _naive_lcs(a, b)


@given(
    st.text(alphabet="abcdefgh ", min_size=40, max_size=120),
    st.integers(min_value=0, max_value=60),
    st.text(alphabet="xyzuvw", min_size=0, max_size=30),
    st.text(alphabet="xyzuvw", min_size=0, max_size=30),
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee(base, start, pre, post):
    """Any shared substring of length >= L yields a shared fingerprint."""
    L = 32
    start = min(start, len(base) - L)
    shared = base[start : start + L]
    a = base
    b = pre + shared + post
    fa = set(winnow_fingerprints(a, L).tolist())
    fb = set(winnow_fingerprints(b, L).tolist())
    assert fa & fb, "winnowing missed a planted shared L-substring"


# ---------------------------------------------------------------- Zipf regime

def test_zipf_plans_agree_and_find_planted_pairs(spark):
    """On a Zipfian-vocabulary corpus (realistic token frequencies)
    both exact Jaccard-join plans must produce identical output and
    every planted near-dup pair must be found (VERDICT r3 Next #2)."""
    from deduplication_and_compression_spark.fixtures.generator import (
        generate_zipf_docs,
    )
    from deduplication_and_compression_spark.operators.textops import (
        bigram_jaccard_pairs,
        bigram_jaccard_pairs_allpairs,
    )

    docs_pdf, truth = generate_zipf_docs(250, seed=13)
    docs = spark.createDataFrame(docs_pdf)
    pp = {(r.a, r.b, r.jaccard_bp)
          for r in bigram_jaccard_pairs(docs).collect()}
    ap = {(r.a, r.b, r.jaccard_bp)
          for r in bigram_jaccard_pairs_allpairs(docs).collect()}
    assert pp == ap and len(pp) > 0
    found = {(a, b) for a, b, _ in pp}
    planted = {(int(r.a), int(r.b)) for r in truth.itertuples()}
    assert planted <= found, planted - found


def test_allpairs_packed_key_fallback_parity(spark):
    """bigram_jaccard_pairs_allpairs groups the intersection count by a
    packed (a<<32 | b) long when doc ids fit [0, 2^31) and falls back
    to the two-column key otherwise; both branches must be
    output-identical.  Shifting the same corpus's ids by 2^31 forces
    the fallback — results must agree modulo the shift."""
    from deduplication_and_compression_spark.fixtures.generator import (
        generate_zipf_docs,
    )
    from deduplication_and_compression_spark.operators.textops import (
        bigram_jaccard_pairs_allpairs,
    )

    docs_pdf, _ = generate_zipf_docs(250, seed=13)
    docs = spark.createDataFrame(docs_pdf)
    packed_out = bigram_jaccard_pairs_allpairs(docs)
    assert dict(packed_out.dtypes)["a"] == dict(docs.dtypes)["doc_id"]
    packed = {(r.a, r.b, r.jaccard_bp) for r in packed_out.collect()}
    off = 1 << 31
    shifted = docs.withColumn("doc_id", (F.col("doc_id") + off).cast("long"))
    fallback = {(r.a - off, r.b - off, r.jaccard_bp)
                for r in bigram_jaccard_pairs_allpairs(shifted).collect()}
    assert packed == fallback and len(packed) > 0


def test_jaccard_plan_pick_per_regime():
    """The cost-based pick across its three measured regimes (numbers
    from the r4 bench host pinning, see ALLPAIRS_WORK_FLOOR):
    tiny-vocab → allpairs; Zipf-but-small → allpairs (work floor);
    Zipf at scale → ppjoin."""
    from deduplication_and_compression_spark.operators.textops import (
        choose_jaccard_plan,
    )
    # bench docs regime: ~931 distinct bigrams over 5000 docs → dense
    # posting lists, no rare tokens for the prefix filter to exploit
    assert choose_jaccard_plan(931, 5000, 2_000_000_000) == "allpairs"
    # 10k-doc Zipf fixture: rare tail exists but est. 31M join rows —
    # the naive join finishes before ppjoin's extra stages amortize
    assert choose_jaccard_plan(80_000, 10_000, 31_000_000) == "allpairs"
    # 30k-doc Zipf fixture: 280M est. join rows → pruning pays
    assert choose_jaccard_plan(240_000, 30_000, 280_000_000) == "ppjoin"
    # unknown volume: fall back to the vocab-vs-corpus discriminator
    assert choose_jaccard_plan(240_000, 30_000) == "ppjoin"
    assert choose_jaccard_plan(931, 5000) == "allpairs"


def test_token_heavy_hitters_semantics_and_plan(spark):
    """Deterministic top-k: occurrences DESC then token ASC; doc_freq
    counts documents, not occurrences; null/empty texts contribute
    nothing; and the final k is a TakeOrderedAndProject (per-partition
    heads), never a global Sort."""
    import io
    from contextlib import redirect_stdout

    import pandas as pd

    from deduplication_and_compression_spark.operators.textops import (
        token_heavy_hitters,
    )

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a", "a c", None, "   "],
    }))
    out = token_heavy_hitters(df, k=2)
    got = out.toPandas()
    assert list(got.itertuples(index=False, name=None)) == [
        ("a", 3, 2),  # 2 occurrences in doc 1 + 1 in doc 2; 2 docs
        ("b", 1, 1),  # ties with c at 1; 'b' < 'c' wins the cut
    ]
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain()
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan


def test_scrub_pii_semantics(spark):
    """Emails, dotted-quad IPs and phone shapes are replaced by
    placeholder tokens and counted; clean text is untouched; null text
    stays null with null counts."""
    import pandas as pd

    from deduplication_and_compression_spark.operators.textops import scrub_pii

    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "mail a.b+c@ex-ample.co.uk or ping 10.0.0.1 now",
            "call 555-123-4567 then 1.2.3.4 and foo@bar.io",
            "no pii here just words 123 45.6",
            None,
            "write admin@10.0.0.1.com for access",  # IP inside an email
        ],
    }))
    out = scrub_pii(df).toPandas().set_index("doc_id")
    # overlap: one [EMAIL] placeholder, and the counts reconcile —
    # the inner IP must NOT also count (r6 code-review fix)
    assert out.loc[5, "text_clean"] == "write [EMAIL] for access"
    assert (int(out.loc[5, "n_emails"]), int(out.loc[5, "n_ips"])) == (1, 0)
    assert out.loc[1, "text_clean"] == "mail [EMAIL] or ping [IP] now"
    assert out.loc[2, "text_clean"] == "call [PHONE] then [IP] and [EMAIL]"
    assert out.loc[3, "text_clean"] == "no pii here just words 123 45.6"
    assert pd.isna(out.loc[4, "text_clean"])
    assert (int(out.loc[1, "n_emails"]), int(out.loc[1, "n_ips"]),
            int(out.loc[2, "n_phones"])) == (1, 1, 1)
    assert (out.loc[3, ["n_emails", "n_ips", "n_phones"]] == 0).all()
    assert out.loc[4, ["n_emails", "n_ips", "n_phones"]].isna().all()
