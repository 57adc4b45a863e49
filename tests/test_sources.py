"""Multi-format document ingest: every supported source format
normalizes to the same document contract, so the dedup/text operators
run unchanged on foreign corpora."""

from __future__ import annotations

import pandas as pd
import pytest

from deduplication_and_compression_spark.operators.textops import exact_dedup_docs
from deduplication_and_compression_spark.sources.tables import (
    DOCUMENT_COLUMNS, read_documents,
)

DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "text": ["the quick brown fox", "lazy dogs sleep all day",
             "the quick brown fox", "completely different content"],
})


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    DOCS.to_parquet(d / "docs.parquet", index=False)
    DOCS.to_json(d / "docs.jsonl", orient="records", lines=True)
    DOCS.to_csv(d / "docs.csv", index=False)
    import pyarrow as pa
    import pyarrow.orc
    pa.orc.write_table(pa.Table.from_pandas(DOCS), d / "docs.orc")
    (d / "docs.txt").write_text("\n".join(DOCS["text"]) + "\n")
    return d


@pytest.mark.parametrize("fmt,fname", [
    ("parquet", "docs.parquet"), ("orc", "docs.orc"),
    ("json", "docs.jsonl"), ("csv", "docs.csv"),
])
def test_read_documents_formats_agree(spark, corpus_dir, fmt, fname):
    df = read_documents(spark, str(corpus_dir / fname), fmt=fmt)
    assert tuple(df.columns) == DOCUMENT_COLUMNS
    pdf = df.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert list(pdf["doc_id"]) == [1, 2, 3, 4]
    assert list(pdf["text"]) == list(DOCS["text"])
    assert (pdf["n_chars"] == DOCS["text"].str.len()).all()
    assert pdf["lang"].isna().all() and pdf["source"].isna().all()
    # the operators run unchanged: docs 1 and 3 are exact duplicates
    dd = exact_dedup_docs(df).toPandas()
    groups = dd.groupby("content_hash")["doc_id"].apply(sorted).tolist()
    assert sorted(map(tuple, groups)) == [(1, 3), (2,), (4,)]


def test_read_documents_text_lines(spark, corpus_dir):
    df = read_documents(spark, str(corpus_dir / "docs.txt"), fmt="text")
    assert tuple(df.columns) == DOCUMENT_COLUMNS
    pdf = df.toPandas()
    assert sorted(pdf["text"]) == sorted(DOCS["text"])
    assert pdf["doc_id"].is_unique  # synthesized ids are unique
    dd = exact_dedup_docs(df).toPandas()
    assert int(dd["is_duplicate"].sum()) == 1  # one of the two fox lines


def test_read_documents_custom_column_mapping(spark, tmp_path):
    pd.DataFrame({"id": [7, 8], "body": ["alpha beta", "gamma delta"],
                  "lang": ["en", "en"]}).to_json(
        tmp_path / "m.jsonl", orient="records", lines=True)
    df = read_documents(spark, str(tmp_path / "m.jsonl"), fmt="json",
                        id_col="id", text_col="body")
    pdf = df.toPandas().sort_values("doc_id")
    assert list(pdf["doc_id"]) == [7, 8]
    assert list(pdf["lang"]) == ["en", "en"]  # present column passes through


def test_read_documents_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported document format"):
        read_documents(spark, "/nonexistent", fmt="avro")


def test_read_documents_rejects_non_numeric_string_ids(spark, tmp_path):
    """String ids that don't parse as integers must raise loudly at
    execution, not silently cast to NULL and void every downstream id
    join (r5 code-review finding) — Spark's ANSI default makes the
    contract cast itself raise CAST_INVALID_INPUT per malformed row."""
    pd.DataFrame({"doc_id": ["a-uuid-1", "a-uuid-2"],
                  "text": ["alpha", "beta"]}).to_json(
        tmp_path / "uuid.jsonl", orient="records", lines=True)
    df = read_documents(spark, str(tmp_path / "uuid.jsonl"), fmt="json")
    with pytest.raises(Exception, match="CAST_INVALID_INPUT"):
        df.collect()


def test_read_documents_rejects_missing_columns(spark, tmp_path):
    """A corpus missing the id or text column must fail with a
    ValueError NAMING the column and listing what is available — not a
    raw KeyError (id) or a late unresolved-'text' analysis error
    (ADVICE r5)."""
    pd.DataFrame({"doc_id": [1], "text": ["alpha"]}).to_json(
        tmp_path / "ok.jsonl", orient="records", lines=True)
    with pytest.raises(ValueError, match=r"id column 'uid' not found.*doc_id"):
        read_documents(spark, str(tmp_path / "ok.jsonl"), fmt="json",
                       id_col="uid")
    with pytest.raises(ValueError, match=r"text column 'body' not found"):
        read_documents(spark, str(tmp_path / "ok.jsonl"), fmt="json",
                       text_col="body")


def test_read_documents_rejects_unsupported_id_type(spark, tmp_path):
    pd.DataFrame({"doc_id": [1.5, 2.5], "text": ["a", "b"]}).to_parquet(
        tmp_path / "f.parquet", index=False)
    with pytest.raises(ValueError, match="map ids to int64"):
        read_documents(spark, str(tmp_path / "f.parquet"), fmt="parquet")


def test_read_documents_custom_ids_alongside_conflicting_columns(spark, tmp_path):
    """A source carrying BOTH a doc_id column and a custom id_col must
    not produce duplicate doc_id columns (AMBIGUOUS_REFERENCE)."""
    pd.DataFrame({"doc_id": [99, 98], "id": [1, 2], "text": ["x", "y"],
                  "body": ["alpha beta", "gamma delta"]}).to_parquet(
        tmp_path / "c.parquet", index=False)
    df = read_documents(spark, str(tmp_path / "c.parquet"), fmt="parquet",
                        id_col="id", text_col="body")
    pdf = df.toPandas().sort_values("doc_id")
    assert list(pdf["doc_id"]) == [1, 2]       # custom ids win
    assert list(pdf["text"]) == ["alpha beta", "gamma delta"]
