"""Rehearsal of the driver's correctness gate: every queries() entry
runs at sf0.01; oracled ones are compared against DuckDB value-for-
value (columns sorted by name, rows sorted, exact equality)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_duckdb_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    spark_pdf = _canon(q(spark, SF_DIR).toPandas())
    oracle_pdf = _canon(ddb.sql(entrymod.oracle_sql()[name]).df())
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: rows {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    assert list(spark_pdf.columns) == list(oracle_pdf.columns), name
    for c in spark_pdf.columns:
        sc, oc = spark_pdf[c], oracle_pdf[c]
        # type-strict: an integer column must stay integer-typed on BOTH
        # sides — DuckDB promoting sum(BIGINT) to HUGEINT (object/float
        # in pandas) is exactly the divergence the driver's value-hash
        # rejects, so the rehearsal must reject it too (VERDICT r1 §wrong 1)
        assert sc.dtype.kind == oc.dtype.kind, (
            f"{name}.{c}: dtype kind {sc.dtype.kind} vs oracle {oc.dtype.kind}"
            f" ({sc.dtype} vs {oc.dtype})"
        )
        if sc.dtype.kind == "f":
            pd.testing.assert_series_equal(
                sc.astype(float), oc.astype(float), check_names=False, rtol=1e-9
            )
        else:
            assert (sc.astype(str) == oc.astype(str)).all(), f"{name}.{c} mismatch"


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name
        assert df.schema is not None


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"doc_id", "cluster_id", "is_duplicate", "representative_id"} <= set(df.columns)
