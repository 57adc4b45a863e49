"""Connected components vs union-find oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from deduplication_and_compression_spark.operators.components import (
    connected_components,
)


def _oracle_labels(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in list(parent):
        r = find(x)
        out[x] = r
    # root label = min member; path compression above already yields min
    comp: dict[str, list[str]] = {}
    for x, r in out.items():
        comp.setdefault(r, []).append(x)
    return {x: min(members) for r, members in comp.items() for x in members}


@pytest.mark.parametrize("case", ["chain", "stars", "random", "cliqueish"])
def test_cc_matches_union_find(spark, case):
    rng = np.random.default_rng(7)
    if case == "chain":
        edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(200)]
    elif case == "stars":
        edges = [(f"s{k}_hub", f"s{k}_m{i}") for k in range(5) for i in range(30)]
    elif case == "random":
        n = 300
        edges = [
            (f"r{int(rng.integers(n)):04d}", f"r{int(rng.integers(n)):04d}")
            for _ in range(400)
        ]
        edges = [(a, b) for a, b in edges if a != b]
    else:
        edges = [
            (f"c{i:02d}", f"c{j:02d}") for i in range(20) for j in range(i + 1, 20)
        ] + [("c00", "z99")]
    pdf = pd.DataFrame(edges, columns=["a", "b"])
    df = spark.createDataFrame(pdf)
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    expect = _oracle_labels(edges)
    assert got == expect
