"""Unit tests for the round-3 operators: anti-join (both strategies),
grouped exact quantiles, document chunking, n-gram frequencies."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray

from kgforge.stages.joins import anti_join_keys
from kgforge.stages.relational import (chunk_documents, grouped_quantiles,
                                       ngram_frequencies)


def _left():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e", "f"], pa.string())}))


def _right():
    return ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 4, 4, 99], pa.int64())}))


@pytest.mark.parametrize("strategy", ["broadcast", "join"])
def test_anti_join_keys(strategy):
    out = anti_join_keys(_left(), _right(), "k", "rk",
                         strategy=strategy).to_pandas()
    # unmatched keys AND the null-key row survive; duplicate right keys
    # don't matter
    assert sorted(out["v"]) == ["a", "c", "e", "f"]


def test_anti_join_empty_right():
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    out = anti_join_keys(_left(), empty, "k", "rk",
                         strategy="broadcast").to_pandas()
    assert len(out) == 6                    # nothing excluded


def test_grouped_quantiles_exact():
    rows = []
    rng = np.random.default_rng(5)
    for g, n in [("a", 101), ("b", 37), ("c", 1)]:
        for v in rng.normal(size=n):
            rows.append((g, float(v)))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array([r[0] for r in rows], pa.string()),
        "x": pa.array([r[1] for r in rows], pa.float64())}))
    qs = [0.25, 0.5, 0.9]
    out = grouped_quantiles(ds, "g", "x", qs).to_pandas()
    df = pd.DataFrame(rows, columns=["g", "x"])
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["x"].to_numpy())
        n = len(vals)
        for q in qs:
            rank = min(n - 1, max(0, int(np.ceil(q * n)) - 1))
            got = out[(out["g"] == g) & (out["q"] == q)]["value"].iloc[0]
            assert got == vals[rank], (g, q)


def test_chunk_documents_edges():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x" * 350, "", "y" * 150, "z" * 10],
                         pa.string())}))
    out = (chunk_documents(ds, chunk_chars=200, overlap=50).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    # doc 1: starts 0,150,300 -> 3 chunks; doc 2: empty -> none;
    # doc 3: exactly one step -> 1 chunk; doc 4: short -> 1 chunk
    assert out.groupby("doc_id").size().to_dict() == {1: 3, 3: 1, 4: 1}
    d1 = out[out["doc_id"] == 1]["chunk"].tolist()
    assert [len(c) for c in d1] == [200, 200, 50]
    assert out[out["doc_id"] == 4]["chunk"].iloc[0] == "z" * 10


def test_chunk_documents_overlap_validation():
    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        chunk_documents(ds, chunk_chars=50, overlap=50)


def test_ngram_frequencies_bigrams():
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c a b", "a b", "solo"], pa.string())}))
    out = ngram_frequencies(ds, n=2, k=10).to_pandas()
    counts = dict(zip(out["ngram"], out["n"]))
    assert counts["a b"] == 3
    assert counts["b c"] == 1
    assert counts["c a"] == 1
    assert "solo" not in counts             # single-token doc: no bigram
