"""Round-5 session-E operators: anchor-text extraction/aggregation,
co-citation, Markov transitions, Good-Turing spectrum, BPE pair
counts — plain-python reference parity + kernel edge cases."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from kgforge.functions.web import extract_links
from kgforge.stages.retrieval import bpe_pair_counts, token_count_of_counts
from kgforge.stages.windows import grouped_transitions

SF = "/root/testdata/sf0.001"

_WS = re.compile(r"[ \t\n\f\r]+")


def _tokens(text) -> list[str]:
    return [t for t in _WS.split(text or "") if t]


def test_extract_links_href_and_anchor():
    h, a, idx = extract_links(pa.array(
        ['<a href="u1">first</a> mid <a href="u2">second</a>',
         None,
         "no anchors",
         '<a href="u3"></a>']))
    assert h.to_pylist() == ["u1", "u2", "u3"]
    assert a.to_pylist() == ["first", "second", ""]
    assert idx.to_pylist() == [0, 0, 3]


def test_extract_links_requires_href_last_attribute():
    # contract: the two-group pattern matches href="..."> directly —
    # an attribute AFTER href breaks the anchor pairing (the fixture
    # and oracle share this exact RE2, so both sides agree)
    h, a, _ = extract_links(pa.array(
        ['<a href="u1" target="_b">x</a><a href="u2">y</a>']))
    assert h.to_pylist() == ["u2"]
    assert a.to_pylist() == ["y"]


@pytest.mark.usefixtures("ray_session")
def test_grouped_transitions_matches_reference():
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type", "ts",
                                "event_id"]).to_pandas()
    ev = ev.dropna(subset=["user_id", "event_type", "ts"])
    ev = ev.sort_values(["user_id", "ts", "event_id"],
                        kind="mergesort")
    ref: Counter = Counter()
    for _, g in ev.groupby("user_id", sort=False):
        ts = g["event_type"].tolist()
        ref.update(zip(ts[:-1], ts[1:]))
    got = grouped_transitions(
        ray.data.read_parquet(f"{SF}/events.parquet",
                              columns=["user_id", "event_type", "ts",
                                       "event_id"])).to_pandas()
    assert len(got) == len(ref)
    for row in got.itertuples():
        assert ref[(row.prev_type, row.next_type)] == row.n_transitions


@pytest.mark.usefixtures("ray_session")
def test_grouped_transitions_null_rows_drop():
    t = pa.table({
        "user_id": pa.array([1, 1, 1, None, 2], pa.int64()),
        "event_type": pa.array(["a", None, "b", "c", "d"], pa.string()),
        "ts": pa.array([1, 2, 3, 4, 5], pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64())})
    got = grouped_transitions(ray.data.from_arrow(t)).to_pandas()
    # user 1's stream after null-drop is a -> b; user 2 has one event
    assert len(got) == 1
    assert (got.iloc[0]["prev_type"], got.iloc[0]["next_type"],
            got.iloc[0]["n_transitions"]) == ("a", "b", 1)


@pytest.mark.usefixtures("ray_session")
def test_token_spectrum_matches_reference():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    freq: Counter = Counter()
    for text in docs.column("text").to_pylist():
        freq.update(_tokens(text))
    ref = Counter(freq.values())
    got = token_count_of_counts(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["text"])).to_pandas()
    assert dict(zip(got["freq"], got["n_tokens"])) == dict(ref)
    # sanity: spectrum weighted by freq recovers total token count
    assert (got["freq"] * got["n_tokens"]).sum() == sum(freq.values())


@pytest.mark.usefixtures("ray_session")
def test_bpe_pair_counts_matches_reference():
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    ref: Counter = Counter()
    for text in docs.column("text").to_pylist():
        for w in _tokens(text):
            w = w[:256]
            for i in range(len(w) - 1):
                ref[w[i:i + 2]] += 1
    got = bpe_pair_counts(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["text"])).to_pandas()
    assert dict(zip(got["pair"], got["n_occurrences"])) == dict(ref)


@pytest.mark.usefixtures("ray_session")
def test_bpe_pair_counts_unicode_and_truncation():
    t = pa.table({"text": pa.array(
        ["héllo héllo", "日本語", "x" * 600, "a"], pa.string())})
    got = bpe_pair_counts(ray.data.from_arrow(t),
                          max_word_len=256).to_pandas()
    ref: Counter = Counter()
    for w in ["héllo", "héllo", "日本語", "x" * 256, "a"]:
        for i in range(len(w) - 1):
            ref[w[i:i + 2]] += 1
    assert dict(zip(got["pair"], got["n_occurrences"])) == dict(ref)


@pytest.mark.usefixtures("ray_session")
def test_containment_catches_subset_jaccard_misses():
    # doc 2 is a strict subset of doc 1 (plus unique padding on doc 1)
    # -> containment 1.0 for the shared window while Jaccard dilutes
    base = "alpha beta gamma delta epsilon"
    long = base + " " + " ".join(f"pad{i}" for i in range(30))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([long, base], pa.string())})
    from kgforge.stages.dedup import ngram_jaccard_pairs
    cont = ngram_jaccard_pairs(ray.data.from_arrow(t), threshold=0.9,
                               metric="containment").to_pandas()
    jac = ngram_jaccard_pairs(ray.data.from_arrow(t),
                              threshold=0.9).to_pandas()
    assert len(jac) == 0
    assert len(cont) == 1 and cont.iloc[0]["containment"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_ngram_novelty_matches_reference():
    from kgforge.stages.dedup import ngram_novelty
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    grams: dict[int, set] = {}
    for row in docs.itertuples():
        toks = _tokens(row.text)
        if len(toks) < 3:
            continue
        grams[row.doc_id] = {" ".join(toks[i:i + 3])
                             for i in range(len(toks) - 2)}
    df: Counter = Counter()
    for gs in grams.values():
        df.update(gs)
    got = ngram_novelty(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])).to_pandas()
    assert set(got["doc_id"]) == set(grams)
    by_id = got.set_index("doc_id")
    for did, gs in grams.items():
        nu = sum(1 for g in gs if df[g] == 1)
        row = by_id.loc[did]
        assert row["n_distinct_grams"] == len(gs)
        assert row["n_unique_grams"] == nu
        assert row["novelty"] == nu / len(gs)


@pytest.mark.usefixtures("ray_session")
def test_walk_skipgram_pairs_matches_reference():
    from kgforge.stages.graph import walk_skipgram_pairs
    # two walks: [1,2,3,4] and [5,6,5,6] (repeat visits count)
    rows = []
    for (s, r), seq in [((1, 0), [1, 2, 3, 4]), ((5, 0), [5, 6, 5, 6])]:
        for st, nd in enumerate(seq):
            rows.append((s, r, st, nd))
    t = pa.table({
        "start_id": pa.array([r[0] for r in rows], pa.uint64()),
        "rep": pa.array([r[1] for r in rows], pa.int64()),
        "step": pa.array([r[2] for r in rows], pa.int64()),
        "node_id": pa.array([r[3] for r in rows], pa.uint64())})
    ref: Counter = Counter()
    for seq in [[1, 2, 3, 4], [5, 6, 5, 6]]:
        for i, c in enumerate(seq):
            for d in (1, 2):
                if i + d < len(seq):
                    ref[(c, seq[i + d])] += 1
                    ref[(seq[i + d], c)] += 1
    got = walk_skipgram_pairs(ray.data.from_arrow(t),
                              window=2).to_pandas()
    assert ({(int(a), int(b)): int(n) for a, b, n in
             zip(got["center_id"], got["context_id"], got["n_pairs"])}
            == dict(ref))
