"""Property-based tests (hypothesis) for the pure kernels the
distributed machinery leans on.  These are the algebraic facts the
shuffle correctness arguments cite:

- the LWW merge state is associative + commutative (so two-phase /
  tree-shaped combining equals the sequential reference fold),
- edge-key composition is bijective even when attribute values contain
  the separator bytes,
- count-based Jaccard equals set-based Jaccard,
- the chunking quirk and type coercion are total functions.
"""

import json
import os
import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgforge.functions import hashing as H  # noqa: E402
from kgforge.keys import (coerce_value, compose_edge_key,  # noqa: E402
                          cypher_literal, split_edge_key)
from kgforge.sources.loaders import chunk_rows  # noqa: E402
from kgforge.stages.canonicalize import _merge_state, _state  # noqa: E402

SETTINGS = settings(max_examples=200, deadline=None)

_order = st.tuples(st.integers(0, 10), st.integers(0, 3), st.integers(0, 3))
_val = st.one_of(st.integers(-5, 5), st.text(max_size=4), st.booleans(),
                 st.none())
_attrs = st.dictionaries(st.sampled_from(["a", "b", "c"]), _val, max_size=3)
_mention = st.tuples(_order, _attrs)


def _fold(mentions) -> dict:
    acc: dict = {}
    for order, attrs in mentions:
        _merge_state(acc, _state(order, attrs))
    return acc


def _canon(state: dict) -> dict:
    return {k: [list(o), v] for k, (o, v) in state.items()}


@SETTINGS
@given(st.lists(_mention, max_size=8), st.lists(_mention, max_size=8))
def test_merge_state_commutative(xs, ys):
    a = _merge_state(_fold(xs), _fold(ys))
    b = _merge_state(_fold(ys), _fold(xs))
    assert _canon(a) == _canon(b)


@SETTINGS
@given(st.lists(_mention, max_size=6), st.lists(_mention, max_size=6),
       st.lists(_mention, max_size=6))
def test_merge_state_associative(xs, ys, zs):
    left = _merge_state(_merge_state(_fold(xs), _fold(ys)), _fold(zs))
    right = _merge_state(_fold(xs), _merge_state(_fold(ys), _fold(zs)))
    assert _canon(left) == _canon(right)


@SETTINGS
@given(st.lists(_mention, min_size=1, max_size=10),
       st.integers(1, 5))
def test_merge_state_partition_invariant(mentions, cut):
    """Any split of the mention stream folds to the same state as the
    sequential fold — the exact property the combiner + bucketed final
    fold relies on."""
    cut = cut % len(mentions)
    seq = _fold(mentions)
    split = _merge_state(_fold(mentions[:cut]), _fold(mentions[cut:]))
    assert _canon(seq) == _canon(split)


@SETTINGS
@given(st.text(max_size=20), st.text(max_size=20), st.text(max_size=10))
def test_edge_key_round_trip(src, dst, label):
    """Bijective even when node keys contain EDGE_SEP / NUL bytes."""
    label = label.replace("\x1e", "_")  # labels are sanitized upstream
    key = compose_edge_key(label, src, dst)
    assert split_edge_key(key) == (label, src, dst)


@SETTINGS
@given(st.lists(st.tuples(st.text(max_size=12), st.text(max_size=12),
                          st.text(max_size=6)), min_size=1, max_size=30))
def test_edge_key_column_matches_scalar(rows):
    """The vectorized arrow edge-key kernel (the flagship edge path)
    composes byte-identical keys to the scalar compose_edge_key, for
    any node-key bytes including EDGE_SEP and NUL."""
    import pyarrow as pa
    from kgforge.keys import compose_edge_key_column
    labels = [r[2].replace("\x1e", "_") for r in rows]
    src = [r[0] for r in rows]
    dst = [r[1] for r in rows]
    vec = compose_edge_key_column(pa.array(labels, pa.string()),
                                  pa.array(src, pa.string()),
                                  pa.array(dst, pa.string())).to_pylist()
    assert vec == [compose_edge_key(l, s, d)
                   for l, s, d in zip(labels, src, dst)]


@SETTINGS
@given(st.lists(st.integers(0, 50), max_size=40, unique=True),
       st.lists(st.integers(0, 50), max_size=40, unique=True))
def test_count_based_jaccard_equals_set_based(a, b):
    """J = I/(|A|+|B|-I) (the ngram_jaccard_pairs formula) equals the
    set-based H.jaccard on the same inputs."""
    aa = np.unique(np.array(a, dtype=np.uint64))
    bb = np.unique(np.array(b, dtype=np.uint64))
    inter = np.intersect1d(aa, bb).size
    union = len(aa) + len(bb) - inter
    count_based = inter / union if union else 1.0
    assert count_based == H.jaccard(aa, bb)


@SETTINGS
@given(st.lists(st.text(max_size=5), max_size=30), st.integers(1, 7),
       st.booleans())
def test_chunk_rows_quirk(rows, per, keep_tail):
    docs = chunk_rows(rows, per, drop_partial_chunk=not keep_tail)
    if not keep_tail:
        # reference floor-division quirk: remainder silently dropped
        assert len(docs) == len(rows) // per
    else:
        joined = "\n".join(rows)
        assert "\n".join(docs) == joined or not rows


@SETTINGS
@given(_val, st.sampled_from(["string", "number", "boolean"]))
def test_coerce_value_total(value, typ):
    """Coercion never raises on scalar payload values and lands in the
    declared column type (or None)."""
    out = coerce_value(value, typ)
    if out is not None:
        assert isinstance(out, {"string": str, "number": float,
                                "boolean": bool}[typ])


@SETTINGS
@given(st.text(max_size=30))
def test_cypher_literal_none_quirk_and_type(s):
    lit = cypher_literal(s)
    assert lit == '""' or lit.startswith('"')
    assert cypher_literal("None") == '""'  # reference helpers.py:31-47


@SETTINGS
@given(st.lists(st.integers(0, 1_000_000), min_size=0, max_size=200))
def test_minhash_band_candidates_superset_of_identical_sets(vals):
    """Two identical shingle sets always share every band — LSH recall
    is 1.0 for exact duplicates by construction."""
    sh = np.unique(np.array(vals, dtype=np.uint64))
    a_, b_ = H.minhash_params(16, seed=3)
    sig = H.minhash_signature(sh, a_, b_)
    assert H.band_hashes(sig, 4) == H.band_hashes(sig.copy(), 4)


@SETTINGS
@given(st.text(max_size=60), st.text(max_size=60))
def test_simhash_identical_text_zero_hamming(a, b):
    ha, hb = H.simhash64(a), H.simhash64(b)
    assert H.hamming64(ha, ha) == 0
    assert 0 <= H.hamming64(ha, hb) <= 64


@SETTINGS
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 100)),
                max_size=30),
       st.lists(st.tuples(st.integers(0, 3), st.integers(-100, 100)),
                max_size=30),
       st.integers(-20, 20), st.integers(0, 40))
def test_range_join_bucketing_exactly_once(lefts, rights, lo, span):
    """The (key, time-bucket) co-partitioning behind
    ``relational.range_join``: with bucket width = window span, a left
    interval touches <= 2 buckets and the right row lands in exactly
    one, so every matching pair surfaces EXACTLY once — no dedup."""
    hi = lo + span
    width = max(hi - lo, 1)
    brute = {(i, j) for i, (lk, lt) in enumerate(lefts)
             for j, (rk, rt) in enumerate(rights)
             if lk == rk and lt + lo <= rt <= lt + hi}
    surfaced = []
    for i, (lk, lt) in enumerate(lefts):
        tbs = {(lt + lo) // width, (lt + hi) // width}
        assert len(tbs) <= 2
        for j, (rk, rt) in enumerate(rights):
            if lk == rk and rt // width in tbs \
                    and lt + lo <= rt <= lt + hi:
                surfaced.append((i, j))
    assert len(surfaced) == len(set(surfaced))      # exactly once
    assert set(surfaced) == brute                   # and complete


@SETTINGS
@given(st.lists(st.text(max_size=12), max_size=8))
def test_simhash_batch_equals_single(texts):
    batch = H.simhash64_batch(texts)
    assert [int(x) for x in batch] == [H.simhash64(t) for t in texts]


@SETTINGS
@given(st.integers(min_value=0, max_value=2**62),
       st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=1, max_value=10_000))
def test_weighted_sample_decision_monotone_in_weight(doc_id, w, scale):
    """Raising a doc's weight can only ADD it to the sample — the
    membership-stability property incremental corpus reweighting
    relies on (u52 is fixed per id, the comparison is monotone)."""
    import hashlib
    u52 = int(hashlib.md5(f"{doc_id}:ws".encode()).hexdigest()[:13], 16)
    kept_w = u52 * scale < w * (1 << 52)
    kept_w_plus = u52 * scale < (w + 1) * (1 << 52)
    assert (not kept_w) or kept_w_plus
    # weight >= scale → always kept (probability capped at 1)
    assert u52 * scale < max(w, scale) * (1 << 52) or w < scale


@SETTINGS
@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=1, max_size=300))
def test_cms_estimate_never_undercounts(keys):
    from kgforge.stages.sketches import _bloom_positions
    width, depth = 64, 3        # tiny sketch → collisions guaranteed
    mat = np.zeros((depth, width), dtype=np.int64)
    for k in keys:
        for j, p in enumerate(_bloom_positions(k, width, depth)):
            mat[j, p] += 1
    from collections import Counter
    true = Counter(keys)
    for k, n in true.items():
        est = min(mat[j, p] for j, p in
                  enumerate(_bloom_positions(k, width, depth)))
        assert est >= n


# latin-1-encodable printable-ish text incl. the chars that need PDF
# string escaping, minus \r (the extractor normalizes per-line text,
# and PDF writers never emit bare \r inside a literal in our subset)
_pdf_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF,
                           exclude_characters="\r"),
    min_size=0, max_size=40)


@given(st.lists(st.lists(_pdf_line, min_size=1, max_size=5),
                min_size=1, max_size=4),
       st.sets(st.integers(min_value=0, max_value=3)))
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(pages, compress):
    """make_simple_pdf → pdf_page_texts round-trips arbitrary latin-1
    lines (parens, backslashes, high bytes) through raw AND
    Flate-compressed content streams."""
    from kgforge.functions.pdf_text import make_simple_pdf, pdf_page_texts
    data = make_simple_pdf(pages, compress={c for c in compress
                                            if c < len(pages)})
    assert pdf_page_texts(data) == ["\n".join(lines) for lines in pages]
