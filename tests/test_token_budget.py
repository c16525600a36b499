"""Token-budget mixture curation (round 5) — boundary semantics."""
import hashlib

import numpy as np
import pyarrow as pa
import ray

from kgforge.stages.relational import token_budget_select


def _hk(i):
    return hashlib.md5(f"{i}:tb".encode()).hexdigest()[:16]


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string())}))


def test_budget_boundary_inclusive():
    # three 4-token docs, budget 8: exactly the first two in hash
    # order are kept (cum 4, 8 <= 8; the third hits 12 > 8)
    rows = [(i, "a b c d", "en") for i in range(3)]
    out = (token_budget_select(_ds(rows), budgets={"en": 8})
           .to_pandas().sort_values("cum_tokens"))
    order = sorted(range(3), key=_hk)
    assert list(out["doc_id"]) == order[:2]
    assert list(out["cum_tokens"]) == [4, 8]


def test_unbudgeted_language_drops():
    rows = [(1, "x y", "en"), (2, "x y", "xx")]
    out = token_budget_select(_ds(rows), budgets={"en": 100}).to_pandas()
    assert set(out["lang"]) == {"en"}


def test_greedy_order_is_hash_not_id():
    # a large doc early in hash order blocks later ones even if its id
    # is bigger — selection must follow md5 order, not id order
    rows = [(i, "w " * 50, "en") for i in range(6)]
    out = (token_budget_select(_ds(rows), budgets={"en": 100})
           .to_pandas())
    order = sorted(range(6), key=_hk)
    assert set(out["doc_id"]) == set(order[:2])


def test_text_never_rides_the_exchange():
    rows = [(1, "a b", "en")]
    out = token_budget_select(_ds(rows), budgets={"en": 10})
    assert set(out.schema().names) == {"doc_id", "lang", "n_tokens",
                                       "cum_tokens"}


def test_deterministic_across_runs_and_blocks():
    rows = [(i, "tok " * (i % 7 + 1), "de") for i in range(40)]
    a = (token_budget_select(_ds(rows), budgets={"de": 60})
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    many = _ds(rows).repartition(8)
    b = (token_budget_select(many, budgets={"de": 60})
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert a.equals(b)
    assert (a["cum_tokens"] <= 60).all()
    assert len(a) > 0
