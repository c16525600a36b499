"""ANN entity-linking candidate generation (stages/linker.py)."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray
from kgforge.stages.linker import (AnnLinker, DEFAULT_DIM, distinct_strings,
                                   embed_counts, gram_dim)


def _manual_embed(s: str, dim: int = DEFAULT_DIM) -> np.ndarray:
    v = np.zeros(dim, dtype=np.int64)
    for i in range(len(s) - 2):
        g = s[i:i + 3]
        v[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % dim] += 1
    return v


def test_embed_counts_matches_manual():
    strings = ["John Doe", "J. Doe", "Doe", "ab", "", "Doe Doe Doe"]
    mat = embed_counts(strings)
    for s, row in zip(strings, mat):
        assert np.array_equal(row, _manual_embed(s)), s
    # shorter than one gram embeds to zero
    assert mat[3].sum() == 0 and mat[4].sum() == 0
    # repeated grams COUNT (not a set): "Doe Doe Doe" has "Doe" thrice
    assert mat[5][gram_dim("Doe")] >= 3


def _link(catalog, surfaces, **kw):
    linker = AnnLinker(catalog, **kw)
    return linker(pa.table({"surface": pa.array(surfaces, pa.string())}))


def test_exact_name_self_links_with_cosine_one():
    catalog = ["John Doe", "Mary Stone", "Alex Rivera"]
    out = _link(catalog, catalog)
    for i in range(out.num_rows):
        row = {c: out.column(c)[i].as_py() for c in out.column_names}
        assert row["canonical"] == row["surface"]
        # cosine == 1  ⟺  dot² == |q|²·|c|²
        assert row["dot"] ** 2 == row["q_norm_sq"] * row["c_norm_sq"]
        assert row["linked"]


def test_alias_forms_link_above_threshold():
    catalog = ["John Doe", "Mary Stone"]
    out = _link(catalog, ["J. Doe", "Doe", "M. Stone", "Stone"])
    got = {out.column("surface")[i].as_py(): (
        out.column("canonical")[i].as_py(),
        out.column("linked")[i].as_py()) for i in range(out.num_rows)}
    assert got["J. Doe"] == ("John Doe", True)
    assert got["Doe"] == ("John Doe", True)
    assert got["M. Stone"] == ("Mary Stone", True)
    assert got["Stone"] == ("Mary Stone", True)


def test_no_shared_gram_yields_empty_match():
    out = _link(["John Doe"], ["xyzzy", "ab"])
    for i in range(out.num_rows):
        assert out.column("canonical")[i].as_py() == ""
        assert out.column("dot")[i].as_py() == 0
        assert out.column("c_norm_sq")[i].as_py() == 0
        assert not out.column("linked")[i].as_py()
    # "ab" is shorter than one 3-gram: zero query norm too
    assert out.column("q_norm_sq")[1].as_py() == 0


def test_tie_breaks_to_lexicographically_smallest():
    # identical catalog vectors (same name twice can't happen — use two
    # names whose grams coincide is brittle; instead verify the rule on
    # an exact tie: a surface equally far from two single-gram catalogs)
    catalog = ["bbb", "aaa"]
    out = _link(catalog, ["aaabbb"])  # shares one gram with each… not
    # equal: "aaabbb" contains "aaa" once and "bbb" once plus bridges —
    # compute expected via the linker's own exact rule instead
    linker = AnnLinker(catalog)
    q = embed_counts(["aaabbb"])[0]
    scores = [(int(q @ c) ** 2 / int(c @ c), name)
              for name, c in zip(linker.canon, linker.cmat)]
    best = max(scores, key=lambda t: (t[0], [-ord(ch) for ch in t[1]]))
    assert out.column("canonical")[0].as_py() == best[1]


def test_threshold_is_exact_rational():
    # cos("Doe", "John Doe"): dot=1, qn2=1, cn2=6 → cos ≈ 0.408
    # threshold 7/20 = 0.35 accepts; 9/20 = 0.45 rejects — both sides
    # decided by the integer cross-product, no float epsilon
    accept = _link(["John Doe"], ["Doe"], threshold=(7, 20))
    reject = _link(["John Doe"], ["Doe"], threshold=(9, 20))
    assert accept.column("linked")[0].as_py()
    assert not reject.column("linked")[0].as_py()
    # same canonical either way — threshold gates linked, not the argmax
    assert reject.column("canonical")[0].as_py() == "John Doe"


def test_catalog_broadcast_ref_and_ray_stage():
    catalog = ["John Doe", "Mary Stone", "Alex Rivera", "Nina Klein"]
    cref = [ray.put(catalog)]
    ds = ray.data.from_arrow(pa.table({
        "surface": pa.array(["J. Doe", "Klein", "Mary Stone", "qqq"],
                            pa.string())}))
    out = (ds.map_batches(AnnLinker, batch_format="pyarrow",
                          concurrency=(1, 2), batch_size=2,
                          fn_constructor_kwargs={"catalog": cref})
           .to_pandas().set_index("surface"))
    assert out.loc["J. Doe", "canonical"] == "John Doe"
    assert out.loc["Klein", "canonical"] == "Nina Klein"
    assert out.loc["Mary Stone", "canonical"] == "Mary Stone"
    assert not out.loc["qqq", "linked"]


def test_distinct_strings_exact():
    vals = [f"s{i % 7}" for i in range(500)] + [None, "s0"]
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    got = sorted(distinct_strings(ds, "v").to_pandas()["v"])
    assert got == sorted({f"s{i}" for i in range(7)})


def test_linker_against_corpus_alias_map():
    """On the synthetic corpus: every full-name surface self-links, and
    initial-form aliases ("J. Doe") link to a catalog person sharing the
    surname — the candidate-generation contract (the alias DICTIONARY
    remains the precision path; ANN generates candidates)."""
    from kgforge.testing.corpus import build_pools
    pools = build_pools(2000, seed=42)
    people = pools["people"]
    aliases = pools["aliases"]
    surfaces = list(aliases)
    out = _link(people, surfaces + people[:20])
    by_surface = {out.column("surface")[i].as_py(): (
        out.column("canonical")[i].as_py(),
        out.column("linked")[i].as_py()) for i in range(out.num_rows)}
    for p in people[:20]:
        assert by_surface[p] == (p, True)
    n_linked = n_surname = 0
    for s in surfaces:
        canon, linked = by_surface[s]
        if linked:
            n_linked += 1
            if canon.split(" ")[-1] == s.split(" ")[-1]:
                n_surname += 1
    assert n_linked / len(surfaces) >= 0.95
    assert n_surname / max(n_linked, 1) >= 0.95


def test_kg_build_with_ann_fallback(tmp_path):
    """Opt-in pipeline integration: built WITHOUT the alias dictionary
    but WITH the ANN catalog, alias surface forms ("J. Doe", "Doe")
    stop minting their own Person nodes — every Person name is a
    catalog member and the node count matches the dictionary build's
    (candidate generation replaces the dictionary on this corpus)."""
    import json as _json

    from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
    from kgforge.testing.corpus import build_pools, write_corpus

    write_corpus(str(tmp_path / "c"), n_pages=400, seed=7, n_files=2)
    people = build_pools(400, seed=7)["people"]
    pages = ray.data.read_parquet(str(tmp_path / "c" / "pages"))
    with open(tmp_path / "c" / "ontology.json") as fh:
        oj = _json.dumps(_json.load(fh))

    plain = build_kg(pages, KGBuildConfig(ontology_json=oj))
    ann = build_kg(pages, KGBuildConfig(
        ontology_json=oj,
        ann_link_catalog={"Person": {"name": people}}))

    plain_names = {r["name"] for r in
                   plain.nodes.filter(lambda r: r["label"] == "Person")
                   .take_all()}
    ann_names = {r["name"] for r in
                 ann.nodes.filter(lambda r: r["label"] == "Person")
                 .take_all()}
    catalog = set(people)
    # without linking, alias forms leak through as their own entities
    assert plain_names - catalog
    # with ANN candidates every Person resolves into the catalog
    assert ann_names <= catalog
    assert len(ann_names) < len(plain_names)


def test_ann_link_bucketed_parity():
    """The catalog-as-Dataset scale path is output-identical to the
    broadcast AnnLinker on the corpus alias surfaces (incl. surfaces
    with no shared gram, which rejoin via the anti-join branch)."""
    import pandas as pd

    from kgforge.stages.linker import ann_link_bucketed
    from kgforge.testing.corpus import build_pools
    pools = build_pools(1200, seed=5)
    people = pools["people"]
    surfaces = sorted(set(list(pools["aliases"]) + people[:30]
                          + ["zzzz-no-match", "ab", ""]))
    bc = (_link(people, surfaces).to_pandas()
          .sort_values("surface").reset_index(drop=True))
    surf_ds = ray.data.from_arrow(
        pa.table({"surface": pa.array(surfaces, pa.string())}))
    cat_ds = ray.data.from_arrow(
        pa.table({"canon": pa.array(people, pa.string())}))
    bk = (ann_link_bucketed(surf_ds, cat_ds, n_buckets=4)
          .to_pandas().sort_values("surface").reset_index(drop=True))
    pd.testing.assert_frame_equal(bc, bk)
    # the no-match (anti-join) branch ran: "" and "ab" have no grams
    # ("zzzz-no-match" picks up a dim COLLISION at dim=64 and scores a
    # tiny unlinked cosine — identically on both paths)
    assert (bk["canonical"] == "").sum() >= 2


def test_canonicalize_url_rules():
    """Every canonicalization rule, including pass-through of garbage."""
    import pyarrow as pa

    from kgforge.functions.web import canonicalize_url
    cases = [
        ("HTTP://WWW.Example.COM:80/a/b/", "http://example.com/a/b"),
        ("https://example.com:443/x?utm_source=a&b=1&a=2#frag",
         "https://example.com/x?a=2&b=1"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com:443/x", "http://example.com:443/x"),
        ("https://example.com", "https://example.com"),
        ("https://example.com/?", "https://example.com"),
        ("https://example.com/p?gclid=g&fbclid=f&utm_campaign=c",
         "https://example.com/p"),
        ("https://example.com/p?z=1&&a=1", "https://example.com/p?a=1&z=1"),
        ("ftp://Host/Dir/", "ftp://host/Dir"),
        ("not a url", "not a url"),
        ("", ""),
        (None, None),
    ]
    canon, ok = canonicalize_url(pa.array([c[0] for c in cases],
                                          pa.string()))
    got = canon.to_pylist()
    for (src, want), g in zip(cases, got):
        assert g == want, (src, g, want)
    assert ok.to_pylist()[-3:] == [False, False, False]
