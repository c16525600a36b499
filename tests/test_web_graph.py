"""Web link-graph construction (session-D round-5 ops).

Engine parity vs plain-python references, kernel edge cases, and the
zero-exchange distinct contract of the edge build.
"""

import hashlib

import pyarrow as pa
import pytest

from kgforge.functions.web import extract_hrefs


def test_extract_hrefs_multiple_per_row():
    h, idx = extract_hrefs(pa.array(
        ['<a href="u1">a</a> mid <a href="u2">b</a>',
         None,
         "plain text, no anchors",
         '<div><a class="x" href="u3">c</a></div>']))
    assert h.to_pylist() == ["u1", "u2", "u3"]
    assert idx.to_pylist() == [0, 0, 3]


def test_extract_hrefs_only_anchor_hrefs():
    # href outside an <a tag segment start is still captured only once
    # per segment: the kernel contract is at-most-one anchor per '<a '
    # segment, first match wins
    h, idx = extract_hrefs(pa.array(
        ['<a href="first">x</a> trailing href="second"']))
    assert h.to_pylist() == ["first"]


def test_extract_hrefs_empty_and_all_null():
    h, idx = extract_hrefs(pa.array([], pa.string()))
    assert len(h) == 0 and len(idx) == 0
    h, idx = extract_hrefs(pa.array([None, None], pa.string()))
    assert len(h) == 0


def _ref_edges(urls: list[str]) -> set[tuple[int, int]]:
    """Plain-python reference of the deterministic outlink fixture."""
    n = len(urls)
    ref = set()
    for u in urls:
        k = int(hashlib.md5(u.encode()).hexdigest()[:2], 16) % 4
        src = int(u[-6:])
        for j in range(k):
            d = int(hashlib.md5(f"{u}:{j}".encode()).hexdigest()[:15],
                    16) % n
            ref.add((src, d))
    return ref


@pytest.mark.usefixtures("ray_session")
def test_web_link_edges_matches_reference():
    import kgforge.pipelines.queries as Q
    sf = "/root/testdata/sf0.001"
    _, pages_path = Q.pages_for_sf(sf)
    import ray
    urls = [r["url"] for r in
            ray.data.read_parquet(pages_path, columns=["url"]).take_all()]
    got = {(r["src_id"], r["dst_id"])
           for r in Q.web_link_edges(sf).take_all()}
    assert got == _ref_edges(urls)


@pytest.mark.usefixtures("ray_session")
def test_web_pagerank_mass_and_schema():
    import kgforge.pipelines.queries as Q
    df = Q.web_pagerank_pages("/root/testdata/sf0.001").to_pandas()
    assert list(df.columns) == ["node_id", "pr_fixed", "pagerank"]
    assert len(df) > 0
    # fixed-point mass is bounded by S = 2^40 (floor losses only)
    assert 0 < df["pr_fixed"].sum() <= (1 << 40)
    assert (df["pr_fixed"] >= 0).all()


@pytest.mark.usefixtures("ray_session")
def test_web_components_cover_link_graph_nodes():
    import kgforge.pipelines.queries as Q
    sf = "/root/testdata/sf0.001"
    edges = Q.web_link_edges(sf).to_pandas()
    comp = Q.web_components(sf).to_pandas()
    nodes = set(edges["src_id"]) | set(edges["dst_id"])
    assert set(comp["node_id"]) == nodes
    # component id is the min node id of its member set
    comp_min = comp.groupby("component_id")["node_id"].min()
    assert (comp_min.index == comp_min.values).all()
    # endpoints of every edge share a component
    cid = comp.set_index("node_id")["component_id"]
    assert (cid.loc[edges["src_id"]].to_numpy()
            == cid.loc[edges["dst_id"]].to_numpy()).all()


@pytest.mark.usefixtures("ray_session")
def test_web_section_rank_conserves_mass():
    import kgforge.pipelines.queries as Q
    sf = "/root/testdata/sf0.001"
    pr = Q.web_pagerank_pages(sf).to_pandas()
    roll = Q.web_section_rank(sf).to_pandas()
    assert sorted(roll["section"]) == ["movies", "news", "people"]
    assert roll["rank_mass"].sum() == pr["pr_fixed"].sum()
    assert roll["n_pages"].sum() == len(pr)
    # per-section recompute
    import numpy as np
    cats = np.array(["movies", "people", "news"])
    pr["section"] = cats[pr["node_id"].to_numpy() % 3]
    ref = pr.groupby("section")["pr_fixed"].sum()
    got = roll.set_index("section")["rank_mass"]
    assert (got.sort_index() == ref.sort_index()).all()


def test_extract_hrefs_ignores_non_anchor_tags():
    # <link>/<base> hrefs in <head> must NOT become outlinks
    h, idx = extract_hrefs(pa.array(
        ['<head><link href="style.css"><base href="/b/"></head>'
         '<a href="u1">x</a>',
         '<link href="only-non-anchor.css">']))
    assert h.to_pylist() == ["u1"]
    assert idx.to_pylist() == [0]
