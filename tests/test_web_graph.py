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
