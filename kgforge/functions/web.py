"""URL structure kernels for web-corpus curation.

The reference operates on already-loaded documents (its URL loader,
``document_loaders/url.py:22-51``, fetches one page and discards the
URL structure); at Common-Crawl scale the url column itself is a
first-class curation signal — per-domain caps, per-section stats,
host-level quality priors.  Vectorized arrow regex, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host/section/...  (host = authority up to /?#; section =
# first path segment, possibly empty).  The DuckDB oracles mirror with
# regexp_extract(url, URL_RE, n).
URL_RE = r"^[a-z][a-z0-9+.-]*://([^/?#]+)(?:/([^/?#]*))?"
_ARROW_RE = (r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"
             r"(?:/(?P<section>[^/?#]*))?")


def url_host_section(col) -> tuple[pa.Array, pa.Array, pa.Array]:
    """(host, section, matched) arrays for a url column — vectorized
    ``pc.extract_regex``; non-matching or null urls get matched=False
    (callers filter; DuckDB mirrors with ``regexp_matches``)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    ext = pc.extract_regex(col, _ARROW_RE)
    matched = ext.is_valid()
    host = pc.if_else(matched, pc.struct_field(ext, "host"),
                      pa.nulls(len(col), pa.string()))
    section = pc.if_else(matched, pc.struct_field(ext, "section"),
                         pa.nulls(len(col), pa.string()))
    # a url with no path at all has a null section group — the oracle's
    # regexp_extract yields '' there, so normalize null-to-empty
    section = pc.fill_null(section, "")
    return host, section, matched


# URL canonicalization (crawl dedup's first line of defense): one RE2
# pattern shared VERBATIM with the DuckDB oracle (groups 1-4 = scheme,
# authority, path, query; fragment discarded by the trailing wildcard).
URL_PARTS_RE = (r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)"
                r"([^?#]*)(?:\?([^#]*))?(?:#.*)?$")
_ARROW_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                   r"(?P<auth>[^/?#]+)(?P<path>[^?#]*)"
                   r"(?:\?(?P<query>[^#]*))?(?:#.*)?$")
# tracking params dropped from the query string (name-anchored)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid)(=.*)?$"
_TRACKING_RE_C = None


def _normalize_query(q: str | None) -> str:
    """Query-string half of canonicalization (the only per-row Python —
    callers invoke it ONLY for rows that carry a query string, rare in
    crawl corpora): drop empties and tracking params, sort the rest
    bytewise (UTF-8 code-point order == DuckDB binary collation), join
    with '&'."""
    global _TRACKING_RE_C
    if not q:
        return ""
    if _TRACKING_RE_C is None:
        import re
        _TRACKING_RE_C = re.compile(TRACKING_PARAM_RE)
    parts = [p for p in q.split("&")
             if p and not _TRACKING_RE_C.match(p)]
    return "&".join(sorted(parts))


def canonicalize_url(col) -> tuple[pa.Array, pa.Array]:
    """Vectorized URL canonicalization → ``(canonical, matched)``.

    Rules (each mirrored in the SQL oracle, see ``url_canonical_pages``):
    scheme and host lowercased; leading ``www.`` stripped; default port
    stripped (``:80`` for http, ``:443`` for https); trailing path
    slashes stripped; fragment dropped; query params de-tracked
    (``utm_*``/``gclid``/``fbclid``), sorted bytewise and rejoined.
    Non-matching / null urls pass through unchanged with matched=False.
    All component work is Arrow kernels; only rows that actually carry
    a query string take the per-row Python branch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.cast(col, pa.string())
    ext = pc.extract_regex(col, _ARROW_PARTS_RE)
    matched = ext.is_valid()
    empty = pa.nulls(len(col), pa.string())
    scheme = pc.utf8_lower(pc.struct_field(ext, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ext, "auth"))
    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.if_else(pc.equal(scheme, "http"),
                      pc.replace_substring_regex(host, r":80$", ""), host)
    host = pc.if_else(pc.equal(scheme, "https"),
                      pc.replace_substring_regex(host, r":443$", ""), host)
    path = pc.replace_substring_regex(
        pc.fill_null(pc.struct_field(ext, "path"), ""), r"/+$", "")
    query = pc.struct_field(ext, "query")
    # per-row python ONLY where a query string exists
    if pc.any(pc.is_valid(query)).as_py():
        qnorm = pa.array([_normalize_query(q) for q in query.to_pylist()],
                         pa.string())
    else:
        qnorm = pa.array([""] * len(col), pa.string())
    qpart = pc.if_else(pc.equal(qnorm, ""), "",
                       pc.binary_join_element_wise("?", qnorm, ""))
    canon = pc.binary_join_element_wise(
        scheme, "://", host, path, qpart, "")
    return pc.if_else(matched, canon, pc.if_else(
        col.is_valid(), col, empty)), matched


# Outlink extraction (the web-graph construction kernel).  One RE2
# pattern shared VERBATIM with the DuckDB oracle's
# regexp_extract_all(html, HREF_RE, 1).
HREF_RE = r'href="([^"]+)"'
_ARROW_HREF_RE = r'href="(?P<href>[^"]+)"'


def extract_hrefs(col) -> tuple[pa.Array, pa.Array]:
    """Vectorized anchor-href extraction from an html column →
    ``(href, row_index)`` flat arrays (a row contributes one entry per
    anchor; rows without anchors contribute none).

    ``pc.extract_regex`` finds only the FIRST match per string, so the
    column is first segmented at every ``"<a "`` tag open (vectorized
    ``replace_substring`` + newline split — each segment then starts
    with at most one anchor) and the single RE2 pattern runs once over
    the flattened segments; ``list_parent_indices`` maps matches back
    to their source rows.  No per-row Python anywhere.

    The reference never builds a link graph (its URL loader fetches one
    page and discards structure, ``document_loaders/url.py:22-51``);
    at Common-Crawl scale the outlink graph is a first-class curation
    signal (host reputation, PageRank priors) — net-new operator."""
    flat, parent = _anchor_segments(col)
    # only segments that START with an anchor open count — otherwise
    # href attributes of non-anchor tags preceding the first '<a '
    # (<link>/<base> in <head>) would leak in as phantom outlinks
    ext = pc.extract_regex(flat, _ARROW_HREF_RE)
    ok = pc.and_(ext.is_valid(), pc.starts_with(flat, "<a "))
    return (pc.filter(pc.struct_field(ext, "href"), ok),
            pc.filter(parent, ok))


def _anchor_segments(col) -> tuple[pa.Array, pa.Array]:
    """Segment an html column at every ``"<a "`` tag open (vectorized
    ``replace_substring`` + newline split) so each flattened segment
    starts with at most one anchor; returns ``(segments, row_index)``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(pc.cast(col, pa.string()), "")
    seg = pc.split_pattern(
        pc.replace_substring(col, "<a ", "\n<a "), "\n")
    return pc.list_flatten(seg), pc.list_parent_indices(seg)


# Full-anchor extraction (href AND anchor text) — one RE2 pattern,
# shared with the DuckDB oracle's regexp_extract_all(snippet, LINK_RE,
# 1|2) positional-zip.
LINK_RE = r'href="([^"]+)">([^<]*)</a>'
_ARROW_LINK_RE = r'href="(?P<href>[^"]+)">(?P<anchor>[^<]*)</a>'


def extract_links(col) -> tuple[pa.Array, pa.Array, pa.Array]:
    """Vectorized (href, anchor_text, row_index) extraction from an
    html column — the inbound-anchor-text aggregation input (anchor
    text is the classic web-KG entity-linking signal: what OTHER pages
    call a target url).  Same segmentation discipline as
    :func:`extract_hrefs`; the single two-group RE2 pattern runs once
    over the flattened segments.  No reference counterpart
    (``document_loaders/url.py:22-51`` discards link structure)."""
    flat, parent = _anchor_segments(col)
    ext = pc.extract_regex(flat, _ARROW_LINK_RE)
    ok = pc.and_(ext.is_valid(), pc.starts_with(flat, "<a "))
    return (pc.filter(pc.struct_field(ext, "href"), ok),
            pc.filter(pc.struct_field(ext, "anchor"), ok),
            pc.filter(parent, ok))
