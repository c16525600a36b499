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
