"""Minimal vendored PDF text extraction (public PDF 1.x spec subset).

The reference's PDF loader (``document_loaders/pdf.py:26-37``) is
``pypdf.PdfReader`` + per-page ``extract_text``.  pypdf is not
installable in this container, so ``read_pdf_source`` uses pypdf when
importable and falls back to this extractor otherwise — enough for the
overwhelmingly common "digital-born simple text" subset:

- cross-reference-free object scan (``N G obj … endobj``), so damaged
  or stream-appended xref tables don't matter;
- page tree walk (``/Type /Catalog`` → ``/Pages`` → ``/Kids``; falls
  back to file order when the tree is malformed);
- per-page ``/Contents`` stream(s), ``/FlateDecode`` (zlib) or raw;
- text operators inside BT…ET blocks: ``Tj``, ``'``, ``"``, ``TJ``
  (kern numbers ignored), line breaks on ``Td``/``TD``/``T*``/``'``;
- PDF literal strings with all escape forms (octal included) and hex
  strings; bytes decoded latin-1 (the simple-font assumption).

Out of scope (raises or skips, loudly documented): encryption,
CID/Type0 composite fonts with ToUnicode CMaps, object streams
(``/ObjStm``), non-Flate filters.  Real-world scanned/complex PDFs
should install pypdf; this keeps the loader functional, not partial,
in the sandbox.
"""

from __future__ import annotations

import re
import zlib

_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START_RE = re.compile(rb"stream\r?\n")
# direct integer /Length only (an indirect "N 0 R" length falls back to
# the delimiter scan).  (?![0-9]) makes the digit run atomic so that a
# multi-digit indirect length like "/Length 30 0 R" cannot backtrack to
# match "3": '30' fails the indirect lookahead, '3' fails (?![0-9]).
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")


def _find_objects(data: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """``num -> (dict_bytes, stream_bytes|None)`` via an xref-free
    header scan.  Stream bodies are sliced by their direct ``/Length``
    when present, NOT by searching for ``endstream`` — compressed bytes
    are arbitrary binary and may contain the delimiter (or a fake
    ``N 0 obj`` header, which is why headers inside a consumed stream
    span are skipped)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    skip_until = 0
    for m in _HDR_RE.finditer(data):
        if m.start() < skip_until:
            continue  # binary stream content masquerading as a header
        num, pos = int(m.group(1)), m.end()
        sm = _STREAM_START_RE.search(data, pos)
        eo = data.find(b"endobj", pos)
        if sm is not None and (eo == -1 or sm.start() < eo):
            head = data[pos:sm.start()]
            lm = _LENGTH_RE.search(head)
            s0 = sm.end()
            if lm is not None:
                end = min(s0 + int(lm.group(1)), len(data))
                stream = data[s0:end]
            else:
                end = data.find(b"endstream", s0)
                if end == -1:
                    end = len(data)
                stream = re.sub(rb"\r?\n\Z", b"", data[s0:end])
            objs[num] = (head, stream)
            skip_until = end
        else:
            end = eo if eo != -1 else len(data)
            objs[num] = (data[pos:end], None)
            skip_until = end
    return objs


def _ref(body: bytes, name: bytes) -> int | None:
    m = re.search(rb"/" + name + rb"\s+(\d+)\s+\d+\s+R", body)
    return int(m.group(1)) if m else None


def _refs_array(body: bytes, name: bytes) -> list[int]:
    """``/Name [1 0 R 2 0 R]`` or single ``/Name 3 0 R``."""
    m = re.search(rb"/" + name + rb"\s*\[(.*?)\]", body, re.S)
    if m:
        return [int(x) for x in re.findall(rb"(\d+)\s+\d+\s+R", m.group(1))]
    one = _ref(body, name)
    return [one] if one is not None else []


def _stream_bytes(obj: tuple[bytes, bytes | None] | None) -> bytes | None:
    if obj is None:
        return None
    head, raw = obj
    if raw is None:
        return None
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode", head):
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None  # unsupported predictor/garbage: skip loudly-ish
    if re.search(rb"/Filter", head):
        return None  # non-Flate filter: image/font stream, not text
    return raw


def _page_objects(objs: dict) -> list[int]:
    """Page object numbers in page-tree order (file order fallback)."""
    root = None
    for head, _stream in objs.values():
        if re.search(rb"/Type\s*/Catalog\b", head):
            root = _ref(head, b"Pages")
            break
    ordered: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        head = objs[num][0]
        if re.search(rb"/Type\s*/Page\b", head):
            ordered.append(num)
            return
        for kid in _refs_array(head, b"Kids"):
            walk(kid, depth + 1)

    if root is not None:
        walk(root)
    if not ordered:  # malformed tree: every /Type /Page in file order
        ordered = [n for n, (h, _s) in sorted(objs.items())
                   if re.search(rb"/Type\s*/Page\b", h)]
    return ordered


_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse ``(...)`` starting at the '(' — returns (bytes, next_idx);
    handles nesting, all escapes and octal codes per spec §7.3.4.2."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i:i + 1]
        if c == b"\\":
            nxt = buf[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt in b"01234567" and nxt:
                # OCTAL digits only: \8 and \9 are undefined escapes
                # (spec: drop the backslash, keep the char), and int(_, 8)
                # on them would raise
                j = i + 1
                while j < min(i + 4, n) and buf[j:j + 1] in \
                        (b"0", b"1", b"2", b"3", b"4", b"5", b"6", b"7"):
                    j += 1
                out.append(int(buf[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and buf[i:i + 1] == b"\n":
                    i += 1
            else:
                i += 1  # lone backslash: drop
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _hex_string(buf: bytes, i: int) -> tuple[bytes, int]:
    j = buf.find(b">", i)
    if j < 0:
        j = len(buf)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1:j])
    if len(hx) % 2:
        hx += b"0"  # spec: odd-length pads with 0
    return bytes.fromhex(hx.decode("ascii")), j + 1


_OP_RE = re.compile(rb"(Tj|TJ|Td|TD|T\*|BT|ET|'|\")")


def _content_text(stream: bytes) -> str:
    """Text of one content stream under the simple-font contract."""
    lines: list[str] = []
    cur: list[str] = []
    i, n = 0, len(stream)
    in_text = False
    pending: list[bytes] = []  # string operands since the last operator

    def flush_line() -> None:
        if cur:
            lines.append("".join(cur))
            cur.clear()

    while i < n:
        c = stream[i:i + 1]
        if c == b"(":
            s, i = _literal_string(stream, i)
            pending.append(s)
            continue
        if c == b"<" and stream[i + 1:i + 2] != b"<":
            s, i = _hex_string(stream, i)
            pending.append(s)
            continue
        m = _OP_RE.match(stream, i)
        if m:
            op = m.group(1)
            if op == b"BT":
                in_text = True
                pending.clear()
            elif op == b"ET":
                in_text = False
                flush_line()
                pending.clear()
            elif in_text and op in (b"Td", b"TD", b"T*", b"'", b'"'):
                flush_line()
                if op in (b"'", b'"') and pending:
                    cur.append(pending[-1].decode("latin-1"))
            elif in_text and op in (b"Tj", b"TJ"):
                for s in pending:
                    cur.append(s.decode("latin-1"))
            pending.clear()
            i = m.end()
            continue
        i += 1
    flush_line()
    return "\n".join(lines)


def _escape_literal(s: str) -> bytes:
    return (s.replace("\\", r"\\").replace("(", r"\(")
            .replace(")", r"\)").encode("latin-1"))


def make_simple_pdf(page_texts: list[list[str]],
                    compress: frozenset | set = frozenset()) -> bytes:
    """Assemble a minimal one-content-stream-per-page PDF (catalog →
    pages tree → Flate or raw streams; no xref — the vendored extractor
    scans objects).  ``page_texts[p]`` is the page's list of text lines
    (each becomes a ``Tj`` with a ``Td`` line break).  Used by tests and
    the ``pdf_extract_docs`` gate query; round-trips through
    :func:`pdf_page_texts` as ``"\\n".join(lines)`` per page."""
    n_pages = len(page_texts)
    objs = [b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj"]
    kids = " ".join(f"{3 + i} 0 R" for i in range(n_pages))
    objs.append(f"2 0 obj << /Type /Pages /Kids [{kids}] "
                f"/Count {n_pages} >> endobj".encode())
    for i in range(n_pages):
        objs.append(f"{3 + i} 0 obj << /Type /Page /Parent 2 0 R "
                    f"/Contents {3 + n_pages + i} 0 R >> endobj".encode())
    for i, lines in enumerate(page_texts):
        ops = b"BT /F1 12 Tf 72 720 Td " + b" 0 -14 Td ".join(
            b"(" + _escape_literal(ln) + b") Tj" for ln in lines) + b" ET"
        body, filt = ops, b""
        if i in compress:
            body = zlib.compress(ops)
            filt = b" /Filter /FlateDecode"
        objs.append(b"%d 0 obj << /Length %d%s >> stream\n%s\nendstream "
                    b"endobj" % (3 + n_pages + i, len(body), filt, body))
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\n%%EOF\n"


def pdf_page_texts(data: bytes) -> list[str]:
    """All pages' text, one string per page (the ``PdfReader(...).pages
    → extract_text`` contract of the reference loader)."""
    # /Encrypt lives in the TRAILER dictionary at the END of the file —
    # scan the whole buffer for the reference form (an accidental match
    # inside compressed bytes would need the full "key + ref" shape)
    if re.search(rb"/Encrypt\s*(\d+\s+\d+\s+R|<<)", data):
        raise NotImplementedError(
            "encrypted PDFs are outside the vendored extractor's subset; "
            "install pypdf")
    objs = _find_objects(data)
    pages = _page_objects(objs)
    out: list[str] = []
    for pnum in pages:
        head = objs[pnum][0]
        texts = []
        for cnum in _refs_array(head, b"Contents"):
            stream = _stream_bytes(objs.get(cnum))
            if stream:
                texts.append(_content_text(stream))
        out.append("\n".join(t for t in texts if t))
    return out
