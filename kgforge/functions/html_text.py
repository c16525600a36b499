"""Pure-stdlib equivalent of the reference's HTML→text extraction.

Reference behavior (``graphrag_sdk/document_loaders/html.py:42-48``)::

    soup = BeautifulSoup(content, "html.parser")
    content = soup.get_text()
    content = re.sub(r"\\n{2,}", "\\n", content)

``beautifulsoup4`` is not installable in this environment, so this module
re-implements the documented semantics of bs4 >= 4.9 with the stdlib
``html.parser`` tree builder:

- The parser is ``html.parser.HTMLParser(convert_charrefs=True)`` (bs4's
  HTMLParserTreeBuilder default): character and entity references in
  ordinary character data are decoded; data inside CDATA-content elements
  (``<script>``/``<style>``) is passed through raw (and excluded anyway).
- ``get_text()`` concatenates, in document order, every string whose exact
  type is ``NavigableString``.  That excludes:
    * ``Comment``  (``<!-- ... -->``)
    * ``Doctype`` / declarations (``<!DOCTYPE html>``)
    * ``ProcessingInstruction`` (``<? ... ?>``)
    * ``CData`` (``<![CDATA[ ... ]]>``)
    * strings stored in bs4 >= 4.9 "string containers": text whose
      *immediate parent* element is ``<script>``, ``<style>`` or
      ``<template>`` (classes ``Script`` / ``Stylesheet`` /
      ``TemplateString``).
- The string-container decision looks only at the *innermost open tag* at
  the time character data appears, so text nested deeper inside a
  ``<template>`` (e.g. ``<template><div>x</div></template>``) IS included,
  matching bs4's ``string_container_stack[-1]`` lookup.
- HTML void elements never stay on the open-tag stack (bs4
  ``HTMLTreeBuilder.empty_element_tags``), so ``<template><br>text`` keeps
  ``template`` as the innermost open tag.
- A stray end tag with no matching open tag is ignored; a matching end tag
  implicitly closes any unclosed inner tags (bs4 ``_popToTag`` semantics).
- Finally runs of two-or-more newlines collapse to one (``re.sub``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import numpy as np
import pyarrow as pa

# bs4 HTMLTreeBuilder.empty_element_tags (html5 void elements + legacy ones)
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "keygen", "link", "menuitem", "meta", "param", "source", "track",
        "wbr",
        # legacy html void elements bs4 also treats as empty
        "basefont", "bgsound", "command", "frame", "image", "isindex",
        "nextid", "spacer",
    }
)

# bs4 >= 4.9 HTMLTreeBuilder.string_containers keys: character data whose
# immediate parent is one of these is not "text" for get_text().
STRING_CONTAINER_TAGS = frozenset({"script", "style", "template"})

_MULTI_NEWLINE = re.compile(r"\n{2,}")


class _GetTextParser(HTMLParser):
    """Collects the NavigableString-equivalent character data of a page."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._stack: list[str] = []

    # -- tag tracking -----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag not in VOID_ELEMENTS:
            self._stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        stack = self._stack
        if tag in stack:
            # pop to and including the most recent matching open tag
            while stack and stack.pop() != tag:
                pass
        # else: stray end tag — ignored (bs4 _popToTag finds nothing)

    # handle_startendtag default == starttag+endtag, which matches bs4's
    # immediately-closed empty tag handling.

    # -- character data ---------------------------------------------------
    def handle_data(self, data: str) -> None:
        if self._stack and self._stack[-1] in STRING_CONTAINER_TAGS:
            return
        self.parts.append(data)

    # Comments, doctype/declarations, processing instructions and unknown
    # declarations (CDATA) map to bs4 Comment/Doctype/ProcessingInstruction/
    # CData strings, which get_text() excludes — HTMLParser's default
    # handlers are no-ops, which is exactly what we want.


def html_get_text(html: str) -> str:
    """``BeautifulSoup(html, "html.parser").get_text()`` equivalent, then
    collapse 2+ newlines to one (reference ``html.py:45-48``)."""
    parser = _GetTextParser()
    parser.feed(html)
    parser.close()
    return _MULTI_NEWLINE.sub("\n", "".join(parser.parts))


def html_bytes_to_text(data: bytes | str, *, errors: str = "strict") -> str:
    """Decode raw page bytes as UTF-8 (the reference opens files in text
    mode with the default codec) and extract text."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        data = bytes(data).decode("utf-8", errors=errors)
    return html_get_text(data)


def extract_text_batch(batch: pa.Table, *, html_col: str = "html",
                       out_col: str = "text",
                       drop_html: bool = True) -> pa.Table:
    """``map_batches`` body: html (binary) column → extracted text column.

    Parsing is inherently per-document Python work (it is a Python HTML
    parse in the reference too); the batch loop is over documents, not
    tokens, and runs in parallel across Ray tasks.
    """
    col = batch.column(html_col)
    texts = np.empty(len(col), dtype=object)
    for i, v in enumerate(col):
        raw = v.as_py()
        texts[i] = "" if raw is None else html_bytes_to_text(raw)
    arr = pa.array(texts, type=pa.large_string())
    if out_col in batch.column_names:
        batch = batch.drop_columns([out_col])
    batch = batch.append_column(out_col, arr)
    if drop_html and html_col in batch.column_names:
        batch = batch.drop_columns([html_col])
    return batch
