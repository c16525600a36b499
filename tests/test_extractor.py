"""Extractor / corpus consistency and chat-path tests."""

import json

from kgforge.functions.json_repair import extract_json
from kgforge.models import (FinishReason, GenerationResponse,
                            StaticReplayModel, chat_extract_payload)
from kgforge.stages.extract import RuleBasedExtractor, payload_to_mention_rows


def test_rule_extractor_recovers_truth(tiny_corpus):
    """The deterministic extractor must reproduce the corpus ground truth
    exactly — this is what lets ReferenceSim and the engine share one
    extraction model (SURVEY §7.0)."""
    ex = RuleBasedExtractor()
    texts = tiny_corpus.pages.column("text").to_pylist()
    urls = tiny_corpus.pages.column("url").to_pylist()
    for url, text in zip(urls, texts):
        got = ex.extract(text or "")
        assert got == tiny_corpus.truth[url], url


def test_corpus_determinism():
    from kgforge.testing.corpus import make_corpus
    a = make_corpus(32, seed=5)
    b = make_corpus(32, seed=5)
    assert a.pages.equals(b.pages)
    assert a.truth == b.truth
    c = make_corpus(32, seed=6)
    assert not c.pages.equals(a.pages)


def test_corpus_exercises_quirks(small_corpus):
    texts = small_corpus.pages.column("text").to_pylist()
    htmls = small_corpus.pages.column("html").to_pylist()
    assert any(t == "" for t in texts)                       # empty page
    assert any(t is not None and t.strip() == "" and len(t) > 0
               for t in texts)                               # whitespace-only
    assert any(b"<b>" in (h or b"") for h in htmls)          # unclosed tag
    # aliases occur: initial-form mentions in some page text
    assert any(". " in t and " starred in " in t for t in texts if t)


def test_payload_to_mention_rows_order():
    payload = {
        "entities": [{"label": "Person", "attributes": {"name": "A"}}],
        "relations": [{"label": "R",
                       "source": {"label": "Person", "attributes": {"name": "A"}},
                       "target": {"label": "Person", "attributes": {"name": "A"}},
                       "attributes": {"w": 1}}],
    }
    rows = payload_to_mention_rows("u", 5, payload)
    assert [r[3] for r in rows] == ["entity", "relation"]
    assert [r[2] for r in rows] == [0, 1]  # seq preserves doc order


def test_chat_extract_payload_continue_and_fix():
    """Exercises the reference call path: MAX_TOKENS continue-loop joined
    with a space (extract_data_step.py:133-156), fenced JSON repair and
    shape check."""
    part1 = '```json\n{"entities": [{"label": "P", "attributes": {"n": "x"}}],'
    part2 = ' "relations": []}\n```'
    model = StaticReplayModel([
        ("Extract entities", [GenerationResponse(part1, FinishReason.MAX_TOKENS)]),
        ("continue", [GenerationResponse(part2, FinishReason.STOP)]),
    ])
    data = chat_extract_payload(model, "some text")
    assert data["entities"][0]["label"] == "P"


def test_extract_json_fences_and_repair():
    fenced = '```json\n{"a": 1,}\n```'
    assert json.loads(extract_json(fenced)) == {"a": 1}
    assert json.loads(extract_json("{'a': True}")) == {"a": True}
