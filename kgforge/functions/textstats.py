"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language ID, document fingerprinting.

All are vectorized per-batch transforms over the ``documents`` table
schema ``(doc_id, text, lang, source, n_chars)``; no per-row Python in
the counting paths (pyarrow.compute kernels), and the tokenizer regexes
are compiled once at module import.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
WORD_RE = re.compile(r"[a-zA-Z']+")
# BPE-ish pre-tokenizer (GPT-2 style, simplified): word pieces, numbers,
# punctuation runs — used for token_count_bpe.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "du", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "para"},
}


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``n_tokens`` (whitespace tokens), ``n_tokens_bpe``
    (BPE-ish pieces) and ``n_chars_text`` — all pyarrow kernels."""
    text = batch.column(text_col)
    batch = batch.append_column(
        "n_tokens", pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64()))
    batch = batch.append_column(
        "n_tokens_bpe", pc.count_substring_regex(text, BPE_RE).cast(pa.int64()))
    batch = batch.append_column(
        "n_chars_text", pc.utf8_length(text).cast(pa.int64()))
    return batch


def quality_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring signals: punctuation count, uppercase count, mean
    token length, stopword ratio (English list)."""
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_punct = pc.count_substring_regex(text, r"[^\w\s]").cast(pa.int64())
    n_upper = pc.count_substring_regex(text, r"[A-Z]").cast(pa.int64())
    n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64())
    batch = batch.append_column("n_punct", n_punct)
    batch = batch.append_column("n_upper", n_upper)
    # stopword hits need set membership — numpy over lowercase word lists
    texts = text.to_pylist()
    stops = STOPWORDS["en"]
    hits = np.zeros(len(texts), dtype=np.int64)
    words = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = WORD_RE.findall(t.lower())
        words[i] = len(ws)
        hits[i] = sum(1 for w in ws if w in stops)
    batch = batch.append_column("n_words", pa.array(words, pa.int64()))
    batch = batch.append_column("n_stopwords", pa.array(hits, pa.int64()))
    # ratio columns as exact divisions (both sides integer-exact → the
    # DuckDB oracle reproduces them bit-for-bit)
    batch = batch.append_column(
        "punct_ratio",
        pc.divide(n_punct.cast(pa.float64()),
                  pc.max_element_wise(n_chars.cast(pa.float64()), 1.0)))
    return batch


class LangIdScorer:
    """Stopword-profile language ID over {en, de, fr, es} — the n-gram
    heuristic stand-in for fasttext-style models (actor-pool stage: the
    profiles build once per actor)."""

    def __init__(self):
        self.profiles = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs, scores = [], []
        for t in texts:
            ws = WORD_RE.findall((t or "").lower())
            best_lang, best = "und", 0
            for lang, prof in sorted(self.profiles.items()):
                s = sum(1 for w in ws if w in prof)
                if s > best:
                    best_lang, best = lang, s
            langs.append(best_lang)
            scores.append(best / max(1, len(ws)))
        batch = batch.append_column("lang_pred", pa.array(langs, pa.string()))
        batch = batch.append_column("lang_score", pa.array(scores, pa.float64()))
        return batch


_FP_TOKEN_SPLIT = re.compile(r"[^ \t\n\f\r]+")  # RE2 '\S+' semantics


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      gram_n: int = 5) -> pa.Table:
    """Winnowing-style document fingerprint (Schleimer et al., MOSS):
    the minimum md5-derived hash over the document's rolling token
    ``gram_n``-gram windows, plus the window count.

    The hash is the first 16 hex chars of ``md5(gram)`` kept AS a hex
    string — fixed-width lowercase hex makes lexicographic MIN equal to
    numeric MIN, so DuckDB re-derives the fingerprint exactly
    (``MIN(substr(md5(gram), 1, 16))`` over the same windows); min is
    order-independent, which is what makes a rolling scheme
    SQL-checkable at all.  Shorter-than-``gram_n`` docs fingerprint the
    whole token list as one window; token-less docs get ``""``/0."""
    texts = batch.column(text_col).to_pylist()
    fps: list[str] = []
    ngrams = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = _FP_TOKEN_SPLIT.findall(t or "")
        if not toks:
            fps.append("")
            continue
        if len(toks) < gram_n:
            grams = [" ".join(toks)]
        else:
            grams = [" ".join(toks[j:j + gram_n])
                     for j in range(len(toks) - gram_n + 1)]
        fps.append(min(hashlib.md5(g.encode("utf-8")).hexdigest()[:16]
                       for g in grams))
        ngrams[i] = len(grams)
    batch = batch.append_column("fingerprint", pa.array(fps, pa.string()))
    return batch.append_column("n_grams", pa.array(ngrams, pa.int64()))


def repetition_stats_batch(batch: pa.Table,
                           text_col: str = "text") -> pa.Table:
    """Gopher-style repetition quality signals, per document:

    - ``n_lines`` / ``n_dup_lines`` / ``dup_line_frac`` — how much of
      the document is repeated lines (boilerplate indicator);
    - ``top_bigram_frac`` — fraction of word-bigram slots taken by the
      single most frequent bigram (loops/degenerate text indicator).

    Line distinct-counting is vectorized (one pandas ``drop_duplicates``
    over the exploded batch); the bigram pass is a linear map-side scan
    with C-level ``Counter`` tallies.  Ratios are exact-int-over-int
    IEEE divisions so the DuckDB oracle reproduces them bit-for-bit."""
    from collections import Counter

    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    filled = pc.fill_null(t, "")
    lines = pc.split_pattern(filled, pattern="\n")
    nl = pc.list_value_length(lines).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    rows = np.repeat(np.arange(len(batch), dtype=np.int64), nl)
    import pandas as pd
    flat = lines.flatten().to_pylist()
    n_distinct = np.zeros(len(batch), dtype=np.int64)
    if len(flat):
        d = (pd.DataFrame({"r": rows, "v": flat})
               .drop_duplicates().groupby("r").size())
        n_distinct[d.index.to_numpy()] = d.to_numpy()
    n_dup = nl - n_distinct

    toklists = pc.split_pattern_regex(
        filled, pattern="[ \t\n\f\r]+").to_pylist()
    mx = np.zeros(len(batch), dtype=np.int64)
    nbg = np.zeros(len(batch), dtype=np.int64)
    for i, toks in enumerate(toklists):
        toks = [x for x in toks if x]
        if len(toks) < 2:
            continue
        nbg[i] = len(toks) - 1
        mx[i] = max(Counter(zip(toks, toks[1:])).values())

    batch = batch.append_column("n_lines", pa.array(nl, pa.int64()))
    batch = batch.append_column("n_dup_lines", pa.array(n_dup, pa.int64()))
    batch = batch.append_column(
        "dup_line_frac",
        pa.array(n_dup.astype(np.float64) /
                 np.maximum(nl, 1).astype(np.float64), pa.float64()))
    return batch.append_column(
        "top_bigram_frac",
        pa.array(mx.astype(np.float64) /
                 np.maximum(nbg, 1).astype(np.float64), pa.float64()))


# ---------------------------------------------------------------------------
# text normalization / PII redaction (round 3)
# ---------------------------------------------------------------------------

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{6,}"


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "text_norm") -> pa.Table:
    """Canonical web-text normalization: unicode NFC, lowercase,
    RE2-whitespace collapse to single spaces, edge trim — all pyarrow
    kernels, exactly mirrored by DuckDB
    ``trim(regexp_replace(nfc_normalize(lower(text)), ...))``."""
    t = batch.column(text_col)
    x = pc.utf8_normalize(t, form="NFC")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, pattern="[ \t\n\f\r]+",
                                   replacement=" ")
    x = pc.utf8_trim(x, characters=" ")
    return batch.append_column(out_col, x)


def redact_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII-style redaction pass: emails → ``[EMAIL]`` first (emails
    contain digits), then 6+ digit runs → ``[NUM]``; match counts kept
    as quality signals.  RE2 on both engine and oracle sides."""
    t = batch.column(text_col)
    x = pc.replace_substring_regex(t, pattern=EMAIL_RE,
                                   replacement="[EMAIL]")
    x = pc.replace_substring_regex(x, pattern=LONGNUM_RE,
                                   replacement="[NUM]")
    batch = batch.append_column("redacted", x)
    batch = batch.append_column(
        "n_emails", pc.count_substring_regex(t, EMAIL_RE).cast(pa.int64()))
    return batch.append_column(
        "n_longnums",
        pc.count_substring_regex(t, LONGNUM_RE).cast(pa.int64()))


_SENT_RE = re.compile(r"[^.!?]+[.!?]*")


def sentences_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Sentence segmentation: document → one row per sentence with a
    1-based ordinal.  The splitter is the single RE2-compatible pattern
    ``[^.!?]+[.!?]*`` (maximal runs up to and including their
    terminator punctuation) — identical semantics to DuckDB
    ``regexp_extract_all``, so the whole exploded table is
    SQL-re-derivable including the ordinals
    (``generate_subscripts``)."""
    ids = batch.column(id_col).to_pylist()
    texts = batch.column(text_col).to_pylist()
    out_id, out_idx, out_s = [], [], []
    for i, t in zip(ids, texts):
        for j, s in enumerate(_SENT_RE.findall(t or ""), start=1):
            out_id.append(i)
            out_idx.append(j)
            out_s.append(s)
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "sent_idx": pa.array(out_idx, pa.int64()),
        "sentence": pa.array(out_s, pa.string()),
        "n_chars_sent": pa.array([len(s) for s in out_s], pa.int64())})


class HashLinearScorer:
    """Hash-feature linear text classifier (the fasttext/Vowpal-Wabbit
    hashing trick) as an ACTOR-POOL scoring stage: the weight table
    builds once per actor in ``__init__`` (the stateful-stage contract
    — a real model checkpoint loads here), ``__call__`` scores batches
    vectorized.

    Weights are deterministic md5-derived integers
    (``w[b] = md5int8("w:{b}") % 1001 - 500``) and features are md5
    token buckets, so the WHOLE model — features, weights, scores — is
    exact-integer and re-derivable in SQL; md5 runs once per
    batch-unique token (same trick as ``simhash64_batch``)."""

    def __init__(self, n_buckets: int = 4096, salt: str = "w"):
        self.n_buckets = n_buckets
        self.weights = np.fromiter(
            (int(hashlib.md5(f"{salt}:{b}".encode("utf-8"))
                 .hexdigest()[:8], 16) % 1001 - 500
             for b in range(n_buckets)),
            dtype=np.int64, count=n_buckets)

    def __call__(self, batch: pa.Table,
                 text_col: str = "text") -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        tok_lists = [_FP_TOKEN_SPLIT.findall(t or "") for t in texts]
        counts = np.fromiter((len(tl) for tl in tok_lists),
                             dtype=np.int64, count=n)
        scores = np.zeros(n, dtype=np.int64)
        if counts.sum():
            flat = np.asarray([tok for tl in tok_lists for tok in tl],
                              dtype=object)
            uniq, inv = np.unique(flat, return_inverse=True)
            buckets = np.fromiter(
                (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                 % self.n_buckets for t in uniq),
                dtype=np.int64, count=len(uniq))
            per_tok_w = self.weights[buckets][inv].astype(np.float64)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
            scores = np.bincount(doc_idx, weights=per_tok_w,
                                 minlength=n).astype(np.int64)
        batch = batch.append_column("score_q",
                                    pa.array(scores, pa.int64()))
        return batch.append_column("n_tokens_scored",
                                   pa.array(counts, pa.int64()))


def ttr_batch(batch: pa.Table, text_col: str = "text",
              id_col: str = "doc_id") -> pa.Table:
    """Per-document type-token ratio (lexical diversity): ``n_types /
    n_tokens`` over whitespace tokens — the cheap repetition/quality
    signal next to the Gopher repetition stats.  Docs with zero tokens
    are DROPPED (the oracle mirrors ``n_tokens > 0``); the ratio is
    ONE IEEE division of two exact ints, so the float gates exactly.

    Embarrassingly parallel: everything happens inside the batch, text
    never shuffles (the 100-TB shape — a pure map stage)."""
    import pandas as pd

    # shared tokenize kernel — the one RE2 '\S+'-equivalent split
    from ..stages.retrieval import _token_lists

    flat, parent, _dl = _token_lists(batch.column(text_col))
    df = pd.DataFrame({"r": parent,
                       "t": flat.to_numpy(zero_copy_only=False)})
    n = len(batch)
    n_tokens = np.zeros(n, dtype=np.int64)
    n_types = np.zeros(n, dtype=np.int64)
    if len(df):
        cnt = df.groupby("r").size()
        n_tokens[cnt.index.to_numpy()] = cnt.to_numpy()
        d = df.drop_duplicates().groupby("r").size()
        n_types[d.index.to_numpy()] = d.to_numpy()
    keep = n_tokens > 0
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)[keep]
    nt = n_tokens[keep]
    ny = n_types[keep]
    return pa.table({
        id_col: pa.array(ids, pa.int64()),
        "n_tokens": pa.array(nt, pa.int64()),
        "n_types": pa.array(ny, pa.int64()),
        "ttr": pa.array(ny.astype(np.float64) / nt.astype(np.float64),
                        pa.float64())})


def char_entropy_batch(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """Per-document Shannon entropy of the CHARACTER distribution —
    the encoding/garbage detector (mojibake and binary-in-text score
    far from natural-language entropy; near-zero entropy flags
    single-char padding).  Empty/null docs are DROPPED (oracle mirrors
    ``length(text) > 0``).

    Integer-exact via the quantized-ln trick on counts (the
    ``host_lang_entropy`` recipe): ``q(x) = floor(ln(x)*1e9 + 0.5)``,
    ``h_e9n = n*q(n) - Σ c*q(c)`` is an order-free integer (n·H in
    nano-nats); the float ``entropy`` is one mirrored IEEE expression.
    Pure map stage — text never shuffles."""
    import pandas as pd

    texts = batch.column(text_col).to_pylist()
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    lens = np.array([0 if t is None else len(t) for t in texts],
                    np.int64)
    cps = [np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
           for t in texts]
    flat = (np.concatenate(cps) if cps
            else np.array([], np.uint32))
    parent = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    cnt = (pd.DataFrame({"r": parent, "c": flat})
           .groupby(["r", "c"]).size().reset_index(name="n"))

    def q(v: np.ndarray) -> np.ndarray:
        return np.floor(
            np.log(v.astype(np.float64)) * 1e9 + 0.5).astype(np.int64)

    cnt["cq"] = cnt["n"].to_numpy(np.int64) * q(cnt["n"].to_numpy())
    per = cnt.groupby("r").agg(
        n_chars=("n", "sum"), n_distinct_chars=("n", "size"),
        sum_cq=("cq", "sum")).reset_index()
    n = per["n_chars"].to_numpy(np.int64)
    h_e9n = n * q(n) - per["sum_cq"].to_numpy(np.int64)
    ent = h_e9n.astype(np.float64) / (n.astype(np.float64) * 1e9)
    idx = per["r"].to_numpy(np.int64)
    return pa.table({
        id_col: pa.array(ids[idx], pa.int64()),
        "n_chars": pa.array(n, pa.int64()),
        "n_distinct_chars": pa.array(
            per["n_distinct_chars"].to_numpy(np.int64), pa.int64()),
        "h_e9n": pa.array(h_e9n, pa.int64()),
        "entropy": pa.array(ent, pa.float64())})
