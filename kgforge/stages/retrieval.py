"""Full-text retrieval over the document corpus: distributed BM25.

The reference's retrieval story is graph-RAG (generated Cypher over
FalkorDB, `graphrag_sdk/kg.py` ask path); a 100-TB training-data
pipeline also needs plain lexical retrieval — e.g. to mine
domain-relevant documents for a target mixture.  BM25 here is a pure
two-pass Ray dataflow:

- **Pass 1 (stats)**: one corpus scan emits per-batch partials —
  per-query-term document frequency, doc count, token count.  Only
  O(n_terms) rows per batch reach the driver, where idf / avgdl are
  computed once.
- **Pass 2 (score)**: one corpus scan; each batch tokenizes
  vectorized (RE2 `[ \\t\\n\\f\\r]+` split — byte-identical to DuckDB
  `regexp_extract_all('\\S+')`), computes tf for the broadcast term
  set via one pandas groupby, accumulates per-query scores in sorted
  term order (IEEE-mirrored against the SQL oracle: every float op
  has the same shape and order; only ln's last ulp differs between
  DuckDB and libm, so the gate compares ranks and pytest pins the
  score values), and keeps a local top-k.  The global merge folds
  n_queries tiny groups.

Corpus text never shuffles; the only exchange is the final
(n_batches x n_queries x k)-row top-k merge.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

_WS = "[ \t\n\f\r]+"


def _token_lists(col: pa.ChunkedArray | pa.Array):
    """(flat tokens, parent doc index, per-doc token count) with empty
    tokens dropped — matches `regexp_extract_all(text, '\\S+')`."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lst = pc.split_pattern_regex(pc.fill_null(col, ""), pattern=_WS)
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    flat = pc.list_flatten(lst)
    parents = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(
        zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep]
    dl = np.bincount(parents, minlength=len(col)).astype(np.int64)
    return flat, parents, dl


def bm25_topk(docs: Dataset, queries: dict[str, list[str]],
              id_col: str = "doc_id", text_col: str = "text",
              k: int = 10, k1: float = 1.2, b: float = 0.75) -> pd.DataFrame:
    """Top-k documents per query under BM25 (query_id, doc_id, score,
    rnk), ties broken by doc_id.  Every float op except ln is
    IEEE-mirrored against the DuckDB oracle; rank order is exact (see
    queries.bm25_topk_docs)."""
    all_terms = sorted({t for ts in queries.values() for t in ts})
    term_set = pa.array(all_terms, pa.string())

    def stats_partial(t: pa.Table) -> pa.Table:
        flat, parents, dl = _token_lists(t.column(text_col))
        qmask = pc.is_in(flat, value_set=term_set).to_numpy(
            zero_copy_only=False)
        keys = [" docs", " toks"]
        vals = [t.num_rows, int(dl.sum())]
        if qmask.any():
            sub = pd.DataFrame({
                "p": parents[qmask],
                "t": np.asarray(flat.to_numpy(zero_copy_only=False))[
                    qmask]})
            dfc = sub.drop_duplicates().groupby("t").size()
            keys += dfc.index.tolist()
            vals += [int(v) for v in dfc.to_numpy()]
        return pa.table({"key": pa.array(keys, pa.string()),
                         "n": pa.array(vals, pa.int64())})

    agg = (docs.select_columns([text_col])
               .map_batches(stats_partial, batch_format="pyarrow")
               .to_pandas().groupby("key")["n"].sum())
    n_docs = int(agg.get(" docs", 0))
    if n_docs == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype=object),
                             id_col: pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64),
                             "rnk": pd.Series([], dtype=np.int64)})
    avgdl = float(agg.get(" toks", 0)) / n_docs
    df_map = {t: int(agg.get(t, 0)) for t in all_terms}
    # mirror of SQL: ln(1 + ((n_docs - df) + 0.5) / (df + 0.5))
    idf = {t: math.log(1.0 + ((n_docs - d) + 0.5) / (d + 0.5))
           for t, d in df_map.items()}
    k1p1 = k1 + 1.0
    one_b = 1.0 - b

    def score_partial(t: pa.Table) -> pa.Table:
        flat, parents, dl = _token_lists(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        qmask = pc.is_in(flat, value_set=term_set).to_numpy(
            zero_copy_only=False)
        tf = np.zeros((len(all_terms), n), dtype=np.float64)
        if qmask.any():
            sub = pd.DataFrame({
                "p": parents[qmask],
                "t": np.asarray(flat.to_numpy(zero_copy_only=False))[
                    qmask]})
            cnt = sub.groupby(["t", "p"]).size()
            tpos = {t_: i for i, t_ in enumerate(all_terms)}
            for (term, p), c in cnt.items():
                tf[tpos[term], p] = float(c)
        dlf = dl.astype(np.float64)
        # denominator's doc-length part, shared across terms; the ops
        # mirror the SQL text exactly: (1-b) + (b*dl)/avgdl
        dpart = one_b + (b * dlf) / avgdl
        out_q, out_id, out_s = [], [], []
        for qid in queries:
            score = np.zeros(n, dtype=np.float64)
            for term in sorted(queries[qid]):
                tv = tf[all_terms.index(term)]
                score = score + (idf[term] * (tv * k1p1)) / (tv + k1 * dpart)
            hit = score > 0.0
            if not hit.any():
                continue
            hid, hsc = ids[hit], score[hit]
            order = np.lexsort((hid, -hsc))[:k]
            out_q += [qid] * len(order)
            out_id += hid[order].tolist()
            out_s += hsc[order].tolist()
        return pa.table({"query_id": pa.array(out_q, pa.string()),
                         id_col: pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    local = (docs.select_columns([id_col, text_col])
                 .map_batches(score_partial, batch_format="pyarrow")
                 .to_pandas())
    if len(local) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype=object),
                             id_col: pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64),
                             "rnk": pd.Series([], dtype=np.int64)})
    local = local.sort_values(["query_id", "score", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
    top = local.groupby("query_id", sort=True).head(k).reset_index(
        drop=True)
    top["rnk"] = top.groupby("query_id").cumcount().to_numpy(
        np.int64) + 1
    top["rnk"] = top["rnk"].astype(np.int64)
    return top[["query_id", id_col, "score", "rnk"]]


def _md5_dims(tokens: np.ndarray, dim: int) -> np.ndarray:
    """md5-hashed vocabulary bucket per token (shared by
    :func:`importance_weights` and :func:`unigram_surprisal` — the SQL
    oracles mirror this exact ``('0x' || substr(md5(t), 1, 8)) % dim``
    expression, so both operators MUST share one implementation)."""
    import hashlib
    uniq, inv = np.unique(tokens, return_inverse=True)
    ud = np.fromiter(
        (int(hashlib.md5(u.encode("utf-8")).hexdigest()[:8], 16) % dim
         for u in uniq), dtype=np.int64, count=len(uniq))
    return ud[inv]


def importance_weights(docs: Dataset, target_col: str, target_value,
                       id_col: str = "doc_id", text_col: str = "text",
                       dim: int = 256) -> Dataset:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public method):
    per-document log-likelihood ratio between a TARGET unigram
    distribution (rows where ``target_col == target_value``) and the
    full-corpus background, over an md5-hashed vocabulary of ``dim``
    buckets with add-1 smoothing.

    Exactness contract: the per-bucket log-ratio is quantized ONCE to
    integer nano-units (``floor(x·1e9 + 0.5)``) on the driver; document
    scores are then pure integer sums, so the DuckDB oracle matches
    hash-exactly (the BM25 float-rank problem never arises — sums of
    identical integers are order-free).  Scores are exact at 1e-9 per
    bucket, plenty for selection/resampling.

    Dataflow (the BM25 two-scan shape): pass 1 folds per-batch
    ``bincount`` partials to a driver-side ``dim``-vector (O(blocks ×
    dim) rows, text never shuffles); pass 2 re-tokenizes each batch and
    emits one row per document.  Output: ``(id_col, target_col,
    n_tokens, score_e9)``.
    """
    def count_partial(t: pa.Table) -> pa.Table:
        flat, parents, _dl = _token_lists(t.column(text_col))
        toks = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=object)
        if len(toks) == 0:
            z = np.zeros(dim, dtype=np.int64)
            c_all = c_tgt = z
        else:
            dims = _md5_dims(toks, dim)
            c_all = np.bincount(dims, minlength=dim).astype(np.int64)
            # fill_null: a NULL target value is background-only (a bare
            # to_numpy of a null-masked bool gives an object array that
            # cannot index)
            is_tgt = pc.fill_null(
                pc.equal(t.column(target_col), target_value),
                False).to_numpy(zero_copy_only=False).astype(bool)
            tmask = is_tgt[parents]
            c_tgt = np.bincount(dims[tmask], minlength=dim).astype(np.int64)
        return pa.table({"dim": pa.array(np.arange(dim, dtype=np.int64)),
                         "c_all": pa.array(c_all),
                         "c_tgt": pa.array(c_tgt)})

    partials = (docs.select_columns([target_col, text_col])
                    .map_batches(count_partial, batch_format="pyarrow")
                    .to_pandas())
    agg = partials.groupby("dim")[["c_all", "c_tgt"]].sum()
    c_all = np.zeros(dim, dtype=np.int64)
    c_tgt = np.zeros(dim, dtype=np.int64)
    c_all[agg.index.to_numpy()] = agg["c_all"].to_numpy()
    c_tgt[agg.index.to_numpy()] = agg["c_tgt"].to_numpy()
    total_b = int(c_all.sum())
    total_t = int(c_tgt.sum())
    # quantized per-bucket llr, op-for-op the SQL oracle's expression:
    # ln(t+1) - ln(b+1) + ln(B+dim) - ln(T+dim), then floor(x*1e9 + .5)
    llr = np.array(
        [math.floor((math.log(float(c_tgt[w] + 1))
                     - math.log(float(c_all[w] + 1))
                     + math.log(float(total_b + dim))
                     - math.log(float(total_t + dim))) * 1e9 + 0.5)
         for w in range(dim)], dtype=np.int64)

    import ray
    llr_ref = ray.put(llr)

    def score_partial(t: pa.Table) -> pa.Table:
        w = ray.get(llr_ref)
        flat, parents, dl = _token_lists(t.column(text_col))
        n = t.num_rows
        score = np.zeros(n, dtype=np.int64)
        if len(parents):
            toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                              dtype=object)
            dims = _md5_dims(toks, dim)
            # pure INT64 accumulation (np.add.at): a float64 weighted
            # bincount loses exactness past 2^53, which a >3e5-token
            # doc with large-|llr| buckets can reach — and exactness is
            # this operator's whole contract
            np.add.at(score, parents, w[dims])
        return pa.table({
            id_col: t.column(id_col),
            target_col: t.column(target_col),
            "n_tokens": pa.array(dl, pa.int64()),
            "score_e9": pa.array(score, pa.int64())})

    return (docs.select_columns([id_col, target_col, text_col])
                .map_batches(score_partial, batch_format="pyarrow"))


def unigram_surprisal(docs: Dataset, id_col: str = "doc_id",
                      text_col: str = "text",
                      dim: int = 256,
                      keep_cols: list[str] | None = None) -> Dataset:
    """Per-document unigram-LM surprisal — the cheapest useful
    "perplexity-ish" quality score a pretraining curation pass runs
    before any neural scorer: fit a hashed unigram LM on the corpus
    itself (md5 → ``dim`` buckets, add-1 smoothing), then score each
    document by its total negative log-likelihood under that LM.
    Boilerplate/templated documents score LOW (their tokens are
    corpus-frequent); rare-vocabulary documents score HIGH.

    Exactness contract (the DSIR discipline of
    :func:`importance_weights`): the per-bucket surprisal
    ``w = floor((ln(B + dim) - ln(c + 1)) * 1e9 + 0.5)`` is quantized
    ONCE on the driver, so document scores are order-free INTEGER sums
    and the DuckDB oracle matches hash-exactly.  ``w >= 0`` always
    (``c + 1 <= B + dim``), so scores are non-negative.

    Dataflow (the BM25 two-scan shape): pass 1 folds per-batch
    ``bincount`` partials to ONE driver-side ``dim``-vector (text
    never shuffles; O(blocks × dim) rows move); pass 2 re-tokenizes
    and emits one ``(id_col, n_tokens, surprisal_e9)`` row per
    document.  No reference counterpart (the reference has no corpus
    statistics; net-new curation op)."""
    def count_partial(t: pa.Table) -> pa.Table:
        flat, _parents, _dl = _token_lists(t.column(text_col))
        toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                          dtype=object)
        if len(toks) == 0:
            c = np.zeros(dim, dtype=np.int64)
        else:
            c = np.bincount(_md5_dims(toks, dim),
                            minlength=dim).astype(np.int64)
        return pa.table({"dim": pa.array(np.arange(dim, dtype=np.int64)),
                         "c": pa.array(c)})

    partials = (docs.select_columns([text_col])
                    .map_batches(count_partial, batch_format="pyarrow")
                    .to_pandas())
    agg = partials.groupby("dim")["c"].sum()
    c_all = np.zeros(dim, dtype=np.int64)
    c_all[agg.index.to_numpy()] = agg.to_numpy()
    total = int(c_all.sum())
    # quantized per-bucket surprisal, op-for-op the SQL oracle's
    # expression: ln(B + dim) - ln(c + 1), then floor(x*1e9 + .5)
    w = np.array(
        [math.floor((math.log(float(total + dim))
                     - math.log(float(c_all[b] + 1))) * 1e9 + 0.5)
         for b in range(dim)], dtype=np.int64)

    import ray
    w_ref = ray.put(w)

    def score_partial(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        flat, parents, dl = _token_lists(t.column(text_col))
        score = np.zeros(t.num_rows, dtype=np.int64)
        if len(parents):
            toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                              dtype=object)
            # int64 np.add.at, not a float bincount — exactness is the
            # contract (importance_weights' argument)
            np.add.at(score, parents, wv[_md5_dims(toks, dim)])
        cols = {id_col: t.column(id_col)}
        for c in keep_cols or []:
            cols[c] = t.column(c)
        cols["n_tokens"] = pa.array(dl, pa.int64())
        cols["surprisal_e9"] = pa.array(score, pa.int64())
        return pa.table(cols)

    return (docs.select_columns([id_col, text_col]
                                + list(keep_cols or []))
                .map_batches(score_partial, batch_format="pyarrow"))


def vocab_coverage(docs: Dataset, vocab_size: int = 1000,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> Dataset:
    """Tokenizer-vocabulary coverage audit: build the top-``vocab_size``
    token vocabulary by ``(tf DESC, token ASC)`` and score every
    document's out-of-vocabulary rate — the pretraining QA check that
    catches corpora a fixed vocab can't represent (code, other
    scripts, OCR noise) before a tokenizer is trained/frozen.

    Dataflow: one corpus token fold
    (:func:`kgforge.stages.relational.doc_frequencies` — per-batch
    combiner + ONE bucket exchange) → the vocab is a top-k sort of the
    token table, broadcast once via ``ray.put`` → one more corpus scan
    emits ``(doc_id, n_tokens, n_oov, oov_rate)`` per document.
    Counts are exact integers; ``oov_rate`` is ONE mirrored IEEE
    division, so the DuckDB oracle gates bit-exactly."""
    from .relational import doc_frequencies
    vocab_df = (doc_frequencies(docs.select_columns([text_col]),
                                text_col=text_col, k=None)
                .sort(["tf", "token"], descending=[True, False])
                .limit(vocab_size).to_pandas())
    import ray
    vocab_ref = ray.put(frozenset(vocab_df["token"].tolist()))

    def score(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        flat, parents, dl = _token_lists(t.column(text_col))
        n = t.num_rows
        oov = np.zeros(n, dtype=np.int64)
        if len(parents):
            toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                              dtype=object)
            miss = ~pd.Series(toks).isin(vocab).to_numpy()
            np.add.at(oov, parents[miss], 1)
        # guarded divide (np.where would still evaluate 0/0 and warn)
        rate = np.zeros(n, dtype=np.float64)
        np.divide(oov.astype(np.float64), dl.astype(np.float64),
                  out=rate, where=dl > 0)
        return pa.table({
            id_col: t.column(id_col),
            "n_tokens": pa.array(dl, pa.int64()),
            "n_oov": pa.array(oov, pa.int64()),
            "oov_rate": pa.array(rate, pa.float64())})

    return (docs.select_columns([id_col, text_col])
                .map_batches(score, batch_format="pyarrow"))


def tfidf_top_terms(docs: Dataset, k: int = 3, id_col: str = "doc_id",
                    text_col: str = "text") -> Dataset:
    """Per-document top-``k`` TF-IDF terms — keyword extraction, the
    retrieval-era summarization primitive (and the feature a
    distinctive-vocabulary router keys on).  Differs from
    ``distinctive_term_docs`` (rarest-term argmax): this ranks by the
    actual ``tf·idf`` product and returns ``k`` rows per doc.

    Exactness contract: idf is quantized ONCE per token on the driver
    — ``idf_e9 = floor((ln(N+1) - ln(df+1))·1e9 + 0.5)`` (the DSIR
    discipline) — so scores are exact int64 products ``tf * idf_e9``
    and the per-doc top-k tie-break (score DESC, term ASC) is
    deterministic; the DuckDB oracle gates hash-exactly.

    Dataflow: one token fold
    (:func:`kgforge.stages.relational.doc_frequencies`) → the
    token→idf map broadcast via ``ray.put`` (corpus-vocabulary-sized;
    at web scale keep the df table as a Dataset and score through a
    token-bucket join instead) → one scoring scan emitting k rows per
    doc.  Output: ``(id_col, term, tf, score_e9)``."""
    from .relational import doc_frequencies
    n_docs = docs.count()
    df_tab = (doc_frequencies(docs.select_columns([text_col]),
                              text_col=text_col, k=None).to_pandas())
    idf = {
        t: math.floor((math.log(float(n_docs + 1))
                       - math.log(float(d + 1))) * 1e9 + 0.5)
        for t, d in zip(df_tab["token"], df_tab["df"])}
    import ray
    idf_ref = ray.put(idf)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "score_e9": pa.array([], pa.int64())})

    def score(t: pa.Table) -> pa.Table:
        m = ray.get(idf_ref)
        flat, parents, _dl = _token_lists(t.column(text_col))
        if len(parents) == 0:
            return empty
        toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                          dtype=object)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        d = (pd.DataFrame({"r": parents, "term": toks})
             .groupby(["r", "term"], as_index=False).size()
             .rename(columns={"size": "tf"}))
        d["score_e9"] = (d["tf"].to_numpy(np.int64)
                         * d["term"].map(m).to_numpy(np.int64))
        d = d.sort_values(["r", "score_e9", "term"],
                          ascending=[True, False, True],
                          kind="mergesort")
        d = d.groupby("r", sort=False).head(k)
        return pa.table({
            id_col: pa.array(ids[d["r"].to_numpy()], pa.int64()),
            "term": pa.array(d["term"].to_numpy(object), pa.string()),
            "tf": pa.array(d["tf"].to_numpy(np.int64), pa.int64()),
            "score_e9": pa.array(d["score_e9"].to_numpy(np.int64),
                                 pa.int64())})

    return (docs.select_columns([id_col, text_col])
                .map_batches(score, batch_format="pyarrow"))


def inverted_index(docs: Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   n_buckets: int = 16) -> Dataset:
    """Full-corpus inverted index (postings-list construction — the
    retrieval-serving primitive BM25 implies but never materializes):
    ``(token, df, postings)`` with postings = comma-joined doc ids in
    ascending numeric order.

    Shape: the per-batch combiner emits DISTINCT ``(token, doc_id)``
    pairs (a doc lives in exactly one batch, so per-batch distinct IS
    global distinct — same argument as the web link edge build); ONE
    token-bucketed exchange moves only the pair rows (text never
    shuffles); the per-bucket fold concatenates, sorts and joins each
    token's ids.  At 10^12-doc scale a stop-word's posting list no
    longer fits one row — shard it into fixed-size posting BLOCKS
    ``(token, block_no, postings)`` by emitting ``doc_id //
    block_size`` as part of the fold key (layout documented, not
    needed at gate scale).

    No reference counterpart (the reference queries FalkorDB/Cypher,
    ``graphrag_sdk/kg.py``); net-new retrieval-infrastructure op."""

    from .joins import str_bucket

    def pairs(t: pa.Table) -> pa.Table:
        flat, parents, _dl = _token_lists(t.column(text_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)[parents]
        # arrow-native distinct FIRST; only the deduped pair set ever
        # leaves Arrow (str_bucket needs objects, but on far fewer rows)
        dedup = pa.table({
            "token": flat,
            "doc_id": pa.array(ids, pa.int64())}).group_by(
            ["token", "doc_id"]).aggregate([])
        tok = dedup.column("token").to_pandas()
        return pa.table({
            "token": dedup.column("token"),
            "doc_id": dedup.column("doc_id"),
            "_bucket": pa.array(str_bucket(tok, n_buckets),
                                pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "token" not in g.columns:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64()),
                             "postings": pa.array([], pa.string())})
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        gg = g.groupby("token", as_index=False).agg(
            df=("doc_id", "size"),
            postings=("doc_id",
                      lambda s: ",".join(str(i) for i in s)))
        return pa.table({
            "token": pa.array(gg["token"], pa.string()),
            "df": pa.array(gg["df"].to_numpy(np.int64), pa.int64()),
            "postings": pa.array(gg["postings"], pa.string())})

    return (docs.map_batches(pairs, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(fold, batch_format="pandas"))


def token_count_of_counts(docs: Dataset, text_col: str = "text",
                          n_buckets: int = 16) -> Dataset:
    """Good-Turing frequency spectrum over the corpus vocabulary:
    ``(freq, n_tokens)`` = how many distinct tokens occur exactly
    ``freq`` times (the count-of-counts table Kneser-Ney / Good-Turing
    LM smoothing estimates discounts from).

    Shape: per-batch ``value_counts`` combiner → ONE token-bucketed
    exchange of (token, n) partials (text never shuffles) → per-bucket
    fold sums each token's total and immediately collapses to
    (freq, n_tokens) partials — output leaving the fold is
    spectrum-sized, not vocabulary-sized — → a final fold over the
    tiny spectrum.  At 10^12 docs the spectrum has O(thousands) of
    distinct frequencies; everything after the first exchange is
    negligible.

    No reference counterpart (the reference holds no corpus
    statistics, ``graphrag_sdk/steps/extract_data_step.py``);
    net-new LM-training-support operator."""
    from .joins import str_bucket

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _token_lists(t.column(text_col))
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "_bucket": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        tokens = vc.field("values").cast(pa.string())
        return pa.table({
            "token": tokens,
            "n": vc.field("counts").cast(pa.int64()),
            "_bucket": pa.array(str_bucket(tokens.to_pandas(), n_buckets),
                                pa.int64())})

    def bucket_fold(g: pd.DataFrame) -> pa.Table:
        """Token totals for this vocabulary shard, collapsed straight
        to the shard's frequency spectrum (spectrum-sized output)."""
        if len(g) == 0 or "token" not in g.columns:
            return pa.table({"freq": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "_fb": pa.array([], pa.int64())})
        tot = g.groupby("token", sort=False)["n"].sum()
        freq, cnt = np.unique(tot.to_numpy(np.int64), return_counts=True)
        return pa.table({
            "freq": pa.array(freq, pa.int64()),
            "n_tokens": pa.array(cnt.astype(np.int64), pa.int64()),
            "_fb": pa.array(freq & 7, pa.int64())})

    def final_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "freq" not in g.columns:
            return pa.table({"freq": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        gg = g.groupby("freq", as_index=False)["n_tokens"].sum()
        return pa.table({
            "freq": pa.array(gg["freq"].to_numpy(np.int64), pa.int64()),
            "n_tokens": pa.array(gg["n_tokens"].to_numpy(np.int64),
                                 pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(bucket_fold, batch_format="pandas")
                .groupby("_fb")
                .map_groups(final_fold, batch_format="pandas"))


def bpe_pair_counts(docs: Dataset, text_col: str = "text",
                    max_word_len: int = 256,
                    n_buckets: int = 16) -> Dataset:
    """Adjacent-character-pair statistics weighted by word frequency —
    the first merge-selection iteration of BPE tokenizer training
    (Sennrich et al. 2016): ``(pair, n_occurrences)`` where ``pair``
    is a 2-codepoint substring of a whitespace token and the count
    weights each word by its corpus frequency.

    Shape: per-batch word ``value_counts`` combiner, then the pair
    expansion runs over the batch's UNIQUE words only — one vectorized
    ``utf8_slice_codeunits`` per character offset (codepoint semantics,
    = DuckDB ``substr``), masked by word length; an in-batch pair
    combiner bounds what rides the ONE pair-bucketed exchange to the
    batch's pair vocabulary.  ``max_word_len`` truncates pathological
    tokens (URLs, base64 blobs) BEFORE counting so the offset loop is
    bounded — mirrored by ``substr(w, 1, 256)`` in the oracle.

    No reference counterpart (the reference delegates tokenization to
    the LLM); net-new tokenizer-training operator."""
    from .joins import str_bucket

    empty = pa.table({"pair": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "_bucket": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        flat, _, _ = _token_lists(t.column(text_col))
        if len(flat) == 0:
            return empty
        flat = pc.utf8_slice_codeunits(flat, 0, max_word_len)
        vc = pc.value_counts(flat)
        words = vc.field("values").cast(pa.string())
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(words).to_numpy(zero_copy_only=False)
        max_len = int(lens.max())
        pair_chunks, cnt_chunks = [], []
        for i in range(max_len - 1):
            mask = pa.array(lens >= i + 2)
            pair_chunks.append(
                pc.filter(pc.utf8_slice_codeunits(words, i, i + 2), mask))
            cnt_chunks.append(counts[lens >= i + 2])
        if not pair_chunks:
            return empty
        pairs = pa.concat_arrays(
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
             for c in pair_chunks])
        ns = pa.array(np.concatenate(cnt_chunks).astype(np.int64),
                      pa.int64())
        comb = pa.table({"pair": pairs, "n": ns}).group_by(
            "pair").aggregate([("n", "sum")])
        pcol = comb.column("pair").cast(pa.string())
        return pa.table({
            "pair": pcol,
            "n": comb.column("n_sum").cast(pa.int64()),
            "_bucket": pa.array(str_bucket(pcol.to_pandas(), n_buckets),
                                pa.int64())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "pair" not in g.columns:
            return pa.table({"pair": pa.array([], pa.string()),
                             "n_occurrences": pa.array([], pa.int64())})
        gg = g.groupby("pair", as_index=False)["n"].sum()
        return pa.table({
            "pair": pa.array(gg["pair"], pa.string()),
            "n_occurrences": pa.array(gg["n"].to_numpy(np.int64),
                                      pa.int64())})

    return (docs.map_batches(partial, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(fold, batch_format="pandas"))


def bigram_surprisal(docs: Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     dim: int = 256) -> Dataset:
    """Per-document BIGRAM-LM conditional surprisal — the CCNet-style
    "perplexity filter" one rung above :func:`unigram_surprisal`:
    fit a hashed bigram LM on the corpus itself (token buckets
    ``md5 % dim``, transition cells ``pb*dim + cb``, add-1 smoothing
    against the ``dim``-way next-bucket fan-out), then score each doc
    by the total conditional negative log-likelihood of its
    transitions.  Fluent/templated text scores LOW, disfluent or
    shuffled text HIGH — this separates word-salad from prose where
    the unigram score cannot.

    Exactness contract (the DSIR discipline): each transition cell's
    surprisal ``w = floor((ln(ctx + dim) - ln(c + 1)) * 1e9 + 0.5)``
    (``ctx`` = total transitions leaving the cell's prev-bucket) is
    quantized ONCE on the driver, so doc scores are order-free INTEGER
    sums and the DuckDB oracle matches hash-exactly.

    Dataflow: the BM25 two-scan shape — pass 1 folds per-batch
    transition ``bincount`` partials (nonzero cells only) into one
    driver-side ``dim²`` vector (512 KB at dim=256 — broadcast, not
    shuffled); pass 2 re-tokenizes and emits one ``(id, n_bigrams,
    bigram_surprisal_e9)`` row per document.  Text never shuffles."""
    dim2 = dim * dim

    def _transitions(col):
        flat, parents, dl = _token_lists(col)
        toks = np.asarray(flat.to_numpy(zero_copy_only=False),
                          dtype=object)
        if len(toks) < 2:
            return (np.array([], np.int64), np.array([], np.int64), dl)
        dims = _md5_dims(toks, dim)
        adj = parents[1:] == parents[:-1]
        cells = dims[:-1][adj] * dim + dims[1:][adj]
        return cells, parents[1:][adj], dl

    def count_partial(t: pa.Table) -> pa.Table:
        cells, _, _ = _transitions(t.column(text_col))
        if len(cells) == 0:
            return pa.table({"cell": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        uniq, counts = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(counts.astype(np.int64))})

    partials = (docs.select_columns([text_col])
                    .map_batches(count_partial, batch_format="pyarrow")
                    .to_pandas())
    agg = partials.groupby("cell")["c"].sum()
    c_big = np.zeros(dim2, dtype=np.int64)
    c_big[agg.index.to_numpy()] = agg.to_numpy()
    ctx = c_big.reshape(dim, dim).sum(axis=1)
    # quantized per-cell conditional surprisal, op-for-op the oracle:
    # ln(ctx[pb] + dim) - ln(c + 1), then floor(x*1e9 + .5)
    w = np.array(
        [math.floor((math.log(float(ctx[cell // dim] + dim))
                     - math.log(float(c_big[cell] + 1))) * 1e9 + 0.5)
         for cell in range(dim2)], dtype=np.int64)

    import ray
    w_ref = ray.put(w)

    def score_partial(t: pa.Table) -> pa.Table:
        wv = ray.get(w_ref)
        cells, cell_parents, dl = _transitions(t.column(text_col))
        score = np.zeros(t.num_rows, dtype=np.int64)
        if len(cells):
            np.add.at(score, cell_parents, wv[cells])
        return pa.table({
            id_col: t.column(id_col),
            "n_bigrams": pa.array(np.maximum(dl - 1, 0), pa.int64()),
            "bigram_surprisal_e9": pa.array(score, pa.int64())})

    return (docs.select_columns([id_col, text_col])
                .map_batches(score_partial, batch_format="pyarrow"))


def token_zipf_slope(docs: Dataset, text_col: str = "text",
                     k: int = 100) -> Dataset:
    """Zipf-law fit of the corpus token spectrum: OLS slope of
    ``ln(frequency)`` against ``ln(rank)`` over the top-``k`` tokens —
    the one-number corpus-health signal (natural language ≈ −1;
    templated/boilerplate corpora flatten toward 0, token-salad
    steepens).

    EXACT: ranks and counts are integers from the
    ``token_frequencies`` fold (deterministic ``(n DESC, token)``
    order); both axes are quantized ``q(x) = floor(ln(x)·1e9 + 0.5)``
    ONCE on the driver, so the OLS moments are exact big-int sums and
    ``slope`` is ONE mirrored IEEE division.  Output is a single row
    (k, slope) — the reduction after the one token-bucket exchange
    ``token_frequencies`` already pays."""
    import math

    import ray

    from .relational import token_frequencies

    top = token_frequencies(docs, text_col=text_col, k=k).to_pandas()
    kk = len(top)
    if kk < 2:
        return ray.data.from_arrow(pa.table({
            "k": pa.array([kk], pa.int64()),
            "slope": pa.array([0.0], pa.float64())}))

    def q(x: float) -> int:
        return math.floor(math.log(x) * 1e9 + 0.5)

    xs = [q(float(i)) for i in range(1, kk + 1)]
    ys = [q(float(n)) for n in top["n"].tolist()]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    den = kk * sxx - sx * sx
    slope = float(kk * sxy - sx * sy) / float(den) if den else 0.0
    return ray.data.from_arrow(pa.table({
        "k": pa.array([kk], pa.int64()),
        "slope": pa.array([slope], pa.float64())}))
