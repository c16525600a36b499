"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a benchmark (held-out test-set) document — the standard
training-data hygiene pass (GPT-3-appendix-C-style n-gram overlap).

Scale shape: the two sides are wildly asymmetric.  The benchmark side
is SMALL (test sets are thousands of documents, not billions), so its
distinct n-gram set is collected once on the driver and broadcast via
``ray.put``; the 100-TB corpus side then streams through ONE
``map_batches`` pass that probes the broadcast set per batch
(C-level hash probes via ``pandas.Series.isin``) — zero shuffle, zero
materialization of the big side.  Driver/broadcast bound: the benchmark
gram vocabulary only (a 10k-doc benchmark is a few hundred MB of grams
at worst).  If the "benchmark" ever outgrew a broadcast, the fallback
is the inverted gram-hash join already used by
``dedup.ngram_jaccard_pairs`` (ship ``(gram_hash, id)`` postings,
pair-count in-bucket).

The reference has no decontamination operator; this extends the
SURVEY.md §2 training-data family (same rationale as the dedup suite).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .joins import _broadcast_cache

_WS_PATTERN = "[ \t\n\f\r]"  # RE2 '\S' complement — matches the oracle


def _batch_ngrams(col, n: int) -> tuple[np.ndarray, list[str]]:
    """Per-row DISTINCT word n-grams of a string column: returns
    ``(row_index, gram)`` parallel arrays.  Tokenization is the RE2
    ``\\S+`` semantics shared by every text operator in this repo."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(col, ""),
                                   pattern=_WS_PATTERN + "+")
    rows: list[int] = []
    grams: list[str] = []
    for r, toks in enumerate(lists.to_pylist()):
        toks = [tk for tk in toks if tk]
        if len(toks) < n:
            continue
        seen = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        rows.extend([r] * len(seen))
        grams.extend(seen)
    return np.asarray(rows, dtype=np.int64), grams


def benchmark_ngram_set(bench: Dataset, text_col: str = "text",
                        n: int = 5) -> frozenset:
    """Distinct word n-grams of the (small) benchmark side, collected
    on the driver.  Streams batch-by-batch — never materializes the
    dataset — and the result is bounded by the benchmark vocabulary."""
    out: set[str] = set()
    for t in bench.select_columns([text_col]).iter_batches(
            batch_size=4096, batch_format="pyarrow"):
        _, grams = _batch_ngrams(t.column(text_col), n)
        out.update(grams)
    return frozenset(out)


def flag_contaminated(corpus: Dataset, bench_grams: frozenset,
                      id_col: str = "doc_id", text_col: str = "text",
                      n: int = 5) -> Dataset:
    """Tag every corpus document with its count of DISTINCT n-grams that
    appear in the benchmark set (``n_hits``) and the boolean
    ``contaminated`` flag — APPENDED to the input columns so the stage
    composes into longer curation chains.  One streaming pass; the gram
    set rides a single ``ray.put`` broadcast resolved once per worker
    process."""
    ref = ray.put(bench_grams)

    def flag(t: pa.Table) -> pa.Table:
        grams_set = _broadcast_cache(ref)
        rows, grams = _batch_ngrams(t.column(text_col), n)
        hits = np.zeros(len(t), dtype=np.int64)
        if len(grams):
            mask = pd.Series(grams, dtype=object).isin(grams_set).to_numpy()
            np.add.at(hits, rows[mask], 1)
        t = t.append_column("n_hits", pa.array(hits, pa.int64()))
        return t.append_column("contaminated", pa.array(hits > 0,
                                                        pa.bool_()))

    return corpus.map_batches(flag, batch_format="pyarrow")
