"""Deduplication operators for web-scale training-data curation.

Scale shape (round-2 re-plumb): signatures are computed ONCE per doc and
kept in a narrow side table; the LSH band shuffle ships only
``(id, band_id, band_hash)`` rows (~20 B/doc/band — round 1 shipped the
full signature in every band row, an O(bands × sig_bytes) exchange);
candidate pairs come out of the band groupby, get deduplicated, and only
THEN are signatures/shingle-sets/vectors joined back for the candidate
ids.  All in-bucket work is vectorized (numpy matrices), never
``iterrows``/``combinations``.

- ``exact_dedup``: content-hash groupby, keep smallest id (deterministic).
- ``minhash_lsh_pairs``: word-shingle minhash, banded LSH candidates,
  signature-estimated Jaccard verification.
- ``simhash_pairs``: 64-bit simhash, 16-bit band blocking (pigeonhole-
  complete for Hamming<=3), vectorized Hamming verification.  The 8-byte
  simhash rides the band shuffle directly (4 bands × 8 B is already
  candidate-shaped — no join needed).
- ``ngram_jaccard_pairs``: EXACT n-gram Jaccard; candidates from a
  shared-shingle inverted index (complete for any threshold > 0), with
  an optional hot-shingle document-frequency cutoff for corpora where
  stop-shingles would blow up the candidate set.
- ``embedding_pairs``: random-hyperplane LSH candidates over an
  embedding column, exact-cosine verification on joined unit vectors.
- ``embedding_pairs_exact``: exact all-pairs cosine via a broadcast
  matrix — the oracle baseline (bounded by matrix-in-memory; the LSH
  path is the 100-TB route).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..functions import hashing as H
from .ann import vectors_to_matrix

N_COARSE_BUCKETS = 64


def _coarse_bucket(tbl: pa.Table, key_col: str,
                   n: int = N_COARSE_BUCKETS) -> pa.Table:
    """Coarse shuffle key over an exact LSH key: the groupby moves data by
    bucket (O(n) groups, sized to the cluster), and the exact-key pairing
    runs vectorized inside each bucket — per-tiny-group ``map_groups``
    scheduling is the scale killer this avoids."""
    col = tbl.column(key_col).cast(pa.uint64())
    bucket = pc.bit_wise_and(col, pa.scalar(n - 1, pa.uint64()))
    return tbl.append_column("bucket", bucket.cast(pa.int64()))


def _pairs_df(ids_a: np.ndarray, ids_b: np.ndarray,
              extra: dict | None = None) -> pd.DataFrame:
    out = pd.DataFrame({"id_a": ids_a.astype(np.int64),
                        "id_b": ids_b.astype(np.int64)})
    for name, vals in (extra or {}).items():
        out[name] = vals
    return out


def _emit_bucket_pairs(group: pd.DataFrame, id_col: str,
                       key_cols: list[str],
                       max_group: int | None = None) -> pd.DataFrame:
    """All C(m,2) id pairs within each exact LSH bucket of the coarse
    group, vectorized (sorted ids, ``np.triu_indices``).  Only buckets
    with >= 2 members are visited (the Python group loop over the long
    singleton tail was the round-1 hot spot); pairs are deduped within
    the coarse group, with residual cross-band duplicates collapsing in
    the verification bucket."""
    dup = group.duplicated(subset=key_cols, keep=False)
    group = group[dup]
    out_a, out_b = [], []
    for _, sub in group.groupby(key_cols, sort=False):
        ids = np.unique(sub[id_col].to_numpy())
        m = len(ids)
        if m < 2 or (max_group is not None and m > max_group):
            continue
        ia, ib = np.triu_indices(m, k=1)
        out_a.append(ids[ia])
        out_b.append(ids[ib])
    if not out_a:
        return _pairs_df(np.empty(0, np.int64), np.empty(0, np.int64))
    pairs = _pairs_df(np.concatenate(out_a), np.concatenate(out_b))
    return pairs.drop_duplicates(subset=["id_a", "id_b"])


def _empty_pairs(metric_col: str, metric_type: pa.DataType) -> Dataset:
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        metric_col: pa.array([], metric_type)}))


def _pbucket_of(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + b.astype(np.uint64)) % np.uint64(N_COARSE_BUCKETS)
    return h.astype(np.int64)


def _join_pair_payloads(cands: Dataset, payloads: Dataset, id_col: str,
                        payload_col: str,
                        max_driver_pairs: int = 5_000_000) -> Dataset | None:
    """Candidate pairs × per-doc payload table → two rows per pair, each
    carrying one side's payload — the candidate-first core: the heavy
    payload (signature / shingle set / vector) only ever moves for ids
    that actually appear in a candidate pair.

    Fast path: the (globally deduplicated) candidate pairs are streamed
    to the driver — bounded by the near-duplicate count, ≪ corpus by the
    premise of dedup — and broadcast as an id → pairs map; one
    ``map_batches`` over the payload table then emits each candidate
    payload replicated to its pairs' verification buckets.  ONE shuffle
    (the verify groupby) after candidate emission.

    Above ``max_driver_pairs`` the pairs stay distributed: exploded pair
    sides and ``pc.is_in``-filtered payloads are co-located by a
    tag-union bucket groupby instead (two shuffles).  ``Dataset.join``
    is deliberately avoided on this path: its hash aggregator builds
    schema-less empty partitions for sparse keys (ray 2.49
    join.py:106-118 finalize) and sparse is the normal case here.

    Returns ``None`` when there are no candidates."""
    cands = cands.materialize()
    chunks_a, chunks_b = [], []
    total = 0
    overflow = False
    for t in cands.iter_batches(batch_size=65536, batch_format="pyarrow"):
        chunks_a.append(t.column("id_a").to_numpy(zero_copy_only=False))
        chunks_b.append(t.column("id_b").to_numpy(zero_copy_only=False))
        total += t.num_rows
        if total > max_driver_pairs:
            overflow = True
            break
    if overflow:
        return _join_pair_payloads_shuffle(cands, payloads, id_col,
                                           payload_col)
    if total == 0:
        return None
    pairs = np.unique(np.stack([np.concatenate(chunks_a),
                                np.concatenate(chunks_b)], axis=1), axis=0)
    pair_map: dict[int, list] = {}
    buckets = _pbucket_of(pairs[:, 0], pairs[:, 1])
    for (a, b), pb in zip(pairs.tolist(), buckets.tolist()):
        pair_map.setdefault(a, []).append((a, b, pb))
        pair_map.setdefault(b, []).append((a, b, pb))
    ref = ray.put(pair_map)
    idref = ray.put(pa.array(np.unique(pairs), pa.int64()))

    def replicate(t: pa.Table) -> pa.Table:
        from .joins import _broadcast_cache, _broadcast_value_array
        # vectorized prefilter: the Python replication loop below only
        # ever sees candidate ids, not the whole corpus
        arr = _broadcast_value_array(idref)
        t = t.filter(pc.fill_null(pc.is_in(t.column(id_col),
                                           value_set=arr), False))
        pm = _broadcast_cache(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        pays = t.column(payload_col).to_pylist()
        jid_o, a_o, b_o, pb_o, pay_o = [], [], [], [], []
        for i, pay in zip(ids, pays):
            for a, b, pb in pm.get(int(i), ()):
                jid_o.append(int(i))
                a_o.append(a)
                b_o.append(b)
                pb_o.append(pb)
                pay_o.append(pay)
        return pa.table({
            "jid": pa.array(jid_o, pa.int64()),
            "id_a": pa.array(a_o, pa.int64()),
            "id_b": pa.array(b_o, pa.int64()),
            "payload": pa.array(pay_o, pa.binary()),
            "pbucket": pa.array(pb_o, pa.int64())})

    return payloads.map_batches(replicate, batch_format="pyarrow")


def _join_pair_payloads_shuffle(cands: Dataset, payloads: Dataset,
                                id_col: str, payload_col: str) -> Dataset:
    """Distributed co-location fallback (see ``_join_pair_payloads``)."""

    def payload_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        # 0-filled (NOT null) id slots: nulls would make pandas promote
        # the id columns to float64 in the attach map_groups, silently
        # corrupting 64-bit ids above 2^53
        zero = pa.array([0] * n, pa.int64())
        return pa.table({
            "jid": t.column(id_col).cast(pa.int64()),
            "id_a": zero,
            "id_b": zero,
            "payload": t.column(payload_col),
            "is_payload": pa.array([True] * n, pa.bool_())})

    def side_rows(t: pa.Table) -> pa.Table:
        a, b = t.column("id_a").cast(pa.int64()), t.column("id_b").cast(
            pa.int64())
        parts = []
        for jid in (a, b):
            n = len(jid)
            parts.append(pa.table({
                "jid": jid, "id_a": a, "id_b": b,
                "payload": pa.nulls(n, pa.binary()),
                "is_payload": pa.array([False] * n, pa.bool_())}))
        return pa.concat_tables(parts)

    tagged = (payloads.map_batches(payload_rows, batch_format="pyarrow")
              .union(cands.map_batches(side_rows, batch_format="pyarrow")))

    def id_bucket(t: pa.Table) -> pa.Table:
        j = t.column("jid").cast(pa.uint64())
        bucket = pc.bit_wise_and(j, pa.scalar(N_COARSE_BUCKETS - 1,
                                              pa.uint64()))
        return t.append_column("bucket", bucket.cast(pa.int64()))

    def attach(group: pd.DataFrame) -> pd.DataFrame:
        pay = group[group["is_payload"]]
        pay = pay.drop_duplicates(subset=["jid"]).set_index("jid")["payload"]
        sides = group[~group["is_payload"]]
        out = pd.DataFrame({
            "jid": sides["jid"].astype(np.int64),
            "id_a": sides["id_a"].astype(np.int64),
            "id_b": sides["id_b"].astype(np.int64),
            "payload": sides["jid"].map(pay)})
        # a candidate id can miss its payload only if the payload table
        # skipped the doc (e.g. empty shingle set) — drop those pairs
        return out[out["payload"].notna()]

    def pair_bucket(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return t.append_column("pbucket",
                               pa.array(_pbucket_of(a, b), pa.int64()))

    return (tagged.map_batches(id_bucket, batch_format="pyarrow")
                  .groupby("bucket")
                  .map_groups(attach, batch_format="pandas")
                  .map_batches(pair_bucket, batch_format="pyarrow"))


def _paired_payloads(group: pd.DataFrame, payload_col: str = "payload"):
    """Sort a verification bucket so each candidate pair is two adjacent
    rows (id_a side first), and split the payload column into the A and B
    row sequences.  Duplicate pair emissions (the same pair surfacing
    from several LSH bands — deduplicating them here, where the pair's
    rows are already co-located, saves a dedicated global pair-dedup
    shuffle) collapse via drop_duplicates; pairs with only one surviving
    side (payload-less partner dropped upstream) are discarded."""
    g = group.sort_values(["id_a", "id_b", "jid"], kind="mergesort")
    g = g.drop_duplicates(subset=["id_a", "id_b", "jid"])
    counts = g.groupby(["id_a", "id_b"], sort=False)["jid"].transform("size")
    g = g[counts == 2]
    pay = g[payload_col].to_numpy()
    ids_a = g["id_a"].to_numpy()[0::2]
    ids_b = g["id_b"].to_numpy()[0::2]
    return pay[0::2], pay[1::2], ids_a, ids_b


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(ds: Dataset, id_col: str = "doc_id",
                text_col: str = "text", keep_text: bool = True,
                keep_hash: bool = False,
                oracle_mode: bool = True) -> Dataset:
    """One row per distinct text: the smallest id wins (deterministic),
    plus the duplicate count.  Shuffle key = hash(text) — uniform even
    when text lengths are skewed.

    ``keep_text=False`` is the 100-TB mode: only ``(id, text_hash)``
    rides the shuffle (~40 B/row instead of the document body) and the
    output is ``(doc_id, n_dups, text_hash)`` — re-join text for the
    kept ids afterwards.  ``keep_text=True`` ships the text because the
    output contract includes it (the sf-scale oracle compares text).
    ``keep_hash=True`` additionally keeps ``text_hash`` alongside the
    text so downstream consumers (e.g. content-hash sharding in
    ``run_curation_job.py``) don't re-hash the corpus.

    ``oracle_mode=True`` (gate default) hashes with per-row md5 so the
    DuckDB oracle can re-derive ``text_hash``; production passes
    ``False`` for the vectorized siphash64 path
    (:func:`kgforge.functions.hashing.fast_text_hash64` — a ~1 µs/row
    hashlib loop is real money at 10^12 docs); fast-mode ``text_hash``
    is uint64, same winners/counts (pinned in pytest)."""
    payload = [text_col] if keep_text else []

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if oracle_mode:
            hashes = [H.text_md5(t or "") for t in texts.to_pylist()]
            harr = pa.array(hashes, pa.string())
            buckets = pa.array([int(h[:8], 16) % 64 for h in hashes],
                               pa.int64())
        else:
            h64 = H.fast_text_hash64(texts.to_pylist())
            harr = pa.array(h64, pa.uint64())
            buckets = pa.array((h64 % np.uint64(64)).astype(np.int64),
                               pa.int64())
        out = batch.select([id_col] + payload).append_column(
            "text_hash", harr)
        return out.append_column("bucket", buckets)

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        # one call per coarse bucket; the per-key fold is a vectorized
        # pandas groupby inside (per-tiny-group map_groups overhead is the
        # scale killer — see canonicalize.py bucketing rationale)
        aggs = {id_col: (id_col, "min"), "n_dups": (id_col, "size")}
        for c in payload:
            aggs[c] = (c, "first")
        g = (group.sort_values(id_col)
                  .groupby("text_hash", as_index=False)
                  .agg(**aggs))
        g["n_dups"] = g["n_dups"].astype(np.int64)
        cols = [id_col, "n_dups"] + (payload if keep_text
                                     else ["text_hash"])
        if keep_text and keep_hash:
            cols = cols + ["text_hash"]
        return g[cols]

    out_cols = [id_col, "n_dups"] + (payload if keep_text
                                     else ["text_hash"])
    if keep_text and keep_hash:
        out_cols = out_cols + ["text_hash"]
    return (ds.map_batches(add_hash, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(keep_first, batch_format="pandas")
              .select_columns(out_cols))


# ---------------------------------------------------------------------------
# minhash + LSH (candidate-first)
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(ds: Dataset, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      n_bands: int = 16, shingle_n: int = 3,
                      threshold: float = 0.7, seed: int = 1234,
                      broadcast_sig_limit: int = 256 << 20) -> Dataset:
    """Near-duplicate pairs ``(id_a < id_b, est_jaccard)`` with
    signature-estimated Jaccard >= threshold.

    Two size-gated dataflows (same gate pattern as the semi-join in
    ``joins.py``):

    - **Broadcast fast path** (signature table ≤ ``broadcast_sig_limit``
      bytes, ~500k docs at the default k=64): the sorted ``(ids, sig
      matrix)`` pair is ``ray.put`` ONCE; each band bucket emits its
      candidate pairs and verifies them inline against the broadcast
      matrix — ONE shuffle total (band groupby) plus a tiny pair-dedup
      aggregate over verified pairs only.
    - **Candidate-first scale path** (beyond the gate): the band shuffle
      carries ``(id, band_id, band_hash)`` only; unique candidate pairs
      join the pinned signature table (``_join_pair_payloads``) and
      agreement is a stacked (pairs × k) numpy comparison.

    Both paths verify the same candidates with the same estimator, so
    the output pair set is identical."""
    a, b = H.minhash_params(num_hashes, seed)

    def sign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        sigs = [H.minhash_signature(H.shingle_hashes(t or "", shingle_n),
                                    a, b).tobytes() for t in texts]
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "sig": pa.array(sigs, pa.binary())})

    # signatures are consumed twice (band explode + verification):
    # materialize pins ~sig_bytes/doc, ~1% of corpus mass
    sigs = ds.map_batches(sign, batch_format="pyarrow").materialize()

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            tbl = pa.table({id_col: pa.array([], pa.int64()),
                            "band_id": pa.array([], pa.int32()),
                            "band_hash": pa.array([], pa.uint64())})
            return _coarse_bucket(tbl, "band_hash")
        mat = np.frombuffer(b"".join(batch.column("sig").to_pylist()),
                            dtype=np.uint64).reshape(n, num_hashes)
        bh = H.band_hash_matrix(mat, n_bands)        # (n, n_bands)
        tbl = pa.table({
            id_col: pa.array(np.repeat(ids.astype(np.int64), n_bands)),
            "band_id": pa.array(np.tile(np.arange(n_bands, dtype=np.int32),
                                        n)),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64())})
        return _coarse_bucket(tbl, "band_hash")

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    n_docs = sigs.count()                 # materialized → metadata only
    if n_docs * (num_hashes + 1) * 8 <= broadcast_sig_limit:
        ids_l, mats = [], []
        for t in sigs.iter_batches(batch_size=65536,
                                   batch_format="pyarrow"):
            if t.num_rows == 0:
                continue
            ids_l.append(t.column(id_col).to_numpy(zero_copy_only=False)
                         .astype(np.int64))
            mats.append(np.frombuffer(b"".join(t.column("sig").to_pylist()),
                                      dtype=np.uint64)
                        .reshape(t.num_rows, num_hashes))
        if not ids_l:
            return _empty_pairs("est_jaccard", pa.float64())
        all_ids = np.concatenate(ids_l)
        order = np.argsort(all_ids)
        ref = ray.put((all_ids[order], np.vstack(mats)[order]))

        def emit_verify(group: pd.DataFrame) -> pd.DataFrame:
            from .joins import _broadcast_cache
            empty = _pairs_df(np.empty(0, np.int64),
                              np.empty(0, np.int64),
                              {"est_jaccard": np.empty(0, np.float64)})
            pairs = _emit_bucket_pairs(group, id_col,
                                       ["band_id", "band_hash"])
            if not len(pairs):
                return empty
            keys, mat = _broadcast_cache(ref)
            ia = np.searchsorted(keys, pairs["id_a"].to_numpy())
            ib = np.searchsorted(keys, pairs["id_b"].to_numpy())
            est = (mat[ia] == mat[ib]).mean(axis=1)
            # band OWNERSHIP replaces a global pair-dedup exchange: with
            # both signatures in hand, every bucket recomputes which
            # band first matched for the pair; only the bucket owning
            # that band's hash emits it — each pair surfaces exactly
            # once globally with zero additional shuffle
            bh_a = H.band_hash_matrix(mat[ia], n_bands)
            bh_b = H.band_hash_matrix(mat[ib], n_bands)
            bands_eq = bh_a == bh_b                  # (pairs, n_bands)
            first = np.argmax(bands_eq, axis=1)
            own_hash = bh_a[np.arange(len(first)), first]
            own_bucket = (own_hash
                          % np.uint64(N_COARSE_BUCKETS)).astype(np.int64)
            bucket_val = int(group["bucket"].iloc[0])
            m = (est >= threshold) & bands_eq.any(axis=1) \
                & (own_bucket == bucket_val)
            return _pairs_df(pairs["id_a"].to_numpy()[m],
                             pairs["id_b"].to_numpy()[m],
                             {"est_jaccard": est[m].astype(np.float64)})

        return (exploded.groupby("bucket")
                .map_groups(emit_verify, batch_format="pandas"))

    cands = (exploded.groupby("bucket")
             .map_groups(lambda g: _emit_bucket_pairs(
                 g, id_col, ["band_id", "band_hash"]),
                 batch_format="pandas"))
    joined = _join_pair_payloads(cands, sigs, id_col, "sig")
    if joined is None:
        return _empty_pairs("est_jaccard", pa.float64())

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        pay_a, pay_b, ids_a, ids_b = _paired_payloads(group)
        if not len(ids_a):
            return _pairs_df(ids_a, ids_b,
                             {"est_jaccard": np.empty(0, np.float64)})
        mat_a = np.frombuffer(b"".join(pay_a), dtype=np.uint64).reshape(
            len(pay_a), num_hashes)
        mat_b = np.frombuffer(b"".join(pay_b), dtype=np.uint64).reshape(
            len(pay_b), num_hashes)
        est = (mat_a == mat_b).mean(axis=1)
        m = est >= threshold
        return _pairs_df(ids_a[m], ids_b[m],
                         {"est_jaccard": est[m].astype(np.float64)})

    return (joined.groupby("pbucket")
                  .map_groups(verify, batch_format="pandas"))


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_pairs(ds: Dataset, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> Dataset:
    """Near-duplicate pairs by 64-bit simhash: block on four 16-bit bands
    (any pair within Hamming<=3 shares at least one band by pigeonhole),
    verify Hamming distance vectorized within blocks.  The signature is
    8 bytes — it rides the band shuffle directly (no candidate join)."""

    def sign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        sigs = H.simhash64_batch(batch.column(text_col).to_pylist())
        n = len(ids)
        # 4 band rows per doc, fully vectorized
        band = np.tile(np.arange(4, dtype=np.uint64), n)
        rep_sig = np.repeat(sigs, 4)
        key = ((rep_sig >> (band * np.uint64(16)))
               & np.uint64(0xFFFF)).astype(np.int32)
        tbl = pa.Table.from_arrays(
            [pa.array(np.repeat(ids, 4), pa.int64()),
             pa.array(band.astype(np.int32), pa.int32()),
             pa.array(key, pa.int32()),
             pa.array(rep_sig, pa.uint64())],
            names=[id_col, "band_id", "band_key", "simhash"])
        return _coarse_bucket(tbl, "band_key")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, sub in group.groupby(["band_id", "band_key"], sort=False):
            if len(sub) < 2:
                continue
            uniq = sub.drop_duplicates(subset=[id_col]).sort_values(id_col)
            ids = uniq[id_col].to_numpy()
            sims = uniq["simhash"].to_numpy().astype(np.uint64)
            ia, ib = np.triu_indices(len(ids), k=1)
            x = sims[ia] ^ sims[ib]
            ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                                axis=1).sum(axis=1).astype(np.int64)
            m = ham <= max_hamming
            out_a.append(ids[ia[m]])
            out_b.append(ids[ib[m]])
            out_h.append(ham[m])
        if not out_a:
            return _pairs_df(np.empty(0, np.int64), np.empty(0, np.int64),
                             {"hamming": np.empty(0, np.int64)})
        return _pairs_df(np.concatenate(out_a), np.concatenate(out_b),
                         {"hamming": np.concatenate(out_h)})

    pairs = (ds.map_batches(sign, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(verify, batch_format="pandas"))
    return (pairs.groupby(["id_a", "id_b"])
                 .min("hamming")
                 .map_batches(lambda t: t.rename_columns(
                     ["id_a", "id_b", "hamming"]), batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# exact n-gram jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(ds: Dataset, id_col: str = "doc_id",
                        text_col: str = "text", shingle_n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = 1000,
                        metric: str = "jaccard") -> Dataset:
    """EXACT word-n-gram Jaccard >= threshold over all document pairs.

    ``metric="containment"`` switches the final ratio to
    ``I / min(|A|, |B|)`` (same candidate index, same exchanges) —
    containment catches SUBSET duplication (a short doc quoted whole
    inside a longer one, mirrors with extra boilerplate) that symmetric
    Jaccard dilutes toward 0; the output score column is named after
    the metric.

    Count-based exact algorithm (no shingle sets ever move, no per-pair
    set intersections): exact Jaccard is a pure function of the shared-
    shingle count and the two set sizes — ``J = I / (|A| + |B| - I)``.

    1. One pass computes each doc's shingle-set SIZE (one int/doc).
    2. The inverted index ships ``(shingle_hash, id)`` rows; within each
       coarse bucket, per-shingle postings emit pair rows which are
       partially COUNT-aggregated in the same ``map_groups`` call (the
       combiner) — so the only full-corpus exchange carries 24-byte rows.
    3. One small groupby sums the partial counts into exact ``I`` per
       pair; sizes are attached from a broadcast ``{id: |S|}`` map and
       the Jaccard filter is a vectorized expression.

    Recall is 1.0 by construction among pairs sharing a sub-cutoff
    shingle: any pair with J > 0 shares a shingle.  ``max_shingle_df``
    skips hotter-than-cutoff shingles at candidate time — a
    stop-shingle shared by 10^6 docs would otherwise emit O(df^2) pair
    rows in ONE bucket (the quadratic scale-killer this operator's own
    docstring predicts at 100 TB), so the guard DEFAULTS ON at 1000
    (pairs above a 0.5 threshold that ONLY share ultra-common shingles
    are vanishingly rare — documented approximation; each skip logs the
    shingle's df loudly).  Pass ``max_shingle_df=None`` to explicitly
    opt out (exact, unbounded).  The sizes broadcast is 8 B/doc; beyond
    ~10^9 docs swap it for a pair-bucket join.  Docs with an empty
    shingle set are skipped — empty-text duplicates belong to
    ``exact_dedup``."""

    def sizes_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_i, out_n = [], []
        for i, t in zip(ids, texts):
            n = H.shingle_hashes(t or "", shingle_n).size
            if n:
                out_i.append(i)
                out_n.append(n)
        return pa.table({id_col: pa.array(out_i, pa.int64()),
                         "n_shingles": pa.array(out_n, pa.int64())})

    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    size_map: dict[int, int] = {}
    for b in (ds.map_batches(sizes_batch, batch_format="pyarrow")
              .iter_batches(batch_size=65536, batch_format="pyarrow")):
        size_map.update(zip(b.column(id_col).to_pylist(),
                            b.column("n_shingles").to_pylist()))
    if not size_map:
        return _empty_pairs(metric, pa.float64())
    sref = ray.put(size_map)

    def explode_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        id_o, sh_o = [], []
        for i, t in zip(ids, texts):
            sh = H.shingle_hashes(t or "", shingle_n)
            id_o.extend([int(i)] * sh.size)
            sh_o.extend(sh.tolist())
        tbl = pa.table({id_col: pa.array(id_o, pa.int64()),
                        "sh": pa.array(sh_o, pa.uint64())})
        return _coarse_bucket(tbl, "sh")

    def partial_pair_counts(group: pd.DataFrame) -> pd.DataFrame:
        # per-shingle postings → pair emissions → in-bucket partial count
        # (the combiner: one row per pair per coarse bucket)
        dup = group.duplicated(subset=["sh"], keep=False)
        group = group[dup]
        out_a, out_b = [], []
        for sh, sub in group.groupby("sh", sort=False):
            ids = np.unique(sub[id_col].to_numpy())
            m = len(ids)
            if m < 2:
                continue
            if max_shingle_df is not None and m > max_shingle_df:
                import logging
                logging.getLogger(__name__).warning(
                    "ngram_jaccard_pairs: skipping stop-shingle %x with "
                    "df=%d > max_shingle_df=%d (would emit %d pair rows); "
                    "pass max_shingle_df=None to force exactness",
                    int(sh), m, max_shingle_df, m * (m - 1) // 2)
                continue
            ia, ib = np.triu_indices(m, k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame({"id_a": np.empty(0, np.int64),
                                 "id_b": np.empty(0, np.int64),
                                 "i_partial": np.empty(0, np.int64),
                                 "pbucket": np.empty(0, np.int64)})
        df = pd.DataFrame({"id_a": np.concatenate(out_a),
                           "id_b": np.concatenate(out_b)})
        g = df.groupby(["id_a", "id_b"], as_index=False).size()
        g = g.rename(columns={"size": "i_partial"})
        g["i_partial"] = g["i_partial"].astype(np.int64)
        # coarse bucket for the FINAL count fold: a per-(id_a,id_b)
        # Ray aggregate would pay per-tiny-group overhead for ~1M pairs
        g["pbucket"] = _pbucket_of(g["id_a"].to_numpy(),
                                   g["id_b"].to_numpy())
        return g

    def final_counts(group: pd.DataFrame) -> pd.DataFrame:
        from .joins import _broadcast_cache
        sizes = _broadcast_cache(sref)
        g = (group.groupby(["id_a", "id_b"], as_index=False)["i_partial"]
             .sum())
        a = g["id_a"].to_numpy()
        b = g["id_b"].to_numpy()
        inter = g["i_partial"].to_numpy().astype(np.float64)
        na = np.fromiter((sizes[i] for i in a), dtype=np.float64,
                         count=len(a))
        nb = np.fromiter((sizes[i] for i in b), dtype=np.float64,
                         count=len(b))
        if metric == "containment":
            score = inter / np.minimum(na, nb)
        else:
            score = inter / (na + nb - inter)
        m = score >= threshold
        return pd.DataFrame({"id_a": a[m].astype(np.int64),
                             "id_b": b[m].astype(np.int64),
                             metric: score[m].astype(np.float64)})

    return (ds.map_batches(explode_shingles, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(partial_pair_counts, batch_format="pandas")
              .groupby("pbucket")
              .map_groups(final_counts, batch_format="pandas"))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _unit_rows(batch: pa.Table, id_col: str, vec_col: str):
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    mat = vectors_to_matrix(batch, vec_col)
    if mat.size == 0:
        return ids[:0], mat
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return ids, mat / norms


def embedding_pairs(ds: Dataset, id_col: str = "vec_id",
                    vec_col: str = "embedding", threshold: float = 0.9,
                    n_planes: int = 12, seed: int = 7,
                    broadcast_vec_limit: int = 256 << 20) -> Dataset:
    """Cosine near-duplicate pairs over a ``list<float>`` column —
    the 100-TB LSH path (approximate recall; measured against
    ``embedding_pairs_exact`` in tests).

    Random-hyperplane LSH with one-bit multiprobe buckets candidate ids;
    the bucket shuffle ships ``(id, bucket)`` only (round 1 shipped the
    full unit vector in every probe row).  Size-gated like minhash: a
    unit matrix under ``broadcast_vec_limit`` bytes is ``ray.put`` once
    and candidates verify inline in the bucket groupby (ONE shuffle +
    tiny pair dedup); above the gate, unit vectors are joined back for
    candidate pairs (``_join_pair_payloads``) and verified in a second
    groupby.  12 planes keep random-vector collisions (and thus
    candidate volume) low while 1-bit multiprobe holds recall ~0.99+ for
    pairs above cosine 0.99 — measured against ``embedding_pairs_exact``
    in tests and reported for the planted testdata pairs in BENCH."""

    def unit(batch: pa.Table) -> pa.Table:
        ids, u = _unit_rows(batch, id_col, vec_col)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "vec": pa.array([r.tobytes() for r in u],
                                         pa.binary())})

    units = ds.map_batches(unit, batch_format="pyarrow").materialize()

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n = batch.num_rows
        if n == 0:
            tbl = pa.table({id_col: pa.array([], pa.int64()),
                            "code": pa.array([], pa.int64())})
            return _coarse_bucket(tbl, "code")
        mat = np.frombuffer(b"".join(batch.column("vec").to_pylist()),
                            dtype=np.float64).reshape(n, -1)
        d = mat.shape[1]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((d, n_planes))
        bits = (mat @ planes) > 0
        codes = (bits @ (1 << np.arange(n_planes))).astype(np.int64)
        # exact code + every 1-bit flip, fully vectorized (flips are
        # always distinct from the base code — no per-row set dedup)
        probes = np.concatenate(
            [codes[:, None],
             codes[:, None] ^ (1 << np.arange(n_planes))[None, :]],
            axis=1)
        tbl = pa.table({
            id_col: pa.array(np.repeat(ids.astype(np.int64),
                                       n_planes + 1)),
            "code": pa.array(probes.reshape(-1), pa.int64())})
        return _coarse_bucket(tbl, "code")

    exploded = units.map_batches(bucketize, batch_format="pyarrow")

    n_vecs = units.count()                # materialized → metadata only
    first = units.take(1) if n_vecs else []
    d = len(first[0]["vec"]) // 8 if first else 0
    if n_vecs and n_vecs * (d + 1) * 8 <= broadcast_vec_limit:
        ids_l, mats = [], []
        for t in units.iter_batches(batch_size=65536,
                                    batch_format="pyarrow"):
            if t.num_rows == 0:
                continue
            ids_l.append(t.column(id_col).to_numpy(zero_copy_only=False)
                         .astype(np.int64))
            mats.append(np.frombuffer(b"".join(t.column("vec").to_pylist()),
                                      dtype=np.float64)
                        .reshape(t.num_rows, -1))
        all_ids = np.concatenate(ids_l)
        order = np.argsort(all_ids)
        ref = ray.put((all_ids[order], np.vstack(mats)[order]))

        def emit_verify(group: pd.DataFrame) -> pd.DataFrame:
            from .joins import _broadcast_cache
            pairs = _emit_bucket_pairs(group, id_col, ["code"])
            if not len(pairs):
                return _pairs_df(np.empty(0, np.int64),
                                 np.empty(0, np.int64),
                                 {"cosine": np.empty(0, np.float64)})
            keys, mat = _broadcast_cache(ref)
            ia = np.searchsorted(keys, pairs["id_a"].to_numpy())
            ib = np.searchsorted(keys, pairs["id_b"].to_numpy())
            cos = np.einsum("ij,ij->i", mat[ia], mat[ib])
            m = cos >= threshold
            return _pairs_df(pairs["id_a"].to_numpy()[m],
                             pairs["id_b"].to_numpy()[m],
                             {"cosine": cos[m].astype(np.float64)})

        verified = (exploded.groupby("bucket")
                    .map_groups(emit_verify, batch_format="pandas"))
        return (verified.groupby(["id_a", "id_b"])
                .min("cosine")
                .map_batches(lambda t: t.rename_columns(
                    ["id_a", "id_b", "cosine"]), batch_format="pyarrow"))

    cands = (exploded.groupby("bucket")
             .map_groups(lambda g: _emit_bucket_pairs(g, id_col,
                                                      ["code"]),
                         batch_format="pandas"))
    joined = _join_pair_payloads(cands, units, id_col, "vec")
    if joined is None:
        return _empty_pairs("cosine", pa.float64())

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        pay_a, pay_b, ids_a, ids_b = _paired_payloads(group)
        if not len(ids_a):
            return _pairs_df(ids_a, ids_b,
                             {"cosine": np.empty(0, np.float64)})
        mat_a = np.vstack([np.frombuffer(v, np.float64) for v in pay_a])
        mat_b = np.vstack([np.frombuffer(v, np.float64) for v in pay_b])
        cos = np.einsum("ij,ij->i", mat_a, mat_b)
        m = cos >= threshold
        return _pairs_df(ids_a[m], ids_b[m], {"cosine": cos[m]})

    return (joined.groupby("pbucket")
                  .map_groups(verify, batch_format="pandas"))


def embedding_pairs_exact(ds: Dataset, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          threshold: float = 0.9) -> Dataset:
    """EXACT all-pairs cosine >= threshold.

    The full unit matrix is collected once on the driver (streamed,
    bounded: n × d × 8 bytes — ~5 GB at 10M × 64-dim; beyond that use
    ``embedding_pairs``) and broadcast; each block then computes
    block × corpus similarities in one matmul and emits only its
    above-threshold pairs with ``id_a < id_b``.  No shuffle at all."""
    ids_all: list[np.ndarray] = []
    mats: list[np.ndarray] = []
    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        i, u = _unit_rows(batch, id_col, vec_col)
        if len(i):
            ids_all.append(i)
            mats.append(u)
    if not mats:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    all_ids = np.concatenate(ids_all)
    full = np.vstack(mats)
    ref = ray.put((all_ids, full))

    def block_pairs(batch: pa.Table) -> pa.Table:
        other_ids, other = ray.get(ref)
        ids, u = _unit_rows(batch, id_col, vec_col)
        if not len(ids):
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        sims = u @ other.T                      # (block, corpus)
        keep = sims >= threshold
        # id_a < id_b both orients the pair and kills self/dup matches
        keep &= ids[:, None] < other_ids[None, :]
        bi, oj = np.nonzero(keep)
        return pa.table({
            "id_a": pa.array(ids[bi], pa.int64()),
            "id_b": pa.array(other_ids[oj], pa.int64()),
            "cosine": pa.array(sims[bi, oj], pa.float64())})

    return ds.map_batches(block_pairs, batch_format="pyarrow")


def semantic_dedup(ds: Dataset, k: int = 8, n_iter: int = 3,
                   threshold: float = 0.95, id_col: str = "vec_id",
                   vec_col: str = "embedding", scale: int = 1_000_000,
                   n_buckets: int = 8) -> Dataset:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    space, then WITHIN each cluster drop every vector that has an
    earlier (smaller-id) cluster-mate with cosine >= ``threshold`` —
    the semantic near-duplicate pruning pass that bounds the pair
    explosion by cluster size instead of the corpus.

    Exactly SQL-oracle-able end to end: the cluster assignment is the
    deterministic integer k-means of
    :func:`kgforge.stages.ann.kmeans_assign_fixed` (same fit, same
    argmin tie-break) and the keep/drop rule is pure pair dominance
    (``kept[j] = not exists i<j in cluster with cos >= t``) over the
    same float64 unit-vector cosines the ``embedding_pairs_exact``
    oracle already matches bit-for-bit against DuckDB's
    ``list_cosine_similarity``.

    Scale shape: the (k, d) centroid matrix is the only broadcast
    state; one assignment pass emits (id, cluster, unit-vec) rows and
    ONE cluster-bucketed shuffle co-locates each cluster, where the
    all-pairs matmul is bounded by cluster size — pick k ~ corpus/5k
    so clusters stay matmul-sized (the SemDeDup paper's regime).

    Output: (id, cluster, kept) for EVERY input row.  No reference
    counterpart (net-new training-data op)."""
    from .ann import _assign_ids, _kmeans_fit

    _qds, cent = _kmeans_fit(ds, k=k, n_iter=n_iter, vec_col=vec_col,
                             id_col=id_col, scale=scale)

    empty_assign = pa.table({
        id_col: pa.array([], pa.int64()),
        "cluster": pa.array([], pa.int64()),
        "vec": pa.array([], pa.binary()),
        "bucket": pa.array([], pa.int64())})

    def assign_unit(batch: pa.Table, c=cent) -> pa.Table:
        ids, u = _unit_rows(batch, id_col, vec_col)
        if not len(ids):
            return empty_assign
        mat = vectors_to_matrix(batch, vec_col, dtype=np.float64)
        q = np.floor(mat * scale).astype(np.int64)
        a = _assign_ids(q, c)
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "cluster": pa.array(a, pa.int64()),
            "vec": pa.array([r.tobytes() for r in u], pa.binary()),
            "bucket": pa.array(a % n_buckets, pa.int64())})

    empty_out = pa.table({
        id_col: pa.array([], pa.int64()),
        "cluster": pa.array([], pa.int64()),
        "kept": pa.array([], pa.bool_())})

    def fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "cluster" not in g.columns:
            return empty_out
        outs = []
        for cl, sub in g.groupby("cluster", sort=True):
            sub = sub.sort_values(id_col)
            ids = sub[id_col].to_numpy(np.int64)
            mat = np.frombuffer(b"".join(sub["vec"].tolist()),
                                np.float64).reshape(len(sub), -1)
            sims = mat @ mat.T
            # kept[j] = no i<j with cos >= t (pair dominance, not
            # transitive-chain removal — mirrors the SQL EXISTS)
            dom = np.triu(sims >= threshold, 1)
            kept = ~dom.any(axis=0)
            outs.append(pa.table({
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(len(ids), cl, np.int64),
                                    pa.int64()),
                "kept": pa.array(kept)}))
        return pa.concat_tables(outs) if outs else empty_out

    return (ds.map_batches(assign_unit, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas"))


# ---------------------------------------------------------------------------
# near-duplicate cluster assignment
# ---------------------------------------------------------------------------


def dedup_clusters(docs: Dataset, pairs: Dataset,
                   id_col: str = "doc_id",
                   keep_cols: list[str] | None = None) -> Dataset:
    """Connected components over the near-duplicate pair graph: every
    doc gets ``cluster_id`` = the smallest id in its component (itself
    when unpaired) — the final step of a near-dedup pipeline (keep one
    representative per cluster).

    The pair set is union-found on the driver — bounded by the
    near-duplicate count, the same documented bound as the candidate
    join — and the root mapping is broadcast; tagging the corpus is one
    vectorized ``map_batches`` (sorted-array ``searchsorted`` lookup,
    no shuffle)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:      # path compression
            parent[x], x = root, parent[x]
        return root

    for t in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b in zip(t.column("id_a").to_pylist(),
                        t.column("id_b").to_pylist()):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = {x: find(x) for x in list(parent)}
    keys = np.array(sorted(roots), dtype=np.int64)
    vals = np.array([roots[k] for k in keys], dtype=np.int64)
    ref = ray.put((keys, vals))

    def tag(t: pa.Table) -> pa.Table:
        from .joins import _broadcast_cache
        k, v = _broadcast_cache(ref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        cluster = ids.copy()
        if k.size:
            idx = np.searchsorted(k, ids)
            idx = np.clip(idx, 0, k.size - 1)
            hit = k[idx] == ids
            cluster[hit] = v[idx[hit]]
        cols = {id_col: pa.array(ids, pa.int64()),
                "cluster_id": pa.array(cluster, pa.int64())}
        for c in keep_cols or []:
            cols[c] = t.column(c)
        return pa.table(cols)

    return docs.map_batches(tag, batch_format="pyarrow")


def line_dedup(docs: Dataset, id_col: str = "doc_id",
               text_col: str = "text", max_dup: int = 1,
               min_len: int = 1, n_buckets: int = 64) -> Dataset:
    """CCNet-style corpus-wide LINE deduplication: split every document
    on ``\\n``, count each distinct line's occurrences across the whole
    corpus, and strip every occurrence of any line appearing more than
    ``max_dup`` times (web boilerplate: nav bars, footers, repeated
    disclaimers).  Lines shorter than ``min_len`` chars are never
    counted or removed.  Returns ``(id, text, n_kept, n_removed)`` with
    per-document line order preserved.

    Scale shape: document text NEVER shuffles.  Stage A ships per-batch
    ``(distinct line, partial count)`` pairs (boilerplate collapses to
    one row per batch) through one coarse-bucket fold; the banned set
    (lines with global count > max_dup) is collected to the driver and
    broadcast once via ``ray.put`` — bounded by the number of DISTINCT
    boilerplate lines, not corpus size.  Stage B is a fully vectorized
    arrow pass per batch: split, ``pc.is_in`` against the broadcast
    array, regroup by ``list_parent_indices``.  For a corpus whose
    banned set outgrows driver memory, the documented alternative is a
    (line-hash-bucket) semi-join of exploded lines — same two-stage
    macro shape, no broadcast."""
    from .joins import _broadcast_value_array, key_bucket

    def partial_counts(t: pa.Table) -> pa.Table:
        flat = pc.list_flatten(
            pc.split_pattern(t.column(text_col), "\n"))
        flat = flat.filter(
            pc.greater_equal(pc.utf8_length(flat), min_len))
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if len(flat) == 0:
            return pa.table({"line": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        vc = flat.value_counts()
        lines = vc.field("values")
        out = pa.table({"line": lines,
                        "n": vc.field("counts").cast(pa.int64())})
        return out.append_column("bucket", key_bucket(lines, n_buckets))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"line": pd.Series([], dtype=object)})
        tot = g.groupby("line", sort=False)["n"].sum()
        banned = tot[tot > max_dup]
        return pd.DataFrame({"line": banned.index.to_numpy(object)})

    banned = (docs.select_columns([text_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas")
              .to_pandas())
    ref = ray.put(banned["line"].tolist()
                  if len(banned) else [])

    def strip(t: pa.Table) -> pa.Table:
        banned_arr = _broadcast_value_array(ref)
        lst = pc.split_pattern(t.column(text_col), "\n")
        if isinstance(lst, pa.ChunkedArray):
            lst = lst.combine_chunks()
        flat = pc.list_flatten(lst)
        parents = pc.list_parent_indices(lst).to_numpy(
            zero_copy_only=False)
        n_docs = t.num_rows
        if len(banned_arr):
            bad = pc.and_(
                pc.is_in(flat, value_set=banned_arr),
                pc.greater_equal(pc.utf8_length(flat), min_len))
            bad_np = bad.to_numpy(zero_copy_only=False)
        else:
            bad_np = np.zeros(len(flat), dtype=bool)
        keep = ~bad_np
        total_per_doc = np.bincount(parents, minlength=n_docs)
        kept_per_doc = np.bincount(parents[keep], minlength=n_docs)
        kept_lines = pd.Series(
            np.asarray(flat.to_numpy(zero_copy_only=False))[keep])
        joined = kept_lines.groupby(parents[keep]).agg("\n".join)
        texts = np.full(n_docs, "", dtype=object)
        texts[joined.index.to_numpy(np.int64)] = joined.to_numpy(object)
        return pa.table({
            id_col: t.column(id_col),
            text_col: pa.array(texts, pa.string()),
            "n_kept": pa.array(kept_per_doc.astype(np.int64), pa.int64()),
            "n_removed": pa.array(
                (total_per_doc - kept_per_doc).astype(np.int64),
                pa.int64())})

    return docs.map_batches(strip, batch_format="pyarrow")


def _positional_ngrams(col, n: int):
    """All POSITIONAL word ``n``-grams of a string column, batch-flat:
    returns ``(flat_tokens, doc_index, gram_strings, gram_start)`` where
    ``flat_tokens``/``doc_index`` cover every non-empty token of every
    row (RE2 ``\\S+`` tokenization, the repo-wide convention) and
    ``gram_strings[j]`` is the space-joined ``n``-gram starting at flat
    position ``gram_start[j]`` (windows never cross a document
    boundary).  Unlike ``decontam._batch_ngrams`` this keeps every
    occurrence and its position — span removal needs both.  Fully
    arrow-native: the gram join is ONE ``binary_join_element_wise``
    over n zero-copy slices of the flat token array (no Python or
    object-array loop).  Returns ``(flat_tokens: pa.StringArray,
    doc_index: np.int64[], grams: pa.StringArray,
    gram_start: np.int64[])``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lists = pc.split_pattern_regex(pc.fill_null(col, ""),
                                   pattern="[ \t\n\f\r]+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parents = parents.filter(nonempty)
    docix = parents.to_numpy(zero_copy_only=False).astype(np.int64)
    empty_grams = pa.array([], pa.string())
    if len(flat) < n:
        return (flat, docix, empty_grams,
                np.array([], dtype=np.int64))
    m = len(flat) - n + 1
    valid = docix[:m] == docix[n - 1:]
    grams = pc.binary_join_element_wise(
        *[flat.slice(j, m) for j in range(n)], " ")
    grams = grams.filter(pa.array(valid))
    starts = np.arange(m, dtype=np.int64)[valid]
    return flat, docix, grams, starts


def span_dedup(docs: Dataset, id_col: str = "doc_id",
               text_col: str = "text", n: int = 5,
               min_count: int = 2, n_buckets: int = 64) -> Dataset:
    """Exact duplicate-SPAN removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", §4 ExactSubstr): drop
    every token covered by any word ``n``-gram that occurs at least
    ``min_count`` times across the whole corpus (counting every
    occurrence, including repeats inside one document).  The rebuilt
    text is whitespace-normalized (single spaces) on BOTH modified and
    unmodified documents, so the transform is deterministic and
    SQL-mirrorable.  Returns ``(id, text, n_tokens, n_removed)``.

    Scale shape (the ``line_dedup`` discipline): document text NEVER
    shuffles.  Stage A ships per-batch ``(distinct gram, partial
    count)`` pairs through one coarse-bucket fold; the banned set
    (grams with global count >= min_count) is collected to the driver
    and broadcast once via ``ray.put`` — bounded by the DUPLICATED
    n-gram vocabulary, not corpus size (web dup spans collapse hard).
    Stage B re-derives positional grams per batch and strips covered
    tokens with a difference-array coverage cumsum — fully batch-local.
    If the banned vocabulary ever outgrew a broadcast, the documented
    fallback is the posting-list semi-join used by
    ``ngram_jaccard_pairs`` (ship (gram-hash, doc, pos), co-bucket);
    the true suffix-array construction of the paper is the
    beyond-broadcast endgame but needs no new exchange shape.

    The reference has no span dedup; this extends the SURVEY.md §2
    training-data family (same rationale as ``line_dedup``)."""
    from .joins import _broadcast_value_array, key_bucket

    def partial_counts(t: pa.Table) -> pa.Table:
        _, _, grams, _ = _positional_ngrams(t.column(text_col), n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64())})
        vc = grams.value_counts()
        gv = vc.field("values")
        out = pa.table({"gram": gv,
                        "n": vc.field("counts").cast(pa.int64())})
        return out.append_column("bucket", key_bucket(gv, n_buckets))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"gram": pd.Series([], dtype=object)})
        tot = g.groupby("gram", sort=False)["n"].sum()
        banned = tot[tot >= min_count]
        return pd.DataFrame({"gram": banned.index.to_numpy(object)})

    banned = (docs.select_columns([text_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(fold, batch_format="pandas")
              .to_pandas())
    ref = ray.put(banned["gram"].tolist() if len(banned) else [])

    def strip(t: pa.Table) -> pa.Table:
        banned_arr = _broadcast_value_array(ref)
        toks, docix, grams, starts = _positional_ngrams(
            t.column(text_col), n)
        n_docs = t.num_rows
        total_per_doc = np.bincount(docix, minlength=n_docs)
        if len(grams) and len(banned_arr):
            bad = pc.is_in(grams, value_set=banned_arr).to_numpy(
                zero_copy_only=False)
            bad_starts = starts[bad]
        else:
            bad_starts = np.array([], dtype=np.int64)
        cov = np.zeros(len(toks) + n, dtype=np.int64)
        np.add.at(cov, bad_starts, 1)
        np.add.at(cov, bad_starts + n, -1)
        covered = np.cumsum(cov[:len(toks)]) > 0
        keep = ~covered
        kept_per_doc = np.bincount(docix[keep], minlength=n_docs)
        kept_flat = toks.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        # per-doc rebuild without any Python loop: tokens are already
        # in doc order, so per-doc kept counts ARE the list offsets
        offsets = np.concatenate(
            [[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        texts = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     kept_flat), " ")
        return pa.table({
            id_col: t.column(id_col),
            text_col: texts,
            "n_tokens": pa.array(total_per_doc.astype(np.int64),
                                 pa.int64()),
            "n_removed": pa.array(
                (total_per_doc - kept_per_doc).astype(np.int64),
                pa.int64())})

    return docs.map_batches(strip, batch_format="pyarrow")


def _editdist_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in O(len) with early exit — only
    ever called on blocking-verified candidate pairs."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        diff = 0
        for x, y in zip(a, b):
            if x != y:
                diff += 1
                if diff > 1:
                    return False
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # lb == la + 1: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_pairs_editdist1(ds: Dataset, id_col: str, name_col: str,
                          n_buckets: int = 64) -> Dataset:
    """Record-linkage candidate mining: ALL unordered pairs of rows
    whose names are within Levenshtein distance 1 (typo/OCR-variant
    entity keys — the fuzzy companion of the exact alias dictionary
    and the ANN linker).  Blocking is the deletion neighborhood: a
    string's keys are itself plus every 1-char deletion; two strings
    at distance <= 1 ALWAYS share a key (substitution: same deletion
    at the edit position; insertion/deletion: the shorter string IS a
    deletion of the longer), so recall is exactly 1 and the final
    Levenshtein check makes precision exactly 1.

    Scale shape: each row emits len(name)+1 ``(key, id, name)`` rows
    into ONE coarse-bucket exchange (keys are short for entity names;
    for long strings swap the key for its md5 and rejoin names by id —
    same macro shape).  Per-key candidate groups pair locally; a
    second tiny exchange dedups pairs found under multiple shared keys
    and runs the exact verify once per distinct pair.  Output:
    ``(a_id, b_id, name_a, name_b, dist)`` with a_id < b_id."""
    from .joins import key_bucket

    def expand(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(t.column(id_col).is_valid(),
                             t.column(name_col).is_valid()))
        ids = t.column(id_col).to_pylist()
        names = t.column(name_col).to_pylist()
        keys: list[str] = []
        out_ids: list[int] = []
        out_names: list[str] = []
        for i, nm in zip(ids, names):
            variants = [nm] + [nm[:j] + nm[j + 1:]
                               for j in range(len(nm))]
            keys.extend(variants)
            out_ids.extend([i] * len(variants))
            out_names.extend([nm] * len(variants))
        karr = pa.array(keys, pa.string())
        out = pa.table({"k": karr,
                        "id": pa.array(out_ids, pa.int64()),
                        "nm": pa.array(out_names, pa.string())})
        return out.append_column("bucket", key_bucket(karr, n_buckets))

    def candidates(g: pd.DataFrame) -> pa.Table:
        a_ids, b_ids, a_nms, b_nms = [], [], [], []
        for _, sub in g.groupby("k", sort=False):
            if len(sub) < 2:
                continue
            sub = sub.drop_duplicates("id").sort_values("id")
            ids = sub["id"].to_numpy(np.int64)
            nms = sub["nm"].to_numpy(object)
            for x in range(len(ids) - 1):
                for y in range(x + 1, len(ids)):
                    a_ids.append(ids[x]); b_ids.append(ids[y])
                    a_nms.append(nms[x]); b_nms.append(nms[y])
        return pa.table({
            "a_id": pa.array(a_ids, pa.int64()),
            "b_id": pa.array(b_ids, pa.int64()),
            "name_a": pa.array(a_nms, pa.string()),
            "name_b": pa.array(b_nms, pa.string()),
            "bucket": pa.array(
                (np.asarray(a_ids, np.int64)
                 + np.asarray(b_ids, np.int64)) % n_buckets
                if a_ids else np.array([], np.int64), pa.int64())})

    def verify(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64()),
                             "name_a": pa.array([], pa.string()),
                             "name_b": pa.array([], pa.string()),
                             "dist": pa.array([], pa.int64())})
        g = g.drop_duplicates(["a_id", "b_id"]).sort_values(
            ["a_id", "b_id"])
        keep = [_editdist_le1(na, nb)
                for na, nb in zip(g["name_a"], g["name_b"])]
        g = g[np.asarray(keep, bool)]
        d = [0 if na == nb else 1
             for na, nb in zip(g["name_a"], g["name_b"])]
        return pa.table({
            "a_id": pa.array(g["a_id"].to_numpy(np.int64), pa.int64()),
            "b_id": pa.array(g["b_id"].to_numpy(np.int64), pa.int64()),
            "name_a": pa.array(g["name_a"].to_numpy(object),
                               pa.string()),
            "name_b": pa.array(g["name_b"].to_numpy(object),
                               pa.string()),
            "dist": pa.array(d, pa.int64())})

    return (ds.select_columns([id_col, name_col])
              .map_batches(expand, batch_format="pyarrow")
              .groupby("bucket")
              .map_groups(candidates, batch_format="pandas")
              .groupby("bucket")
              .map_groups(verify, batch_format="pandas"))


def ngram_novelty(docs: Dataset, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  n_buckets: int = 64) -> Dataset:
    """Per-document n-gram novelty score — the corpus-diversity signal
    a curation pass uses to prefer documents contributing NEW content:
    ``(doc_id, n_distinct_grams, n_unique_grams, novelty)`` where
    ``novelty`` = fraction of the doc's DISTINCT word n-grams that
    occur in no other document (corpus df == 1; a doc's own repeats
    don't count against it).  Documents with fewer than ``n`` tokens
    contribute no gram window and are excluded (oracle mirror:
    ``WHERE len(toks) >= n``).

    Scale shape: text never shuffles.  Per-batch distinct (gram,
    doc_id) pairs (a doc lives in one batch, so per-batch distinct IS
    global distinct — the inverted-index argument) ride ONE
    gram-bucketed exchange; the in-bucket fold computes each gram's df
    and collapses straight to per-doc ``(n_distinct, n_unique)``
    partials (doc-sized output, gram rows never leave the bucket);
    a second doc-bucketed fold sums partials and performs the single
    IEEE division.  Gram strings (not hashes) ride the exchange so the
    df==1 test is exact — at 10^12 docs swap in a 128-bit gram hash
    (collision-safe) to cut exchange bytes.

    No reference counterpart; net-new curation-metrics operator
    (complements ``ngram_jaccard_pairs``/``span_dedup``)."""
    from .joins import key_bucket

    def pairs(t: pa.Table) -> pa.Table:
        _, docix, grams, starts = _positional_ngrams(t.column(text_col), n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "_gb": pa.array([], pa.int64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64)[docix[starts]]
        dedup = pa.table({"gram": grams,
                          "doc_id": pa.array(ids, pa.int64())}).group_by(
            ["gram", "doc_id"]).aggregate([])
        gcol = dedup.column("gram").cast(pa.string())
        return pa.table({"gram": gcol, "doc_id": dedup.column("doc_id"),
                         "_gb": key_bucket(gcol, n_buckets)})

    def gram_fold(g: pd.DataFrame) -> pa.Table:
        """df per gram -> per-doc (n_distinct, n_unique) partials for
        this gram shard; output is doc-sized."""
        if len(g) == 0 or "gram" not in g.columns:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64()),
                             "nu": pa.array([], pa.int64()),
                             "_db": pa.array([], pa.int64())})
        df = g.groupby("gram", sort=False)["doc_id"].transform("size")
        uniq = (df.to_numpy(np.int64) == 1)
        agg = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                            "u": uniq.astype(np.int64)}).groupby(
            "doc_id", as_index=False).agg(nd=("u", "size"),
                                          nu=("u", "sum"))
        ids = agg["doc_id"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "nd": pa.array(agg["nd"].to_numpy(np.int64), pa.int64()),
            "nu": pa.array(agg["nu"].to_numpy(np.int64), pa.int64()),
            "_db": pa.array(ids & (n_buckets - 1), pa.int64())})

    def doc_fold(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0 or "doc_id" not in g.columns:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_distinct_grams": pa.array([], pa.int64()),
                "n_unique_grams": pa.array([], pa.int64()),
                "novelty": pa.array([], pa.float64())})
        agg = g.groupby("doc_id", as_index=False).agg(
            nd=("nd", "sum"), nu=("nu", "sum"))
        nd = agg["nd"].to_numpy(np.int64)
        nu = agg["nu"].to_numpy(np.int64)
        return pa.table({
            "doc_id": pa.array(agg["doc_id"].to_numpy(np.int64),
                               pa.int64()),
            "n_distinct_grams": pa.array(nd, pa.int64()),
            "n_unique_grams": pa.array(nu, pa.int64()),
            "novelty": pa.array(nu.astype(np.float64)
                                / nd.astype(np.float64), pa.float64())})

    return (docs.select_columns([id_col, text_col])
                .map_batches(pairs, batch_format="pyarrow")
                .groupby("_gb")
                .map_groups(gram_fold, batch_format="pandas")
                .groupby("_db")
                .map_groups(doc_fold, batch_format="pandas"))
