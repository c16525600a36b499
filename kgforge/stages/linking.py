"""Entity-linking candidate generation.

The north-star linking design is alias-dictionary + embedding-ANN
candidate generation feeding canonicalization.  The alias dictionary is
the primary mechanism (broadcast into ``_MentionFolder`` via
``alias_map``); this module supplies the ANN half: build alias entries
by embedding surface forms (deterministic char-n-gram hashing — the
sandbox stand-in for a text-embedding model) and linking each to its
nearest canonical form above a cosine threshold.

Output is a plain ``{label: {attr: {surface: canonical}}}`` alias map,
so ANN-generated links compose with hand-curated ones and flow through
the existing broadcast path — no new pipeline machinery.

At corpus scale the surface-form vocabulary comes out of the mention
table (a ``groupby`` on the surface column, tiny next to the corpus);
the canonical dictionary is the small side and is broadcast.
"""

from __future__ import annotations

import zlib

import numpy as np

from ray.data import Dataset


def char_ngram_embedding(text: str, dim: int = 256,
                         ns: tuple[int, ...] = (2, 3)) -> np.ndarray:
    """Deterministic char-n-gram hashing embedding (unit-normalized),
    mixing bigrams and trigrams so small edits stay close — 'Jon Doe'
    lands near 'John Doe'."""
    vec = np.zeros(dim, dtype=np.float64)
    padded = f"^{text.lower()}$"
    for n in ns:
        for i in range(max(1, len(padded) - n + 1)):
            gram = padded[i:i + n]
            vec[zlib.crc32(gram.encode("utf-8")) % dim] += 1.0
    norm = np.linalg.norm(vec)
    return vec / norm if norm else vec


def link_surfaces_to_canonicals(surfaces: list[str], canonicals: list[str],
                                threshold: float = 0.7, dim: int = 256,
                                c_mat: np.ndarray | None = None
                                ) -> dict[str, str]:
    """Brute-force cosine nearest-canonical per surface (the exact
    baseline; the LSH/IVF variants in ``stages/ann.py`` are the scale
    path for huge canonical dictionaries).  Ambiguity guard: a surface
    links only when its best match clears the threshold AND beats the
    runner-up by a margin.  Pass a precomputed ``c_mat`` (e.g. the
    broadcast matrix in :func:`ann_alias_map`) to avoid re-embedding the
    canonical dictionary per call."""
    if not surfaces or not canonicals:
        return {}
    s_mat = np.stack([char_ngram_embedding(s, dim) for s in surfaces])
    if c_mat is None:
        c_mat = np.stack([char_ngram_embedding(c, dim) for c in canonicals])
    sims = s_mat @ c_mat.T
    out: dict[str, str] = {}
    for i, surface in enumerate(surfaces):
        order = np.argsort(-sims[i])
        best = order[0]
        if sims[i][best] < threshold:
            continue
        if len(order) > 1 and sims[i][order[1]] >= sims[i][best] - 0.05:
            continue  # ambiguous between two canonicals — leave unlinked
        canonical = canonicals[int(best)]
        if surface != canonical:
            out[surface] = canonical
    return out


def ann_alias_map(mentions_surfaces: Dataset, label: str, attr: str,
                  canonicals: list[str], threshold: float = 0.7,
                  surface_col: str = "surface") -> dict:
    """Distributed wrapper: distinct surface forms (one small groupby
    over the mention table) → per-batch nearest-canonical linking against
    the broadcast canonical matrix → alias map."""
    import pyarrow as pa

    import ray
    c_mat = np.stack([char_ngram_embedding(c) for c in canonicals]) \
        if canonicals else np.zeros((0, 256))
    cref = ray.put((c_mat, list(canonicals)))

    def link_batch(batch: pa.Table) -> pa.Table:
        mat, names = ray.get(cref)
        surfaces = batch.column(surface_col).to_pylist()
        links = link_surfaces_to_canonicals(surfaces, names,
                                            threshold=threshold, c_mat=mat)
        keep = [s for s in surfaces if s in links]
        return pa.table({"surface": pa.array(keep, pa.string()),
                         "canonical": pa.array([links[s] for s in keep],
                                               pa.string())})

    distinct = mentions_surfaces.groupby(surface_col).count() \
        .select_columns([surface_col])
    pairs = distinct.map_batches(link_batch, batch_format="pyarrow")
    table: dict[str, str] = {}
    for row in pairs.take_all():
        table[row["surface"]] = row["canonical"]
    return {label: {attr: table}}
