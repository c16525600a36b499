"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md F1).

Generates the ``input_hint`` table
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)`` from a seeded RNG, with body text produced by a known
grammar over the F2 movies ontology (the analog of the reference's test
ontology, ``/root/reference/tests/test_kg.py:25-67``), so ground-truth
triples per page are known:

- ``"{person} starred in {movie} ({year}) as {role}."``
- ``"{movie} ({year}) was directed by {person}."``
- ``"{person} is {age} years old."``       (non-unique attr → LWW merge)
- ``"{movie} ({year}) is a sequel."``

Head people/movies follow a Zipf-ish distribution (exercises skew /
combiner pre-aggregation); person mentions use alias surface forms
("John Doe" / "J. Doe" / "Doe") for entity-linking tests; ~2% of pages
are empty or whitespace-only; ~10% contain an unclosed tag; HTML wraps
the text with boilerplate, comments, scripts, styles, character
references and a doctype.

``text`` is the byte-expected extraction output of
``kgforge.functions.html_text.html_get_text`` (documented bs4-equivalent
semantics, pinned by hand-written goldens in tests/test_html_text.py).
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.html_text import html_get_text
from ..ontology import Ontology

CORPUS_VERSION = 4

ONTOLOGY_JSON = {
    "entities": [
        {"label": "Person", "attributes": [
            {"name": "name", "type": "string", "unique": True, "required": True},
            {"name": "age", "type": "number", "unique": False, "required": False}]},
        {"label": "Movie", "attributes": [
            {"name": "title", "type": "string", "unique": True, "required": True},
            {"name": "release_year", "type": "number", "unique": False,
             "required": False},
            {"name": "is_sequel", "type": "boolean", "unique": False,
             "required": False}]},
    ],
    "relations": [
        {"label": "ACTED_IN", "source": {"label": "Person"},
         "target": {"label": "Movie"},
         "attributes": [{"name": "role", "type": "string", "unique": False,
                         "required": False}]},
        {"label": "DIRECTED", "source": {"label": "Person"},
         "target": {"label": "Movie"}, "attributes": []},
    ],
}

_FIRST = ["John", "Mary", "Alex", "Nina", "Omar", "Lena", "Carl", "Rita",
          "Hugo", "Ines", "Pavel", "Sofia", "Marc", "Julia", "Tom", "Vera",
          "Igor", "Dana", "Felix", "Rosa", "Noel", "Tara", "Ivan", "Mona"]
_LAST = ["Doe", "Stone", "Rivera", "Klein", "Baum", "Costa", "Lindt", "Vance",
         "Marsh", "Okafor", "Petrov", "Quinn", "Sato", "Iqbal", "Novak",
         "Reyes", "Falk", "Gruber", "Hale", "Idris", "Jansen", "Kovac",
         "Lund", "Mora"]
_ADJ = ["Amber", "Silent", "Broken", "Golden", "Crimson", "Hollow", "Iron",
        "Lucky", "Pale", "Rapid", "Secret", "Twisted", "Velvet", "Wild",
        "Frozen", "Gentle"]
_NOUN = ["Falcon", "Harbor", "Garden", "Mirror", "Signal", "Voyage", "Empire",
         "Whisper", "Canyon", "Lantern", "Orchid", "Summit", "Tide", "Vault",
         "Meadow", "Compass"]
_ROLE = ["Hero", "Villain", "Detective", "Mentor", "Pilot", "Doctor",
         "Captain", "Stranger", "Judge", "Rebel"]

BASE_TS_US = 1_727_740_800_000_000  # 2024-10-01T00:00:00Z in µs


@dataclass
class Corpus:
    pages: pa.Table
    truth: dict[str, dict]            # url -> extraction payload
    alias_map: dict                   # {label: {attr: {surface: canonical}}}
    ontology: Ontology = field(default_factory=lambda: Ontology.from_json(ONTOLOGY_JSON))


def _person_pool(rng: random.Random, n: int) -> list[str]:
    combos = [(f, l) for f in _FIRST for l in _LAST]
    rng.shuffle(combos)
    return [f"{f} {l}" for f, l in combos[:n]]


def _movie_pool(rng: random.Random, n: int) -> list[tuple[str, int]]:
    titles: list[str] = []
    seen = set()
    i = 0
    while len(titles) < n:
        adj = _ADJ[(i * 7 + 3) % len(_ADJ)]
        noun = _NOUN[(i * 5 + 1) % len(_NOUN)]
        style = i % 4
        if style == 0:
            t = f"The {adj} {noun}"
        elif style == 1:
            t = f"{adj} {noun}"
        elif style == 2:
            t = f"The {noun}'s {adj} Hour"   # apostrophe → escaping quirk
        else:
            t = f"{adj} {noun} Returns"
        if t in seen:
            t = f"{t} {len(titles)}"
        seen.add(t)
        titles.append(t)
        i += 1
    return [(t, 1950 + (idx * 13) % 75) for idx, t in enumerate(titles)]


def _aliases(people: list[str]) -> dict[str, str]:
    """surface → canonical; only unambiguous alias forms are linkable."""
    initial: dict[str, list[str]] = {}
    last_only: dict[str, list[str]] = {}
    for p in people:
        first, last = p.split(" ", 1)
        initial.setdefault(f"{first[0]}. {last}", []).append(p)
        last_only.setdefault(last, []).append(p)
    out = {}
    for surface, cands in {**initial, **last_only}.items():
        if len(cands) == 1:
            out[surface] = cands[0]
    return out


def _zipf_choice(rng: random.Random, n: int) -> int:
    # weight 1/(rank+1): a few head items dominate
    weights = [1.0 / (i + 1) for i in range(n)]
    return rng.choices(range(n), weights=weights, k=1)[0]


def build_pools(n_pages: int, seed: int = 42) -> dict:
    rng = random.Random(seed)
    people = _person_pool(rng, max(8, min(n_pages, 50_000) // 6))
    movies = _movie_pool(rng, max(6, min(n_pages, 50_000) // 8))
    return {"people": people, "movies": movies,
            "aliases": _aliases(people)}


def page_row(i: int, pools: dict, seed: int = 42) -> tuple:
    """Generate page ``i`` independently of every other page: the RNG is
    derived from ``(seed, i)``, so generation can run as a parallel Ray
    ``map_batches`` over page indices and still be byte-deterministic."""
    rng = random.Random((seed << 24) ^ i)
    cat = ["movies", "people", "news"][i % 3]
    url = f"https://fixture.test/{cat}/page-{i:06d}"
    ts = BASE_TS_US + i * 137_000_000
    lang = "en" if rng.random() < 0.95 else rng.choice(["de", "fr"])
    kind_roll = rng.random()
    if kind_roll < 0.01:
        html = b""
        text = ""
        payload = {"entities": [], "relations": []}
    elif kind_roll < 0.02:
        html = b"<html><body>\n   \n</body></html>"
        text = html_get_text(html.decode())
        payload = {"entities": [], "relations": []}
    else:
        sentences, payload = _page_facts(rng, pools["people"],
                                         pools["movies"], pools["aliases"])
        html = _wrap_html(rng, f"page {i:06d}", sentences, i)
        text = html_get_text(html.decode("utf-8"))
    return url, ts, html, text, lang, payload


def _rows_to_tables(rows: list[tuple]) -> tuple[pa.Table, dict]:
    urls, tss, htmls, texts, langs = zip(*[r[:5] for r in rows])
    truth = {r[0]: r[5] for r in rows}
    pages = pa.Table.from_arrays(
        [pa.array(list(urls), pa.string()),
         pa.array(list(tss), pa.timestamp("us")),
         pa.array(list(htmls), pa.binary()),
         pa.array(list(texts), pa.string()),
         pa.array(list(langs), pa.string())],
        names=["url", "warc_ts", "html", "text", "lang"])
    return pages, truth


def make_corpus(n_pages: int, seed: int = 42) -> Corpus:
    pools = build_pools(n_pages, seed)
    rows = [page_row(i, pools, seed) for i in range(n_pages)]
    pages, truth = _rows_to_tables(rows)
    return Corpus(pages, truth, {"Person": {"name": pools["aliases"]}})


def _mention_person(rng: random.Random, canonical: str) -> str:
    first, last = canonical.split(" ", 1)
    roll = rng.random()
    if roll < 0.70:
        return canonical
    if roll < 0.90:
        return f"{first[0]}. {last}"
    return last


def _page_facts(rng, people, movies, alias_map_flat):
    n_facts = rng.randint(1, 5)
    sentences: list[str] = []
    entities: list[dict] = []
    relations: list[dict] = []
    for _ in range(n_facts):
        roll = rng.random()
        if roll < 0.45:
            p = people[_zipf_choice(rng, len(people))]
            title, year = movies[_zipf_choice(rng, len(movies))]
            role = rng.choice(_ROLE)
            surface = _mention_person(rng, p)
            sentences.append(f"{surface} starred in {title} ({year}) as {role}.")
            entities.append({"label": "Person", "attributes": {"name": surface}})
            entities.append({"label": "Movie", "attributes": {
                "title": title, "release_year": year}})
            relations.append({
                "label": "ACTED_IN",
                "source": {"label": "Person", "attributes": {"name": surface}},
                "target": {"label": "Movie", "attributes": {"title": title}},
                "attributes": {"role": role}})
        elif roll < 0.70:
            p = people[_zipf_choice(rng, len(people))]
            title, year = movies[_zipf_choice(rng, len(movies))]
            surface = _mention_person(rng, p)
            sentences.append(f"{title} ({year}) was directed by {surface}.")
            entities.append({"label": "Movie", "attributes": {
                "title": title, "release_year": year}})
            entities.append({"label": "Person", "attributes": {"name": surface}})
            relations.append({
                "label": "DIRECTED",
                "source": {"label": "Person", "attributes": {"name": surface}},
                "target": {"label": "Movie", "attributes": {"title": title}},
                "attributes": {}})
        elif roll < 0.90:
            p = people[_zipf_choice(rng, len(people))]
            age = rng.randint(20, 79)
            surface = _mention_person(rng, p)
            sentences.append(f"{surface} is {age} years old.")
            entities.append({"label": "Person", "attributes": {
                "name": surface, "age": age}})
        else:
            title, year = movies[_zipf_choice(rng, len(movies))]
            sentences.append(f"{title} ({year}) is a sequel.")
            entities.append({"label": "Movie", "attributes": {
                "title": title, "release_year": year, "is_sequel": True}})
    return sentences, {"entities": entities, "relations": relations}


def _wrap_html(rng: random.Random, slug: str, sentences: list[str],
               i: int) -> bytes:
    body = "\n".join(f"<p>{s}</p>" for s in sentences)
    unclosed = "<b>" if rng.random() < 0.10 else ""
    parts = [
        "<!DOCTYPE html>",
        "<html>",
        "<head>",
        f"<title>{slug} &#8212; fixture archive</title>",
        "<style>body { color: #333; }</style>",
        '<script>var hidden = "<p>not text</p>";</script>',
        "</head>",
        "<body>",
        "<!-- navigation boilerplate -->",
        '<div class="nav">home &amp; index</div>',
        f'{unclosed}<div class="content">',
        body,
        "</div>",
        "<template>hidden template text</template>",
        "<footer>generated fixture archive footer</footer>",
        "</body>",
        "</html>",
    ]
    return "\n".join(parts).encode("utf-8")


def write_corpus(out_dir: str, n_pages: int, seed: int = 42,
                 n_files: int = 4) -> Corpus:
    """Write pages (split over ``n_files`` parquet files — the shard unit
    for resume tests), truth, aliases and ontology to ``out_dir``."""
    corpus = make_corpus(n_pages, seed)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    n = corpus.pages.num_rows
    per = max(1, (n + n_files - 1) // n_files)
    for f in range(n_files):
        part = corpus.pages.slice(f * per, per)
        if part.num_rows == 0:
            break
        pq.write_table(part, os.path.join(pages_dir, f"part-{f:04d}.parquet"))
    truth_tbl = pa.Table.from_arrays(
        [pa.array(list(corpus.truth.keys()), pa.string()),
         pa.array([json.dumps(v) for v in corpus.truth.values()], pa.string())],
        names=["url", "payload"])
    pq.write_table(truth_tbl, os.path.join(out_dir, "truth.parquet"))
    _write_meta(out_dir, corpus.alias_map)
    return corpus


def _write_meta(out_dir: str, alias_map: dict) -> None:
    with open(os.path.join(out_dir, "aliases.json"), "w") as fh:
        json.dump(alias_map, fh, indent=2)
    with open(os.path.join(out_dir, "ontology.json"), "w") as fh:
        json.dump(ONTOLOGY_JSON, fh, indent=2)


def write_corpus_parallel(out_dir: str, n_pages: int, seed: int = 42) -> None:
    """Generate the same byte-deterministic corpus with a Ray pipeline
    (page i depends only on (seed, i)) — for bench-scale corpora where
    single-threaded generation would dominate wall-clock.  Requires an
    initialised Ray session."""
    import pyarrow as _pa

    import ray

    pools = build_pools(n_pages, seed)
    pref = ray.put(pools)

    def gen(batch) -> _pa.Table:
        p = ray.get(pref)
        rows = [page_row(int(i), p, seed) for i in batch["id"]]
        pages, truth = _rows_to_tables(rows)
        return pages.append_column(
            "payload", _pa.array([json.dumps(truth[u]) for u in
                                  pages.column("url").to_pylist()],
                                 _pa.string()))

    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    ds = (ray.data.range(n_pages, override_num_blocks=max(8, n_pages // 4096))
          .map_batches(gen, batch_size=4096, batch_format="numpy")
          .materialize())
    ds.drop_columns(["payload"]).write_parquet(pages_dir)
    truth_dir = os.path.join(out_dir, "truth")
    os.makedirs(truth_dir, exist_ok=True)
    ds.select_columns(["url", "payload"]).write_parquet(truth_dir)
    _write_meta(out_dir, {"Person": {"name": pools["aliases"]}})


def cached_corpus_dir(n_pages: int, seed: int = 42,
                      root: str = "/tmp/kgforge_corpus") -> str:
    """Synthesize once per (n_pages, seed, version), reuse across runs.
    Large corpora generate in parallel when a Ray session is up."""
    out = os.path.join(root, f"v{CORPUS_VERSION}_n{n_pages}_s{seed}")
    marker = os.path.join(out, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        import ray
        # crash-safe: generate into a temp dir and rename — a killed run
        # must never leave a half-written dir that a rerun would append
        # duplicate parquet files into and then mark complete
        tmp = f"{out}.tmp-{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        if n_pages >= 20_000 and ray.is_initialized():
            write_corpus_parallel(tmp, n_pages, seed)
        else:
            write_corpus(tmp, n_pages, seed)
        with open(os.path.join(tmp, "_COMPLETE"), "w") as fh:
            fh.write("ok")
        if not os.path.exists(out):
            os.replace(tmp, out)
        else:  # a concurrent generator won the race
            shutil.rmtree(tmp, ignore_errors=True)
    return out
