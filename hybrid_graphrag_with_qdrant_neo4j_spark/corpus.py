"""Deterministic synthetic Common-Crawl-style corpus (seed=42, in-repo,
no external data).

Generates the ``pages`` input table of BASELINE.json's ``input_hint``:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Design (FIXTURES.md §1):
  - text = declarative SVO sentences drawn from a fixed template bank, so
    the pattern triple-extractor has *known* (s,p,o) answers;
  - the entity vocabulary is Zipf-skewed with one very hot entity
    appearing in ~20% of sentences (exercises salted aggregation /
    AQE skew-join);
  - entity alias variants ("Acme Corporation" vs "Acme Corporation." vs
    "ACME Corporation") exercise exact-lowercase merging and
    embedding-similarity merging (cosine >= 0.96, triplets.py:257-261)
    plus connected-components canonicalization;
  - ~5% of pages are latin-1 encoded (decode fallback, cli/main.py:134-146),
    ~2% have an empty body (empty-text edge, ingest.py:75-77);
  - 90% lang='en'; non-en rows must be filtered before NER/triple stages.

Row i is seeded independently (``seed*1_000_003 + i``), so any row can be
generated in O(1) on any executor — generation is embarrassingly parallel
and content never depends on partitioning.
"""

from __future__ import annotations

import datetime as _dt
import random
from typing import Dict, Iterator, List

_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

# Entity bank: canonical name -> surface aliases.  Aliases differ only in
# case/punctuation so the hash embedder puts them within cosine 0.96 of
# each other (embedding-similarity merge) or lowercase-equal (exact merge).
_COMPANIES: List[List[str]] = [
    ["Acme Corporation", "Acme Corporation.", "ACME Corporation"],  # hot entity
    ["Globex Systems", "Globex Systems."],
    ["Initech Labs", "Initech Labs."],
    ["Umbrella Works", "UMBRELLA Works"],
    ["Stark Industries", "Stark Industries."],
    ["Wayne Enterprises"],
    ["Tyrell Group", "Tyrell Group."],
    ["Cyberdyne Research"],
    ["Hooli Platforms", "Hooli Platforms."],
    ["Soylent Foods"],
    ["Vandelay Imports"],
    ["Wonka Confections"],
    # this pair is NOT lowercase-equal but its hash-embedding cosine is
    # ~0.978 >= 0.96 -> exercises the embedding-similarity merge + CC
    # path inside the corpus pipeline (not just unit tests)
    [
        "Consolidated Amalgamated Industrial Holdings Corporation",
        "Consolidated Amalgamated Industrial Holdings Corporations",
    ],
]
_PEOPLE = [
    "Alice Harper", "Bob Stone", "Carol Finch", "David Boyd", "Erin Cole",
    "Frank Ames", "Grace Lane", "Henry Ford", "Irene Katz", "Jack Monroe",
]
_CITIES = [
    "Berlin", "Tokyo", "Austin", "Lagos", "Oslo", "Lima", "Porto", "Delhi",
]
_PRODUCTS = [
    "Quantum Widgets", "Neural Turbines", "Fusion Pumps", "Orbital Drives",
]

# Each template matches exactly one pattern in textproc._REL_PATTERNS.
_TEMPLATES = [
    ("{S} founded {O} in 1999.", "founded", "person", "company"),
    ("{S} acquired {O} last year.", "acquired", "company", "company"),
    ("{S} works at {O} as an engineer.", "works at", "person", "company"),
    ("{S} is the CEO of {O} since 2015.", "leads", "person", "company"),
    ("{S} partnered with {O} on a joint venture.", "partnered with", "company", "company"),
    ("{S} is based in {O} near the river.", "based in", "company", "city"),
    ("{S} invested in {O} during the downturn.", "invested in", "company", "company"),
    ("{S} competes with {O} across three markets.", "competes with", "company", "company"),
    ("{S} develops {O} for industrial clients.", "develops", "company", "product"),
    ("{S} sued {O} over patent claims.", "sued", "company", "company"),
]
# Filler sentences with no extractable SVO (negative examples for P/R).
_FILLERS = [
    "the quarterly report was longer than expected.",
    "several markets moved sideways all week.",
    "analysts were unsure about the outlook.",
    "rain delayed the annual shareholder meeting.",
    "no further details were made public.",
]
_NONEN_SENTENCES = {
    "de": "der bericht wurde gestern veroeffentlicht und enthielt zahlen.",
    "fr": "le rapport a ete publie hier avec des chiffres detailles.",
    "zz": "zxq vlorp trannik suvol empra quild noster vamp.",
}


def _pick_company(rng: random.Random) -> str:
    """Zipf-ish pick: company 0 ('Acme') with p=0.20, then harmonic tail."""
    if rng.random() < 0.20:
        group = _COMPANIES[0]
    else:
        weights = [1.0 / (i + 1) for i in range(1, len(_COMPANIES))]
        total = sum(weights)
        r = rng.random() * total
        acc = 0.0
        group = _COMPANIES[-1]
        for i, w in enumerate(weights):
            acc += w
            if r <= acc:
                group = _COMPANIES[i + 1]
                break
    return group[rng.randrange(len(group))]


def _surface(kind: str, rng: random.Random) -> str:
    if kind == "company":
        return _pick_company(rng)
    if kind == "person":
        return _PEOPLE[rng.randrange(len(_PEOPLE))]
    if kind == "city":
        return _CITIES[rng.randrange(len(_CITIES))]
    return _PRODUCTS[rng.randrange(len(_PRODUCTS))]


def _page_text(rng: random.Random, n_sentences: int) -> str:
    sents = []
    for _ in range(n_sentences):
        if rng.random() < 0.30:
            sents.append(_FILLERS[rng.randrange(len(_FILLERS))])
        else:
            tpl, _rel, skind, okind = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
            sents.append(tpl.format(S=_surface(skind, rng), O=_surface(okind, rng)))
    return " ".join(sents)


def _page_links(i: int, seed: int) -> List[str]:
    """Deterministic outbound hrefs for page i (the web link graph).

    Drawn from an INDEPENDENT rng stream (different multiplier than the
    body stream) so adding links never shifts any text/lang/encoding
    draw — existing fixtures stay byte-identical on the ``text`` column.

    Link shape mirrors a real crawl:
      - ~10% of pages have no links;
      - targets prefer EARLIER pages (``u**3`` skew), so low-numbered
        hosts (``site0``..) become hubs — the dst-host hot keys a
        domain-rank job must absorb;
      - ~15% relative hrefs (``/page/N``, same-host resolution),
        ~5% fragment-only, ~3% ``mailto:`` (both dropped by
        resolution), ~10% exact duplicates (link multiplicity).
    """
    lrng = random.Random(seed * 2_000_003 + 7_919 * i + 13)
    if lrng.random() < 0.10:
        return []
    links: List[str] = []
    for _ in range(2 + lrng.randrange(6)):
        r = lrng.random()
        j = int(lrng.random() ** 3 * max(i, 1))
        if r < 0.05:
            links.append(f"#section{j % 7}")
        elif r < 0.08:
            links.append("mailto:contact@site.example")
        elif r < 0.23:
            links.append(f"/page/{j}")
        else:
            links.append(f"https://site{j % 97}.example/page/{j}")
        if links and lrng.random() < 0.10:
            links.append(links[-1])
    return links


def _render_html(title: str, body_text: str, links: List[str] = ()) -> str:
    # one <p> per sentence, delimiter kept — tag-strip + whitespace
    # collapse reproduces body_text byte-for-byte; anchors carry EMPTY
    # text so the link footer adds only whitespace under extraction
    # (the byte-identical-text invariant is untouched)
    paras = "".join(f"<p>{s} </p>" for s in body_text.split(" "))
    footer = "".join(f'<a href="{h}"></a>' for h in links)
    return (
        "<html><head><title>" + title + "</title>"
        "<style>p{margin:0}</style>"
        "<script>var x=1;</script></head>"
        "<body>" + paras + footer + "</body></html>"
    )


def page_row(i: int, seed: int = 42, sentences_per_page: int = 12) -> Dict:
    """Generate page row i in O(1)."""
    rng = random.Random(seed * 1_000_003 + i)
    url = f"https://site{i % 97}.example/page/{i}"
    warc_ts = _EPOCH + _dt.timedelta(seconds=37 * i)
    r = rng.random()
    lang = "en" if r < 0.90 else ("de", "fr", "zz")[i % 3]
    links = _page_links(i, seed)
    if rng.random() < 0.02:
        text = ""
        html = "<html><head><title>t</title></head><body></body></html>"
    elif lang == "en":
        text = _page_text(rng, sentences_per_page)
        html = _render_html(f"Page {i}", text, links)
    else:
        text = _NONEN_SENTENCES[lang]
        html = _render_html(f"Seite {i}", text, links)
    encoding = "latin-1" if rng.random() < 0.05 else "utf-8"
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": html.encode(encoding, errors="replace"),
        "text": text,
        "lang": lang,
    }


def generate_pages(
    n: int, seed: int = 42, sentences_per_page: int = 12, start: int = 0
) -> Iterator[Dict]:
    """Yield page rows start..start+n-1 (single-process oracle path).
    ``start`` gives disjoint url ranges for incremental-ingest tests."""
    for i in range(start, start + n):
        yield page_row(i, seed=seed, sentences_per_page=sentences_per_page)


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_spark_df(spark, n: int, seed: int = 42, partitions: int = 32,
                   sentences_per_page: int = 12, start: int = 0):
    """Distributed generation: parallelize index ranges; each executor
    generates its own rows (no driver-side page bodies; scales linearly
    with cores — the same shape a real WARC scan would have)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    per = (n + partitions - 1) // partitions

    def _gen_partition(pidx_iter):
        for pidx in pidx_iter:
            lo = start + pidx * per
            hi = min(lo + per, start + n)
            for i in range(lo, hi):
                row = page_row(i, seed=seed, sentences_per_page=sentences_per_page)
                yield (row["url"], row["warc_ts"], row["html"], row["text"], row["lang"])

    rdd = spark.sparkContext.parallelize(range(partitions), partitions).mapPartitions(
        _gen_partition
    )
    return spark.createDataFrame(rdd, schema)
