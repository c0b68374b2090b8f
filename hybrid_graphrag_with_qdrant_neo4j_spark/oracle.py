"""Single-process pure-Python oracle for the KG-construction pipeline.

Runs the exact algorithms from ``textproc`` (the verbatim-semantics ports
of the reference's chunker / n-grams / triple parser) over an iterable of
page rows, producing the same logical tables the Spark pipeline
materializes.  pytest compares Spark output to this oracle byte-for-byte
(the P/R >= 0.95 gate of BASELINE.json is measured against this oracle,
which *is* the reference semantics — see SURVEY.md §5/§7).

Entity-link semantics mirrored from the reference (triplets.py:252-398):
  - entity names lowercased (triplets.py:355-359);
  - merge when exact lowercase names collide OR embedding cosine >= 0.96
    (triplets.py:257-261; we drop the reference's top-10-candidate cap —
    our blocking is recall-complete at the threshold, a strict superset
    documented in BENCH/BASELINE.md);
  - transitive closure (the reference's UNWIND cross-product MERGE,
    triplets.py:372-398) == connected components; canonical id is the
    lexicographically smallest member name (deterministic tie-break).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

from . import textproc as tp

DEFAULT_MAX_TOKENS = 200
LINK_THRESHOLD = 0.96


def doc_id_for_url(url: str) -> str:
    # content-derived id (never positional): reference uses filename stem
    # (cli/main.py:128); urls are our filenames.
    import hashlib

    return hashlib.sha256(url.encode("utf-8")).hexdigest()[:16]


def oracle_tables(pages: Iterable[Dict], max_tokens: int = DEFAULT_MAX_TOKENS) -> Dict[str, List[Tuple]]:
    """Compute chunks / term_chunk_edges / triples_raw / mentions / entities /
    edges for the given pages.  Non-'en' pages are excluded from term and
    triple stages (language-filtered partitions per north_star); chunking
    applies to every page with non-empty text."""
    chunks: List[Tuple] = []        # (url, doc_id, chunk_id, chunk_index, text)
    term_edges_set = set()          # (chunk_id, term, type)
    triples_raw: List[Tuple] = []   # (chunk_id, subj, pred, obj) — subj/obj lowercased, pred sanitized
    mentions_set = set()            # (chunk_id, entity_name)

    for page in pages:
        url, text, lang = page["url"], page["text"], page["lang"]
        extracted = tp.extract_text_from_html(page["html"])
        # byte-identical invariant: extraction reproduces `text`
        # (checked by tests; the oracle proceeds from the extracted text)
        doc = doc_id_for_url(url)
        for idx, chunk in enumerate(tp.chunk_text(extracted, max_tokens)):
            chunk_id = f"{doc}_chunk{idx}"   # ingest.py:145 id synthesis
            chunks.append((url, doc, chunk_id, idx, chunk))
            if lang != "en":
                continue
            uni, bi, tri = tp.extract_ngrams(chunk)
            for t in uni:
                term_edges_set.add((chunk_id, t, "unigram"))
            for t in bi:
                term_edges_set.add((chunk_id, t, "bigram"))
            for t in tri:
                term_edges_set.add((chunk_id, t, "trigram"))
            for sent in tp.sent_tokenize(chunk):
                for s, r, o in tp.extract_triplets(sent):
                    subj, pred, obj = s.lower(), tp.sanitize_relation(r), o.lower()
                    triples_raw.append((chunk_id, subj, pred, obj))
                    mentions_set.add((chunk_id, subj))
                    mentions_set.add((chunk_id, obj))

    # ---- entity linking + connected components ----
    names = sorted({s for _, s, _, _ in triples_raw} | {o for _, _, _, o in triples_raw})
    embs = {n: tp.embed_text_py(n) for n in names}
    parent = {n: n for n in names}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if tp.cosine(embs[names[i]], embs[names[j]]) >= LINK_THRESHOLD:
                union(names[i], names[j])

    canonical = {n: find(n) for n in names}
    entities = sorted((n, canonical[n]) for n in names)  # (name, canonical_id)

    edges_set = set()
    for chunk_id, subj, pred, obj in triples_raw:
        edges_set.add((canonical[subj], pred, canonical[obj], chunk_id))
    # attach url provenance (fixes the reference's null r.source,
    # retrieval.py:283 vs triplets.py:354-369)
    chunk_to_url = {c[2]: c[0] for c in chunks}
    edges = sorted(
        (s, p, o, cid, chunk_to_url[cid]) for (s, p, o, cid) in edges_set
    )

    return {
        "chunks": sorted(chunks),
        "term_chunk_edges": sorted(term_edges_set),
        "triples_raw": sorted(triples_raw),
        "mentions": sorted(mentions_set),
        "entities": entities,
        "edges": edges,
    }


def precision_recall(
    predicted: Iterable[Tuple], expected: Iterable[Tuple]
) -> Tuple[float, float]:
    ps, es = set(predicted), set(expected)
    if not ps and not es:
        return 1.0, 1.0
    tp_ = len(ps & es)
    precision = tp_ / len(ps) if ps else 1.0
    recall = tp_ / len(es) if es else 1.0
    return precision, recall
