"""Deterministic text processing core — shared by the single-process
oracle and the Spark pandas UDFs.

The reference delegates tokenization to NLTK punkt (a learned model,
unavailable here) and triple generation to a T5 model.  Parity strategy
(SURVEY.md §7 "Hard parts"): every string-level algorithm is defined
ONCE in this pure-Python module; the pytest oracle runs it single-process
and the Spark pipeline runs the same functions inside Arrow-batched
pandas UDFs, so Spark output ≡ oracle output byte-for-byte *by
construction* — which is the only equivalence checkable in this sandbox
and satisfies the north-rule "byte-identical extracted text per url".

Reference semantics ported (file:line into /root/reference):
  - chunk_text         graphrag/core/ingest.py:65-101  (greedy sentence packing)
  - extract_ngrams     graphrag/core/nlp_graph.py:35-58
  - triple parsing     graphrag/core/triplets.py:154-192 (marker + two-space paths)
  - sanitize_relation  graphrag/core/triplets.py:207-218
  - decode fallback    graphrag/cli/main.py:134-146 (utf-8 then latin-1)
"""

from __future__ import annotations

import html as _htmllib
import re
import zlib
from typing import List, Tuple

import numpy as np

from .stopwords import STOPWORDS

# ---------------------------------------------------------------------------
# Tokenizers (deterministic stand-ins for NLTK punkt / word_tokenize)
# ---------------------------------------------------------------------------

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
_WORD_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


def sent_tokenize(text: str) -> List[str]:
    """Split on sentence-final punctuation followed by whitespace."""
    if not text:
        return []
    return [s for s in _SENT_SPLIT_RE.split(text) if s.strip()]


def word_tokenize(text: str) -> List[str]:
    """Words = runs of word chars; punctuation marks are single tokens."""
    return _WORD_RE.findall(text)


# ---------------------------------------------------------------------------
# Chunker — semantics of ingest.py:65-101 (greedy sentence packing)
# ---------------------------------------------------------------------------

def chunk_text(text: str, max_tokens: int = 200) -> List[str]:
    """Greedy sentence-packing chunker.

    Mirrors the reference exactly: accumulate sentences; when adding the
    next sentence would push the running token count past ``max_tokens``
    and the current chunk is non-empty, flush first.  A single oversized
    sentence therefore still becomes its own chunk.  Chunks are joined
    with a single space.  (ingest.py:85-98)
    """
    if not text:
        return []
    sentences = sent_tokenize(text)
    chunks: List[str] = []
    current_chunk: List[str] = []
    current_length = 0
    for sent in sentences:
        tokens = word_tokenize(sent)
        if current_length + len(tokens) > max_tokens and current_chunk:
            chunks.append(" ".join(current_chunk))
            current_chunk = []
            current_length = 0
        current_chunk.append(sent)
        current_length += len(tokens)
    if current_chunk:
        chunks.append(" ".join(current_chunk))
    return chunks


# ---------------------------------------------------------------------------
# N-grams — semantics of nlp_graph.py:35-58
# ---------------------------------------------------------------------------

def extract_ngrams(
    text: str, remove_stopwords: bool = True
) -> Tuple[List[str], List[str], List[str]]:
    """(unigrams, bigrams, trigrams).

    Note the reference subtlety kept here: stopwords are removed from
    *unigrams only*; bigrams/trigrams are built over the unfiltered
    lowercased-alnum token stream (nlp_graph.py:47-55).
    """
    tokens = [w.lower() for w in word_tokenize(text) if w.isalnum()]
    if remove_stopwords:
        unigrams = [t for t in tokens if t not in STOPWORDS]
    else:
        unigrams = tokens
    bigrams = [" ".join(tokens[i : i + 2]) for i in range(len(tokens) - 1)]
    trigrams = [" ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)]
    return unigrams, bigrams, trigrams


# ---------------------------------------------------------------------------
# Triple extraction
# ---------------------------------------------------------------------------
# The reference pipeline is: T5 generate() -> marker-string parse
# (triplets.py:154-192).  The parse is pure string code and is ported
# verbatim below.  The T5 model is replaced by a deterministic
# pattern-based generator that *emits the same marker format* the model
# would, so the verbatim parser stays in the execution path and defines
# the output schema exactly as in the reference.

def parse_triplet_output(triplet_text: str) -> List[Tuple[str, str, str]]:
    """Verbatim port of the reference's model-output parser
    (triplets.py:152-192): marker path, else two-space heuristic path."""
    triplets: List[Tuple[str, str, str]] = []
    if "<triplet>" in triplet_text:
        for segment in triplet_text.split("<triplet>"):
            if segment.strip():
                triple_content = (
                    segment.split("</triplet>")[0]
                    if "</triplet>" in segment
                    else segment
                )
                triple_content = triple_content.replace("<pad>", "")
                if "<relation>" in triple_content and "<object>" in triple_content:
                    subj = triple_content.split("<relation>")[0].strip()
                    rel = (
                        triple_content.split("<relation>")[1]
                        .split("<object>")[0]
                        .strip()
                    )
                    obj = triple_content.split("<object>")[1].strip()
                    if subj and rel and obj:
                        triplets.append((subj, rel, obj))
    else:
        cleaned_text = triplet_text.replace("<pad>", "").replace("</s>", "").strip()
        parts = re.split(r"\s{2,}", cleaned_text)
        if len(parts) == 3:
            subj, rel, obj = parts[0].strip(), parts[1].strip(), parts[2].strip()
            # reference appends UNCONDITIONALLY here (triplets.py:182-188)
            # — only the marker path has the truthiness guard (:174)
            triplets.append((subj, rel, obj))
    return triplets


def sanitize_relation(rel: str) -> str:
    """Port of triplets.py:207-218: strip non [0-9a-zA-Z_ ], spaces->_, upper."""
    rel_clean = re.sub(r"[^0-9a-zA-Z_ ]", "", rel)
    return rel_clean.replace(" ", "_").upper()


# Deterministic "model": SVO patterns over a fixed relation verb bank.
# Subject/object noun phrases = capitalized token sequences (the same
# shape the reference's entity-candidate regex expects, retrieval.py:332).
_NP = r"[A-Z][\w'-]*(?:\s+(?:of|the|and)\s+[A-Z][\w'-]*|\s+[A-Z][\w'-]*)*"
_REL_PATTERNS: List[Tuple[re.Pattern, str]] = [
    (re.compile(rf"({_NP})\s+founded\s+({_NP})"), "founded"),
    (re.compile(rf"({_NP})\s+acquired\s+({_NP})"), "acquired"),
    (re.compile(rf"({_NP})\s+works\s+at\s+({_NP})"), "works at"),
    (re.compile(rf"({_NP})\s+is\s+the\s+(?:CEO|founder|chairman)\s+of\s+({_NP})"), "leads"),
    (re.compile(rf"({_NP})\s+partnered\s+with\s+({_NP})"), "partnered with"),
    (re.compile(rf"({_NP})\s+is\s+(?:based|headquartered)\s+in\s+({_NP})"), "based in"),
    (re.compile(rf"({_NP})\s+invested\s+in\s+({_NP})"), "invested in"),
    (re.compile(rf"({_NP})\s+competes\s+with\s+({_NP})"), "competes with"),
    (re.compile(rf"({_NP})\s+develops\s+({_NP})"), "develops"),
    (re.compile(rf"({_NP})\s+sued\s+({_NP})"), "sued"),
]


# cheap prefilter: every _REL_PATTERNS entry requires one of these
# keywords, so sentences without any skip the 10-pattern scan entirely
# (pure optimization — output identical)
_REL_KEYWORDS_RE = re.compile(
    r"founded|acquired|works\s+at|CEO|founder|chairman|partnered|based|"
    r"headquartered|invested|competes|develops|sued"
)


def generate_triplet_text(sentence: str) -> str:
    """Deterministic stand-in for T5 ``generate()`` (triplets.py:146-149).

    Emits the exact marker format the reference's fine-tuned model emits
    (``<pad><triplet>S <relation>R <object>O</triplet></s>``) so the
    verbatim parser above is exercised on every sentence.  Sentences with
    no SVO pattern produce a bare ``<pad></s>`` (parser yields nothing,
    matching the reference's empty-extraction warning path).
    """
    parts = []
    if _REL_KEYWORDS_RE.search(sentence):
        for pat, rel in _REL_PATTERNS:
            for m in pat.finditer(sentence):
                parts.append(
                    f"<triplet>{m.group(1)} <relation>{rel} <object>{m.group(2)}</triplet>"
                )
    return "<pad>" + "".join(parts) + "</s>"


def extract_triplets(sentence: str) -> List[Tuple[str, str, str]]:
    """Full M3 path: deterministic generator -> verbatim parser."""
    return parse_triplet_output(generate_triplet_text(sentence))


# ---------------------------------------------------------------------------
# HTML -> text extraction (S2 replacement per north_star)
# ---------------------------------------------------------------------------

_HEAD_RE = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.IGNORECASE | re.DOTALL)
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def decode_page_bytes(raw: bytes) -> str:
    """utf-8 with latin-1 fallback — the reference's file-decode ladder
    (cli/main.py:134-146)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def extract_text_from_html(raw: bytes) -> str:
    """Deterministic trafilatura-style boilerplate strip.

    Drop <head>/<script>/<style> subtrees (boilerplate), strip tags,
    unescape entities, collapse whitespace.  Pure function of the bytes
    -> byte-identical text per url across any partitioning.
    """
    doc = decode_page_bytes(raw)
    doc = _HEAD_RE.sub(" ", doc)
    doc = _SCRIPT_STYLE_RE.sub(" ", doc)
    doc = _TAG_RE.sub(" ", doc)
    doc = _htmllib.unescape(doc)
    return _WS_RE.sub(" ", doc).strip()


# ---------------------------------------------------------------------------
# Deterministic hash embedder (M1/M2 test-mode stand-in)
# ---------------------------------------------------------------------------
# Feature hashing of word tokens + char 3-shingles into `dim` buckets
# with a crc32-derived sign, then L2 normalization (the reference
# normalizes too: common.py:86, ingest.py:119).  Deterministic across
# processes/platforms (crc32 is specified), cheap inside pandas UDFs.

EMBED_DIM = 768
_PREFIX_RE = re.compile(r"^(passage|query):\s*")


def _features(text: str) -> List[str]:
    toks = [w.lower() for w in word_tokenize(text) if w.isalnum()]
    feats = list(toks)
    joined = " ".join(toks)
    feats.extend(joined[i : i + 3] for i in range(len(joined) - 2))
    return feats


def _embed_text_py_ref(text: str, dim: int = EMBED_DIM) -> List[float]:
    """Reference implementation of the hash embedder: sequential
    per-feature loop.  Kept as (a) the non-ASCII execution path of
    :func:`embed_text_py` (char-window shingles differ from byte windows
    under multi-byte utf-8) and (b) the oracle the fast path's parity
    test compares against."""
    text = _PREFIX_RE.sub("", text or "")
    vec = [0.0] * dim
    for f in _features(text):
        h = zlib.crc32(f.encode("utf-8"))
        idx = h % dim
        sign = 1.0 if (h >> 16) & 1 else -1.0
        vec[idx] += sign
    norm = sum(v * v for v in vec) ** 0.5
    if norm == 0.0:
        # zero-vector fallback on empty/error input (retrieval.py:98-105)
        return vec
    # round-trip through float32 so the stored array<float> column and
    # this oracle hold bit-identical values -> threshold comparisons
    # (cosine >= 0.96) agree exactly between Spark and the oracle
    import struct

    return [
        struct.unpack("f", struct.pack("f", v / norm))[0] for v in vec
    ]


def _mk_crc_table() -> "np.ndarray":
    tbl = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (0xEDB88320 if c & 1 else 0)
        tbl.append(c)
    return np.array(tbl, dtype=np.uint32)


_CRC_TABLE = _mk_crc_table()
_U8, _U16, _UFF, _UINIT = (
    np.uint32(8),
    np.uint32(16),
    np.uint32(0xFF),
    np.uint32(0xFFFFFFFF),
)


def embed_text_py(text: str, dim: int = EMBED_DIM) -> List[float]:
    """Single-text hash embedding, L2-normalized.  The e5 ``passage:`` /
    ``query:`` prefixes (common.py:73-82, retrieval.py:93) are accepted
    and stripped so query/passage embeddings of equal text align.

    BIT-IDENTICAL numpy fast path for ASCII text (~4x over the loop,
    and this is the per-doc hot spot of the chunk-embedding stage):
    char 3-shingles of ASCII text are byte 3-windows, so their crc32s
    vectorize as three table lookups over the joined byte array; sign
    accumulation adds only ±1.0, and sums of integer-valued doubles
    below 2^53 are EXACT in any order, so ``bincount`` + numpy's
    sum-of-squares reproduce the sequential loop's doubles bit-for-bit;
    the final ``/ norm`` + float32 cast round identically to the
    struct round-trip.  Parity is pytest-gated against
    :func:`_embed_text_py_ref` (randomized corpus), and non-ASCII text
    takes the reference path outright."""
    stripped = _PREFIX_RE.sub("", text or "")
    toks = [w.lower() for w in word_tokenize(stripped) if w.isalnum()]
    joined = " ".join(toks)
    if not joined.isascii():
        return _embed_text_py_ref(text, dim)
    tok_h = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in toks),
        dtype=np.uint32,
        count=len(toks),
    )
    b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
    m = len(b) - 2
    if m > 0:
        crc = np.full(m, _UINIT, dtype=np.uint32)
        for k in range(3):
            crc = (crc >> _U8) ^ _CRC_TABLE[(crc ^ b[k : k + m]) & _UFF]
        sh_h = crc ^ _UINIT
    else:
        sh_h = np.empty(0, dtype=np.uint32)
    h = np.concatenate([tok_h, sh_h])
    if h.size == 0:
        return [0.0] * dim
    idx = (h % np.uint32(dim)).astype(np.intp)
    sign = np.where((h >> _U16) & np.uint32(1), 1.0, -1.0)
    vec = np.bincount(idx, weights=sign, minlength=dim)
    ss = float((vec * vec).sum())
    if ss == 0.0:
        return [0.0] * dim
    return (vec / (ss**0.5)).astype(np.float32).tolist()


def cosine(a: List[float], b: List[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    if na == 0.0 or nb == 0.0:
        return 0.0
    return num / (na * nb)
