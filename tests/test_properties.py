"""Property-based tests (hypothesis) for the deterministic text core —
invariants that hold for ALL inputs, not just fixtures."""

from hypothesis import given, settings, strategies as st

from hybrid_graphrag_with_qdrant_neo4j_spark import textproc as tp
from hybrid_graphrag_with_qdrant_neo4j_spark.operators.dedup import (
    minhash_signature_py,
    simhash_py,
)

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs")),
    max_size=400,
)


@settings(max_examples=200, deadline=None)
@given(_text, st.integers(min_value=1, max_value=50))
def test_chunker_preserves_sentences(text, max_tokens):
    """Every sentence lands in exactly one chunk, in order; joining the
    chunks with spaces reproduces the sentence-joined text."""
    sentences = tp.sent_tokenize(text)
    chunks = tp.chunk_text(text, max_tokens)
    assert " ".join(chunks) == " ".join(sentences)
    if not sentences:
        assert chunks == []


@settings(max_examples=200, deadline=None)
@given(_text, st.integers(min_value=5, max_value=60))
def test_chunker_respects_budget_except_single_oversized(text, max_tokens):
    for chunk in tp.chunk_text(text, max_tokens):
        n = len(tp.word_tokenize(chunk))
        if n > max_tokens:
            # only legal when the chunk is one single oversized sentence
            assert len(tp.sent_tokenize(chunk)) == 1


@settings(max_examples=200, deadline=None)
@given(_text)
def test_ngram_counts_consistent(text):
    uni, bi, tri = tp.extract_ngrams(text, remove_stopwords=False)
    assert len(bi) == max(len(uni) - 1, 0)
    assert len(tri) == max(len(uni) - 2, 0)
    assert all(t == t.lower() for t in uni)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=100))
def test_sanitize_relation_charset(rel):
    out = tp.sanitize_relation(rel)
    assert all(c.isalnum() or c == "_" for c in out)
    assert out == out.upper()


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60), st.text(max_size=60), st.text(max_size=60))
def test_parser_roundtrip_marker_format(s, r, o):
    """generate -> parse is lossless for clean field values (no markers,
    no leading/trailing space, no internal whitespace runs)."""

    def clean(x):
        x = " ".join(x.split())
        return x if x and "<" not in x and ">" not in x else "X"

    s, r, o = clean(s), clean(r), clean(o)
    text = f"<pad><triplet>{s} <relation>{r} <object>{o}</triplet></s>"
    assert tp.parse_triplet_output(text) == [(s, r, o)]


@settings(max_examples=100, deadline=None)
@given(_text)
def test_embedding_normalized_or_zero(text):
    v = tp.embed_text_py(text)
    n = sum(x * x for x in v)
    assert n == 0.0 or abs(n - 1.0) < 1e-3


@settings(max_examples=50, deadline=None)
@given(_text)
def test_minhash_identity(text):
    a = minhash_signature_py(text, 32, 3)
    b = minhash_signature_py(text, 32, 3)
    assert a == b and len(a) == 32


@settings(max_examples=50, deadline=None)
@given(_text)
def test_simhash_range(text):
    h = simhash_py(text)
    assert -(1 << 63) <= h < (1 << 63)
