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


def test_codes_within_radius_exact_ball():
    """LSH probe enumeration: the radius-r ball around a code contains
    exactly sum_{i<=r} C(bits,i) distinct codes, all within hamming r."""
    from math import comb
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators.ann_index import (
        _codes_within_radius,
    )

    for bits, radius, code in [(8, 1, 0), (8, 2, 0xA5), (6, 3, 0x2A)]:
        ball = _codes_within_radius(code, bits, radius)
        assert len(ball) == len(set(ball)) == sum(comb(bits, i) for i in range(radius + 1))
        assert all(bin(c ^ code).count("1") <= radius and c < (1 << bits) for c in ball)


def test_minhash_coeffs_memoized_and_deterministic():
    from hybrid_graphrag_with_qdrant_neo4j_spark.operators import dedup

    a1, b1 = dedup._mh_coeffs(64)
    a2, b2 = dedup._mh_coeffs(64)
    assert a1 is a2 and b1 is b2  # lru_cache hit — hot path allocates once
    assert (a1 >= 1).all() and (a1 < dedup._MH_P).all()


def test_food_analysis_first_match_precedence():
    """Rule-cascade property: for any path containing several keywords,
    the FIRST matching rule wins (elif semantics of the reference)."""
    import itertools

    KW = ["salad", "cake", "grill", "fry", "fancy", "simple",
          "healthy", "indulgent", "italian", "pasta", "mexican", "taco"]

    def py_reference(path):
        # straight port of food_analyzer.py:10-90 rule order
        if "salad" in path: ing = ["lettuce", "tomato", "cucumber"]
        elif "cake" in path: ing = ["flour", "sugar", "chocolate"]
        else: ing = ["unknown_ingredient_1", "unknown_ingredient_2"]
        if "grill" in path: tech = "grilling"
        elif "fry" in path: tech = "frying"
        else: tech = "unknown_technique"
        if "healthy" in path or "salad" in path: nut = ["healthy", "low-calorie"]
        elif "indulgent" in path or "cake" in path: nut = ["indulgent", "high-calorie"]
        else: nut = ["balanced"]
        if "italian" in path or "pasta" in path: cui = "Italian"
        elif "mexican" in path or "taco" in path: cui = "Mexican"
        else: cui = "Unknown Cuisine"
        return ing, tech, nut, cui

    # exhaustive over 2-keyword combos beats sampling here (fast, total)
    paths = ["_".join(p) + ".jpg" for p in itertools.permutations(KW, 2)]
    import tests.conftest  # noqa: F401  (session fixture not needed; spark via getOrCreate)
    from pyspark.sql import SparkSession
    from hybrid_graphrag_with_qdrant_neo4j_spark.functions import multimodal

    spark = SparkSession.getActiveSession()
    if spark is None:
        from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark
        spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    df = spark.createDataFrame([(p,) for p in paths], "path string")
    out = {r["path"]: r for r in multimodal.food_analysis(df).collect()}
    for p in paths:
        ing, tech, nut, cui = py_reference(p)
        r = out[p]
        assert (r["ingredients"], r["cooking_technique"],
                r["nutritional_trends"], r["cuisine"]) == (ing, tech, nut, cui), p


@settings(max_examples=300, deadline=None)
@given(_text)
def test_embed_fast_path_equals_reference_for_all_inputs(text):
    """The numpy ASCII fast path of the hash embedder is bit-identical
    to the sequential reference loop for arbitrary unicode input (the
    non-ASCII branch dispatches to the reference outright)."""
    assert tp.embed_text_py(text) == tp._embed_text_py_ref(text)
