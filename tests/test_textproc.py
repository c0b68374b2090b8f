"""String-level fixtures for the reference-semantics ports (FIXTURES.md §3)."""

from hybrid_graphrag_with_qdrant_neo4j_spark import textproc as tp


# ---- chunker (ingest.py:65-101 semantics) ----

def test_chunk_empty():
    assert tp.chunk_text("") == []
    assert tp.chunk_text(None if False else "") == []


def test_chunk_single_long_sentence_is_own_chunk():
    sent = " ".join(["word"] * 50) + "."
    out = tp.chunk_text(sent, max_tokens=10)
    assert out == [sent]  # oversized sentence still forms one chunk


def test_chunk_greedy_packing():
    # 3 sentences x 4 tokens (3 words + '.'); max 8 -> [s1 s2], [s3]
    text = "a b c. d e f. g h i."
    out = tp.chunk_text(text, max_tokens=8)
    assert out == ["a b c. d e f.", "g h i."]


def test_chunk_exact_boundary():
    # 2 sentences x 4 tokens; max 8 -> both fit exactly (strict >)
    text = "a b c. d e f."
    assert tp.chunk_text(text, max_tokens=8) == ["a b c. d e f."]


# ---- n-grams (nlp_graph.py:35-58 semantics) ----

def test_ngrams_lowercase_alnum_and_stopwords():
    uni, bi, tri = tp.extract_ngrams("The Quick fox, the lazy dog!")
    # stopwords removed from unigrams only
    assert uni == ["quick", "fox", "lazy", "dog"]
    # bigrams/trigrams over the unfiltered token stream
    assert bi[0] == "the quick" and "the lazy" in bi
    assert tri[0] == "the quick fox"


def test_ngrams_no_stopword_removal():
    uni, _, _ = tp.extract_ngrams("the fox", remove_stopwords=False)
    assert uni == ["the", "fox"]


# ---- triple parser (verbatim port of triplets.py:154-192) ----

def test_parse_marker_format():
    out = tp.parse_triplet_output(
        "<pad><triplet>Alice <relation>founded <object>Acme</triplet></s>"
    )
    assert out == [("Alice", "founded", "Acme")]


def test_parse_marker_multiple():
    out = tp.parse_triplet_output(
        "<triplet>A <relation>r1 <object>B</triplet>"
        "<triplet>C <relation>r2 <object>D</triplet>"
    )
    assert out == [("A", "r1", "B"), ("C", "r2", "D")]


def test_parse_marker_missing_object_dropped():
    assert tp.parse_triplet_output("<triplet>A <relation>r1 only</triplet>") == []


def test_parse_marker_empty_fields_dropped():
    assert tp.parse_triplet_output("<triplet> <relation>r <object>O</triplet>") == []


def test_parse_two_space_heuristic():
    assert tp.parse_triplet_output("<pad>Alice  founded  Acme</s>") == [
        ("Alice", "founded", "Acme")
    ]


def test_parse_two_space_wrong_arity():
    assert tp.parse_triplet_output("<pad>Alice  founded</s>") == []
    assert tp.parse_triplet_output("a  b  c  d") == []


# ---- sanitize_relation (triplets.py:207-218) ----

def test_sanitize_relation():
    assert tp.sanitize_relation("works at!") == "WORKS_AT"
    assert tp.sanitize_relation("co-founded (in 1999)") == "COFOUNDED_IN_1999"
    assert tp.sanitize_relation("a_b c") == "A_B_C"


# ---- pattern extractor end-to-end ----

def test_extract_triplets_known_sentence():
    out = tp.extract_triplets("Alice Harper founded Acme Corporation in 1999.")
    assert out == [("Alice Harper", "founded", "Acme Corporation")]


def test_extract_triplets_filler_sentence_empty():
    assert tp.extract_triplets("the quarterly report was longer than expected.") == []


def test_extract_triplets_ceo_pattern():
    out = tp.extract_triplets("Bob Stone is the CEO of Globex Systems since 2015.")
    assert out == [("Bob Stone", "leads", "Globex Systems")]


# ---- html extraction ----

def test_extract_text_strips_head_and_tags():
    html = (
        b"<html><head><title>T</title><script>x</script></head>"
        b"<body><p>Hello </p><p>world. </p></body></html>"
    )
    assert tp.extract_text_from_html(html) == "Hello world."


def test_extract_text_latin1_fallback():
    raw = "caf\xe9 page".encode("latin-1")
    assert "caf\xe9" in tp.extract_text_from_html(b"<body>" + raw + b"</body>")


def test_extract_text_entities_unescaped():
    assert tp.extract_text_from_html(b"<body>a &amp; b</body>") == "a & b"


# ---- embedder ----

def test_embed_deterministic_and_normalized():
    v1 = tp.embed_text_py("Acme Corporation")
    v2 = tp.embed_text_py("Acme Corporation")
    assert v1 == v2
    assert abs(sum(x * x for x in v1) - 1.0) < 1e-5


def test_embed_prefix_stripped():
    assert tp.embed_text_py("passage: foo bar") == tp.embed_text_py("foo bar")
    assert tp.embed_text_py("query: foo bar") == tp.embed_text_py("foo bar")


def test_embed_empty_is_zero_vector():
    assert tp.embed_text_py("") == [0.0] * tp.EMBED_DIM


def test_cosine_identical_is_one():
    v = tp.embed_text_py("hello world")
    assert abs(tp.cosine(v, v) - 1.0) < 1e-9


def test_embed_fast_path_bit_identical_to_reference():
    """The numpy ASCII fast path must reproduce the sequential loop
    reference (`_embed_text_py_ref`) bit-for-bit: stored embeddings,
    the >=0.96 linking threshold, and the driver oracles all assume one
    embedding function."""
    import random
    import string

    rng = random.Random(20260817)
    words = [
        "".join(
            rng.choices(string.ascii_lowercase + string.digits, k=rng.randint(1, 10))
        )
        for _ in range(300)
    ]
    cases = [
        "",
        " ",
        "passage: hello world",
        "query:  x",
        "a.b,c;d! e? (f) [g]",
        "x" * 2000,
        "ab",            # joined shorter than one 3-shingle window
        "héllo wörld 北京 straße",   # non-ASCII -> reference path
        "mixed ascii und öäü tail",
    ]
    cases += [
        " ".join(rng.choices(words, k=rng.randint(0, 250)))
        + rng.choice([".", "!", "?", ""])
        for _ in range(150)
    ]
    for c in cases:
        assert tp.embed_text_py(c) == tp._embed_text_py_ref(c), repr(c[:50])
