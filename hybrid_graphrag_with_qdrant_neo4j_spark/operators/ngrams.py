"""Term graph: n-gram extraction -> term_chunk_edges (SURVEY.md F5/F6/M5).

Reference: nlp_graph.py:35-58 (extract_ngrams: lowercase + isalnum filter,
stopwords removed from unigrams only), nlp_graph.py:60-104 (MERGE writes
=> dropDuplicates), nlp_graph.py:134-215 (the reference's own Spark NLP
sketch, which collected to the driver — our version stays distributed
end-to-end and writes edges as a DataFrame).

Tokenization stays in a pandas UDF for parity (``str.isalnum`` has
Unicode semantics that JVM regexes don't reproduce exactly); everything
downstream (explode, dedup, joins) is JVM-side.
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import textproc as tp

_TERMS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("type", T.StringType()),
        ]
    )
)


@F.pandas_udf(_TERMS_TYPE)
def _ngram_udf(texts: pd.Series) -> pd.Series:
    def one(text: str) -> List[Tuple[str, str]]:
        uni, bi, tri = tp.extract_ngrams(text or "")
        # MERGE dedup (nlp_graph.py:93-94) happens HERE: the edge key is
        # (chunk_id, term, type), so duplicates can only occur within a
        # single chunk — deduping inside the UDF makes the whole stage
        # shuffle-free (dict preserves first-seen order deterministically)
        return list(
            dict.fromkeys(
                [(t, "unigram") for t in uni]
                + [(t, "bigram") for t in bi]
                + [(t, "trigram") for t in tri]
            )
        )

    return texts.map(one)


_TOKENS_TYPE = T.ArrayType(T.StringType())


@F.pandas_udf(_TOKENS_TYPE)
def _tokens_udf(texts: pd.Series) -> pd.Series:
    """Lowercased alnum token stream only — the one part of n-gram
    extraction that must stay in Python (``str.isalnum`` unicode
    parity); everything derived from it is JVM-side column algebra."""

    def one(text: str) -> List[str]:
        return [w.lower() for w in tp.word_tokenize(text or "") if w.isalnum()]

    return texts.map(one)


def _stopword_lit() -> F.Column:
    # frozen fixture -> literal array in the plan, broadcast with the task
    return F.array(*[F.lit(s) for s in sorted(tp.STOPWORDS)])


def _adjacent_grams(toks: F.Column, n: int) -> F.Column:
    """n-grams of adjacent tokens as space-joined strings, built by
    zip_with over shifted slices — whole-stage codegen, no Python."""
    width = F.size(toks) - (n - 1)
    if n == 2:
        grams = F.zip_with(
            F.slice(toks, F.lit(1), width),
            F.slice(toks, F.lit(2), width),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    else:
        grams = F.zip_with(
            F.zip_with(
                F.slice(toks, F.lit(1), width),
                F.slice(toks, F.lit(2), width),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            F.slice(toks, F.lit(3), width),
            lambda ab, c: F.concat_ws(" ", ab, c),
        )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast(_TOKENS_TYPE)
    )


def _tagged(arr: F.Column, tag: str) -> F.Column:
    return F.transform(
        arr,
        lambda x: F.struct(x.alias("term"), F.lit(tag).alias("type")),
    )


def term_chunk_edges(chunks: DataFrame, jvm_ngrams: bool = True) -> DataFrame:
    """chunks -> term_chunk_edges(chunk_id, term, type), MERGE-deduped.

    Cypher MERGE's at-most-once semantics (nlp_graph.py:93-94) need no
    shuffle at all: the dedup key contains chunk_id, so uniqueness is a
    per-chunk property enforced before the explode.  A groupBy here
    shuffled ~600 rows/chunk for nothing (measured 110 s of a 165 s
    pipeline run at 100k pages — now ~0).  Cross-chunk aggregations
    downstream (term search) still do their own partial+final
    aggregation.

    ``jvm_ngrams=True`` (default): Python emits ONLY the tokenized
    array (unicode ``str.isalnum`` parity needs Python); bigram/trigram
    concatenation, the unigram stopword filter, per-type dedup, and
    type tagging are JVM column expressions — this was the hottest
    per-doc stage of the KG pipeline (the UDF built ~1600 n-gram
    strings + structs per chunk and shipped them through Arrow; now
    ~540 tokens cross Arrow and codegen builds the rest).  Output is
    SET-identical to the Python path (``jvm_ngrams=False``, kept for
    the equivalence test): same per-type dedup, same stopwords-on-
    unigrams-only subtlety (nlp_graph.py:47-55) — row ORDER differs
    (grouped by type instead of first-seen interleave), which no
    consumer observes (edges are a set; oracles compare sorted).
    """
    if not jvm_ngrams:
        return chunks.select(
            "chunk_id", F.explode(_ngram_udf(F.col("text"))).alias("t")
        ).select(
            "chunk_id", F.col("t.term").alias("term"), F.col("t.type").alias("type")
        )
    # separate projection -> the Arrow UDF lands in its own
    # ArrowEvalPython node and runs ONCE per row; the uni/bi/tri
    # expressions below reference its output column, not the UDF call
    tokd = chunks.select("chunk_id", _tokens_udf(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    sw = _stopword_lit()
    uni = F.array_distinct(
        F.filter(toks, lambda t: ~F.array_contains(sw, t))
    )
    bi = F.array_distinct(_adjacent_grams(toks, 2))
    tri = F.array_distinct(_adjacent_grams(toks, 3))
    terms = F.concat(
        _tagged(uni, "unigram"), _tagged(bi, "bigram"), _tagged(tri, "trigram")
    )
    return tokd.select(
        "chunk_id", F.explode(terms).alias("t")
    ).select(
        "chunk_id", F.col("t.term").alias("term"), F.col("t.type").alias("type")
    )


def term_chunk_occurrences(chunks: DataFrame) -> DataFrame:
    """chunks -> (chunk_id, term) with ONE ROW PER OCCURRENCE — the
    frequency-preserving sibling of :func:`term_chunk_edges` that BM25
    ranking needs (``term_chunk_edges`` is MERGE-deduped per chunk, so
    term frequencies are gone by design; reference nlp_graph.py:93-94).

    Same vocabulary as the edge table (stopword-filtered unigrams +
    bigrams + trigrams from the identical tokenizer), same plan shape
    (one Arrow UDF emits the token array, n-gram construction is JVM
    column algebra) — only the ``array_distinct`` calls are dropped so
    multiplicity survives.  No shuffle: the output is a per-row explode;
    downstream BM25 statistics do their own partial+final aggregation."""
    tokd = chunks.select("chunk_id", _tokens_udf(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    sw = _stopword_lit()
    uni = F.filter(toks, lambda t: ~F.array_contains(sw, t))
    grams = F.concat(uni, _adjacent_grams(toks, 2), _adjacent_grams(toks, 3))
    return tokd.select("chunk_id", F.explode(grams).alias("term"))


def term_counts_per_chunk(edges: DataFrame) -> DataFrame:
    """Per-chunk n-gram counts (cli/main.py:90-97 returns lens)."""
    return edges.groupBy("chunk_id", "type").agg(F.count("*").alias("n_terms"))
