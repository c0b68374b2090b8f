"""Frozen english stopword list.

The reference filters unigrams through NLTK's english stopword corpus
(``graphrag/core/nlp_graph.py:14-19,47-51``).  NLTK is not available in
this environment and its list can drift between releases, so the list
itself is pinned here as a fixture (SURVEY.md F6).  This is the standard
NLTK english list (public domain word list).
"""

STOPWORDS = frozenset(
    """
    i me my myself we our ours ourselves you you're you've you'll you'd
    your yours yourself yourselves he him his himself she she's her hers
    herself it it's its itself they them their theirs themselves what
    which who whom this that that'll these those am is are was were be
    been being have has had having do does did doing a an the and but if
    or because as until while of at by for with about against between
    into through during before after above below to from up down in out
    on off over under again further then once here there when where why
    how all any both each few more most other some such no nor not only
    own same so than too very s t can will just don don't should
    should've now d ll m o re ve y ain aren aren't couldn couldn't didn
    didn't doesn doesn't hadn hadn't hasn hasn't haven haven't isn isn't
    ma mightn mightn't mustn mustn't needn needn't shan shan't shouldn
    shouldn't wasn wasn't weren weren't won won't wouldn wouldn't
    """.split()
)

# Sorted tuple for deterministic SQL inlining (oracle queries embed the
# list as a literal IN (...) set — order-stable across runs).
STOPWORDS_SORTED = tuple(sorted(STOPWORDS))


def sql_stopword_list() -> str:
    """Render the stopword set as a SQL string literal list."""
    return ", ".join("'" + w.replace("'", "''") + "'" for w in STOPWORDS_SORTED)
