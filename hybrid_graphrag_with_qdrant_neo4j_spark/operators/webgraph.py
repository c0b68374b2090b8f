"""Web link graph over the raw pages table (Common-Crawl-native).

The reference pipeline never looks at a page's outbound links — it
ingests each document in isolation (ingest.py:38-63).  At crawl scale
the link structure is itself first-class curation signal: which hosts
are hubs, which domains does the corpus over-sample, which pages should
a pruning pass keep because high-rank domains point at them.  This
module extracts that structure from the SAME ``html`` binary column the
text extractor reads, so a single pruned scan of the pages table feeds
both the KG build and the link graph.

Pipeline shape (all DataFrame-native):

    pages(url, html, ...)
      → outlinks        whole-stage-codegen href extraction: the decode
                        ladder (utf-8→latin-1, same semantics as
                        textproc.decode_page_bytes) as is_valid_utf8 +
                        zero-copy cast, regexp_extract_all + explode —
                        no Python worker in the loop at all
      → resolved_links  whole-stage-codegen resolution: absolute http(s)
                        kept, '/'-relative resolved against the source
                        host, everything else (fragments, mailto:)
                        dropped
      → host_graph      (src_host, dst_host, n_links) groupBy — the
                        map-side partial agg absorbs per-page duplicate
                        links before the shuffle
      → domain_rank     PageRank over DISTINCT host pairs (reuses
                        operators/graph_analytics.pagerank)

100 TB design: href extraction is embarrassingly parallel (one pass
over the pages scan, no shuffle); the only shuffle is the host-pair
groupBy, keyed on (src_host, dst_host) — hot dst hosts (every crawl has
them; the synthetic corpus plants them deliberately) are absorbed by
map-side combine because the PAIR key stays well-distributed even when
one side is hot.  The host graph itself is tiny relative to the corpus
(|hosts| ≪ |pages|), so the iterative rank runs on a table that fits
comfortably in one executor's cache — rank cost does not scale with
corpus bytes, only with distinct hosts.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from . import graph_analytics

# href attribute of an anchor tag; [^>]* keeps it inside the tag.  RE2-
# compatible (no lookaround/backrefs) so the DuckDB oracle twin runs the
# IDENTICAL pattern via regexp_extract_all.
_HREF_PATTERN = r'<a\s[^>]*href="([^"]*)"'
_HREF_RE = re.compile(_HREF_PATTERN)

_HOST_PATTERN = r"^https?://([^/]+)"


def decode_ladder(bin_col) -> Column:
    """JVM twin of textproc.decode_page_bytes (utf-8 strict, else
    latin-1) as a whole-stage-codegen expression: ``is_valid_utf8`` is
    the exact strict-utf-8 predicate, the valid branch is the ZERO-COPY
    binary→string cast (Spark strings are utf-8 bytes already), and the
    fallback is ``decode(·, 'ISO-8859-1')``, which never throws because
    latin-1 maps every byte.  Pinned equal to the Python ladder on
    valid-utf8 / latin-1 / U+FFFD-bearing / NULL / empty inputs by
    ``test_decode_ladder_matches_python``."""
    c = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    s_raw = c.cast("string")
    return F.when(F.is_valid_utf8(s_raw), s_raw).otherwise(
        F.decode(c, "ISO-8859-1")
    )


def outlinks(pages: DataFrame, html_col: str = "html",
             url_col: str = "url") -> DataFrame:
    """(src_url, href) — one row per anchor occurrence, duplicates kept
    (multiplicity is signal for the weighted host graph).

    Fully JVM-side: decode ladder (:func:`decode_ladder`) +
    ``regexp_extract_all`` + explode, all inside one whole-stage-codegen
    span — no Python worker, no Arrow serde.  The previous mapInPandas
    implementation spent ~8.6 s of an 8-core 21.8 s run shipping html
    INTO Python and another ~6 s shipping exploded rows back OUT, while
    the regex itself cost 2.8 s (decomposed on the 2M-page corpus); the
    JVM form deletes both serde legs and runs the same job in 13.4 s
    with an identical result (35M links bit-equal on the 8M corpus).
    regexp runs ONCE per page — the plan gate counts a single
    regexp_extract_all (the historical scalar-PYTHON-UDF + explode shape
    ran its UDF twice via InferFiltersFromGenerate; duplicating a
    codegen'd regex into an inferred size()>0 filter does not happen
    here, asserted by test_host_graph_plan_single_pass_single_shuffle).

    Pages without links disappear (link table, not a page census —
    page-level stats come from :func:`domain_profile`).
    """
    arr = F.regexp_extract_all(
        decode_ladder(html_col), F.lit(_HREF_PATTERN), 1
    )
    return pages.select(
        F.col(url_col).alias("src_url"), F.explode(arr).alias("href")
    )


def host_of(url_col) -> Column:
    """scheme-stripped host — regexp both here and in the SQL twin so
    the two sides share one definition."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.regexp_extract(c, _HOST_PATTERN, 1)


def resolve_href(src: str = "src_url", href: str = "href") -> Column:
    """Resolved destination url (or NULL): absolute http(s) hrefs kept
    verbatim, '/'-relative resolved against the source page's
    scheme+host, everything else (fragments, mailto:, other schemes)
    NULL.  Pure whole-stage-codegen column expression — no UDF."""
    base = F.regexp_extract(F.col(src), r"^(https?://[^/]+)", 1)
    return (
        F.when(F.col(href).rlike("^https?://"), F.col(href))
        .when(F.col(href).startswith("/"), F.concat(base, F.col(href)))
        .otherwise(F.lit(None))
    )


def resolved_links(links: DataFrame, src: str = "src_url",
                   href: str = "href") -> DataFrame:
    """(src_url, dst_url) with unresolvable hrefs dropped — see
    :func:`resolve_href`."""
    return (
        links.select(
            F.col(src).alias("src_url"),
            resolve_href(src, href).alias("dst_url"),
        )
        .filter(F.col("dst_url").isNotNull())
    )


def host_graph(links: DataFrame, drop_self: bool = True) -> DataFrame:
    """(src_host, dst_host, n_links) — the weighted domain graph.

    Self-host edges (intra-site navigation) are dropped by default:
    they dominate raw counts on any real site and carry no cross-domain
    authority signal.  n_links counts anchor OCCURRENCES (duplicates
    included) — the weight a weighted rank would use; the unweighted
    :func:`domain_rank` de-duplicates pairs itself.
    """
    hosts = links.select(
        host_of("src_url").alias("src_host"),
        host_of("dst_url").alias("dst_host"),
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if drop_self:
        hosts = hosts.filter(F.col("src_host") != F.col("dst_host"))
    return hosts.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links")
    )


def domain_rank(hgraph: DataFrame, damping: float = 0.85,
                iterations: int = 10,
                local_under: int | None = 50_000) -> DataFrame:
    """(host, pagerank) — PageRank over the distinct host pairs of a
    :func:`host_graph`.  Same contract as graph_analytics.pagerank
    (GraphX un-normalized form, dangling mass dropped); link
    multiplicity is ignored — an unweighted authority rank, which is
    what crawl frontier scoring conventionally uses.

    ``local_under=50_000`` host-pair edges by default: a host graph is
    orders of magnitude smaller than its corpus, so small/medium crawls
    rank driver-local (numpy) instead of paying ~20 scheduler rounds;
    a crawl with more cross-host pairs than the gate runs the
    distributed loop unchanged."""
    r = graph_analytics.pagerank(
        hgraph, src="src_host", dst="dst_host",
        damping=damping, iterations=iterations, local_under=local_under,
    )
    return r.select(F.col("entity_id").alias("host"), "pagerank")


def url_rank(links: DataFrame, damping: float = 0.85,
             iterations: int = 10,
             local_under: int | None = None) -> DataFrame:
    """(url, pagerank) — PageRank over the URL-level link graph
    (:func:`resolved_links` output with both endpoints normalized via
    :func:`normalize_url`), the page-granular authority signal a
    training-data sampler weights individual documents by, where
    :func:`domain_rank` can only weight whole hosts.

    UNLIKE the host-level ranks, this graph is CORPUS-SIZED — |urls| ~
    |pages| — so it is the one webgraph operator whose cost scales with
    crawl bytes, which is why ``local_under`` defaults to None (the
    distributed loop: edge table repartitioned+persisted once, each of
    the 10 iterations shuffles only rank-sized rows; see
    graph_analytics.pagerank).  At 100 TB this is the canonical
    web-scale iterative job; the per-iteration plan is pinned by
    `test_pagerank_iteration_reuses_cached_edges`.  Normalizing both
    endpoints first collapses fragment/port/case/trailing-slash
    variants so rank mass lands on one node per resource instead of
    splitting across crawl-record spellings."""
    g = links.select(
        normalize_url("src_url").alias("src"),
        normalize_url("dst_url").alias("dst"),
    )
    r = graph_analytics.pagerank(
        g, src="src", dst="dst",
        damping=damping, iterations=iterations, local_under=local_under,
    )
    return r.select(F.col("entity_id").alias("url"), "pagerank")


def normalize_url(url_col) -> Column:
    """Crawl-canonical url form: strip the fragment, lowercase the
    scheme+host (never the path — paths are case-significant), drop the
    scheme's default port (:80 http / :443 https), drop the trailing
    slash RUN (the whole run, not one slash — single-slash stripping is
    not idempotent on 'https://a.example//', found by the seeded
    property sweep).  Two crawl records of 'HTTPS://Site.Example:443/p#x'
    and 'https://site.example/p' normalize to the same key — the
    exact-dedup identity a re-fetch pipeline groups on BEFORE content
    hashing.

    Pure whole-stage-codegen regexp chain (no UDF); the DuckDB twin
    runs the same RE2 patterns (replacement backref syntax differs,
    $1 vs \\1 — semantics identical).
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    u = F.regexp_replace(c, r"#.*$", "")
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1))
    tail = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", "")
    head = F.regexp_replace(head, r"^(http://[^/:]+):80$", "$1")
    head = F.regexp_replace(head, r"^(https://[^/:]+):443$", "$1")
    return F.regexp_replace(F.concat(head, tail), r"/+$", "")


def url_dedup_groups(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """(norm_url, n_records, n_distinct_urls) per normalized url — the
    crawl-record grouping that collapses fragment/port/case variants of
    one resource.  One hash groupBy on the normalized key; map-side
    partials absorb per-partition variant mass."""
    return (
        pages.select(normalize_url(url_col).alias("norm_url"),
                     F.col(url_col).alias("_u"))
        .groupBy("norm_url")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("_u").alias("n_distinct_urls"),
        )
    )


def domain_rank_weighted(hgraph: DataFrame, damping: float = 0.85,
                         iterations: int = 10,
                         local_under: int | None = 50_000) -> DataFrame:
    """(host, pagerank) with mass split ∝ n_links — a host linked 50×
    outranks one linked once, where :func:`domain_rank` treats both
    the same.  See graph_analytics.weighted_pagerank for the exact
    iteration contract; ``local_under`` as in :func:`domain_rank`."""
    r = graph_analytics.weighted_pagerank(
        hgraph, src="src_host", dst="dst_host", weight="n_links",
        damping=damping, iterations=iterations, local_under=local_under,
    )
    return r.select(F.col("entity_id").alias("host"), "pagerank")


def host_hits(hgraph: DataFrame, iterations: int = 10,
              local_under: int | None = 50_000) -> DataFrame:
    """(host, hub, authority) — HITS over the distinct host pairs of a
    :func:`host_graph` (see graph_analytics.hits for the exact
    L1-normalized iteration contract).  On a crawl's domain graph, hub
    hosts are the directories/aggregators whose outlinks are worth
    frontier-expanding; authority hosts are the content domains those
    hubs agree on — the two-sided signal PageRank collapses into one.
    ``local_under`` as in :func:`domain_rank`."""
    r = graph_analytics.hits(
        hgraph, src="src_host", dst="dst_host",
        iterations=iterations, local_under=local_under,
    )
    return r.select(F.col("entity_id").alias("host"), "hub", "authority")


def reciprocity(hgraph: DataFrame) -> DataFrame:
    """(host, n_out_hosts, n_reciprocal, reciprocity) — per-host link
    reciprocity over the DISTINCT host pairs: how many of a host's
    out-neighbors link back, and the ratio.  Organic linking is largely
    one-directional (content cites content); wholesale reciprocation is
    the signature of link-exchange schemes, so a high ratio on a
    high-out-degree host is a spam flag the rank-based signals
    (:func:`spam_mass`) don't capture directly.  Hosts with no
    out-links are absent (ratio undefined, not 0).

    Plan: distinct pairs self-joined on the REVERSED pair key (one
    shuffle, equi-join — never a cartesian), then one groupBy on src
    with algebraic aggregates.  Scales with |host pairs|, not corpus
    bytes."""
    g = hgraph.select("src_host", "dst_host").distinct()
    rev = g.select(
        F.col("dst_host").alias("src_host"),
        F.col("src_host").alias("dst_host"),
        F.lit(1).alias("_recip"),
    )
    full = g.join(rev, ["src_host", "dst_host"], "left")
    return full.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("n_out_hosts"),
        F.sum(F.coalesce("_recip", F.lit(0))).alias("n_reciprocal"),
        (
            F.sum(F.coalesce("_recip", F.lit(0))).cast("double")
            / F.count("*")
        ).alias("reciprocity"),
    )


def trusted_hosts(pages: DataFrame, min_pages: int = 2,
                  min_quality: float = 0.5, url_col: str = "url",
                  text_col: str = "text",
                  lang_col: str = "lang") -> DataFrame:
    """One-column (host) seed set for :func:`trust_rank`: hosts whose
    :func:`domain_profile` shows at least ``min_pages`` pages with mean
    quality ≥ ``min_quality``.  Deterministic across engines: the
    profile's mean_quality is an exact integer-micro-unit mean (see
    :func:`domain_profile`), so the threshold comparison never rides on
    float dust.  In a production crawl the seed list would more likely
    be a curated whitelist — this helper is the data-derived default."""
    prof = domain_profile(pages, url_col=url_col, text_col=text_col,
                          lang_col=lang_col)
    return prof.filter(
        (F.col("n_pages") >= min_pages)
        & (F.col("mean_quality") >= min_quality)
    ).select("host")


def trust_rank(hgraph: DataFrame, seeds, damping: float = 0.85,
               iterations: int = 10,
               local_under: int | None = 50_000) -> DataFrame:
    """(host, trust) — TrustRank over the host graph: personalized
    PageRank restarted onto a trusted seed set, so trust mass flows only
    along links REACHABLE from good hosts (Gyöngyi, Garcia-Molina &
    Pedersen, "Combating Web Spam with TrustRank", VLDB 2004).  A host
    nobody trustworthy links to ends with trust 0 regardless of how many
    spam farms point at it — the property plain :func:`domain_rank`
    lacks.

    ``seeds`` is a host list or a one-column DataFrame (e.g.
    :func:`trusted_hosts`).  Iteration contract is exactly
    graph_analytics.personalized_pagerank's (restart = 1/|S|, dangling
    mass dropped, trust > 0 rows only); ``local_under`` dispatches
    driver-local below 50k host pairs like the other webgraph ranks.

    100 TB design: the walk runs on the host graph, not the corpus —
    cost scales with |host pairs|.  Seed selection via
    :func:`trusted_hosts` is one pruned corpus scan + one groupBy."""
    r = graph_analytics.personalized_pagerank(
        hgraph, seeds, src="src_host", dst="dst_host",
        damping=damping, iterations=iterations, local_under=local_under,
    )
    return r.select(
        F.col("entity_id").alias("host"), F.col("ppr").alias("trust")
    )


def spam_mass(hgraph: DataFrame, seeds, damping: float = 0.85,
              iterations: int = 10,
              local_under: int | None = 50_000,
              rank: DataFrame | None = None) -> DataFrame:
    """(host, pagerank, trust, spam_mass) — relative spam-mass
    estimate per ranked host (Gyöngyi et al., "Link Spam Detection
    Based on Mass Estimation", VLDB 2006): the fraction of a host's
    PageRank NOT explained by trust flowing from the seed set,

        spam_mass = max(0, (p̂ − t̂) / p̂),  p̂ = pr/Σpr, t̂ = trust/Σtrust

    where pr is the unweighted :func:`domain_rank` and trust is
    :func:`trust_rank` over the SAME host graph with the SAME damping
    and iteration count.  p̂ > 0 always (the un-normalized PageRank
    floor is 1−d), so the division is total; spam_mass ∈ [0, 1], with
    1 = "all of this host's authority comes from outside the trusted
    web" — a link farm flags near 1, a well-linked legitimate host near
    0.  If the seed set contributes no trust at all (empty seeds), every
    host's spam_mass is 1 by the same formula limit — callers should
    treat an empty seed set as a configuration error.

    One rank each side, one broadcastable two-row sum, one hash join on
    host — no corpus rescans.  Ordering within equal scores is not
    defined; consumers rank by (spam_mass, pagerank).

    ``rank``: an already-computed (host, pagerank) DataFrame for the
    SAME host graph / damping / iterations (e.g. the pipeline's
    materialized ``domain_rank`` stage) — skips recomputing the
    unseeded walk.  Caller owns the consistency contract."""
    pr = rank if rank is not None else domain_rank(
        hgraph, damping=damping, iterations=iterations,
        local_under=local_under)
    tr = trust_rank(hgraph, seeds, damping=damping, iterations=iterations,
                    local_under=local_under)
    p_sum = pr.agg(F.sum("pagerank").alias("_ps"))
    t_sum = tr.agg(F.sum("trust").alias("_ts"))
    sums = F.broadcast(p_sum.crossJoin(t_sum))
    j = (
        pr.join(tr, "host", "left")
        .withColumn("trust", F.coalesce("trust", F.lit(0.0)))
        .crossJoin(sums)
    )
    p_hat = F.col("pagerank") / F.col("_ps")
    t_hat = F.when(
        F.col("_ts") > 0.0, F.col("trust") / F.col("_ts")
    ).otherwise(F.lit(0.0))
    return j.select(
        "host",
        "pagerank",
        "trust",
        F.greatest(F.lit(0.0), (p_hat - t_hat) / p_hat).alias("spam_mass"),
    )


def domain_profile(pages: DataFrame, url_col: str = "url",
                   text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """Per-host curation report over the raw pages table:
    (host, n_pages, n_en, n_empty, mean_quality, mean_tokens).

    One pruned scan (url, text, lang), one groupBy on host — every
    metric is an algebraic aggregate so the map-side partial absorbs
    each host's page mass before the shuffle.  quality/token columns
    come from functions.text_quality (whole-stage codegen, no UDF).
    Feeds prune --where: e.g. drop every page of a host whose
    mean_quality sits below threshold.

    Means are computed as INTEGER sums (quality in 1e-6 micro-units —
    exact, since quality_score is 6dp-rounded) followed by ONE double
    division: bit-identical across engines and across any partial-agg
    addition order, where avg-then-round disagrees between Spark and
    DuckDB on exact 7th-decimal halves (observed on this corpus).
    """
    from ..functions import text_quality as TQ

    base = pages.select(
        host_of(url_col).alias("host"),
        F.col(lang_col).alias("lang"),
        F.round(TQ.quality_score(F.col(text_col)) * F.lit(1e6))
        .cast("long")
        .alias("q_micro"),
        TQ.token_count(F.col(text_col)).cast("long").alias("n_toks"),
        (F.length(F.col(text_col)) == 0).cast("int").alias("is_empty"),
    )
    return base.groupBy("host").agg(
        F.count("*").alias("n_pages"),
        F.sum((F.col("lang") == "en").cast("int")).alias("n_en"),
        F.sum("is_empty").alias("n_empty"),
        (
            F.sum("q_micro").cast("double")
            / (F.count("*") * F.lit(1_000_000.0))
        ).alias("mean_quality"),
        (F.sum("n_toks").cast("double") / F.count("*")).alias("mean_tokens"),
    )
