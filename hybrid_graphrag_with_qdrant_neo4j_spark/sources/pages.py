"""Pages source: the Common-Crawl-style input table and HTML→text
extraction (replaces the reference's file/PDF loaders, S1/S2 in
SURVEY.md §2.1; cli/main.py:115-156, ingest.py:38-63).

Extraction is a vectorized Arrow pandas UDF over the ``html`` binary
column — deterministic, byte-identical per url (north-rule invariant),
with the reference's utf-8→latin-1 decode ladder inside
(cli/main.py:134-146).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from .. import textproc as tp


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda b: tp.extract_text_from_html(bytes(b)) if b is not None else "")


def with_extracted_text(pages: DataFrame, html_col: str = "html",
                        out_col: str = "text") -> DataFrame:
    """Replace/derive the text column from raw html bytes."""
    return pages.withColumn(out_col, extract_text_udf(F.col(html_col)))


def with_doc_id(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Content-derived doc id (sha256(url)[:16]) — deterministic and
    join-stable under any partitioning, the rebuild's replacement for the
    reference's UUIDv5-over-id mapping (qdrant_connection.py:95-107)."""
    return pages.withColumn("doc_id", F.substring(F.sha2(F.col(url_col), 256), 1, 16))


def repartition_by_url(pages: DataFrame, num_partitions: int,
                       url_col: str = "url") -> DataFrame:
    """Explicit url-hash repartition (north_star): balances page bodies
    across executors before the UDF-heavy stages; xxhash64 avoids hot
    spots from crawl ordering."""
    return pages.repartition(num_partitions, F.xxhash64(F.col(url_col)))


def english_pages(pages: DataFrame) -> DataFrame:
    """Language-filtered partition for NER/triple stages (north_star).
    Pushed down to the parquet scan when pages is a file source."""
    return pages.filter(F.col("lang") == "en")
