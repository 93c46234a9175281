"""Facet aggregation (A5).

Reference: ``/root/reference/java/alix/lucene/search/FieldFacet.java:102-260``
— per facet value: document count and token weight (sum of doc lengths in
the text field); with a query: hits + matched occurrences.

Spark shape: docs ⋈ doc_lens (⋈ matched postings) → groupBy(facet).
The facet column may be single-valued (``facet``) or an array
(``facets`` → explode first), mirroring SortedDocValues vs
SortedSetDocValues (``SAXIndexer.java:309-320``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def facet_stats(
    docs: DataFrame,
    doc_lens: DataFrame,
    facet_col: str,
    id_col: str = "doc_id",
    multivalued: bool = False,
) -> DataFrame:
    """(facet, docs, occs) — doc count + token weight per facet value."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet"))
    if multivalued:
        d = d.select("doc_id", F.explode("facet").alias("facet"))
    return (
        d.join(doc_lens, "doc_id", "left")
        .groupBy("facet")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("dl").cast("long").alias("occs"),
        )
    )


def facet_covers(
    docs_typed: DataFrame,
    facet_col: str = "book_id",
    cover_type: str = "book",
    id_col: str = "doc_id",
) -> DataFrame:
    """(facet, cover_doc) — the reference tracks an optional "cover"
    docId per facet value, the document that REPRESENTS the value (e.g.
    the book document covering its chapters), selected by a cover query
    on doc type (``FieldFacet.java:102-139``). First (lowest-id) cover
    wins when several match, as in the reference's first-writer array."""
    return (
        docs_typed.filter(F.col("doc_type") == cover_type)
        .groupBy(F.col(facet_col).alias("facet"))
        .agg(F.min(id_col).cast("long").alias("cover_doc"))
    )


def facet_query_stats(
    docs: DataFrame,
    postings: DataFrame,
    terms: list[str],
    facet_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(facet, hits, freq) for a query term list —
    ``FieldFacet.java:346-448``: hits = docs matching any term, freq =
    matched occurrences, grouped by facet value."""
    matched = (
        postings.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("_freq"))
    )
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(facet_col).alias("facet"))
    return (
        d.join(matched, "doc_id")
        .groupBy("facet")
        .agg(
            F.count(F.lit(1)).cast("long").alias("hits"),
            F.sum("_freq").cast("long").alias("freq"),
        )
    )
