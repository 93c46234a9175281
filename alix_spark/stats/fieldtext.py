"""Term-list statistics (FieldText analogues).

Reference: ``/root/reference/java/alix/lucene/search/FieldText.java``.
Every operator here is a groupBy + top-k; filters arrive as either a
column predicate on the docs table or a one-column ``doc_id`` frame used
as a broadcast semi-join (the BitSet filter of ``FieldText.java:620``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_postings(postings: DataFrame, doc_filter: DataFrame | None) -> DataFrame:
    """Apply a Corpus-style doc filter (F1, ``FieldText.java:412-455``)."""
    if doc_filter is None:
        return postings
    return postings.join(
        F.broadcast(doc_filter.select("doc_id")), "doc_id", "left_semi"
    )


def term_stats(
    postings: DataFrame, doc_filter: DataFrame | None = None
) -> DataFrame:
    """A1/A2 — (term, occs, docs), optionally restricted to a sub-corpus."""
    return (
        filter_postings(postings, doc_filter)
        .groupBy("term")
        .agg(
            F.sum("tf").cast("long").alias("occs"),
            F.count(F.lit(1)).cast("long").alias("docs"),
        )
    )


def doc_term_list(postings: DataFrame, doc_id) -> DataFrame:
    """A4 — terms of one document with tf (``Doc.java:588-635``)."""
    return postings.filter(F.col("doc_id") == doc_id).select(
        "term", "tf"
    )


def doc_stats(
    postings: DataFrame, terms: list[str], doc_filter: DataFrame | None = None
) -> DataFrame:
    """Q8 — per-doc matched freq for a term list
    (``FieldText.java:464-498``) → (doc_id, freq)."""
    return (
        filter_postings(postings, doc_filter)
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("freq"))
    )
