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


def forms_with_tags(token_table: DataFrame) -> DataFrame:
    """French-chain token table → (term, occs, docs, tag, is_stop) — the
    FieldText vocabulary with its POS tag and stopword flag
    (``FieldText.java:92-104``: formTag / formStop parallel arrays).

    The reference takes a form's tag from the dictionaries at vocabulary
    build; here we take the max tag seen across occurrences (deterministic;
    homograph divergences affect the tag column only, never counts).
    """
    from alix_spark.analysis.fr_dicts import STOP

    t = token_table.filter(F.col("term") != "")
    stop_arr = F.array(*[F.lit(s) for s in sorted(STOP)])
    return (
        t.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("occs"),
            F.count_distinct("doc_id").cast("long").alias("docs"),
            F.max("tag").cast("int").alias("tag"),
        )
        .withColumn("is_stop", F.array_contains(stop_arr, F.col("term")))
    )


def term_stats_tag_filtered(
    forms_tagged: DataFrame,
    include_groups: list[int] | None = None,
    exclude_groups: list[int] | None = None,
    exclude_stop: bool = True,
) -> DataFrame:
    """F5 — TagFilter'd term list (``Tag.java:305-395`` applied at
    ``FieldText.java:608-610``): keep/reject POS groups (high-nibble
    masks) and stopwords. The default UI view is 'significant words' —
    exclude stopwords and punctuation/number groups."""
    from alix_spark.analysis.fr_dicts import GROUP_MASK

    out = forms_tagged
    grp = F.col("tag").bitwiseAND(GROUP_MASK)
    if include_groups is not None:
        out = out.filter(grp.isin([int(g) for g in include_groups]))
    if exclude_groups is not None:
        out = out.filter(~grp.isin([int(g) for g in exclude_groups]))
    if exclude_stop:
        out = out.filter(~F.col("is_stop"))
    return out


def term_stats_nostop(
    postings: DataFrame,
    stop_terms: list[str],
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """A1 with a stop list (the F6 membership filter as a column
    predicate — the broadcast-set analogue of the reference's byte
    automaton, ``FrDics.java:117-118``)."""
    return term_stats(postings, doc_filter).filter(
        ~F.col("term").isin(list(stop_terms))
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
