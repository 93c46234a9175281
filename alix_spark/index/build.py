"""Core index tables from a token stream.

Reference semantics being reproduced (see SURVEY.md §1.4):

* ``postings``  — per (term, doc): tf + sorted positions. Lucene's
  ``DOCS_AND_FREQS_AND_POSITIONS`` postings
  (``/root/reference/java/alix/lucene/Alix.java:154-165``).
* ``forms``     — the vocabulary with corpus tf (``occs``) and df
  (``docs``), plus a dense ``form_id`` assigned in descending corpus
  frequency order, ties broken by form ascending
  (``/root/reference/java/alix/lucene/search/FieldText.java:109-116,195``;
  tie rule divergence documented in SURVEY.md §7.4.5).
* ``doc_lens``  — tokens per doc (``FieldText.java:130,180`` ``docOccs``).

Scale notes:

* ``postings`` groups by (term, doc_id) — the key includes doc_id, so the
  Zipf skew of hot terms is spread over all their documents; no salting
  needed here. Map-side partial aggregation collapses the exploded token
  stream before the shuffle.
* ``forms`` groups by term alone; partial aggregation makes the hot-term
  reduction cheap (one partial row per map task).
* the ``form_id`` ranking is a global sort. At 100 TB the vocabulary is
  ~10^8-10^9 forms — several orders smaller than the corpus. We rank with a
  range-partitioned sort + per-partition offsets (no single-partition
  window), so the rank step scales with the vocabulary, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_postings(tokens: DataFrame, positions: bool = True) -> DataFrame:
    """(doc_id, pos, term) → (term, doc_id, tf[, positions:array<int>]).

    ``positions=False`` is Lucene's DOCS_AND_FREQS mode
    (``/root/reference/java/alix/lucene/Alix.java:167-176`` meta fields):
    skips the position-list collection, halving the shuffle for indexes
    that serve ranked retrieval only.
    """
    if not positions:
        return tokens.groupBy("term", "doc_id").agg(
            F.count(F.lit(1)).cast("int").alias("tf")
        )
    return tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def build_doc_lens(tokens: DataFrame) -> DataFrame:
    """(doc_id, pos, term) → (doc_id, dl)."""
    return tokens.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("dl"))


def build_doc_lens_from_postings(postings: DataFrame) -> DataFrame:
    """postings → (doc_id, dl). Row-identical to
    :func:`build_doc_lens` (dl = Σ tf), but derived from the (much
    smaller, already-materialized) postings table — a build pipeline
    that has written postings never needs a second tokenize+shuffle
    pass over the corpus for doc lengths."""
    return postings.groupBy("doc_id").agg(
        F.sum("tf").cast("int").alias("dl")
    )


def build_forms(postings: DataFrame, assign_ids: bool = True) -> DataFrame:
    """postings → (form_id, term, occs, docs).

    ``occs`` = corpus term frequency, ``docs`` = document frequency.
    ``form_id`` is dense, 1-based, descending-frequency ordered — formId 0
    is reserved for the punctuation/hole pseudo-form exactly as in the
    reference (``FieldText.java:191``).
    """
    stats = postings.groupBy("term").agg(
        F.sum("tf").cast("long").alias("occs"),
        F.count(F.lit(1)).cast("long").alias("docs"),
    )
    if not assign_ids:
        return stats
    return rank_forms(stats)


def rank_forms(stats: DataFrame) -> DataFrame:
    """Assign dense freq-ordered 1-based form ids (formId 0 is reserved
    for the punctuation/hole pseudo-form) without a single-partition
    window — see :func:`alix_spark.ingest.scalable_row_number`."""
    from alix_spark.ingest import scalable_row_number

    return scalable_row_number(
        stats, [F.desc("occs"), F.asc("term")], "form_id", start=1
    ).select("form_id", "term", "occs", "docs")


def corpus_totals(forms: DataFrame) -> tuple[int, int]:
    """(all_occs, n_forms) — ``FieldText.java:87-90,232-233``."""
    row = forms.agg(
        F.sum("occs").alias("occs"), F.count(F.lit(1)).alias("forms")
    ).collect()[0]
    return int(row["occs"] or 0), int(row["forms"])
