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


def build_postings_from_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    positions: bool = True,
) -> DataFrame:
    """docs → postings (term, doc_id, tf[, positions]) with NO shuffle.

    Row-identical to ``build_postings(simple.tokenize(docs))`` (pytest
    cross-check in tests/test_index_build.py), but a posting row depends
    only on its own document, so the ``(term, doc_id)`` Exchange of the
    token-stream path is pure overhead (guide §2.4): this kernel
    tokenizes each Arrow batch of raw documents and emits the finished
    posting rows map-side. The whole-corpus shuffle that was ~4× the
    corpus bytes (one ~25-byte row per token occurrence) disappears from
    the plan — the scan feeds the kernel feeds the sink.

    Simple analysis chain only (the regex IS the chain); the French
    kernel keeps its own pipeline.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # nullability mirrors the groupBy path exactly (schema parity is
    # part of row-identity: the oracle compares schemas)
    fields = [
        StructField("term", StringType(), False),
        StructField("doc_id", LongType(), True),
        StructField("tf", IntegerType(), False),
    ]
    if positions:
        fields.append(
            StructField(
                "positions", ArrayType(IntegerType(), False), False
            )
        )
    schema = StructType(fields)
    tok_re = _re.compile(r"[a-z0-9]+")
    want_pos = positions

    def kernel(batches):
        import numpy as np

        cols = ["term", "doc_id", "tf"] + (["positions"] if want_pos else [])
        for pdf in batches:
            doc_arrs: list[np.ndarray] = []
            term_arrs: list[str] = []
            pos_arrs: list[np.ndarray] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["_text"]):
                toks = tok_re.findall((text or "").lower())
                if not toks:
                    continue
                n = len(toks)
                doc_arrs.append(np.full(n, int(doc_id), dtype=np.int64))
                term_arrs.extend(toks)
                pos_arrs.append(np.arange(n, dtype=np.int64))
            if not doc_arrs:
                continue
            d = np.concatenate(doc_arrs)
            p = np.concatenate(pos_arrs)
            codes, uniques = pd.factorize(
                np.asarray(term_arrs, dtype=object), sort=False
            )
            # group by (doc, term-code); positions sort last so each
            # run's occurrences come out ascending
            order = np.lexsort((p, codes, d))
            c = codes[order]
            dd = d[order]
            pp = p[order]
            is_new = np.empty(c.size, dtype=bool)
            is_new[0] = True
            is_new[1:] = (c[1:] != c[:-1]) | (dd[1:] != dd[:-1])
            starts = np.flatnonzero(is_new)
            tfs = np.diff(np.append(starts, c.size)).astype(np.int32)
            out = {
                "term": uniques[c[starts]],
                "doc_id": dd[starts],
                "tf": tfs,
            }
            if want_pos:
                out["positions"] = np.split(
                    pp.astype(np.int32), starts[1:]
                )
            yield pd.DataFrame(out, columns=cols)

    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text")
    )
    return d.mapInPandas(kernel, schema)


def build_doc_lens(tokens: DataFrame) -> DataFrame:
    """(doc_id, pos, term) → (doc_id, dl)."""
    return tokens.groupBy("doc_id").agg(F.count(F.lit(1)).cast("int").alias("dl"))


def build_doc_lens_from_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs → (doc_id, dl) with NO shuffle and NO Python: dl is just the
    size of the simple chain's token array, a whole-stage-codegen map
    over the document table (guide §2.4 — the groupBy of
    :func:`build_doc_lens` re-aggregated what each row already knows).
    Docs with zero tokens are omitted, matching the token-stream path.
    """
    from alix_spark.analysis.simple import tokens_array

    # coalesce('' for null text) keeps the dl column non-nullable, so
    # the schema matches the groupBy path's count() exactly; null-text
    # docs have dl 0 and drop out either way
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tokens_array(F.coalesce(F.col(text_col), F.lit(""))))
            .cast("int")
            .alias("dl"),
        )
        .filter(F.col("dl") > 0)
    )


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

    # cache the (vocabulary-sized) stats: the range partitioner's
    # sampling pass and the exchange map stage otherwise each
    # re-evaluate the upstream postings aggregation
    return scalable_row_number(
        stats.cache(), [F.desc("occs"), F.asc("term")], "form_id", start=1
    ).select("form_id", "term", "occs", "docs")


def corpus_totals(forms: DataFrame) -> tuple[int, int]:
    """(all_occs, n_forms) — ``FieldText.java:87-90,232-233``."""
    row = forms.agg(
        F.sum("occs").alias("occs"), F.count(F.lit(1)).alias("forms")
    ).collect()[0]
    return int(row["occs"] or 0), int(row["forms"])
