"""Spark integration of the French analysis chain: one Arrow-vectorized
``mapInPandas`` kernel per batch of documents, emitting the 4-channel
token table (SURVEY.md §1.5).

The kernel is the SAME pure function unit-tested in
tests/test_french_analysis.py — Spark only supplies batching and
distribution, so analysis results are independent of partitioning.

Output channels per token: graph (original), orth (normalized), term
(final indexed form — lemma channel with "" holes for punctuation), tag
(int POS flags), start/end char offsets. Downstream:

* postings/forms: filter out the holes (term != "")
* rails / co-occurrence: keep holes (they break expressions and windows,
  ``FieldRail.java:392,549``)
* KWIC/hilite: use start/end offsets against the stored text
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKEN_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", IntegerType()),
        StructField("graph", StringType()),
        StructField("orth", StringType()),
        StructField("term", StringType()),
        StructField("orth_term", StringType()),
        StructField("tag", IntegerType()),
        StructField("start", IntegerType()),
        StructField("end", IntegerType()),
    ]
)


def analyze_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    skip_xml: bool = True,
    lexicon: dict | None = None,
) -> DataFrame:
    """docs → full token table via the French chain.

    ``lexicon`` optionally replaces the built-in compact word list with a
    full-size one (``load_lexicon_csv``); it is shipped to executors as a
    Spark broadcast — one copy per executor, not per task (the
    ``FrDics.java:82-83`` 130k-type scale path; throughput measured in
    tests/test_full_lexicon.py).

    Output adds the ``orth_term`` channel — the ``_orth`` twin field of
    the reference (``FrAnalyzer.java:56,67``, ``SAXIndexer.java:429-431``):
    exact-spelling forms, no lemmatization folding.
    """
    from alix_spark.analysis.french import analyze

    cols = [id_col, text_col]
    bc = (
        docs.sparkSession.sparkContext.broadcast(lexicon)
        if lexicon is not None
        else None
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = bc.value if bc is not None else None
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                for t in analyze(text or "", skip_xml=skip_xml, words=words):
                    rows.append(
                        (
                            int(doc_id),
                            t.pos,
                            t.graph,
                            t.orth,
                            t.indexed,
                            t.indexed_orth,
                            t.tag,
                            t.start,
                            t.end,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in TOKEN_SCHEMA.fields],
            )

    return docs.select(*cols).mapInPandas(kernel, TOKEN_SCHEMA)


def fr_tokens_for_index(token_table: DataFrame) -> DataFrame:
    """Token table → (doc_id, pos, term) for the index builders, holes
    removed (postings never contain the empty pseudo-form;
    ``FieldText.java:191`` keeps it only as formId 0)."""
    from pyspark.sql import functions as F

    return token_table.filter(F.col("term") != "").select(
        "doc_id", "pos", "term"
    )


def fr_orth_tokens_for_index(token_table: DataFrame) -> DataFrame:
    """Token table → (doc_id, pos, term) for the ``_orth`` twin postings:
    exact-spelling search, same position space as the lemma channel
    (``SAXIndexer.java:429-431`` indexes both fields over one stream)."""
    from pyspark.sql import functions as F

    return token_table.filter(F.col("orth_term") != "").select(
        "doc_id", "pos", F.col("orth_term").alias("term")
    )
