"""Simple tokenizer: lowercase, split on non-alphanumerics — all JVM-side.

This is the analysis chain for source-code / plain-text corpora and the
reference point for every DuckDB oracle. It deliberately lives entirely in
Spark SQL expressions (``lower`` / ``split`` / ``filter`` / ``posexplode``)
so tokenization participates in whole-stage codegen: no Python is involved,
and Catalyst can pushdown/prune around it.

Equivalent DuckDB SQL (used by the oracles)::

    SELECT doc_id, u.term, u.pos - 1 AS pos
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                             x -> x <> '') AS toks
          FROM documents),
         LATERAL (SELECT unnest(toks) AS term,
                         generate_subscripts(toks, 1) AS pos) u

Alix analogue: the tokenizer contract of
``/root/reference/java/alix/lucene/analysis/FrTokenizer.java`` (emit terms
with sequential positions); the French-specific rules live in
:mod:`alix_spark.analysis.french` instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_array(text: Column) -> Column:
    """Array of tokens for one text column, empty strings removed.

    Positions are the indexes in this array — i.e. the token sequence, the
    same semantics as Alix's rail (token-at-position) model
    (``FieldRail.java:80-88``), with no punctuation holes in the simple
    chain.
    """
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT_RE), lambda x: x != "")


def token_offsets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs → offsets table ``(doc_id, pos, start, end, term)``.

    The simple chain's analogue of the reference's term vectors with
    positions AND offsets (``/root/reference/java/alix/lucene/
    Alix.java:154-165``): persisted once at build time so render
    operators (KWIC / hilite / paint) read char offsets from the index
    instead of re-tokenizing the corpus per request. Token stream is
    row-identical to :func:`tokenize` (same ``[a-z0-9]+`` classes on the
    lowered text); one Arrow kernel, map-only, no shuffle.
    """
    import re as _re

    import pandas as pd
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("pos", IntegerType()),
            StructField("start", IntegerType()),
            StructField("end", IntegerType()),
            StructField("term", StringType()),
        ]
    )
    pat = _re.compile(r"[a-z0-9]+")

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            # columnar accumulation: per-doc span arrays concatenated
            # once per batch — the row-tuple formulation built one
            # Python tuple per TOKEN and paid a row-wise DataFrame
            # construction on top (guide §4.2)
            doc_arrs, pos_arrs, span_arrs = [], [], []
            terms: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                lowered = (text or "").lower()
                spans = [m.span() for m in pat.finditer(lowered)]
                if not spans:
                    continue
                n = len(spans)
                doc_arrs.append(np.full(n, int(doc_id), dtype=np.int64))
                pos_arrs.append(np.arange(n, dtype=np.int32))
                sp = np.asarray(spans, dtype=np.int32)
                span_arrs.append(sp)
                terms.extend(lowered[s:e] for s, e in spans)
            if not doc_arrs:
                continue
            sp = np.concatenate(span_arrs)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(doc_arrs),
                    "pos": np.concatenate(pos_arrs),
                    "start": sp[:, 0],
                    "end": sp[:, 1],
                    "term": np.asarray(terms, dtype=object),
                }
            )

    d = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    return d.mapInPandas(kernel, schema)


def tokenize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """docs → token table ``(doc_id, pos, term)``.

    One output row per token occurrence. This is the exploded form every
    index table derives from; it is never materialized at full corpus scale
    (the builders aggregate it immediately, letting map-side partial
    aggregation collapse it before any shuffle).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_array(F.col(text_col))).alias("pos", "term"),
    ).select("doc_id", "pos", "term")
