"""BM25 ranked retrieval as a DataFrame plan.

Two scoring variants (SURVEY.md §4.2):

* **exact** — the textbook formula Alix implements in
  ``/root/reference/java/alix/web/Distrib.java:105-121``::

      idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
      tf_w = f * (k1 + 1) / (f + k1 * (1 - b + b * dl / avgdl))

  with k1 = 1.2, b = 0.75 (``Distrib.java:107``).

* **lucene** — rank-identical to Lucene 8.8's ``BM25Similarity`` as used by
  the reference (``/root/reference/java/alix/lucene/Alix.java:232,342``):
  the ``(k1+1)`` numerator factor is dropped, and the document length is
  quantized through Lucene's 1-byte SmallFloat norm before use
  (:func:`alix_spark.index.codec.smallfloat_quantize_len`).

Physical plan: query terms are a tiny broadcast side; the postings scan is
filtered by ``term IN (...)`` (pushed to parquet when the postings table is
on disk), joined to ``doc_lens`` (broadcast when small, shuffle otherwise),
scored as column expressions inside codegen, aggregated per doc, and
top-k'ed via ``orderBy().limit()`` (Spark's ``TakeOrderedAndProject`` — a
per-partition bounded heap + driver merge, the distributed analogue of the
reference's ``TopArray``, ``/root/reference/java/alix/util/TopArray.java:42``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf_expr(df_col: Column, n_docs: int) -> Column:
    """ln(1 + (N - df + 0.5)/(df + 0.5)) — Distrib.java:114 / Lucene BM25."""
    return F.log(
        1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5)
    )


def tf_expr(
    tf_col: Column,
    dl_col: Column,
    avgdl: float,
    k1: float = K1,
    b: float = B,
    lucene: bool = False,
) -> Column:
    """BM25 tf weight; ``lucene=True`` drops the (k1+1) numerator factor."""
    num = tf_col if lucene else tf_col * (k1 + 1.0)
    return num / (tf_col + k1 * (1.0 - b + b * dl_col / F.lit(float(avgdl))))


def corpus_stats(doc_lens: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) in one tiny job.

    avgdl matches Lucene's ``avgFieldLength`` = sumTotalTermFreq/docCount
    computed on EXACT lengths (quantization only applies to the per-doc
    length in the tf denominator, not to the average).
    """
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def with_quantized_dl(doc_lens: DataFrame) -> DataFrame:
    """Replace ``dl`` with the Lucene-visible length: the SmallFloat
    byte4 norm decode (codec validated byte-for-byte vs lucene-core-8.8.1).

    At query time Lucene reads the 1-byte norm, so two docs of length 41
    and 40 score identically — rank identity with the reference requires
    reproducing exactly this loss.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    from alix_spark.index.codec import quantize_doc_len

    @pandas_udf(IntegerType())
    def _q(dl: pd.Series) -> pd.Series:
        return pd.Series(quantize_doc_len(dl.to_numpy()).astype("int32"))

    return doc_lens.withColumn("dl", _q(F.col("dl")))


def score_terms(
    postings: DataFrame,
    doc_lens: DataFrame,
    terms: list[str],
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
    lucene: bool = False,
    dfs: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores for the given query terms.

    Returns (doc_id, term, tf, score_part). ``dfs`` (term, df) lets callers
    supply full-corpus document frequencies when ``postings`` is already
    restricted to a candidate set — idf must stay corpus-wide (Lucene
    computes idf before the boolean filter narrows the docs).
    """
    qp = postings.filter(F.col("term").isin(terms))
    if dfs is None:
        # df computed from the given postings — correct when unfiltered.
        dfs = qp.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    else:
        dfs = dfs.filter(F.col("term").isin(terms)).select("term", "df")
    part = idf_expr(F.col("df").cast("double"), n_docs) * tf_expr(
        F.col("tf").cast("double"),
        F.col("dl").cast("double"),
        avgdl,
        k1,
        b,
        lucene,
    )
    if lucene:
        # Lucene's per-clause Scorer.score() returns float32; the boolean
        # sum then accumulates those floats in double. Mimic the cast so
        # ties and near-ties order identically.
        part = part.cast("float").cast("double")
    scored = (
        qp.join(F.broadcast(dfs), "term")
        .join(doc_lens, "doc_id")
        .withColumn("score_part", part)
    )
    return scored.select("doc_id", "term", "tf", "score_part")


def bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = K1,
    b: float = B,
    lucene: bool = False,
    n_docs: int | None = None,
    avgdl: float | None = None,
    dfs: DataFrame | None = None,
) -> DataFrame:
    """Top-k docs for an OR-of-terms query → (doc_id, score), score desc.

    Ties broken by doc_id ascending, matching Lucene's tie-break
    (SURVEY.md §7.4.2).
    """
    if n_docs is None or avgdl is None:
        n_docs, avgdl = corpus_stats(doc_lens)  # exact lengths (Lucene too)
    if lucene:
        doc_lens = with_quantized_dl(doc_lens)
    scored = score_terms(
        postings, doc_lens, terms, n_docs, avgdl, k1, b, lucene, dfs=dfs
    )
    # duplicate query terms are distinct SHOULD clauses in Lucene: each
    # occurrence contributes its clause score again
    from collections import Counter

    mult = Counter(terms)
    if any(c > 1 for c in mult.values()):
        wmap = F.create_map(
            *[F.lit(x) for tc in mult.items() for x in tc]
        )
        scored = scored.withColumn(
            "score_part",
            F.col("score_part") * wmap[F.col("term")].cast("double"),
        )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score_part").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
