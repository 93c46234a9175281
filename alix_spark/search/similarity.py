"""Q4 — alternative doc-ranking similarities (rescoring modes).

Reference: the user-selectable similarity menu
(``/root/reference/java/alix/web/Sim.java:43-96``) backed by:

* ``occs``  — raw matched tf (``SimilarityOccs.java:38-50``)
* ``g``     — G-test 2·f·ln(f/E) (``SimilarityG.java:44-70``)
* ``chi2``  — (f−E)²/E with log₂ damping, NEGATIVE when the term is
  repelled (``SimilarityChi2.java:44-60``)
* ``chi2inv`` — "most repulsed doc": (f−E)²/E when f ≤ E, 0 otherwise
  (``SimilarityChi2inv.java:44-55``)
* ``theme`` — tf/docLen (``SimilarityTheme.java:40-55``)

All column expressions over the query-term postings ⋈ doc_lens join —
same physical plan as BM25, different score column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_docs(
    postings: DataFrame,
    doc_lens: DataFrame,
    terms: list[str],
    sim: str = "occs",
    k: int = 10,
) -> DataFrame:
    """Top-k docs for the term set under the chosen similarity →
    (doc_id, score)."""
    qp = postings.filter(F.col("term").isin(terms))
    totals = doc_lens.agg(
        F.sum("dl").alias("n"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    n_tokens = float(totals["n"] or 1)
    term_occs = {
        r["term"]: float(r["occs"])
        for r in qp.groupBy("term")
        .agg(F.sum("tf").alias("occs"))
        .collect()
    }
    j = qp.join(doc_lens, "doc_id")
    f_ = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    # E = term corpus freq × doc share of the corpus
    occs_map = F.create_map(
        *[F.lit(x) for kv in term_occs.items() for x in kv]
    )
    e = occs_map[F.col("term")] * dl / n_tokens
    if sim == "occs":
        score = f_
    elif sim == "g":
        g = 2.0 * f_ * F.log(f_ / e)
        score = F.when(f_ < e, -g).otherwise(g)
    elif sim == "chi2":
        chi = (f_ - e) * (f_ - e) / e / F.log2(1.0 + dl)
        score = F.when(f_ < e, -chi).otherwise(chi)
    elif sim == "chi2inv":
        measure = (f_ - e) * (f_ - e) / e
        score = F.when(f_ > e, F.lit(0.0)).otherwise(measure)
    elif sim == "theme":
        score = f_ / dl
    else:
        raise ValueError(f"unknown similarity {sim!r}")
    return (
        j.withColumn("_s", score)
        .groupBy("doc_id")
        .agg(F.round(F.sum("_s"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def more_like_this(
    postings: DataFrame,
    doc_lens: DataFrame,
    doc_id: int,
    n_docs: int,
    avgdl: float,
    n_terms: int = 20,
    k: int = 10,
) -> DataFrame:
    """Q7 — find docs similar to one doc: take its top-scored terms, run
    them as an OR query (``/root/reference/java/alix/lucene/search/Doc.java:640-656``)."""
    from alix_spark.search import bm25 as bm25_mod
    from alix_spark.stats.scorers import tfidf_doc_terms

    top_terms = [
        r["term"]
        for r in tfidf_doc_terms(postings, doc_lens, n_docs, doc_id)
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(n_terms)
        .collect()
    ]
    scored = bm25_mod.score_terms(
        postings, doc_lens, top_terms, n_docs, avgdl
    ).filter(F.col("doc_id") != doc_id)
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("score_part").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
