"""Specificity / relevance scorers for term lists (A3) — the Distrib
family of the reference (``/root/reference/java/alix/web/Distrib.java:42-161``),
as pure column expressions.

A3's shape: given a sub-corpus (doc filter), score every term by how
over/under-represented it is there vs the whole corpus. Scorers:

* ``occs``   — raw partition frequency
* ``g``      — G-test 2·Σ O·ln(O/E), signed (``Distrib.java:83-97``)
* ``chi2``   — (O−E)²/E, signed (``Distrib.java:146-161``)
* ``tfidf``  — idf=(1+ln((N+1)/(df+1)))², tf=idf·(k+(1−k)·f/dl), k=0.2
  (``Distrib.java:124-143``)
* ``bm25``   — the §4.2 formula summed over matching docs

The contingency for g/chi2 is (term in part) vs (term elsewhere):
E = occs_all · part_occs / all_occs, O = occs_part.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alix_spark.stats.fieldtext import filter_postings, term_stats


def specificity(
    postings: DataFrame,
    forms: DataFrame,
    doc_filter: DataFrame,
    scorer: str = "g",
) -> DataFrame:
    """Scored term list of a sub-corpus → (term, part_occs, score).

    One aggregation over the filtered postings + a broadcast-sized join
    to corpus stats; scoring is a codegen expression.
    """
    part = term_stats(postings, doc_filter).withColumnRenamed(
        "occs", "part_occs"
    ).withColumnRenamed("docs", "part_docs")
    totals = part.agg(F.sum("part_occs").alias("t")).collect()[0]["t"] or 0
    all_occs = (
        forms.agg(F.sum("occs").alias("t")).collect()[0]["t"] or 1
    )
    j = part.join(forms.select("term", "occs", "docs"), "term")
    o = F.col("part_occs").cast("double")
    e = F.col("occs").cast("double") * float(totals) / float(all_occs)
    if scorer == "occs":
        score = o
    elif scorer == "g":
        # signed G over the 2x2 (part vs rest) table
        o2 = F.col("occs").cast("double") - o  # term elsewhere
        e2 = F.col("occs").cast("double") * (1.0 - float(totals) / float(all_occs))
        term1 = F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))
        term2 = F.when(o2 > 0, o2 * F.log(o2 / e2)).otherwise(F.lit(0.0))
        g = 2.0 * (term1 + term2)
        score = F.when(o < e, -g).otherwise(g)
    elif scorer == "chi2":
        chi = (o - e) * (o - e) / e
        score = F.when(o < e, -chi).otherwise(chi)
    else:
        raise ValueError(f"unknown scorer {scorer!r}")
    return j.withColumn("score", F.round(score, 4)).select(
        "term", F.col("part_occs").cast("long").alias("part_occs"), "score"
    )


def tfidf_doc_terms(
    postings: DataFrame,
    doc_lens: DataFrame,
    n_docs: int,
    doc_id: int,
    k: float = 0.2,
) -> DataFrame:
    """A4 with the reference's tf-idf variant (``Distrib.java:124-143``):
    top terms of one document → (term, tf, score)."""
    # df only for the ONE doc's terms: a doc-bounded semi-join instead
    # of aggregating (and broadcasting!) the full vocabulary — at scale
    # the all-terms dfs broadcast is vocabulary-sized, this one is
    # doc-sized. Result-identical: the inner join below dropped every
    # other term anyway.
    doc_p = postings.filter(F.col("doc_id") == doc_id)
    dfs = (
        postings.join(
            F.broadcast(doc_p.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    p = doc_p.join(F.broadcast(dfs), "term").join(doc_lens, "doc_id")
    idf_ = F.pow(
        1.0 + F.log((float(n_docs) + 1.0) / (F.col("df").cast("double") + 1.0)),
        2.0,
    )
    tf_ = k + (1.0 - k) * F.col("tf").cast("double") / F.col("dl").cast("double")
    return p.select(
        "term",
        F.col("tf").cast("long").alias("tf"),
        F.round(idf_ * tf_, 4).alias("score"),
    )
