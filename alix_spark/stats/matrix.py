"""C8 — per-form document-repartition test (FieldMatrix).

Reference: ``/root/reference/java/alix/lucene/search/FieldMatrix.java:63-143``
— for every form, a Muller-1977-style χ² of its distribution across docs:
how far each doc's observed frequency sits from the doc's expected share
(doc_len/corpus_len of the form's total occurrences).

Spark: postings ⋈ doc_lens, score column, groupBy(form) — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def repartition_chi2(
    postings: DataFrame, doc_lens: DataFrame, forms: DataFrame
) -> DataFrame:
    """(term, chi2) — Σ_docs (O − E)²/E with E = occs·dl/N.

    Only docs containing the term contribute their (O−E)² term here plus
    a closed-form correction for absent docs: Σ_absent E = occs·(1 −
    Σ_present dl/N), avoiding a corpus-sized dense matrix.
    """
    n = doc_lens.agg(F.sum("dl")).collect()[0][0] or 1
    j = (
        postings.join(doc_lens, "doc_id")
        .join(forms.select("term", "occs"), "term")
        .withColumn("_e", F.col("occs") * F.col("dl") / float(n))
        .withColumn(
            "_chi", (F.col("tf") - F.col("_e")) ** 2 / F.col("_e")
        )
    )
    present = j.groupBy("term").agg(
        F.sum("_chi").alias("_chi_present"),
        F.sum("dl").alias("_dl_present"),
        F.first("occs").alias("_occs"),
    )
    # absent docs: O=0 → (0−E)²/E = E; Σ E over absent = occs·(N−Σdl)/N
    return present.withColumn(
        "chi2",
        F.round(
            F.col("_chi_present")
            + F.col("_occs") * (float(n) - F.col("_dl_present")) / float(n),
            4,
        ),
    ).select("term", "chi2")
