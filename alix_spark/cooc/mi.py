"""Mutual-information family for co-occurrence scoring (C3).

Public formulas over a 2×2 contingency table, matching the semantics of
the reference's MI menu (``/root/reference/java/alix/web/MI.java:42-122``;
pivot-repetition clamp Oab ≤ Ob, ``FieldRail.java:451``):

    Oab = co-occurrences of pivot a and form b (window counts)
    Oa  = pivot occurrences ("found")
    Ob  = corpus occurrences of form b
    N   = corpus token count

All implemented as Spark column expressions over the C2 output joined to
the forms table — pure codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _expected(oa: Column, ob: Column, n: Column) -> Column:
    return oa * ob / n


def score_occs(oab: Column, *_: Column) -> Column:
    return oab.cast("double")


def score_g(oab: Column, oa: Column, ob: Column, n: Column) -> Column:
    """Log-likelihood G² over the 2×2 table, signed negative when the
    observed co-occurrence is below expectation."""
    o11 = oab
    o12 = oa - oab
    o21 = ob - oab
    o22 = n - oa - ob + oab
    e11 = oa * ob / n
    e12 = oa * (n - ob) / n
    e21 = (n - oa) * ob / n
    e22 = (n - oa) * (n - ob) / n

    def term(o: Column, e: Column) -> Column:
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    g = 2.0 * (term(o11, e11) + term(o12, e12) + term(o21, e21) + term(o22, e22))
    return F.when(o11 < e11, -g).otherwise(g)


def score_jaccard(oab: Column, oa: Column, ob: Column, n: Column) -> Column:
    """Jaccard with the reference's 10^5 magnification (``MI.java:66-74``)."""
    return 100000.0 * oab / (oa + ob - oab)


def score_dice(oab: Column, oa: Column, ob: Column, n: Column) -> Column:
    return 100000.0 * 2.0 * oab / (oa + ob)


def score_chi2(oab: Column, oa: Column, ob: Column, n: Column) -> Column:
    """Signed χ² on the co-occurrence cell (``MI.java:84-98``)."""
    e = _expected(oa, ob, n)
    chi = (oab - e) * (oab - e) / e
    return F.when(oab < e, -chi).otherwise(chi)


SCORERS = {
    "occs": score_occs,
    "g": score_g,
    "jaccard": score_jaccard,
    "dice": score_dice,
    "chi2": score_chi2,
}


def score_coocs(
    coocs: DataFrame,
    forms: DataFrame,
    found: int,
    all_occs: int,
    mi: str = "g",
) -> DataFrame:
    """C2 output (form_id|term, freq, hits) ⋈ forms → scored co-occurrents.

    ``found`` = pivot occurrences (Oa); ``all_occs`` = N. The clamp
    Oab ≤ Ob guards pivot repetitions inside one window
    (``FieldRail.java:451``).
    """
    scorer = SCORERS[mi]
    if "form_id" in coocs.columns:
        j = coocs.join(forms.select("form_id", "term", "occs"), "form_id")
    else:
        j = coocs.join(forms.select("term", "occs"), "term")
    oab = F.least(F.col("freq"), F.col("occs")).cast("double")
    oa = F.lit(float(found))
    ob = F.col("occs").cast("double")
    n = F.lit(float(all_occs))
    return j.withColumn("score", scorer(oab, oa, ob, n)).select(
        "term", "freq", "hits", "score"
    )
