"""A6 — int-field distributions (FieldInt).

Reference: ``/root/reference/java/alix/lucene/search/FieldInt.java:95-366``
— per distinct int value (year…): doc count and token weight; plus
min/max/sum for range metadata (the ``IntPoint`` analogue is parquet
min/max pruning, free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def int_distribution(
    docs: DataFrame,
    doc_lens: DataFrame,
    int_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """(value, docs, occs) per distinct value of the int field."""
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(int_col).alias("value"))
    return (
        d.join(doc_lens, "doc_id", "left")
        .groupBy("value")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("dl").cast("long").alias("occs"),
        )
    )


def int_range_filter(docs: DataFrame, int_col: str, lo, hi) -> DataFrame:
    """F7 — range filter; Catalyst pushes this to the parquet scan."""
    return docs.filter(F.col(int_col).between(lo, hi))
