"""A7 — chronology curves over an int axis (Scale).

Reference: ``/root/reference/java/alix/lucene/search/Scale.java:82-344``.
The x-axis is NOT the raw year: docs are ordered by the int field, their
token counts cumulated, and the cumulative-token axis is cut into ``dots``
equal buckets — so every bucket holds the same amount of TEXT, not the
same number of years. Term(-group) frequencies are then summed per
bucket.

Spark plan: a cumulative-sum window over the year ordering (one pass),
bucket = floor(cum_before * dots / total), then matched-postings ⋈ bucket
map, groupBy(bucket, group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_buckets(
    docs: DataFrame,
    doc_lens: DataFrame,
    axis_col: str,
    dots: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) — equal-token buckets along the axis order.

    The cumulative window orders by (axis, doc_id) for determinism. A
    single unpartitioned window is acceptable here because its input is
    one row per doc with two ints (the doc-length table, not the corpus);
    for 10^12 docs this becomes a range-partitioned prefix sum — same
    structure as :func:`alix_spark.ingest.scalable_row_number`.
    """
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(axis_col).alias("_axis"))
    j = d.join(doc_lens, "doc_id")
    w = Window.orderBy("_axis", "doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = j.agg(F.sum("dl")).collect()[0][0] or 1
    return (
        j.withColumn("_cum", F.coalesce(F.sum("dl").over(w), F.lit(0)))
        .withColumn(
            "bucket",
            F.least(
                F.floor(F.col("_cum") * dots / float(total)).cast("int"),
                F.lit(dots - 1),
            ),
        )
        .select("doc_id", "_axis", "bucket")
    )


def chronology(
    docs: DataFrame,
    doc_lens: DataFrame,
    postings: DataFrame,
    term_groups: dict[str, list[str]],
    axis_col: str,
    dots: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frequency curves per bucket per term group → (bucket, group, freq,
    axis_min, axis_max, bucket_occs).

    ``term_groups`` maps a curve label to its terms (the reference's
    TermList groups, ``Scale.java:272-344``). Frequencies are per-bucket
    matched occurrences; ``bucket_occs`` normalizes to relative frequency.
    """
    buckets = doc_buckets(docs, doc_lens, axis_col, dots, id_col)
    pairs = [(g, t) for g, ts in term_groups.items() for t in ts]
    spark = docs.sparkSession
    gmap = spark.createDataFrame(pairs, "group string, term string")
    matched = (
        postings.join(F.broadcast(gmap), "term")
        .groupBy("doc_id", "group")
        .agg(F.sum("tf").alias("freq"))
    )
    per_bucket = (
        buckets.join(matched, "doc_id")
        .groupBy("bucket", "group")
        .agg(F.sum("freq").cast("long").alias("freq"))
    )
    sizes = (
        buckets.join(doc_lens, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum("dl").cast("long").alias("bucket_occs"),
            F.min("_axis").alias("axis_min"),
            F.max("_axis").alias("axis_max"),
        )
    )
    return per_bucket.join(sizes, "bucket").select(
        "bucket", "group", "freq", "axis_min", "axis_max", "bucket_occs"
    )
