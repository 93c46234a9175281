"""C5/C6 — adjacent bigrams and sliding-window word networks.

Reference: raw bigram counting ``/root/reference/java/alix/lucene/search/FieldRail.java:596-622``;
word-network sliding window ``/root/reference/java/alix/lucene/analysis/CharsNet.java:46-120``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bigrams(tokens: DataFrame) -> DataFrame:
    """Adjacent (w1, w2) pair counts corpus-wide → (w1, w2, n).

    Self-join on ``pos + 1`` within a doc. Both sides shuffle on doc_id —
    one exchange reused for both join inputs (same key), and AQE handles
    long-doc skew.
    """
    t1 = tokens.select(
        "doc_id", F.col("pos").alias("p1"), F.col("term").alias("w1")
    )
    t2 = tokens.select(
        "doc_id", (F.col("pos") - 1).alias("p1"), F.col("term").alias("w2")
    )
    return (
        t1.join(t2, ["doc_id", "p1"])
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def word_network(tokens: DataFrame, width: int = 5) -> tuple[DataFrame, DataFrame]:
    """C6 — (nodes, edges) for a sliding window of ``width`` tokens.

    nodes = (term, n); edges = (w1, w2, n) for unordered pairs within the
    window (w1 < w2 to canonicalize).
    """
    nodes = tokens.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("n"))
    # Positional equi-join, NOT a doc_id-only self-join: the right side is
    # replicated once per window offset delta ∈ [1, width-1] with its
    # position rebased to the left partner's, so the join key is
    # (doc_id, pos) and the per-doc intermediate is O(L·width) — a
    # 100k-token doc produces 100k·(width-1) rows, never L².
    t1 = tokens.select("doc_id", F.col("pos").alias("pa"), F.col("term").alias("ta"))
    t2 = (
        tokens.select("doc_id", F.col("pos").alias("pb"), F.col("term").alias("tb"))
        .withColumn("_d", F.explode(F.sequence(F.lit(1), F.lit(width - 1))))
        .withColumn("pa", F.col("pb") - F.col("_d"))
        .select("doc_id", "pa", "tb")
    )
    edges = (
        t1.join(t2, ["doc_id", "pa"])
        .select(
            F.least("ta", "tb").alias("w1"),
            F.greatest("ta", "tb").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return nodes, edges
