"""C5/C6 — adjacent bigrams and sliding-window word networks.

Reference: raw bigram counting ``/root/reference/java/alix/lucene/search/FieldRail.java:596-622``;
word-network sliding window ``/root/reference/java/alix/lucene/analysis/CharsNet.java:46-120``.

Two plans per operator:

* ``bigrams``/``word_network`` — positional equi-join on the token
  table. Correct and linear, but shuffles the full token table to
  co-locate the join before the pair-count exchange. Kept as the
  oracle cross-check path.
* ``bigrams_rails``/``word_network_rails`` — map-side emit from the
  rails table (``doc_id, rail: array<int>``): each doc's pairs come
  from a numpy zip-with-slice inside an Arrow kernel with per-batch
  partial counting, so the only exchange is the combiner-reduced
  pair-count shuffle (vocabulary²-bounded, corpus-size independent) +
  a vocabulary-sized forms join. This is the scale path — exactly how
  the reference serves bigrams from its mmap'ed rail
  (``FieldRail.java:596-622``), and the fix for the sf1 bench where
  the join path was the suite's worst scaler.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

PAIR_SCHEMA = StructType(
    [
        StructField("id1", LongType()),
        StructField("id2", LongType()),
        StructField("n", LongType()),
    ]
)


def _pair_counts_rails(rails: DataFrame, width: int) -> DataFrame:
    """Partial (id1, id2, n) counts for ordered pairs at offsets
    1..width-1 within each rail, holes (formId 0) excluded. Map-only:
    one pass over the rail arrays, one ``np.unique`` per Arrow batch,
    then a single combiner-reduced exchange on the pair key."""

    def kernel(batches):
        for pdf in batches:
            lefts: list[np.ndarray] = []
            rights: list[np.ndarray] = []
            for rail in pdf["rail"]:
                arr = np.asarray(rail, dtype=np.int64)
                for d in range(1, width):
                    if arr.size <= d:
                        break
                    a, b = arr[:-d], arr[d:]
                    keep = (a != 0) & (b != 0)
                    if keep.any():
                        lefts.append(a[keep])
                        rights.append(b[keep])
            if not lefts:
                continue
            # encode the pair as one int64 (formIds are 32-bit dense
            # ranks) so np.unique counts pairs in one vectorized pass;
            # the shift decode below sign-extends, so the 31-bit
            # assumption must hold — check it instead of corrupting ids
            left_arr = np.concatenate(lefts)
            right_arr = np.concatenate(rights)
            if max(left_arr.max(), right_arr.max()) >= np.int64(1) << 31:
                raise ValueError(
                    "form_id exceeds 2^31; int64 pair packing would "
                    "sign-extend — widen the pair key first"
                )
            key = left_arr << np.int64(32)
            key |= right_arr
            vals, counts = np.unique(key, return_counts=True)
            yield pd.DataFrame(
                {
                    "id1": vals >> np.int64(32),
                    "id2": vals & np.int64(0xFFFFFFFF),
                    "n": counts,
                }
            )

    partial = rails.mapInPandas(kernel, PAIR_SCHEMA)
    return partial.groupBy("id1", "id2").agg(
        F.sum("n").cast("long").alias("n")
    )


def bigrams_rails(rails: DataFrame, forms: DataFrame) -> DataFrame:
    """C5 served map-side from rails → (w1, w2, n); row-identical to
    :func:`bigrams` on the hole-free view of the token table the rails
    were built from (holes break adjacency in both paths: here via the
    formId-0 exclusion, there via the position gap — which requires the
    rails input to carry its holes as rows, see
    :func:`alix_spark.cooc.rails.build_rails`)."""
    pairs = _pair_counts_rails(rails, width=2)
    f1 = forms.select(F.col("form_id").alias("id1"), F.col("term").alias("w1"))
    f2 = forms.select(F.col("form_id").alias("id2"), F.col("term").alias("w2"))
    return pairs.join(f1, "id1").join(f2, "id2").select("w1", "w2", "n")


def word_network_rails(
    rails: DataFrame, forms: DataFrame, width: int = 5
) -> DataFrame:
    """C6 edges served map-side from rails → (w1, w2, n), unordered
    pairs canonicalized by term (``least``/``greatest`` AFTER the forms
    join — formId rank order is frequency, not lexicographic). The
    re-aggregation runs on the distinct-pair table (vocabulary-bounded),
    not the corpus."""
    pairs = _pair_counts_rails(rails, width=width)
    f1 = forms.select(F.col("form_id").alias("id1"), F.col("term").alias("ta"))
    f2 = forms.select(F.col("form_id").alias("id2"), F.col("term").alias("tb"))
    return (
        pairs.join(f1, "id1")
        .join(f2, "id2")
        .select(
            F.least("ta", "tb").alias("w1"),
            F.greatest("ta", "tb").alias("w2"),
            "n",
        )
        .groupBy("w1", "w2")
        .agg(F.sum("n").cast("long").alias("n"))
    )


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
