"""C2 — windowed co-occurrence counts with interval-union semantics.

Reference: ``/root/reference/java/alix/lucene/search/FieldRail.java:283-405``.
For every occurrence of the pivot term at position p, the context is
``[p-left, p+right]``; contexts of nearby occurrences are UNIONed as a
position set before counting (BitSet union at ``FieldRail.java:370-377``),
so a token inside two overlapping windows counts once.

DataFrame plan: explode each pivot occurrence into its window's position
ids ``[p-left, p+right]``, ``DISTINCT (doc, pos)`` — the distinct IS the
interval union — then equi-join the tokens table on ``(doc_id, pos)``.
The intermediate is O(found × width) rows and every join is a plain
hash-partitioned equi-join, so a frequent pivot never turns into a
|pivots|×|tokens| blow-up (the round-1 plan did; VERDICT.md What's-wrong
#3). The rails kernel (:func:`alix_spark.cooc.rails.cooc_window_rails`)
remains the alternative engine and is proven result-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cooc_window(
    tokens: DataFrame,
    pivot: str,
    left: int = 3,
    right: int = 3,
    include_pivot: bool = False,
) -> DataFrame:
    """(term, freq, hits) for tokens co-occurring with ``pivot``.

    ``freq`` = occurrences inside the union of context windows;
    ``hits`` = distinct docs contributing. The pivot's own occurrences are
    excluded by default (they are reported as ``found`` by the reference,
    not as a co-form of itself).
    """
    ctx_pos = (
        tokens.filter(F.col("term") == pivot)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos") - left, F.col("pos") + right)
            ).alias("pos"),
        )
        # interval union: one row per distinct context position
        .distinct()
    )
    # (doc_id, pos) is unique in tokens, so this equi-join matches each
    # context position at most once; out-of-range positions simply miss.
    ctx = tokens.join(ctx_pos, ["doc_id", "pos"]).select(
        "doc_id", "pos", "term"
    )
    if not include_pivot:
        ctx = ctx.filter(F.col("term") != pivot)
    return ctx.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.count_distinct("doc_id").cast("long").alias("hits"),
    )


def pivot_found(tokens: DataFrame, pivot: str) -> int:
    """``found`` — total pivot occurrences (``FieldRail.java:336``)."""
    return tokens.filter(F.col("term") == pivot).count()
