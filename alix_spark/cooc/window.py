"""C2 — windowed co-occurrence counts with interval-union semantics.

Reference: ``/root/reference/java/alix/lucene/search/FieldRail.java:283-405``.
For every occurrence of the pivot term at position p, the context is
``[p-left, p+right]``; contexts of nearby occurrences are UNIONed as a
position set before counting (BitSet union at ``FieldRail.java:370-377``),
so a token inside two overlapping windows counts once.

DataFrame plan: pivot positions × token positions range-join within the
window, then ``DISTINCT (doc, pos)`` — the distinct IS the interval union.
The range-join is bounded (window width ≤ ~20), so Spark executes it as a
join on doc_id with a position predicate; at 100 TB scale the preferred
variant replays per-doc rails inside a grouped pandas UDF (no join skew);
see :func:`cooc_window_rails` in this module once rails land.
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
    pivots = tokens.filter(F.col("term") == pivot).select(
        F.col("doc_id").alias("p_doc"), F.col("pos").alias("p_pos")
    )
    ctx = (
        tokens.join(
            pivots,
            (F.col("doc_id") == F.col("p_doc"))
            & (F.col("pos") >= F.col("p_pos") - left)
            & (F.col("pos") <= F.col("p_pos") + right),
        )
        # interval union: one count per distinct context position
        .select("doc_id", "pos", "term")
        .distinct()
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
