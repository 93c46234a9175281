"""Rails — per-document token-id sequences, the co-occurrence engine's
columnar store.

Reference: ``/root/reference/java/alix/lucene/search/FieldRail.java:80-183``
— a mmap'ed flattening of every doc into its formId sequence, holes
(punctuation) encoded as formId 0. Spark shape: a ``rails`` table
``(doc_id, rail: array<int>)`` persisted as parquet; the window/ngram
kernels replay rails inside Arrow-vectorized grouped UDFs (the survey's
preferred plan for C2 — avoids the skewy positional range join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def build_rails(token_table: DataFrame, forms: DataFrame) -> DataFrame:
    """Token table (with holes) ⋈ forms → (doc_id, rail: array<long>).

    Holes (term == "") become formId 0 (``FieldText.java:191``). All
    JVM-side: sort-collect per doc.

    INPUT CONTRACT: pass the full positional stream — every emitted
    position must be a row (``Corpus.rail_tokens``: the hole-bearing
    french token_table, or the simple chain's dense tokens). A
    hole-FILTERED french table has position gaps that a rail would
    silently read as adjacency, corrupting ngram and window semantics.
    """
    t = token_table.join(
        forms.select("term", "form_id"), "term", "left"
    ).withColumn("form_id", F.coalesce("form_id", F.lit(0)))
    return t.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "form_id"))),
            lambda s: s.form_id,
        ).alias("rail")
    )


COOC_SCHEMA = StructType(
    [
        StructField("form_id", LongType()),
        StructField("freq", LongType()),
        StructField("hits", LongType()),
    ]
)


def cooc_window_rails(
    rails: DataFrame,
    pivot_form_ids: list[int],
    left: int = 3,
    right: int = 3,
) -> DataFrame:
    """C2 via rails: windowed co-occurrence counts with interval-union
    semantics (``FieldRail.java:283-405``) → (form_id, freq, hits).

    Per doc (inside a mapInPandas kernel): mark the union of
    [p-left, p+right] context windows with a difference-array + cumsum
    (the BitSet-union analogue, ``FieldRail.java:370-377``), then count
    the formIds under the mask. Holes (0) and the pivots themselves are
    excluded from counts but DO occupy positions — exactly the reference
    semantics (``FieldRail.java:386-399``).

    Map-side partial aggregation: the kernel emits per-batch partial
    (form_id, freq, hits) so the shuffle carries vocabulary-sized data,
    not corpus-sized.
    """
    pivots = set(int(p) for p in pivot_form_ids)

    def kernel(batches):
        for pdf in batches:
            freq: dict[int, int] = {}
            hits: dict[int, int] = {}
            for rail in pdf["rail"]:
                arr = np.asarray(rail, dtype=np.int64)
                ppos = np.flatnonzero(np.isin(arr, list(pivots)))
                if ppos.size == 0:
                    continue
                lo = np.maximum(ppos - left, 0)
                hi = np.minimum(ppos + right, arr.size - 1)
                diff = np.zeros(arr.size + 1, dtype=np.int64)
                np.add.at(diff, lo, 1)
                np.add.at(diff, hi + 1, -1)
                mask = np.cumsum(diff[:-1]) > 0
                ctx = arr[mask]
                ctx = ctx[(ctx != 0) & ~np.isin(ctx, list(pivots))]
                if ctx.size == 0:
                    continue
                vals, counts = np.unique(ctx, return_counts=True)
                for v, c in zip(vals.tolist(), counts.tolist()):
                    freq[v] = freq.get(v, 0) + c
                    hits[v] = hits.get(v, 0) + 1
            yield pd.DataFrame(
                {
                    "form_id": list(freq.keys()),
                    "freq": list(freq.values()),
                    "hits": [hits[k] for k in freq],
                }
            )

    partial = rails.mapInPandas(kernel, COOC_SCHEMA)
    return partial.groupBy("form_id").agg(
        F.sum("freq").cast("long").alias("freq"),
        F.sum("hits").cast("long").alias("hits"),
    )


EXPR_SCHEMA = StructType(
    [
        StructField("expression", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def expressions(
    rails: DataFrame,
    stop_form_ids: set[int],
    verb_form_ids: set[int] | None = None,
    min_len: int = 2,
    max_len: int = 5,
) -> DataFrame:
    """C4 — expression mining (``FieldRail.java:523-589``): count plain
    multi-word sequences; holes (0) break candidates, stop words may sit
    INSIDE but not at the edges, verbs break.

    → (expression: array<form_id>, n), to be joined back to forms for
    display.
    """
    verb_ids = verb_form_ids or set()

    def kernel(batches):
        for pdf in batches:
            counts: dict[tuple, int] = {}
            for rail in pdf["rail"]:
                arr = [int(x) for x in rail]
                run: list[int] = []
                for f in arr + [0]:
                    if f == 0 or f in verb_ids:
                        run = []
                        continue
                    run.append(f)
                    if len(run) > max_len:
                        run.pop(0)
                    for ln in range(min_len, len(run) + 1):
                        cand = tuple(run[-ln:])
                        # edges must be plain words (not stop)
                        if cand[0] in stop_form_ids or cand[-1] in stop_form_ids:
                            continue
                        counts[cand] = counts.get(cand, 0) + 1
            yield pd.DataFrame(
                {
                    "expression": [list(k) for k in counts],
                    "n": list(counts.values()),
                }
            )

    partial = rails.mapInPandas(kernel, EXPR_SCHEMA)
    return partial.groupBy("expression").agg(
        F.sum("n").cast("long").alias("n")
    )


def expressions_display(exprs: DataFrame, forms: DataFrame) -> DataFrame:
    """Render mined expressions as display strings → (expression: string, n).

    Distributed: posexplode the formId array, equi-join the forms table
    (vocabulary-sized — AQE broadcasts it), regroup on the original array
    key and reassemble in position order. No driver-side vocabulary map,
    so it holds at 100 TB vocabularies.
    """
    x = forms.select("form_id", "term")
    exploded = exprs.select(
        "expression", "n", F.posexplode("expression").alias("pos", "form_id")
    ).join(x, "form_id")
    return exploded.groupBy("expression", "n").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s.term,
            ),
            " ",
        ).alias("expr_str")
    ).select(F.col("expr_str").alias("expression"), "n")
