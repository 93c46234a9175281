"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline, pure column expressions
  (``zip_with`` dot product inside codegen, ``TakeOrderedAndProject`` for
  the top-k);
* LSH-bucketed ANN (random hyperplane signatures) — the scale path: the
  query probes only its bucket(s), turning a full scan into a partition-
  prunable equi-join.

Also C7-style document similarity by shared vocabulary
(``/root/reference/java/alix/lucene/search/Doc.java:303-343``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two float arrays (as double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact cosine top-k → (vec_id, cos). Ties → vec_id ascending."""
    q = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
    df = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    return df.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (LCG; no numpy needed
    on the driver, and identical across runs)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
            # map to (-1, 1)
            v.append((state / float(1 << 63)) * 2.0 - 1.0)
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        planes.append([x / nrm for x in v])
    return planes


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature as one int64 bucket id."""
    bits = [
        F.when(
            dot(vec_col, F.array(*[F.lit(float(x)) for x in p])) >= 0, 1
        ).otherwise(0)
        for p in planes
    ]
    sig = F.lit(0).cast("long")
    for i, bit in enumerate(bits):
        sig = sig + (bit.cast("long") * F.lit(1 << i))
    return sig


def lsh_knn(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_id: int | None = None,
    probe_hamming: int = 1,
) -> DataFrame:
    """ANN: score only vectors in buckets near the query's hyperplane
    signature (multi-probe).

    ``probe_hamming``: probe every bucket within this Hamming distance of
    the query signature — 0 is single-probe (scan fraction ≈ 2^-n_planes,
    lowest recall), 1 adds the n_planes adjacent buckets (the standard
    multi-probe recall fix; scan fraction ≈ (1+n_planes)·2^-n_planes).
    At scale the signature is a partition/bucketing column of the
    embeddings table, so the ``isin`` filter prunes file reads. Recall vs
    the exact scan is regression-tested (tests/test_lsh_recall.py).
    """
    from itertools import combinations

    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for i, p in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(query_vec, p))
        if d >= 0:
            q_sig |= 1 << i
    probe_sigs = set()
    for r in range(probe_hamming + 1):
        for flips in combinations(range(n_planes), r):
            s = q_sig
            for i in flips:
                s ^= 1 << i
            probe_sigs.add(s)
    df = embeddings.withColumn("_sig", lsh_signature(F.col(vec_col), planes))
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
    return (
        df.filter(F.col("_sig").isin(sorted(probe_sigs)))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def doc_shared_vocab(
    postings: DataFrame, doc_a, doc_b, doc_lens: DataFrame, k: int = 100
) -> DataFrame:
    """C7 — shared vocabulary of two docs scored tf1/len1 + tf2/len2
    (``Doc.java:303-343``) → (term, score)."""
    pa = postings.filter(F.col("doc_id") == doc_a).select(
        "term", F.col("tf").alias("tf_a")
    )
    pb = postings.filter(F.col("doc_id") == doc_b).select(
        "term", F.col("tf").alias("tf_b")
    )
    la = doc_lens.filter(F.col("doc_id") == doc_a).collect()[0]["dl"]
    lb = doc_lens.filter(F.col("doc_id") == doc_b).collect()[0]["dl"]
    return (
        pa.join(pb, "term")
        .withColumn(
            "score",
            F.round(
                F.col("tf_a").cast("double") / float(la)
                + F.col("tf_b").cast("double") / float(lb),
                6,
            ),
        )
        .select("term", "score")
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )
