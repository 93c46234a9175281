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

import numpy as np
import pandas as pd
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


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs → (id_a, id_b, cos) with
    cos ≥ ``threshold`` — the vector twin of MinHash near-dup mining
    (``textops/dedup.py``), completing the dedup family.

    Scale path: ``n_tables`` independent hyperplane-LSH signatures
    (OR-construction — a pair is a candidate if it shares a bucket in
    ANY table) → per-(table, bucket) equi-join on ids only (vectors are
    NOT carried through the bucket shuffle; they join back by id for the
    verify) → exact cosine verify. Mega-buckets beyond
    ``max_bucket_size`` are dropped with the same quadratic-degradation
    guard as the MinHash path. Probabilistic recall (no pigeonhole bound
    for vectors): at cos ≥ 0.99, 12 planes × 4 tables gives
    P[miss] < 1e-3 per pair; the driver oracle compares against the
    exact all-pairs join, proving recall 1.0 on the test corpus.
    """
    dim = len(embeddings.select(vec_col).first()[0])
    e = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    sigs = e.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_signature(
                            F.col("v"),
                            _hyperplanes(dim, n_planes, seed + 1000 * t),
                        ).alias("sig"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("ts"),
    ).select("id", F.col("ts.t").alias("t"), F.col("ts.sig").alias("sig"))
    ok_buckets = (
        sigs.groupBy("t", "sig")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket_size)
        .select("t", "sig")
    )
    sigs = sigs.join(ok_buckets, ["t", "sig"])
    cands = (
        sigs.alias("a")
        .join(sigs.alias("b"), ["t", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .distinct()
    )
    va = e.select(F.col("id").alias("id_a"), F.col("v").alias("_va"))
    vb = e.select(F.col("id").alias("id_b"), F.col("v").alias("_vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(cosine(F.col("_va"), F.col("_vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def lsh_partitioned_write(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the vectors table partitioned BY the hyperplane
    signature — the at-rest layout where :func:`lsh_knn`'s bucket filter
    becomes file-level partition pruning (a query touches
    (1+n_planes)·2^-n_planes of the files instead of scanning all rows).
    """
    dim = len(embeddings.select(vec_col).first()[vec_col])
    planes = _hyperplanes(dim, n_planes, seed)
    embeddings.withColumn(
        "_sig", lsh_signature(F.col(vec_col), planes)
    ).write.mode("overwrite").partitionBy("_sig").parquet(path)


def lsh_knn_at_rest(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    exclude_id: int | None = None,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN over an :func:`lsh_partitioned_write` table: the probe-bucket
    ``isin`` filter hits the ``_sig`` PARTITION column, so only the
    probed buckets' files are read (PartitionFilters in the plan —
    asserted in tests/test_plan_hygiene.py)."""
    from itertools import combinations

    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q_sig = 0
    for i, p in enumerate(planes):
        if sum(float(a) * b for a, b in zip(query_vec, p)) >= 0:
            q_sig |= 1 << i
    probe_sigs = set()
    for r in range(probe_hamming + 1):
        for flips in combinations(range(n_planes), r):
            s = q_sig
            for i in flips:
                s ^= 1 << i
            probe_sigs.add(s)
    df = spark.read.parquet(path).filter(
        F.col("_sig").isin(sorted(probe_sigs))
    )
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: deterministic Lloyd k-means over the
    embedding column → (assignments (vec_id, cell), centroids).

    * init: the ``n_centroids`` lowest vec_ids (deterministic, no RNG);
    * assign: one Arrow kernel per batch — numpy matmul of the batch
      against the broadcast centroid matrix (cosine);
    * update: map-side partial (cell, count, sum) per Arrow batch, tiny
      final reduce on the driver (k × n_batches rows) — the scalable
      mean-update shape.

    At rest the ``cell`` column becomes the partition key of the vectors
    table, so a query scans only its probed cells' files.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    first = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(vec_col)
        .collect()
    )
    cents = np.array([list(r[vec_col]) for r in first], dtype=np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12

    def assign_udf_for(c: np.ndarray):
        cn = c.copy()

        @pandas_udf(IntegerType())
        def assign(vecs: pd.Series) -> pd.Series:
            m = np.array(vecs.tolist(), dtype=np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
            return pd.Series(np.argmax(m @ cn.T, axis=1).astype("int32"))

        return assign

    for _ in range(iters):
        assign = assign_udf_for(cents)
        assigned = embeddings.select(
            F.col(id_col), F.col(vec_col), assign(F.col(vec_col)).alias("cell")
        )
        # partial sums per Arrow batch -> tiny driver-side finalize
        from pyspark.sql.types import (
            ArrayType, DoubleType, IntegerType as IT, LongType,
            StructField, StructType,
        )

        part_schema = StructType(
            [
                StructField("cell", IT()),
                StructField("n", LongType()),
                StructField("s", ArrayType(DoubleType())),
            ]
        )
        dim = cents.shape[1]
        k = cents.shape[0]

        def partial(batches):
            for pdf in batches:
                m = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                cells = pdf["cell"].to_numpy()
                rows = []
                for c in np.unique(cells):
                    sel = m[cells == c]
                    rows.append((int(c), int(sel.shape[0]), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cell", "n", "s"])

        parts = assigned.select("cell", vec_col).mapInPandas(
            partial, part_schema
        ).collect()
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in parts:
            sums[r["cell"]] += np.array(r["s"])
            counts[r["cell"]] += r["n"]
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents /= np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12

    assign = assign_udf_for(cents)
    assignments = embeddings.select(
        F.col(id_col), assign(F.col(vec_col)).alias("cell")
    )
    return assignments, cents.tolist()


def ivf_knn(
    embeddings: DataFrame,
    assignments: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF search: rank cells by centroid·query, scan only the top
    ``nprobe`` cells, exact cosine within them → (vec_id, cos).

    ``nprobe == len(centroids)`` scans everything and is EXACTLY
    brute-force top-k (the driver-contract oracle property); small
    nprobe is the 100 TB path (cells are partition dirs — file-level
    pruning)."""
    q = np.array(query_vec, dtype=np.float64)
    q /= np.linalg.norm(q) + 1e-12
    c = np.array(centroids, dtype=np.float64)
    order = np.argsort(-(c @ q))
    probe = [int(x) for x in order[:nprobe]]
    cand = embeddings.join(
        assignments.filter(F.col("cell").isin(probe)).select(id_col), id_col
    )
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != exclude_id)
    qcol = F.array(*[F.lit(float(x)).cast("float") for x in query_vec])
    return (
        cand.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine(F.col(vec_col), qcol), 4).alias("cos"),
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
    lens = {
        r["doc_id"]: r["dl"]
        for r in doc_lens.filter(
            F.col("doc_id").isin([doc_a, doc_b])
        ).collect()
    }
    la, lb = lens[doc_a], lens[doc_b]
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
