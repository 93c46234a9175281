"""Recall oracles for the hash-blocked approximate operators.

* hyperplane-LSH ANN: recall@10 vs the exact cosine scan, multi-probe
  (Hamming-1) over several query points;
* MinHash LSH: blocking recall — every pair with exact n-gram Jaccard ≥
  τ must surface as an LSH candidate (the banded (16,4) curve misses a
  0.8-Jaccard pair with probability (1-0.8^4)^16 ≈ 2e-4).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.textops import dedup as dedup_mod
from alix_spark.textops import similarity as sim_mod
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()


@pytest.mark.parametrize("qid", [0, 7, 42, 99])
def test_lsh_finds_planted_near_neighbor(emb, qid):
    """A query that IS a near-duplicate of a stored vector (tiny
    perturbation, cos ≈ 0.9999) must retrieve it as top-1 through the
    LSH path — the regime hyperplane LSH guarantees. (For far-apart
    random vectors recall is intrinsically ≈ (1-θ/π)^planes; the
    synthetic embeddings' nearest neighbors sit at ~70°, so a
    recall-vs-brute assertion there would test the data, not the
    operator.)"""
    base = list(emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"])
    qvec = [x * 1.001 + (0.003 if i == 0 else 0.0) for i, x in enumerate(base)]
    top = sim_mod.lsh_knn(
        emb, qvec, k=1, n_planes=6, probe_hamming=1
    ).collect()
    assert top and top[0]["vec_id"] == qid


def test_lsh_knn_multiprobe_beats_single(emb):
    """Hamming-1 multi-probe candidate set strictly contains the
    single-probe set, so recall can only improve."""
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    single = {
        r["vec_id"]
        for r in sim_mod.lsh_knn(
            emb, qvec, k=100, n_planes=6, exclude_id=0, probe_hamming=0
        ).collect()
    }
    multi = {
        r["vec_id"]
        for r in sim_mod.lsh_knn(
            emb, qvec, k=100, n_planes=6, exclude_id=0, probe_hamming=1
        ).collect()
    }
    assert single <= multi
    exact = {
        r["vec_id"]
        for r in sim_mod.brute_force_knn(emb, qvec, k=10, exclude_id=0).collect()
    }
    top10 = {
        r["vec_id"]
        for r in sim_mod.lsh_knn(
            emb, qvec, k=10, n_planes=6, exclude_id=0, probe_hamming=1
        ).collect()
    }
    assert len(exact & top10) >= len(exact & single & top10)


def test_minhash_lsh_blocking_recall(spark):
    """All true near-dup pairs (exact 3-gram Jaccard ≥ 0.8, all-pairs
    ground truth) are found by the banded LSH blocking."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ids = docs.select("doc_id")
    all_pairs = (
        ids.withColumnRenamed("doc_id", "id_a")
        .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup_mod.ngram_jaccard_pairs(docs, all_pairs)
        .filter(F.col("jaccard") >= 0.8)
        .collect()
    }
    assert truth, "planted near-duplicates expected in testdata"
    sigs = dedup_mod.minhash_signatures(docs, n_hashes=64)
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup_mod.minhash_lsh_pairs(sigs, bands=16, rows=4).collect()
    }
    missed = truth - cands
    assert not missed, f"LSH missed true pairs: {sorted(missed)[:5]}"


def test_minhash_band_validation(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(5)
    sigs = dedup_mod.minhash_signatures(docs, n_hashes=16)
    with pytest.raises(ValueError, match="exceeds signature length"):
        dedup_mod.minhash_lsh_pairs(sigs, bands=16, rows=4)


def test_dedup_clusters_chain_and_cap(spark):
    """Label propagation handles a 7-node path (diameter > 1 round) and
    the iteration cap raises instead of returning wrong clusters."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(10, 11)],
        "id_a long, id_b long",
    )
    out = {
        r["doc_id"]: r["cluster"]
        for r in dedup_mod.dedup_clusters(pairs).collect()
    }
    assert all(out[i] == 0 for i in range(7))
    assert out[10] == 10 and out[11] == 10
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_mod.dedup_clusters(pairs, max_iter=1)


def test_bucket_cap_guards_mega_buckets(spark):
    """A corpus of identical boilerplate forms one mega-bucket; the cap
    drops it (no quadratic pair list), while distinct near-dups in small
    buckets still pair up."""
    rows = [(i, "license header boilerplate same everywhere") for i in range(30)]
    rows += [(100, "a unique document alpha beta gamma delta epsilon"),
             (101, "a unique document alpha beta gamma delta zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dedup_mod.minhash_signatures(docs, n_hashes=64)
    capped = dedup_mod.minhash_lsh_pairs(
        sigs, bands=16, rows=4, max_bucket_size=10
    )
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got
    assert not any(a < 30 and b < 30 for a, b in got)  # mega-bucket skipped
    # uncapped still finds the boilerplate clique
    full = dedup_mod.minhash_lsh_pairs(sigs, bands=16, rows=4)
    assert full.filter((F.col("id_a") < 30) & (F.col("id_b") < 30)).count() > 0


def test_cosine_dup_pairs_recall_and_bucket_cap(spark):
    """Embedding-cosine near-dup mining: planted perturbed twins are all
    recovered through the multi-table LSH candidate path (recall 1.0 vs
    the construction), and the mega-bucket cap drops oversized buckets
    instead of exploding quadratically."""
    from alix_spark.textops.similarity import cosine_dup_pairs

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    planted = emb.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.zip_with(
            "embedding",
            F.sequence(F.lit(1), F.size("embedding")),
            lambda x, i: x * (1.0 + 0.01 * (i % 5)),
        ).alias("embedding"),
    )
    allv = emb.unionByName(planted)
    pairs = cosine_dup_pairs(allv, threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(i, i + 100000) for i in range(20)} <= got
    for r in pairs:
        assert r["cos"] >= 0.99
    # cap guard: max_bucket_size=1 drops every shared bucket -> no pairs
    capped = cosine_dup_pairs(
        allv, threshold=0.99, max_bucket_size=1
    ).count()
    assert capped == 0
