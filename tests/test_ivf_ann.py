"""IVF ANN: exactness when probing all cells, recall under partial
probes, planted-near-neighbor retrieval, and cell balance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark.textops import similarity as sim_mod
from tests.conftest import SF_SMOKE

N_CENTROIDS = 8


@pytest.fixture(scope="module")
def ivf(spark):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()
    assignments, centroids = sim_mod.ivf_build(
        emb, n_centroids=N_CENTROIDS, iters=3
    )
    return emb, assignments.cache(), centroids


def test_probe_all_equals_brute_force(ivf):
    emb, assignments, centroids = ivf
    qvec = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    exact = [
        (r["vec_id"], r["cos"])
        for r in sim_mod.brute_force_knn(emb, qvec, k=10, exclude_id=0).collect()
    ]
    got = [
        (r["vec_id"], r["cos"])
        for r in sim_mod.ivf_knn(
            emb, assignments, centroids, qvec, k=10,
            nprobe=len(centroids), exclude_id=0,
        ).collect()
    ]
    assert got == exact


@pytest.mark.parametrize("qid", [0, 7, 42])
def test_partial_probe_recall(ivf, qid):
    """nprobe=3 of 8 cells keeps ≥50% of the exact top-10 on the
    synthetic corpus (near-random vectors — the hard case; real
    clustered embeddings do far better)."""
    emb, assignments, centroids = ivf
    qvec = list(
        emb.filter(F.col("vec_id") == qid).collect()[0]["embedding"]
    )
    exact = {
        r["vec_id"]
        for r in sim_mod.brute_force_knn(emb, qvec, k=10, exclude_id=qid).collect()
    }
    got = {
        r["vec_id"]
        for r in sim_mod.ivf_knn(
            emb, assignments, centroids, qvec, k=10, nprobe=3,
            exclude_id=qid,
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.5, (qid, exact & got)


def test_planted_neighbor_single_probe(ivf):
    """A near-duplicate query retrieves its source vector with nprobe=1
    (it lands in the same cell)."""
    emb, assignments, centroids = ivf
    base = list(emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"])
    qvec = [x * 1.001 for x in base]
    top = sim_mod.ivf_knn(
        emb, assignments, centroids, qvec, k=1, nprobe=1
    ).collect()
    assert top and top[0]["vec_id"] == 7


def test_cells_cover_and_balance(ivf):
    emb, assignments, _ = ivf
    n = emb.count()
    per_cell = {
        r["cell"]: r["n"]
        for r in assignments.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(per_cell.values()) == n
    # no cell swallows everything (coarse quantizer actually partitions)
    assert max(per_cell.values()) < n * 0.8
