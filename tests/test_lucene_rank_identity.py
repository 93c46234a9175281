"""Rank-identity gate vs the Lucene reference (BASELINE.json metric).

Golden files were produced by indexing the same corpora through the
reference's own lucene-core-8.8.1.jar (tools/lucene_oracle/). The engine's
lucene-mode BM25 must reproduce the top-10 docIDs in order, with scores
equal to float precision.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

from alix_spark import Corpus
from tests.conftest import SF_SMOKE

SF_BENCH = "/root/testdata/sf0.1"


def _golden(name: str):
    return json.loads((Path(__file__).parent / "golden" / name).read_text())

GOLDEN_SMOKE = _golden("lucene_topk_sf0.001.json")
GOLDEN_BENCH = _golden("lucene_topk_sf0.1.json")


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    return Corpus(docs)


@pytest.fixture(scope="module")
def corpus_sf01(spark):
    docs = spark.read.parquet(f"{SF_BENCH}/documents.parquet")
    return Corpus(docs)


def _check(corpus, case):
    got = [
        (r["doc_id"], r["score"])
        for r in corpus.search(case["q"], k=10, lucene=True).collect()
    ]
    exp = [(int(d), float(s)) for d, s in case["topk"]]
    assert [d for d, _ in got] == [d for d, _ in exp], (
        f"docID ranking differs for {case['q']!r}:\n"
        f"  got={got}\n  exp={exp}"
    )
    for (gd, gs), (ed, es) in zip(got, exp):
        assert math.isclose(gs, es, rel_tol=1e-5, abs_tol=1e-6), (
            f"score differs for doc {gd} in {case['q']!r}: {gs} vs {es}"
        )


@pytest.mark.parametrize("case", GOLDEN_SMOKE, ids=[g["q"] for g in GOLDEN_SMOKE])
def test_rank_identity(corpus, case):
    _check(corpus, case)


@pytest.mark.parametrize("case", GOLDEN_BENCH, ids=[g["q"] for g in GOLDEN_BENCH])
def test_rank_identity_sf01(corpus_sf01, case):
    """The BASELINE.json metric: rank identity on the SF=0.1 sample."""
    _check(corpus_sf01, case)
