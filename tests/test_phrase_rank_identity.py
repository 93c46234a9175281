"""Phrase-query rank identity vs the reference's own lucene-core-8.8.1:
top-10 docIDs + BM25 scores for exact PhraseQuery goldens, served from
the compressed positional segments."""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from alix_spark import Corpus
from alix_spark.index import segments as seg_mod
from alix_spark.search.phrase import phrase_bm25_topk
from tests.conftest import SF_SMOKE

GOLDEN = {
    sf: json.loads(
        (Path(__file__).parent / "golden" / f"lucene_phrase_{sf}.json").read_text()
    )
    for sf in ("sf0.001", "sf0.1")
}


@pytest.fixture(scope="module", params=["sf0.001", "sf0.1"])
def ctx(spark, request):
    sf = request.param
    docs = spark.read.parquet(f"/root/testdata/{sf}/documents.parquet")
    segs, norms = seg_mod.split_single_pass(
        seg_mod.build_single_pass_from_docs(
            docs.select("doc_id", "text"), text_col="text", seg_size=64
        )
    )
    segs = segs.cache()
    norms = norms.cache()
    n, avgdl = seg_mod.corpus_stats_from_norms(norms)
    # Lucene's avgFieldLength is sumTotalTermFreq/docCount on EXACT lengths
    dfs = {
        r["term"]: int(r["docs"])
        for r in seg_mod.forms_from_segments(segs).collect()
    }
    return sf, segs, norms, n, avgdl, dfs


@pytest.mark.parametrize("qi", range(len(GOLDEN["sf0.001"])),
                         ids=[g["q"] for g in GOLDEN["sf0.001"]])
def test_phrase_rank_identity_vs_lucene(ctx, qi):
    sf, segs, norms, n, avgdl, dfs = ctx
    case = GOLDEN[sf][qi]
    terms = case["q"].strip('"').split()
    got = phrase_bm25_topk(segs, norms, terms, dfs, n, avgdl, k=10).collect()
    exp = [(int(d), float(s)) for d, s in case["topk"]]
    assert [r["doc_id"] for r in got] == [d for d, _ in exp], (sf, case["q"])
    for g, (_, es) in zip(got, exp):
        assert math.isclose(g["score"], es, rel_tol=1e-5, abs_tol=1e-6), (
            sf, case["q"],
        )
