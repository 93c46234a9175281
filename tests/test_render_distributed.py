"""Distributed D3/D4: paint_docs / contrast_docs cogrouped kernels agree
with the pure per-doc functions they wrap."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark import Corpus
from alix_spark.render.paint import contrast, contrast_docs, paint, paint_docs


@pytest.fixture(scope="module")
def ctx(spark):
    docs = spark.createDataFrame(
        [
            (0, "le chat chat dort et le chien regarde"),
            (1, "le chien dort et la femme regarde le chat"),
            (2, "rien de commun ici vraiment"),
        ],
        "doc_id long, text string",
    )
    c = Corpus(docs, analyzer="french")
    return docs, c.token_table.cache()


def _local_offsets(token_pdf):
    return list(zip(token_pdf["start"], token_pdf["end"], token_pdf["term"]))


def test_paint_docs_matches_local(ctx):
    docs, tok = ctx
    got = {r["doc_id"]: r["html"] for r in paint_docs(docs, tok).collect()}
    assert set(got) == {0, 1, 2}
    tok_pdf = tok.toPandas()
    txt = {r["doc_id"]: r["text"] for r in docs.collect()}
    for d in (0, 1, 2):
        part = tok_pdf[tok_pdf["doc_id"] == d]
        tfs = part[part["term"] != ""]["term"].value_counts().to_dict()
        exp = paint(txt[d], _local_offsets(part), tfs, stop=set())
        assert got[d] == exp, d
    assert '<mark class="lvl' in got[0]


def test_contrast_docs_matches_local(ctx):
    docs, tok = ctx
    got = {
        r["doc_id"]: r["html"]
        for r in contrast_docs(docs, tok, other_doc_id=1).collect()
    }
    tok_pdf = tok.toPandas()
    txt = {r["doc_id"]: r["text"] for r in docs.collect()}
    other = tok_pdf[(tok_pdf["doc_id"] == 1) & (tok_pdf["term"] != "")]
    tf_other = other["term"].value_counts().to_dict()
    for d in (0, 2):
        part = tok_pdf[tok_pdf["doc_id"] == d]
        nz = part[part["term"] != ""]["term"]
        exp = contrast(
            txt[d], _local_offsets(part), nz.value_counts().to_dict(),
            tf_other, int(nz.size), int(other.shape[0]),
        )
        assert got[d] == exp, d
    # doc 0 shares 'chat'/'chien' with doc 1, so shared marks exist
    assert 'class="shared' in got[0]
    # doc 2 shares nothing -> no shared marks
    assert 'class="shared' not in got[2]


def test_rank_chi2inv_repulsion(spark):
    """chi2inv scores only under-represented docs; over-represented get 0."""
    from alix_spark.search.similarity import rank_docs

    docs = spark.createDataFrame(
        [(0, "aa aa aa aa bb"), (1, "aa bb bb bb bb bb bb bb")],
        "doc_id long, text string",
    )
    c = Corpus(docs)
    out = {
        r["doc_id"]: r["score"]
        for r in rank_docs(c.postings, c.doc_lens, ["aa"], sim="chi2inv", k=10).collect()
    }
    # doc 0 is aa-rich (f > E -> 0); doc 1 is aa-poor (repulsed -> positive)
    assert out[0] == 0.0 and out[1] > 0.0
