"""Book/chapter hierarchy: parent lookup, corpus-from-books, rollup.

Reference: ``SAXIndexer.java:461-479`` (book block), ``Alix.java:657-669``
(parent by type-filtered query), ``Corpus.java:237-301``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alix_spark import hierarchy as H


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # (doc_id, repo, lang, doc_type)
        (0, "org/a", "py", "chapter"),
        (1, "org/a", "py", "chapter"),
        (2, "org/a", "py", "book"),
        (3, "org/b", "md", "chapter"),
        (4, "org/b", "md", "book"),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, repo string, lang string, doc_type string"
    ).withColumn("book_id", F.col("repo"))
    return d.cache()


@pytest.fixture(scope="module")
def doc_lens(spark):
    return spark.createDataFrame(
        [(0, 10), (1, 20), (2, 0), (3, 5), (4, 0)], "doc_id long, dl long"
    )


def test_with_hierarchy_derives_columns(spark):
    flat = spark.createDataFrame(
        [(0, "r1", "x"), (1, "r2", "y")], "doc_id long, repo string, path string"
    )
    h = H.with_hierarchy(flat)
    assert {r["book_id"] for r in h.collect()} == {"r1", "r2"}
    assert {r["doc_type"] for r in h.collect()} == {"chapter"}


def test_parent_book_lookup(docs):
    parent = H.parent_book(docs, 1).collect()
    assert len(parent) == 1 and parent[0]["doc_id"] == 2


def test_corpus_from_books_excludes_book_rows(docs):
    ids = {r["doc_id"] for r in H.corpus_from_books(docs, ["org/a"]).collect()}
    assert ids == {0, 1}


def test_book_rows_ranges(docs, doc_lens):
    b = {r["book_id"]: r for r in H.book_rows(
        docs.filter(F.col("doc_type") == "chapter"), doc_lens
    ).collect()}
    assert b["org/a"]["n_chapters"] == 2
    assert (b["org/a"]["first_doc"], b["org/a"]["last_doc"]) == (0, 1)
    assert b["org/a"]["occs"] == 30


def test_facet_rollup_two_levels(docs, doc_lens):
    out = H.facet_rollup(
        docs.filter(F.col("doc_type") == "chapter"), doc_lens, "lang"
    ).collect()
    per_book = {
        (r["facet"], r["book_id"]): (r["docs"], r["occs"])
        for r in out
        if r["book_id"] is not None
    }
    totals = {r["facet"]: (r["docs"], r["occs"]) for r in out if r["book_id"] is None}
    assert per_book[("py", "org/a")] == (2, 30)
    assert totals["py"] == (2, 30)
    assert totals["md"] == (1, 5)


def test_index_book_documents_layout_and_search(spark):
    """SAXIndexer.java:461-479 — the book document is a REAL indexed row
    written right after its chapter block: a book-only term (front
    matter) is searchable at book level and excluded from chapter-level
    corpora; chapter ids stay contiguous per block."""
    flat = spark.createDataFrame(
        [
            (0, "org/alpha", "src/f0.py", "alpha code one"),
            (1, "org/alpha", "src/f1.py", "alpha code two"),
            (2, "org/alpha", "src/f2.py", "alpha code three"),
            (3, "zzz/beta", "lib/g0.py", "beta code one"),
            (4, "zzz/beta", "lib/g1.py", "beta code two"),
        ],
        "doc_id long, repo string, path string, text string",
    )
    d = H.with_hierarchy(flat)
    full = H.index_book_documents(d).cache()
    rows = {r["doc_id"]: r for r in full.collect()}
    # interleaved layout: chapters 0-2, book at 3; chapters 4-5, book 6
    assert [rows[i]["doc_type"] for i in range(7)] == [
        "chapter", "chapter", "chapter", "book",
        "chapter", "chapter", "book",
    ]
    assert rows[3]["book_id"] == "org/alpha"
    assert rows[6]["book_id"] == "zzz/beta"
    # book text = front matter (book id + chapter titles), searchable
    from alix_spark.analysis import simple

    toks = simple.tokenize(full, "doc_id", "text")
    hits = sorted(
        r["doc_id"]
        for r in toks.filter(F.col("term") == "f1").select("doc_id")
        .distinct().collect()
    )
    assert hits == [3]  # the chapter TITLE is found only at book level
    # chapter text is still found at chapter level (shifted ids)
    alpha_hits = sorted(
        r["doc_id"]
        for r in toks.filter(F.col("term") == "alpha").select("doc_id")
        .distinct().collect()
    )
    assert alpha_hits == [0, 1, 2, 3]  # 3 chapters + the book front matter
    # corpus-from-books expands to chapters ONLY (book row excluded)
    corpus = sorted(
        r["doc_id"]
        for r in H.corpus_from_books(full, ["org/alpha"]).collect()
    )
    assert corpus == [0, 1, 2]
    # parent lookup: chapter 5 (zzz/beta) → book row 6
    parent = H.parent_book(full, 5).collect()
    assert len(parent) == 1 and parent[0]["doc_id"] == 6
