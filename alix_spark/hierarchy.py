"""Two-level document hierarchy: books containing chapters.

Reference: a ``<alix:book>`` buffers its chapters and writes them as one
contiguous block with the book document LAST
(``/root/reference/java/alix/lucene/SAXIndexer.java:461-479``); parent
lookup is a type-filtered query on the shared book id, not a pointer
(``/root/reference/java/alix/lucene/Alix.java:657-669``); corpora are
built from book-id lists and expand to every chapter docId
(``/root/reference/java/alix/lucene/search/Corpus.java:237-301``).

Spark shape: the docs table carries ``book_id`` and ``doc_type``
('book' | 'chapter' | 'article') columns. For the code-corpus input hint,
``repo`` is the natural book key and files are the chapters —
:func:`with_hierarchy` derives both columns from it. All lookups are
joins/filters; the two-level facet aggregation is a Spark ``rollup``
(SURVEY.md §2.9: the only grouping-set the reference ever needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOOK = "book"
CHAPTER = "chapter"


def with_hierarchy(
    docs: DataFrame, book_col: str = "repo", doc_type: str = CHAPTER
) -> DataFrame:
    """Attach (book_id, doc_type) to a flat docs table — every row a
    chapter of its ``book_col`` value."""
    return docs.withColumn("book_id", F.col(book_col)).withColumn(
        "doc_type", F.lit(doc_type)
    )


def book_rows(docs: DataFrame, doc_lens: DataFrame | None = None) -> DataFrame:
    """Synthesize one 'book' row per book_id: chapter count, doc-id range
    (contiguous by construction when ids were assigned in (repo, path)
    order — the reference's addDocuments-block invariant), and token
    weight when ``doc_lens`` is given."""
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_chapters"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    ]
    j = docs
    if doc_lens is not None:
        j = docs.join(doc_lens, "doc_id", "left")
        aggs.append(F.sum("dl").cast("long").alias("occs"))
    return j.groupBy("book_id").agg(*aggs)


def index_book_documents(
    docs: DataFrame,
    text_col: str = "text",
    title_col: str = "path",
) -> DataFrame:
    """Emit a REAL book document after each chapter block — the
    reference buffers a ``<alix:book>``'s chapters and writes the book
    document LAST in the same contiguous block
    (``SAXIndexer.java:461-479``), so book-level text (title page, front
    matter) is itself searchable, distinct from chapter text.

    Input: a flat ``with_hierarchy`` docs table whose doc_ids were
    assigned in (book, chapter) order (contiguous blocks — the ingest
    invariant). Output: chapters + one ``doc_type='book'`` row per book
    whose text is the book's front matter (book id + chapter titles),
    with doc_ids remapped to the reference's interleaved layout::

        chapters(book0) … book0 chapters(book1) … book1 …

    i.e. every chapter id shifts by the number of completed book blocks
    before it; the book row takes the id right after its block. All
    JVM-side: one aggregate over (small) books + a broadcast join back.
    """
    from alix_spark.ingest import scalable_row_number

    # front matter is BOUNDED (first 256 titles): the bound is enforced
    # BEFORE any aggregation buffer exists — a window rank keeps only the
    # 256 alphabetically-first titles per book, so the collect_list below
    # holds ≤256 elements even for a book with millions of chapters (the
    # reference's book text is the title page, not the full table of
    # contents). The window sort spills; the agg buffer never grows.
    from pyspark.sql import Window

    w = Window.partitionBy("book_id").orderBy(
        F.asc(title_col), F.asc("doc_id")
    )
    front = (
        docs.select("book_id", title_col, "doc_id")
        .filter(F.col(title_col).isNotNull())
        .withColumn("_trk", F.row_number().over(w))
        .filter(F.col("_trk") <= 256)
        .groupBy("book_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_list(title_col)), " "
            ).alias("_titles")
        )
    )
    books = (
        docs.groupBy("book_id")
        .agg(
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .join(front, "book_id", "left")
        .withColumn(
            "_book_text",
            F.concat_ws(
                " ", F.col("book_id"), F.coalesce("_titles", F.lit(""))
            ),
        )
        .drop("_titles")
    )
    books = scalable_row_number(
        books, [F.asc("first_doc")], "_book_rank", start=0
    )
    chap_cols = docs.columns
    chapters = (
        docs.join(
            F.broadcast(books.select("book_id", "_book_rank")), "book_id"
        )
        .withColumn("doc_id", F.col("doc_id") + F.col("_book_rank"))
        .select(*chap_cols)
    )
    book_rows_df = books.select(
        "book_id",
        (F.col("last_doc") + F.col("_book_rank") + 1).alias("doc_id"),
        F.col("_book_text").alias(text_col),
    ).withColumn("doc_type", F.lit(BOOK))
    missing = [
        c for c in chap_cols if c not in book_rows_df.columns
    ]
    for c in missing:
        book_rows_df = book_rows_df.withColumn(
            c, F.lit(None).cast(docs.schema[c].dataType)
        )
    return chapters.unionByName(book_rows_df.select(*chap_cols))


def parent_book(docs: DataFrame, doc_id: int) -> DataFrame:
    """Alix.java:657-669 — the book row of one document, by shared
    book_id + type filter (never a pointer)."""
    bid = docs.filter(F.col("doc_id") == doc_id).select("book_id")
    return docs.join(F.broadcast(bid), "book_id").filter(
        F.col("doc_type") == BOOK
    )


def corpus_from_books(docs: DataFrame, book_ids: list[str]) -> DataFrame:
    """F2 — a Corpus (docId set) from a book-id list: every chapter of
    the named books (``Corpus.java:237-301``). Returns (doc_id)."""
    return (
        docs.filter(F.col("book_id").isin(list(book_ids)))
        .filter(F.col("doc_type") != BOOK)
        .select("doc_id")
    )


def facet_rollup(
    docs: DataFrame, doc_lens: DataFrame, facet_col: str
) -> DataFrame:
    """Two-level facet aggregation: per (facet, book) AND per facet via
    one ``rollup`` — chapters roll up into their books, books into the
    facet total (the reference's bookid facet view, grouping-sets-free
    because Spark computes both levels in one pass)."""
    j = docs.join(doc_lens, "doc_id", "left")
    return (
        j.rollup(F.col(facet_col).alias("facet"), "book_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("dl").cast("long").alias("occs"),
        )
        .filter(F.col("facet").isNotNull())  # drop the grand-total row
    )
