"""S5 — incremental update: delete-then-reinsert by source key.

Reference semantics: the indexer deletes every doc carrying the same
``alix.filename`` before re-adding the file's documents
(``/root/reference/java/alix/lucene/SAXIndexer.java:133-137``), and the
CLI loader swaps the finished index in atomically
(``/root/reference/java/alix/cli/Load.java:157-165``). Here the source
key is ``(repo, path)`` — the MERGE key of the input_hint's code-document
table.

Spark-native design (docId-range segments make this surgical):

* **updates** keep their existing doc_id — delete + reinsert in place,
  so only the segment(s) covering those ids are rebuilt;
* **inserts** get doc_ids appended after the current max (Lucene's
  insertion-order docids), landing in the tail segment / new segments;
* **deletes** drop the doc row; the covering segment is rebuilt without
  its postings (ids are never reused — the reference's Lucene behaviour);
* every segment whose doc range is untouched is carried over
  **byte-identical** — no decode, no re-encode, no shuffle; the cost of
  an update is O(changed segments), not O(corpus).

Correctness contract (tests/test_incremental_update.py): untouched
segment rows are bit-identical to the previous build, and BM25 top-k on
the updated index equals a from-scratch computation over the updated
docs table with the same id mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from alix_spark.index import segments as seg_mod


def split_changes(
    docs_old: DataFrame, changed: DataFrame, key: tuple[str, str] = ("repo", "path")
) -> tuple[DataFrame, DataFrame]:
    """Partition the changed rows into (updates, inserts) by whether the
    (repo, path) key already exists; updates carry the OLD doc_id."""
    k = list(key)
    old_ids = docs_old.select(*k, "doc_id")
    updates = changed.join(old_ids, k, "inner")
    inserts = changed.join(old_ids.select(*k), k, "left_anti")
    return updates, inserts


def seg_range_pred(affected: list[int], seg_size: int):
    """Pushdown-friendly predicate selecting the docs of the affected
    docId-range segments: an OR of plain ``doc_id`` range comparisons
    (parquet row-group/file min-max stats prune on these, which the
    arithmetic form ``(doc_id/seg_size).isin(...)`` can never do — at
    100 TB that is the difference between touching the affected file
    groups and scanning the whole docs table)."""
    pred = F.lit(False)
    for s in affected:
        lo, hi = s * seg_size, (s + 1) * seg_size
        pred = pred | ((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    return pred


def incremental_update(
    docs_old: DataFrame,
    segments_old: DataFrame,
    norms_old: DataFrame,
    changed: DataFrame,
    seg_size: int,
    n_buckets: int = seg_mod.DEFAULT_BUCKETS,
    text_col: str = "content",
    deleted: DataFrame | None = None,
    key: tuple[str, str] = ("repo", "path"),
) -> tuple[DataFrame, DataFrame, DataFrame, list[int]]:
    """MERGE ``changed`` (and optional ``deleted`` keys) into an index.

    Returns (docs_new, segments_new, norms_new, affected_seg_ids).
    ``changed`` has the source schema (repo, path, commit, lang, content
    [, sha256]); ``deleted`` has just the key columns.
    """
    from alix_spark import ingest
    from alix_spark.analysis import simple

    k = list(key)
    if "sha256" not in changed.columns:
        changed = ingest.add_sha256(changed, text_col)
    else:
        bad = ingest.sha256_violations(changed, text_col).count()
        if bad:
            raise RuntimeError(f"sha256 invariant violated for {bad} changed rows")

    updates, inserts = split_changes(docs_old, changed, key)
    max_id = docs_old.agg(F.max("doc_id")).collect()[0][0]
    max_id = -1 if max_id is None else int(max_id)
    inserts = ingest.scalable_row_number(
        inserts, [F.asc(c) for c in k], "doc_id", start=max_id + 1
    )

    # new docs table: untouched + updated-in-place + appended inserts,
    # minus deletes (anti-join on the key)
    untouched = docs_old.join(changed.select(*k), k, "left_anti")
    if deleted is not None:
        untouched = untouched.join(deleted.select(*k), k, "left_anti")
        updates = updates.join(deleted.select(*k), k, "left_anti")
    cols = docs_old.columns
    docs_new = (
        untouched.select(*cols)
        .unionByName(updates.select(*cols))
        .unionByName(inserts.select(*cols))
    )

    # affected docId-range segments: every segment touched by an update,
    # insert, or delete — including segments of deleted-only docs
    touched_ids = updates.select("doc_id")
    touched_ids = touched_ids.unionByName(inserts.select("doc_id"))
    if deleted is not None:
        touched_ids = touched_ids.unionByName(
            docs_old.join(deleted.select(*k), k, "inner").select("doc_id")
        )
    affected = sorted(
        r["seg"]
        for r in touched_ids.select(
            (F.col("doc_id") / seg_size).cast("long").alias("seg")
        )
        .distinct()
        .collect()
    )
    if not affected:
        return docs_new, segments_old, norms_old, []

    # rebuild ONLY the affected segments, from ALL surviving docs whose
    # ids fall in those ranges (a segment encodes its whole doc range);
    # plain doc_id range comparisons so the scan prunes on parquet stats
    in_affected = docs_new.filter(seg_range_pred(affected, seg_size))
    tokens = simple.tokenize(in_affected, "doc_id", text_col)
    rebuilt = seg_mod.build_single_pass(
        tokens, seg_size=seg_size, n_buckets=n_buckets
    )
    new_segs, new_norms = seg_mod.split_single_pass(rebuilt)

    segments_new = segments_old.filter(
        ~F.col("seg_id").isin(affected)
    ).unionByName(new_segs)
    norms_new = norms_old.filter(~F.col("seg_id").isin(affected)).unionByName(
        new_norms
    )
    return docs_new, segments_new, norms_new, affected
