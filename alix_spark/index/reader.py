"""IndexReader — open a built index directory and serve queries.

The query-side counterpart of :mod:`alix_spark.build_index`: loads the
meta, forms, final segment + norm tables, and answers the FULL query
surface — ranked OR (block-max WAND), MUST / MUST_NOT boolean
restriction, and wildcard prefix expansion — from the persisted
segments, with no corpus rescan. Plays the role of the reference's
``Alix.reader()/searcher()`` lazy singletons plus its query assembly
(``/root/reference/java/alix/lucene/Alix.java:298-344,687-756``).

Scoring on this path is Lucene-faithful: per-doc lengths come from the
stored SmallFloat norms (byte-quantized, like Lucene's), avgdl from the
exact per-segment sums, idf stays corpus-wide under boolean restriction
— the `bm25_lucene` semantics proven rank-identical to the reference
jar in tests/test_lucene_rank_identity.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

POSTINGS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("term", StringType()),
        StructField("tf", IntegerType()),
    ]
)


def expand_prefixes(
    forms: DataFrame, prefixes: list[str], sort: bool = False
) -> list[str]:
    """Expand wildcard prefixes against a vocabulary table in ONE
    pruned scan (all prefixes OR'ed into a single filter, one Spark
    job for any number of wildcards — WildcardQuery,
    ``Alix.java:731-734``). Output preserves the per-prefix grouping
    contract: each prefix's matches (sorted when ``sort``), in input
    order. Shared by :meth:`IndexReader.expand_wildcards` and
    ``Corpus.parse`` so the expansion semantics live in one place."""
    if not prefixes:
        return []
    cond = F.col("term").startswith(prefixes[0])
    for prefix in prefixes[1:]:
        cond = cond | F.col("term").startswith(prefix)
    matched = [
        r["term"] for r in forms.filter(cond).select("term").collect()
    ]
    if sort:
        matched = sorted(matched)
    out: list[str] = []
    for prefix in prefixes:
        out.extend(t for t in matched if t.startswith(prefix))
    return out


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        meta_rows = spark.read.json(f"{index_dir}/_meta").collect()
        meta = meta_rows[0].asDict()
        self._init_tables(
            spark,
            segments=spark.read.parquet(
                f"{index_dir}/{meta['final_segments']}"
            ),
            norms=spark.read.parquet(f"{index_dir}/{meta['final_norms']}"),
            docs=spark.read.parquet(f"{index_dir}/docs"),
            forms=spark.read.parquet(f"{index_dir}/forms"),
            n_buckets=int(meta["buckets"]),
            n_docs=int(meta["n_docs_with_tokens"]),
            avgdl=float(meta["avgdl"]),
        )
        self.index_dir = index_dir
        self.meta = meta

    def _init_tables(
        self,
        spark: SparkSession,
        segments: DataFrame,
        norms: DataFrame,
        docs: DataFrame | None,
        forms: DataFrame | None,
        n_buckets: int,
        n_docs: int | None = None,
        avgdl: float | None = None,
    ) -> None:
        from alix_spark.index import segments as seg_mod

        self.spark = spark
        self.segments = segments
        self.norms = norms.cache()
        self.docs = docs
        self.forms = (
            forms
            if forms is not None
            else seg_mod.forms_from_segments(segments)
        )
        if n_docs is None or avgdl is None:
            n_docs, avgdl = seg_mod.corpus_stats_from_norms(self.norms)
        self.n_docs = int(n_docs)
        self.avgdl = float(avgdl)
        self.n_buckets = n_buckets

    @classmethod
    def from_tables(
        cls,
        spark: SparkSession,
        segments: DataFrame,
        norms: DataFrame,
        docs: DataFrame | None = None,
        forms: DataFrame | None = None,
        n_buckets: int | None = None,
    ) -> "IndexReader":
        """Open directly over segment/norm tables (already-loaded
        parquet, or the output of a build) — same query surface, no
        ``_meta`` file needed."""
        from alix_spark.index import segments as seg_mod

        self = cls.__new__(cls)
        self._init_tables(
            spark,
            segments,
            norms,
            docs,
            forms,
            seg_mod.DEFAULT_BUCKETS if n_buckets is None else n_buckets,
        )
        self.index_dir = None
        self.meta = {}
        return self

    @classmethod
    def open_streaming(
        cls, spark: SparkSession, index_dir: str
    ) -> "IndexReader":
        """Open the CURRENT version of a streaming (manifest-versioned)
        index — the same query surface over a live
        :class:`alix_spark.streaming.StreamingIndexer` directory. The
        snapshot is pinned at open time (the manifest's file groups are
        immutable), so concurrent publishes never change what this
        reader sees — the reference's lazy ``Alix.reader()`` singleton
        semantics (``Alix.java:298-344``) without any lock.

        Retention bound: the pin holds only while the opened version is
        within the indexer's ``retain_versions`` window — once
        ``retain_versions`` newer versions have published, ``gc()``
        deletes the unshared file groups of this snapshot and its lazy
        DataFrames will fail on next evaluation. A reader held across
        many publishes should re-open (or the stream should be run with
        a ``retain_versions`` ≥ the maximum reader age in versions).
        """
        from alix_spark.streaming import StreamingIndexer

        ix = StreamingIndexer(spark, index_dir)
        docs, segments, norms = ix.load_tables()
        self = cls.from_tables(
            spark,
            segments,
            norms,
            docs=docs,
            n_buckets=ix.current_n_buckets(),
        )
        self.index_dir = index_dir
        self.meta = {
            "version": ix.current_version(),
            "seg_size_final": ix.current_seg_size(),
        }
        return self

    # -- posting access -------------------------------------------------
    def dfs_for(self, terms: list[str]) -> dict[str, int]:
        uniq = sorted(set(terms))
        return {
            r["term"]: int(r["docs"])
            for r in self.forms.filter(F.col("term").isin(uniq))
            .select("term", "docs")
            .collect()
        }

    def decoded_postings(self, terms: list[str]) -> DataFrame:
        """(doc_id, term, tf) for the given terms, decoded from the
        compressed segments. The scan is bucket+term pruned (pushed to
        parquet); the varbyte decode runs per docId-range segment in an
        Arrow kernel — the same distribution shape as the WAND scorer,
        so a Zipf-head term never concentrates on one task."""
        from alix_spark.index import segments as seg_mod
        from alix_spark.index.xxhash import term_bucket

        uniq = sorted(set(terms))
        if not uniq:
            return self.spark.createDataFrame([], POSTINGS_SCHEMA)
        buckets = sorted({term_bucket(t, self.n_buckets) for t in uniq})
        pruned = self.segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(uniq)
        )

        def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
            out = []
            for term, rows in pdf.groupby("term", sort=False):
                ids, tfs = seg_mod.decode_blocks(rows)
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": ids.astype("int64"),
                            "term": term,
                            "tf": tfs.astype("int32"),
                        }
                    )
                )
            if not out:
                return pd.DataFrame(
                    {"doc_id": [], "term": [], "tf": []}
                ).astype({"doc_id": "int64", "term": "str", "tf": "int32"})
            return pd.concat(out, ignore_index=True)

        return pruned.groupBy("seg_id").applyInPandas(
            kernel, POSTINGS_SCHEMA
        )

    def doc_lens(self) -> DataFrame:
        """(doc_id, dl) with the Lucene-visible (quantized) lengths,
        decoded from the stored norms."""
        from alix_spark.search.phrase import doc_lens_from_norms

        return doc_lens_from_norms(self.norms)

    def expand_wildcards(self, prefixes: list[str]) -> list[str]:
        """Prefix expansion against the persisted vocabulary
        (WildcardQuery, ``Alix.java:731-734``); a tiny pruned scan of
        the forms table."""
        return expand_prefixes(self.forms, prefixes, sort=True)

    def phrase(self, terms: list[str]) -> DataFrame:
        """Exact-phrase matching → (doc_id, freq) off the positional
        segments (requires an index built with positions — the default;
        the reference's PhraseQuery path, ``Alix.java:154-165``)."""
        from alix_spark.search.phrase import phrase_search

        return phrase_search(self.segments, terms, n_buckets=self.n_buckets)

    def _parse_expanded(self, q: str):
        """Parse ``q`` with wildcards expanded against the persisted
        vocabulary; ``parsed.had_wildcards`` records that expansion
        happened (a no-match expansion is an empty BooleanQuery, not a
        malformed query)."""
        from alix_spark.search.parser import parse

        parsed = parse(q)
        if parsed.wildcards:
            parsed.should.extend(self.expand_wildcards(parsed.wildcards))
            parsed.wildcards = []
        return parsed

    def boolean_docs(self, q: str) -> DataFrame:
        """ALL doc ids matching the boolean semantics of ``q`` (no
        ranking, no k-cut) → (doc_id), served from decoded segment
        postings — the reference's BooleanQuery match set
        (``Alix.java:714-754``)."""
        from alix_spark.search.boolean import matching_docs

        parsed = self._parse_expanded(q)
        decoded = self.decoded_postings(parsed.all_terms())
        return matching_docs(
            decoded, parsed, all_docs=self.doc_lens()
        ).select("doc_id")

    # -- the query surface ----------------------------------------------
    def search(self, q: str, k: int = 10) -> DataFrame:
        """Top-k retrieval for the full +/-/* query grammar →
        (doc_id, score), served entirely from the persisted index.

        * pure OR → block-max WAND over the compressed segments
        * MUST / MUST_NOT → boolean restriction over decoded doc sets
          (posting-join / anti-join), positive terms then scored with
          corpus-wide idf (``Alix.java:714-754`` semantics)
        * ``prefix*`` → vocabulary expansion into SHOULD clauses
        * pure-negative → all docs minus exclusions, score 0
        """
        from alix_spark.search import bm25 as bm25_mod
        from alix_spark.search import wand as wand_mod
        from alix_spark.search.boolean import matching_docs

        parsed = self._parse_expanded(q)
        terms = parsed.must + parsed.should
        if not parsed.must and not parsed.must_not:
            if not terms:
                if parsed.had_wildcards:
                    # a wildcard that expanded to nothing matches
                    # nothing — not a malformed query
                    return (
                        self.doc_lens()
                        .select("doc_id")
                        .withColumn("score", F.lit(0.0))
                        .limit(0)
                    )
                raise ValueError(f"empty query: {q!r}")
            return wand_mod.wand_topk(
                self.segments,
                self.norms,
                terms,
                self.dfs_for(terms),
                self.n_docs,
                self.avgdl,
                k=k,
                n_buckets=self.n_buckets,
            )
        decoded = self.decoded_postings(
            sorted(set(terms) | set(parsed.must_not))
        )
        dls = self.doc_lens()
        candidates = matching_docs(decoded, parsed, all_docs=dls)
        if not terms:
            # pure-negative: every surviving doc, unscored (score 0)
            return (
                candidates.select("doc_id")
                .withColumn("score", F.lit(0.0))
                .orderBy("doc_id")
                .limit(k)
            )
        postings = decoded.filter(F.col("term").isin(terms)).join(
            candidates, "doc_id", "left_semi"
        )
        # idf stays corpus-wide even when candidates are restricted
        dfs = self.forms.select("term", F.col("docs").alias("df"))
        return bm25_mod.bm25_topk(
            postings,
            dls,
            terms,
            k=k,
            lucene=True,
            n_docs=self.n_docs,
            avgdl=self.avgdl,
            dfs=dfs,
        )
