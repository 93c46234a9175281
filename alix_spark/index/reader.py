"""IndexReader — open a built index directory and serve queries.

The query-side counterpart of :mod:`alix_spark.build_index`: loads the
meta, forms, final segment + norm tables, and answers BM25 top-k through
block-max WAND. Plays the role of the reference's
``Alix.reader()/searcher()`` lazy singletons
(``/root/reference/java/alix/lucene/Alix.java:298-344``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IndexReader:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        meta_rows = spark.read.json(f"{index_dir}/_meta").collect()
        self.meta = meta_rows[0].asDict()
        self.avgdl = float(self.meta["avgdl"])
        self.n_docs = int(self.meta["n_docs_with_tokens"])
        self.n_buckets = int(self.meta["buckets"])
        self.segments = spark.read.parquet(
            f"{index_dir}/{self.meta['final_segments']}"
        )
        self.norms = spark.read.parquet(
            f"{index_dir}/{self.meta['final_norms']}"
        ).cache()
        self.forms = spark.read.parquet(f"{index_dir}/forms")
        self.docs = spark.read.parquet(f"{index_dir}/docs")

    @classmethod
    def open_streaming(
        cls, spark: SparkSession, index_dir: str
    ) -> "IndexReader":
        """Open the CURRENT version of a streaming (manifest-versioned)
        index — the same query surface over a live
        :class:`alix_spark.streaming.StreamingIndexer` directory. The
        snapshot is pinned at open time (the manifest's file groups are
        immutable), so a long-running reader is unaffected by later
        publishes — the reference's lazy ``Alix.reader()`` singleton
        semantics (``Alix.java:298-344``) without any lock.
        """
        from alix_spark.index import segments as seg_mod
        from alix_spark.streaming import StreamingIndexer

        ix = StreamingIndexer(spark, index_dir)
        docs, segments, norms = ix.load_tables()
        self = cls.__new__(cls)
        self.spark = spark
        self.index_dir = index_dir
        self.segments = segments
        self.norms = norms.cache()
        self.docs = docs
        self.forms = seg_mod.forms_from_segments(segments)
        n, avgdl = seg_mod.corpus_stats_from_norms(self.norms)
        self.n_docs = int(n)
        self.avgdl = float(avgdl)
        self.n_buckets = ix.n_buckets
        self.meta = {
            "version": ix.current_version(),
            "seg_size_final": ix.current_seg_size(),
        }
        return self

    def dfs_for(self, terms: list[str]) -> dict[str, int]:
        uniq = sorted(set(terms))
        return {
            r["term"]: int(r["docs"])
            for r in self.forms.filter(F.col("term").isin(uniq))
            .select("term", "docs")
            .collect()
        }

    def search(self, q: str, k: int = 10) -> DataFrame:
        """BM25 top-k via block-max WAND → (doc_id, score).

        The query string goes through the same analysis chain as the
        corpus (parser handles +must/-not; negative/MUST clauses fall back
        to the DataFrame path in Corpus — WAND serves the common ranked
        OR retrieval).
        """
        from alix_spark.search import wand as wand_mod
        from alix_spark.search.parser import parse

        parsed = parse(q)
        if parsed.must or parsed.must_not or parsed.wildcards:
            raise NotImplementedError(
                "IndexReader.search serves OR queries; boolean operators "
                "route through Corpus.search"
            )
        terms = parsed.should
        dfs = self.dfs_for(terms)
        return wand_mod.wand_topk(
            self.segments,
            self.norms,
            terms,
            dfs,
            self.n_docs,
            self.avgdl,
            k=k,
            n_buckets=self.n_buckets,
        )
