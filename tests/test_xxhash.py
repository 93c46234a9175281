"""Python XXH64 == Spark xxhash64 (seed 42), across length regimes and
non-ASCII; plus direct-build ≡ two-stage-build equivalence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from alix_spark.index.xxhash import term_bucket, xxh64_signed


def test_xxh64_matches_spark(spark):
    terms = [
        "", "a", "ab", "abc", "abcd", "fast", "tok1234", "l'homme", "é",
        "über", "x" * 7, "y" * 8, "z" * 31, "w" * 32, "v" * 33, "u" * 100,
        "parce que", "漢字",
    ]
    df = spark.createDataFrame([(t,) for t in terms], "t string")
    rows = df.select(
        "t",
        F.xxhash64("t").alias("h"),
        F.pmod(F.xxhash64("t"), F.lit(32)).cast("int").alias("b"),
    ).collect()
    for r in rows:
        assert xxh64_signed(r["t"].encode()) == r["h"], r["t"]
        assert term_bucket(r["t"], 32) == r["b"], r["t"]


def test_direct_build_equals_two_stage(spark):
    from alix_spark import Corpus
    from alix_spark.index import segments as seg_mod
    from alix_spark.search.bm25 import corpus_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    c = Corpus(docs)
    n, avgdl = corpus_stats(c.doc_lens)
    norms = seg_mod.build_norms(c.doc_lens, seg_size=128).cache()
    two_stage = seg_mod.build_segments(
        c.postings, c.doc_lens, avgdl, seg_size=128
    ).toPandas()
    direct = seg_mod.build_segments_direct(
        c.tokens, norms, avgdl, seg_size=128
    ).toPandas()
    key = ["term", "seg_id", "block_id"]
    a = two_stage.sort_values(key).reset_index(drop=True)
    b = direct.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    for col in ["bucket", "term", "seg_id", "block_id", "n", "first_doc",
                "last_doc", "max_tf"]:
        assert a[col].tolist() == b[col].tolist(), col
    assert [bytes(x) for x in a["doc_gaps"]] == [bytes(x) for x in b["doc_gaps"]]
    assert [bytes(x) for x in a["tfs"]] == [bytes(x) for x in b["tfs"]]
