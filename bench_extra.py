#!/usr/bin/env python3
"""Extra benchmarks + plan capture for the optimization rounds.

NOT the driver bench (bench.py is frozen for measurement). This file
isolates individual operators with the noop sink (guide §1.4), labels the
jobs (§1.5), and dumps `.explain("formatted")` for each query to
plans/r07/<name>_<tag>.txt so plan claims are checkable without Spark.

Usage:
    python bench_extra.py <tag> [query ...]

<tag> is the plan-file suffix ("before" / "after"). With no query names,
runs every registered probe. Prints one JSON line of isolated timings.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def dump_plan(df, name: str, tag: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    path = os.path.join(PLAN_DIR, f"{name}_{tag}.txt")
    with open(path, "w") as f, redirect_stdout(f):
        df.explain("formatted")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    only = set(sys.argv[2:])

    from pyspark.sql import functions as F

    from alix_spark import Corpus, get_spark
    from alix_spark.cooc import ngrams as ngrams_mod
    from alix_spark.cooc import window as window_mod
    from alix_spark.textops import dedup as dedup_mod

    spark = get_spark(
        app_name="alix-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .repartition(int(CPUS))
        .cache()
    )
    docs.count()
    timings: dict[str, float] = {}

    def probe(name: str, build, sink=noop, plan: bool = True):
        """build() -> DataFrame; timed through the sink, plan dumped."""
        if only and name not in only:
            return
        df = build()
        if plan:
            dump_plan(df, name, tag)
        sc.setJobDescription(f"probe:{name}")
        t0 = time.time()
        sink(df)
        timings[name] = round(time.time() - t0, 3)
        sc.setJobDescription(None)

    # --- postings / index build -------------------------------------- #
    c = Corpus(docs, cache=False)
    probe("postings", lambda: c.postings)
    probe("doc_lens", lambda: c.doc_lens)
    probe("forms", lambda: c.forms)

    # offsets
    from alix_spark.analysis.simple import token_offsets

    probe("offsets", lambda: token_offsets(docs, "doc_id", "text"))

    # --- segment-backed search paths ---------------------------------- #
    from alix_spark.index import segments as seg_mod
    from alix_spark.search import wand as wand_mod
    from alix_spark.search.bm25 import corpus_stats as _cs
    from alix_spark.search.phrase import phrase_search

    tmp = tempfile.mkdtemp(prefix="alix_bx_")
    seg_mod.build_single_pass_from_docs(
        docs.select("doc_id", "text"), text_col="text", seg_size=1024
    ).repartition(32, F.col("bucket")).write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{tmp}/segments")
    segs_r, norms = seg_mod.split_single_pass(
        spark.read.parquet(f"{tmp}/segments")
    )
    norms = norms.cache()
    norms.count()

    cq = Corpus(docs)
    n_c, avgdl_c = _cs(cq.doc_lens)
    wand_queries = {
        0: ["fast", "join", "merge"], 1: ["scan", "column"],
        2: ["window", "hash", "agg"], 3: ["slow", "batch"],
        4: ["query", "row", "data"], 5: ["customer", "line"],
        6: ["spark", "group"], 7: ["vector", "hash"],
        8: ["key", "order", "sort"], 9: ["part", "small", "the"],
    }
    all_wand_terms = sorted({t for ts in wand_queries.values() for t in ts})
    wand_dfs = {
        r["term"]: int(r["docs"])
        for r in cq.forms.filter(F.col("term").isin(all_wand_terms)).collect()
    }
    probe(
        "wand_batch",
        lambda: wand_mod.wand_topk_batch(
            segs_r, norms, wand_queries, wand_dfs, n_c, avgdl_c, k=10
        ),
    )
    probe("phrase", lambda: phrase_search(segs_r, ["part", "filter"]))

    # --- tokens consumers --------------------------------------------- #
    tokens = cq.tokens
    tokens.count()  # warm the cache so probes price the operator
    probe(
        "cooc_window",
        lambda: window_mod.cooc_window(tokens, "fast", 3, 3)
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(50),
    )

    from alix_spark.cooc.rails import build_rails

    probe("build_rails", lambda: build_rails(cq.rail_tokens, cq.forms))
    rails = build_rails(cq.rail_tokens, cq.forms).cache()
    rails.count()
    probe("bigrams_rails", lambda: ngrams_mod.bigrams_rails(rails, cq.forms))

    # --- dedup kernels ------------------------------------------------- #
    probe("minhash_sigs", lambda: dedup_mod.minhash_signatures(docs))

    def mh_pairs():
        sigs = dedup_mod.minhash_signatures(docs)
        pairs = dedup_mod.minhash_lsh_pairs(sigs, bands=16, rows=4)
        return dedup_mod.minhash_jaccard_estimate(sigs, pairs)

    probe("minhash_full", mh_pairs)
    probe("simhash_sigs", lambda: dedup_mod.simhash(docs))

    def sh_dups():
        sims = dedup_mod.simhash(docs)
        return dedup_mod.simhash_near_dups(sims, max_hamming=3)

    probe("simhash_full", sh_dups)

    # --- incremental update ------------------------------------------- #
    from alix_spark.index.update import incremental_update

    d2 = docs.withColumn("repo", F.col("source")).withColumn(
        "path", F.concat(F.lit("f"), F.col("doc_id"))
    )
    changed = (
        d2.filter(F.col("doc_id") < 50)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzzupdated")))
        .drop("doc_id")
    )

    if not only or "incremental_update" in only:
        sc.setJobDescription("probe:incremental_update")
        t0 = time.time()
        _, sn, nn, _ = incremental_update(
            d2, segs_r, norms, changed, seg_size=1024, text_col="text"
        )
        sn.count() + nn.count()
        timings["incremental_update"] = round(time.time() - t0, 3)
        sc.setJobDescription(None)

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"tag": tag, "sf_dir": SF_DIR, "timings": timings}))


if __name__ == "__main__":
    main()
