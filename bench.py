#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` = total wall seconds of the headline suite at $SPARK_GRAFT_SF_DIR
(lower is better; sf0.1 by default, keeping r1..r5 comparability). Since
r6 the same line also carries:

- "calibration_sec": a FIXED single-process CPU kernel (seeded numpy
  matmul + a pure-python integer loop) timed before Spark starts. Host
  weather moved recorded suites ±35% across rounds 4-5 with unchanged
  code; dividing suite seconds by the calibration makes cross-round
  deltas self-normalizing.
- "sf1": the same suite re-run at 50k docs (tools/gen_sf.py synthesizes
  /tmp/sf1 deterministically from the measured sf0.1 distributions,
  seed 42, on first use). The 5k-doc corpus is overhead-dominated;
  round-over-round engine deltas should be read at sf1. Set
  SPARK_GRAFT_SF1=0 to skip.

Also reports index-build docs/sec (the north-rule throughput number) in
the queries map as "index_build_docs_per_sec" (higher is better; not a
latency).

Scaling evidence (local[1] vs local[4] etc.) is produced by
bench_scaling.py and recorded in BENCH/BASELINE.md — not here, to keep
the per-round bench fast.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SF1_DIR = "/tmp/sf1"


def calibrate() -> float:
    """Fixed CPU-speed kernel, run before Spark starts: 6 seeded
    1000x1000 matmul rounds + 2M pure-python LCG steps. Deterministic
    work, so the measured seconds price THIS host at THIS moment —
    the denominator for cross-round suite comparisons."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((1000, 1000))
    t0 = time.time()
    for _ in range(6):
        a = a @ a
        a /= np.abs(a).max() + 1.0
    x = 0
    for _ in range(2_000_000):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return round(time.time() - t0, 3)


def ensure_sf1() -> str | None:
    """Synthesize the deterministic 50k-doc corpus on first use (seed 42,
    distributions measured from the read-only sf0.1 tables). Generation
    is ATOMIC: gen_sf writes into a scratch dir that is renamed into
    place only when complete, so a killed run can never leave a
    half-corpus that bricks every later bench (documents.parquet present
    but embeddings.parquet missing)."""
    # completeness gate = the LAST table gen_sf writes, not the first
    if os.path.isdir(SF1_DIR) and os.path.exists(
        f"{SF1_DIR}/embeddings.parquet"
    ):
        return SF1_DIR
    try:
        import shutil
        import subprocess

        here = os.path.dirname(os.path.abspath(__file__))
        tmp = SF1_DIR + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        subprocess.run(
            [sys.executable, os.path.join(here, "tools", "gen_sf.py"), tmp],
            check=True,
            capture_output=True,
            timeout=600,
        )
        shutil.rmtree(SF1_DIR, ignore_errors=True)  # stale partial, if any
        os.rename(tmp, SF1_DIR)
        return SF1_DIR
    except Exception:
        return None


def ab_prev_round(sf_dir: str) -> dict | None:
    """Same-session A/B vs the previous round's driver commit (the last
    'round N: ...' commit): check it out into a cached /tmp worktree and
    run ITS bench.py minutes after ours on the same host. Rounds 4-5
    each burned hours on 26->39 s "regressions" that an A/B resolved as
    host weather; this makes every recorded bench carry its own control.
    Runs AFTER spark.stop() so the legs don't contend."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        commit = subprocess.run(
            ["git", "log", "--grep", "^round [0-9]*:", "-1", "--format=%H"],
            cwd=here, capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=here, capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        if commit == head:
            # HEAD IS the round commit (e.g. re-recording right after the
            # driver's round-close): comparing HEAD to itself is not a
            # control — use the PREVIOUS round marker instead
            commit = subprocess.run(
                ["git", "log", "--grep", "^round [0-9]*:", "-1",
                 "--format=%H", "HEAD~1"],
                cwd=here, capture_output=True, text=True, timeout=30,
                check=True,
            ).stdout.strip()
        if not commit or commit == head:
            return None
        wt = f"/tmp/alix_ab_{commit[:12]}"
        if not os.path.isdir(wt):
            subprocess.run(
                ["git", "worktree", "add", "--detach", wt, commit],
                cwd=here, capture_output=True, timeout=60, check=True,
            )
        env = dict(
            os.environ,
            SPARK_GRAFT_SF1="0",  # control leg: sf0.1 suite only
            SPARK_GRAFT_AB="0",  # no recursive A/B once r6+ is the control
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=str(CPUS),
        )
        out = subprocess.run(
            [sys.executable, os.path.join(wt, "bench.py")],
            cwd=wt, env=env, capture_output=True, text=True, timeout=420,
        )
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{") and line.endswith("}"):
                prev = json.loads(line)
                return {
                    "commit": commit[:12],
                    "suite_sec": prev.get("value"),
                    "queries": prev.get("queries"),
                }
        return {"commit": commit[:12], "error": f"no json (rc={out.returncode})"}
    except Exception as e:  # A/B is evidence, never a bench failure
        return {"error": str(e)[:200]}


def run_suite(spark, sf_dir: str, cpus: int) -> tuple[dict, int]:
    """The headline suite at one scale factor. Returns (timings, n_docs)."""
    from pyspark.sql import functions as F

    from alix_spark import Corpus
    from alix_spark.cooc import ngrams as ngrams_mod
    from alix_spark.cooc import window as window_mod
    from alix_spark.stats import fieldtext as ft_mod
    from alix_spark.textops import dedup as dedup_mod
    from alix_spark.textops import similarity as sim_mod

    # the tiny bench parquet arrives as 1-2 splits; spread it so UDF
    # kernels and the tokenize stage use every core (a real corpus would
    # already have many input splits)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(cpus)
        .cache()
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # --- index build: tokenize -> postings + doc_lens + forms -> parquet sink
    n_docs = docs.count()
    tmp = tempfile.mkdtemp(prefix="alix_bench_idx_")
    c = Corpus(docs, cache=False)

    from alix_spark.index import build as ib

    def build_index():
        # one tokenize+shuffle (postings), then doc_lens and forms
        # derive from the MATERIALIZED postings parquet — the
        # build_index.py CLI stage shape (dl = Σ tf, row-identical)
        c.postings.write.mode("overwrite").parquet(f"{tmp}/postings")
        p = spark.read.parquet(f"{tmp}/postings")
        ib.build_doc_lens_from_postings(p).write.mode("overwrite").parquet(
            f"{tmp}/doc_lens"
        )
        ib.build_forms(p).write.mode("overwrite").parquet(f"{tmp}/forms")

    timed("index_build", build_index)
    timings["_docs_per_sec"] = round(n_docs / timings["index_build"], 1)

    # offsets table (render-serving term vectors with offsets — a
    # build_index.py stage since r3; map-only Arrow kernel + write)
    from alix_spark.analysis.simple import token_offsets

    timed(
        "offsets_build",
        lambda: token_offsets(docs, "doc_id", "text")
        .write.mode("overwrite")
        .parquet(f"{tmp}/offsets"),
    )

    # compressed-segment build (single-shuffle direct path) + WAND batch
    from alix_spark.index import segments as seg_mod
    from alix_spark.search import wand as wand_mod
    from alix_spark.search.bm25 import corpus_stats as _cs

    n_c, avgdl_c = _cs(c.doc_lens)

    def build_segments():
        # docs-shuffle single-pass: tokenize in the kernel, positions
        # included (the full Lucene-parity index), norms emitted inline
        seg_mod.build_single_pass_from_docs(
            docs.select("doc_id", "text"), text_col="text", seg_size=1024
        ).repartition(32, F.col("bucket")).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(f"{tmp}/segments")

    timed("segment_build", build_segments)
    segs_r, norms = seg_mod.split_single_pass(
        spark.read.parquet(f"{tmp}/segments")
    )
    norms = norms.cache()

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
        for r in c.forms.filter(F.col("term").isin(all_wand_terms)).collect()
    }
    timed(
        "wand_batch_10q",
        lambda: wand_mod.wand_topk_batch(
            segs_r, norms, wand_queries, wand_dfs, n_c, avgdl_c, k=10
        ).collect(),
    )

    from alix_spark.search.phrase import phrase_search

    timed(
        "phrase",
        lambda: phrase_search(segs_r, ["part", "filter"]).collect(),
    )
    # high-df phrase: the two most document-frequent terms — nearly every
    # doc is a candidate, exercising the flat-array adjacency kernel
    # (time should stay flat in candidate count, not blow up per-doc)
    hi = [
        r["term"]
        for r in c.forms.orderBy(F.desc("docs"), F.asc("term")).limit(2).collect()
    ]
    timed(
        "phrase_highdf",
        lambda: phrase_search(segs_r, hi).collect(),
    )

    # incremental update: mutate 50 docs, re-encode ONLY touched segments
    from alix_spark.index.update import incremental_update

    d2 = docs.withColumn("repo", F.col("source")).withColumn(
        "path", F.concat(F.lit("f"), F.col("doc_id"))
    )
    changed = (
        d2.filter(F.col("doc_id") < 50)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzzupdated")))
        .drop("doc_id")
    )

    def incr():
        _, sn, nn, _ = incremental_update(
            d2, segs_r, norms, changed, seg_size=1024, text_col="text"
        )
        return sn.count() + nn.count()

    timed("incremental_update", incr)

    # reload the persisted index (query from disk, as a real engine would)
    postings = spark.read.parquet(f"{tmp}/postings").cache()
    doc_lens = spark.read.parquet(f"{tmp}/doc_lens").cache()
    postings.count(), doc_lens.count()  # warm the cache outside timings
    cq = Corpus(docs)  # for tokens-based ops
    tokens = cq.tokens

    from alix_spark.search import bm25 as bm25_mod

    n, avgdl = bm25_mod.corpus_stats(doc_lens)

    timed(
        "bm25_topk",
        lambda: bm25_mod.bm25_topk(
            postings, doc_lens, ["fast", "join", "merge"], k=10,
            n_docs=n, avgdl=avgdl,
        ).collect(),
    )
    timed(
        "term_freq",
        lambda: ft_mod.term_stats(postings)
        .orderBy(F.desc("occs"), F.asc("term"))
        .limit(100)
        .collect(),
    )
    timed(
        "boolean",
        lambda: postings.filter(F.col("term").isin(["fast", "join"]))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("m"))
        .filter(F.col("m") == 2)
        .count(),
    )
    timed(
        "cooc_window",
        lambda: window_mod.cooc_window(tokens, "fast", 3, 3)
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(50)
        .collect(),
    )
    # cooc_window is the suite's FIRST tokens consumer, so its timing
    # above includes the corpus tokenize + cache fill; this rerun prices
    # the operator itself on the warmed cache (the steady-state cost)
    timed(
        "cooc_window_warm",
        lambda: window_mod.cooc_window(tokens, "fast", 3, 3)
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(50)
        .collect(),
    )
    # bigrams now times the rails serving path (build_rails + map-side
    # pair emit) — the r6 fix for the worst sf1 scaler; the token-join
    # variant remains as the pytest cross-check path.
    def bigrams_rails_bench():
        from alix_spark.cooc.rails import build_rails

        rails = build_rails(cq.rail_tokens, cq.forms)
        return (
            ngrams_mod.bigrams_rails(rails, cq.forms)
            .orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
            .limit(50)
            .collect()
        )

    timed("bigrams", bigrams_rails_bench)

    def minhash():
        sigs = dedup_mod.minhash_signatures(docs)
        pairs = dedup_mod.minhash_lsh_pairs(sigs, bands=16, rows=4)
        return dedup_mod.minhash_jaccard_estimate(sigs, pairs).count()

    timed("minhash_dedup", minhash)

    def simhash():
        sims = dedup_mod.simhash(docs)
        return dedup_mod.simhash_near_dups(sims, max_hamming=3).count()

    timed("simhash_dedup", simhash)

    qvec = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    timed(
        "knn_brute",
        lambda: sim_mod.brute_force_knn(emb, list(qvec), k=10, exclude_id=0).collect(),
    )

    shutil.rmtree(tmp, ignore_errors=True)
    return timings, n_docs


def main() -> None:
    calibration = calibrate()

    from alix_spark import get_spark

    spark = get_spark(
        app_name="alix-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings, n_docs = run_suite(spark, SF_DIR, int(CPUS))
    docs_per_sec = timings.pop("_docs_per_sec")
    total = round(sum(timings.values()), 3)
    queries = dict(timings)
    queries["index_build_docs_per_sec"] = docs_per_sec
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "cpus": int(CPUS),
        "calibration_sec": calibration,
    }

    # sf1 leg (50k docs): the scale where engine deltas are readable —
    # skipped if generation fails or SPARK_GRAFT_SF1=0, and when the main
    # run already targets sf1.
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and os.path.realpath(
        SF_DIR
    ) != os.path.realpath(SF1_DIR):
        sf1 = ensure_sf1()
        if sf1 is not None:
            spark.catalog.clearCache()
            t1, n1 = run_suite(spark, sf1, int(CPUS))
            dps1 = t1.pop("_docs_per_sec")
            q1 = dict(t1)
            q1["index_build_docs_per_sec"] = dps1
            result["sf1"] = {
                "suite_sec": round(sum(t1.values()), 3),
                "queries": q1,
                "n_docs": n1,
            }

    # interleaved same-session A/B vs the previous round's commit (r4/r5
    # lesson: cross-round suite deltas are meaningless without a control
    # run on the same host minutes apart). Spark stops first so the
    # control leg gets the whole box, like ours did.
    if os.environ.get("SPARK_GRAFT_AB", "1") != "0":
        spark.stop()
        ab = ab_prev_round(SF_DIR)
        if ab is not None:
            result["prev_round_ab"] = ab

    print(json.dumps(result))


if __name__ == "__main__":
    main()
