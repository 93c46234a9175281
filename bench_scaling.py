#!/usr/bin/env python3
"""Scaling-efficiency evidence for the north rule: the same index-build +
query job at two parallelism levels (local[8] vs local[32] here — the
sandbox stand-in for N vs 4N executors), reporting throughput at both and
the efficiency ratio.

efficiency = (tput_4N / tput_N) / 4       (1.0 = perfect linear scaling)

Each measurement runs in its own subprocess (one SparkContext per JVM).
The input corpus is synthesized once to parquet so both runs read
identical bytes. Results are appended to BENCH.md.

Usage: python bench_scaling.py [--docs 40000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import pyspark.sql.functions as F2
from alix_spark import get_spark
from alix_spark.analysis import simple
from alix_spark.index import build as ib
from alix_spark.index import segments as seg_mod
from alix_spark.search import wand as wand_mod
from alix_spark.search.bm25 import corpus_stats

cpus = int(sys.argv[1]); src = sys.argv[2]; out = sys.argv[3]
docs_stage = sys.argv[4] if len(sys.argv) > 4 else "parquet"
codec = sys.argv[5] if len(sys.argv) > 5 else "snappy"
# fixed shuffle-partition count and heap for BOTH runs: the efficiency
# measurement varies only the core count
spark = get_spark(app_name=f"alix-scale-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=128,
                  extra_conf={{
                      "spark.driver.memory": "24g",
                      # keep AQE from coalescing this (locally small) shuffle
                      # below the core count — at cluster scale the default
                      # 64MB advisory size is right, here it caps parallelism
                      "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
                      # shuffle spill to tmpfs: one shared disk does NOT
                      # scale with thread count, unlike a real cluster
                      # where every executor brings its own local storage
                      "spark.local.dir": os.environ.get(
                          "ALIX_SPARK_LOCAL", "/tmp"),
                  }})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(src)
n_docs = docs.count()

t0 = time.time()
from alix_spark import ingest
# docs stage: id assignment must be pinned (range-partition sampling
# makes re-evaluations of the raw plan non-reproducible; see
# ingest.scalable_row_number). Two strategies, selected by argv[4]:
#   parquet        — the product path (resumable lineage stage); codec
#                    from argv[5] (snappy default / none / zstd)
#   localcheckpoint— executor-storage materialization, skipping the
#                    parquet encode + commit + re-read roundtrip (the
#                    right choice when resume isn't needed)
spark.conf.set("spark.sql.parquet.compression.codec", codec)
if docs_stage == "localcheckpoint":
    docs = ingest.assign_doc_ids(docs).localCheckpoint()
    docs.count()
else:
    ingest.assign_doc_ids(docs).write.mode("overwrite").parquet(f"{{out}}/docs")
    docs = spark.read.parquet(f"{{out}}/docs")
# ingest invariant: per-row sha256(content) equality
bad = ingest.sha256_violations(docs, "content").count()
assert bad == 0, f"sha256 invariant violated: {{bad}} rows"
docs_stage_sec = time.time() - t0
# ONE pass over the corpus: segments + norms from a single shuffle (the
# kernel tokenizes AND derives doc lengths locally); the vocabulary
# derives from block metadata — no second corpus scan. The shuffle
# carries raw (doc_id, content) rows — corpus-sized, ~4x less than the
# exploded token table. One output file per bucket dir keeps the commit
# cheap and query-side opens fast.
unioned = seg_mod.build_single_pass_from_docs(
    docs.select("doc_id", "content"), text_col="content", seg_size=2048)
unioned.repartition(33, F2.col("bucket")).write.mode("overwrite") \
    .partitionBy("bucket").parquet(f"{{out}}/index")
idx = spark.read.parquet(f"{{out}}/index")
segs_w, norms_w = seg_mod.split_single_pass(idx)
seg_mod.forms_from_segments(segs_w).write.mode("overwrite") \
    .parquet(f"{{out}}/forms")
build_sec = time.time() - t0
n, avgdl = seg_mod.corpus_stats_from_norms(norms_w)

idx_r = spark.read.parquet(f"{{out}}/index")
segs_r, norms_r = seg_mod.split_single_pass(idx_r)
norms_r = norms_r.cache(); norms_r.count()
forms_r = spark.read.parquet(f"{{out}}/forms")
queries = [f"tok{{i}} tok{{i*3+1}} tok{{i*7+2}}" for i in range(50)]
import pyspark.sql.functions as F
t0 = time.time()
qmap = {{i: q.split() for i, q in enumerate(queries)}}
all_terms = sorted({{t for ts in qmap.values() for t in ts}})
dfs = {{r["term"]: int(r["docs"]) for r in
       forms_r.filter(F.col("term").isin(all_terms)).collect()}}
res = wand_mod.wand_topk_batch(segs_r, norms_r, qmap, dfs, n, avgdl, k=10).collect()
assert len(res) > 0
query_sec = time.time() - t0
print(json.dumps({{"cpus": cpus, "n_docs": n_docs,
                   "build_sec": round(build_sec, 2),
                   "docs_stage_sec": round(docs_stage_sec, 2),
                   "index_stage_sec": round(build_sec - docs_stage_sec, 2),
                   "build_docs_per_sec": round(n_docs / build_sec, 1),
                   "query_sec": round(query_sec, 2),
                   "queries_per_sec": round(len(queries) / query_sec, 2)}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=40000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument(
        "--docs-stage", default="parquet",
        choices=["parquet", "localcheckpoint"],
        help="docs-checkpoint strategy (see WORKER comments)",
    )
    ap.add_argument("--codec", default="snappy")
    args = ap.parse_args()

    shm = Path("/dev/shm")
    tmp = tempfile.mkdtemp(
        prefix="alix_scale_", dir=str(shm) if shm.is_dir() else None
    )
    os.environ["ALIX_SPARK_LOCAL"] = f"{tmp}/spark_local"
    src = f"{tmp}/corpus"
    # synthesize the input once (not part of the measured job)
    gen = (
        f"import sys; sys.path.insert(0, {str(REPO)!r})\n"
        "from alix_spark import get_spark, ingest\n"
        "spark = get_spark(master='local[32]', shuffle_partitions=64)\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"ingest.synthesize_code_corpus(spark, {args.docs}).write.mode('overwrite').parquet({src!r})\n"
    )
    subprocess.run([sys.executable, "-c", gen], check=True)

    worker_path = Path(tmp) / "worker.py"
    worker_path.write_text(WORKER.format(repo=str(REPO)))
    results = {}
    # two runs per level, best-of-2: removes OS page-cache / JIT warmup
    # noise from the efficiency ratio (the first pass warms, the second
    # measures steady state — what a long-running cluster job sees)
    for cpus in (args.high, args.low):
        best = None
        for _attempt in range(2):
            out = subprocess.run(
                [sys.executable, str(worker_path), str(cpus), src,
                 f"{tmp}/idx{cpus}", args.docs_stage, args.codec],
                check=True,
                capture_output=True,
                text=True,
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["build_sec"] < best["build_sec"]:
                best = dict(r)
            best["query_sec"] = min(best["query_sec"], r["query_sec"])
            best["queries_per_sec"] = max(
                best["queries_per_sec"], r["queries_per_sec"]
            )
            best["build_docs_per_sec"] = max(
                best["build_docs_per_sec"], r["build_docs_per_sec"]
            )
        results[cpus] = best
        print(json.dumps(best))

    lo, hi = results[args.low], results[args.high]
    ratio = args.high / args.low
    build_eff = (hi["build_docs_per_sec"] / lo["build_docs_per_sec"]) / ratio
    query_eff = (hi["queries_per_sec"] / lo["queries_per_sec"]) / ratio
    docs_eff = (lo["docs_stage_sec"] / hi["docs_stage_sec"]) / ratio
    index_eff = (lo["index_stage_sec"] / hi["index_stage_sec"]) / ratio
    summary = {
        "low_cpus": args.low,
        "high_cpus": args.high,
        "n_docs": args.docs,
        "docs_stage": args.docs_stage,
        "codec": args.codec,
        "build_docs_per_sec": {
            str(args.low): lo["build_docs_per_sec"],
            str(args.high): hi["build_docs_per_sec"],
        },
        "build_scaling_efficiency": round(build_eff, 3),
        "docs_stage_efficiency": round(docs_eff, 3),
        "index_stage_efficiency": round(index_eff, 3),
        "queries_per_sec": {
            str(args.low): lo["queries_per_sec"],
            str(args.high): hi["queries_per_sec"],
        },
        "query_scaling_efficiency": round(query_eff, 3),
    }
    print(json.dumps(summary))

    bench_md = REPO / "BENCH.md"
    stamp = subprocess.run(
        ["date", "-u", "+%Y-%m-%dT%H:%M:%SZ"], capture_output=True, text=True
    ).stdout.strip()
    with bench_md.open("a") as f:
        f.write(
            f"\n## Scaling run {stamp}\n\n"
            f"Same job (index build: tokenize → postings → compressed "
            f"segments + norms + forms → parquet; then 10 WAND top-10 "
            f"queries) on {args.docs} synthesized docs, identical input "
            f"parquet, local[{args.low}] vs local[{args.high}].\n\n"
            f"| metric | local[{args.low}] | local[{args.high}] | efficiency (N→{int(ratio)}N) |\n"
            f"|---|---|---|---|\n"
            f"| index build docs/sec | {lo['build_docs_per_sec']} | "
            f"{hi['build_docs_per_sec']} | **{build_eff:.3f}** |\n"
            f"| docs stage sec (strategy={args.docs_stage}, codec={args.codec}) "
            f"| {lo['docs_stage_sec']} | {hi['docs_stage_sec']} | {docs_eff:.3f} |\n"
            f"| index stage sec | {lo['index_stage_sec']} | "
            f"{hi['index_stage_sec']} | {index_eff:.3f} |\n"
            f"| WAND queries/sec | {lo['queries_per_sec']} | "
            f"{hi['queries_per_sec']} | {query_eff:.3f} |\n"
        )
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()
