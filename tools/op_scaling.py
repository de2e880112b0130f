"""Per-operator 2-vs-8-core scaling probe (round 5 — makes the round-4
ad-hoc protocol reproducible): same taskset-affinity + interleaved-rounds
+ min-per-level discipline as tools/scaling_bench.py, but timing ONE
operator over a replicated worst-case documents corpus instead of the
full KG build.

Corpus: sf0.1 documents replicated ``n_replicas``x with unique doc_ids —
for span removal that is the worst case (every doc fully duplicated, so
removal mass is maximal); for the backoff LM it is the round-4 protocol
(train = even ids, score = odd ids). Written once to a 16-file parquet
(excluded from timing).

Full-evaluation guard (round 4, disclosed): a bare count() lets Catalyst
eliminate the unique-key left join and measure nothing — every probe
forces an aggregate over EVERY output column, and the aggregate row is
printed so the two levels' outputs can be checked identical.

Usage: python tools/op_scaling.py {span|span_scan|backoff|backoff_bcast}
                                  [n_replicas=40] [n_lo=2] [n_hi=8]
                                  [rounds=2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PREP = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from llm_knowledge_graph_spark.session import get_spark
spark = get_spark(app_name="op-scaling-prep", master="local[8]",
                  shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n = d.count()
rep = spark.range({n_replicas}).select(F.col("id").alias("rep"))
out = (d.crossJoin(rep)
       .select((F.col("doc_id") * {n_replicas} + F.col("rep"))
               .alias("doc_id"), "text", "lang"))
out.repartition(16).write.mode("overwrite").parquet({corpus!r})
print("PREP_DOCS", n * {n_replicas})
spark.stop()
"""

RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from llm_knowledge_graph_spark.session import get_spark
spark = get_spark(app_name="op-scaling-{op}-{n}", master="local[{n}]",
                  shuffle_partitions={shuffle})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})

def probe(d):
    op = {op!r}
    if op in ("span", "span_scan"):
        from llm_knowledge_graph_spark.operators.dedup import (
            remove_duplicate_spans)
        mode = "scan" if op == "span_scan" else "except"
        out = remove_duplicate_spans(d, n=8, reconstruct=mode)
        # FULL evaluation: aggregate over every output column
        return out.agg(F.sum("n_tokens"), F.sum("n_removed"),
                       F.sum(F.length("clean_md5")),
                       F.count("*")).collect()[0]
    else:
        from llm_knowledge_graph_spark.operators.surprisal import (
            stupid_backoff_bits, stupid_backoff_bits_head_broadcast)
        train = d.filter(F.col("doc_id") % 2 == 0)
        score = d.filter(F.col("doc_id") % 2 == 1)
        fn = (stupid_backoff_bits_head_broadcast
              if op == "backoff_bcast" else stupid_backoff_bits)
        out = fn(train, score, "doc_id", "text")
        return out.agg(F.sum("n_bigrams"), F.sum("n_backoff"),
                       F.sum("n_oov"), F.sum("bits_units"),
                       F.sum("mean_millibits"),
                       F.count("*")).collect()[0]

# warmup (untimed): python workers / JIT / parquet footers on a slice
probe(docs.limit(2000))
spark.catalog.clearCache()
t0 = time.perf_counter()
row = probe(docs)
t = time.perf_counter() - t0
print("RESULT", t, list(row))
spark.stop()
"""


def run_level(op: str, n: int, corpus: str) -> tuple[float, str]:
    code = RUNNER.format(repo=str(REPO), op=op, n=n, shuffle=2 * n,
                         corpus=corpus)
    cores = ",".join(str(c) for c in range(n))
    env = dict(os.environ)
    out = subprocess.run(
        ["taskset", "-c", cores, sys.executable, "-c", code],
        capture_output=True, text=True, env=env, check=True).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
    _, t, vals = line.split(" ", 2)
    return float(t), vals


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "span"
    n_replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    rounds = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    corpus = f"/tmp/op_scaling_docs_{n_replicas}x"

    if not Path(corpus).exists():
        prep = PREP.format(repo=str(REPO), n_replicas=n_replicas,
                           corpus=corpus)
        out = subprocess.run([sys.executable, "-c", prep],
                             capture_output=True, text=True,
                             check=True).stdout
        print([ln for ln in out.splitlines() if "PREP" in ln][0],
              file=sys.stderr)

    times: dict[int, list[float]] = {n_lo: [], n_hi: []}
    vals: dict[int, str] = {}
    for _ in range(rounds):          # interleaved: lo, hi, lo, hi, ...
        for n in (n_lo, n_hi):
            t, v = run_level(op, n, corpus)
            times[n].append(round(t, 2))
            if n in vals and vals[n] != v:
                raise AssertionError(f"nondeterministic output at {n}: "
                                     f"{vals[n]} != {v}")
            vals[n] = v
    if vals[n_lo] != vals[n_hi]:
        raise AssertionError(
            f"output differs across levels: {vals[n_lo]} != {vals[n_hi]}")
    t_lo, t_hi = min(times[n_lo]), min(times[n_hi])
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    print(json.dumps({
        "op": op, "n_replicas": n_replicas,
        "levels": {str(n_lo): t_lo, str(n_hi): t_hi},
        "samples": {str(k): v for k, v in times.items()},
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "outputs_identical": True,
        "agg_row": vals[n_hi],
    }))


if __name__ == "__main__":
    main()
