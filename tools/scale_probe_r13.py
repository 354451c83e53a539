"""Scale-out demonstration probe (VERDICT r12 #5).

At sf0.1 every heavy query is session/scheduler-overhead-bound, so the
driver's 8-core bench ran FASTER than the 32-core one (346.8 vs 393.2 s
total) and nothing in the committed evidence showed any operator
actually scaling out.  This probe builds a larger synthetic corpus by
REPLICATING the sf0.1 tables with id offsets (deterministic, structure
per replica preserved, no cross-replica near-dup collisions — see
_build_corpus) and times the top-of-board queries at 32 vs 8 cores in
fresh per-setting subprocesses.

- documents: doc_id += r * 10_000 (stays inside the media fixture's
  [0, 1M) id guard); every word of replica r>0's text gets an ``_r{r}``
  suffix, so replica vocabularies are DISJOINT — shingle/minhash
  structure is exactly M independent copies (no M^2 cross-replica pair
  blowup), i.e. honest weak scaling for the text/media family.  Media
  fingerprints derive from doc_id, so image/video fps differ per replica.
- embeddings: vec_id += r * 10_000; vectors unchanged (queries/centroids
  stay the id < n lowest rows of replica 0; corpus work scales ~M).
- lineitem: l_partkey += r * 300_000 with l_suppkey SHARED, so the
  bipartite trade graph stays one connected component and the BFS
  frontier really covers M x the edges.

Usage:
  python tools/scale_probe.py [--mult 10] [--queries a,b,c]
                              [--cpus 32,8] [--passes 2]

Writes docs/SCALEOUT_R13.json.  The corpus is rebuilt from the sf0.1
parquet on every invocation (under /tmp) — nothing persists across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = (
    "crossmodal_asset_clusters",
    "ivfpq_recall_at_k",
    "pq_recall_at_k",
    "jaccard_prefix_pairs",
    "trade_bfs_reach",
)

_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {here!r})
from lakeforge import cache
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES

sf_dir = {sf_dir!r}
names = {names!r}
spark = get_spark("lakeforge-scale-probe")
spark.sparkContext.setLogLevel("ERROR")
for w in ("top_orders", "text_stats", "embedding_cosine_topk"):
    QUERIES[w](spark, sf_dir).write.format("noop").mode("overwrite").save()
    cache.release_all(); spark.catalog.clearCache()
out = {{}}
for name in names:
    spark.sparkContext.setJobDescription("scale_probe:" + name)
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    cache.release_all(); spark.catalog.clearCache()
print("SCALE_PROBE_RESULT " + json.dumps(out))
spark.stop()
"""


def _build_corpus(mult: int, dst: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.1"
    os.makedirs(dst, exist_ok=True)
    plans = {
        # doc_id offset must keep every replica id inside the media
        # fixture's [0, 1M) guard: 10k spacing covers mult <= ~99.
        "documents": {"doc_id": 10_000},
        "embeddings": {"vec_id": 10_000},
        "lineitem": {"l_partkey": 300_000, "l_orderkey": 10_000_000},
    }
    for table, offsets in plans.items():
        t = pq.read_table(f"{src}/{table}.parquet")
        parts = []
        for r in range(mult):
            tt = t
            for col, step in offsets.items():
                idx = tt.schema.get_field_index(col)
                tt = tt.set_column(
                    idx, col, pc.add(tt.column(col), r * step)
                )
            if table == "documents" and r > 0:
                texts = [
                    " ".join(f"{w}_r{r}" for w in (s or "").split())
                    for s in tt.column("text").to_pylist()
                ]
                idx = tt.schema.get_field_index("text")
                tt = tt.set_column(idx, "text", pa.array(texts, pa.string()))
            parts.append(tt)
        # row groups of 100k keep the single output file splittable so the
        # scan itself can parallelize (guide §6 input split size).
        pq.write_table(
            pa.concat_tables(parts),
            f"{dst}/{table}.parquet",
            row_group_size=100_000,
        )
    # Tables the probe queries don't read are passed through unchanged so
    # any incidental reader still finds them.
    for f in os.listdir(src):
        if not os.path.exists(f"{dst}/{f}"):
            shutil.copy(f"{src}/{f}", f"{dst}/{f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--cpus", default="32,8")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    names = [s for s in args.queries.split(",") if s]
    cpu_list = [int(c) for c in args.cpus.split(",")]

    dst = f"/tmp/lf_scale_{args.mult}x"
    print(f"building {dst} (sf0.1 x {args.mult}) ...", flush=True)
    _build_corpus(args.mult, dst)

    samples: dict[int, dict[str, list[float]]] = {
        c: {n: [] for n in names} for c in cpu_list
    }
    for p in range(args.passes):
        for cpus in cpu_list:
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
            code = _RUNNER.format(here=HERE, sf_dir=dst, names=names)
            res = subprocess.run(
                [sys.executable, "-c", code],
                env=env,
                capture_output=True,
                text=True,
            )
            line = [
                ln
                for ln in res.stdout.splitlines()
                if ln.startswith("SCALE_PROBE_RESULT ")
            ]
            if not line:
                print(res.stdout[-2000:], res.stderr[-2000:])
                sys.exit(f"probe subprocess failed (cpus={cpus})")
            got = json.loads(line[0].split(" ", 1)[1])
            for n, s in got.items():
                samples[cpus][n].append(s)
            print(f"pass {p} cpus={cpus}: {got}", flush=True)

    import statistics

    med = {
        c: {n: round(statistics.median(s), 3) for n, s in qs.items()}
        for c, qs in samples.items()
    }
    lo, hi = max(cpu_list), min(cpu_list)
    table = {
        n: {
            f"c{lo}_sec": med[lo][n],
            f"c{hi}_sec": med[hi][n],
            "speedup_low_over_high": round(med[hi][n] / med[lo][n], 2),
        }
        for n in names
    }
    out = {
        "mult": args.mult,
        "corpus": dst,
        "cpus": cpu_list,
        "passes": args.passes,
        "medians": med,
        "raw": {str(c): samples[c] for c in cpu_list},
        "speedups": table,
    }
    path = os.path.join(HERE, "docs", "SCALEOUT_R13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(table, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
