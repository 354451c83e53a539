"""Scale probe for the round-11 ships — probe-on-ship (VERDICT r09 #5
discipline, kept per VERDICT r10 #8).

1x/10x/100x synthetic document corpora (the only table both ops read),
median of N runs, caches released, alpha = log10(t100/t10).

Appends/replaces its own section in docs/SCALE_PROBE.md.

Usage: python tools/scale_probe_r11.py [--runs N]
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lakeforge import cache
from lakeforge.io import docgen_source
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES
from scale_probe_r9b import make_tpch
from scale_probe_r10b import enrich_tpch, make_docs_multilang

DOC_HEADER = "## Round-11 ships (probed the round they ship)"

OPS = [
    ("neardup_incremental",
     "signatures/banding are one map-side-combinable pipeline over "
     "corpus+batch (k minima per doc ride the exchange, never text); the "
     "store probe and within-batch pairing are (band, bh) equi-joins — "
     "candidates only where 60-bit band hashes truly collide.  In "
     "production the store half is a persisted table, so the per-ingest "
     "cost is batch-sized; the probe measures the full rebuild (worst "
     "case) and must still be ~linear."),
    ("image_dhash_neardup",
     "image bytes never shuffle: encode -> real BMP decode -> dHash all "
     "inside one Arrow mapInPandas chain; identical fingerprints collapse "
     "to (fp, rep, cnt) groups BEFORE pairing (dup floods cost one row, "
     "pair mass analytic C(cnt,2)); distinct fps pair via 4 x 14-bit "
     "pigeonhole bands (2^14 bucket values — the first cut's 7 x 8-bit "
     "bands had 256 and ITS OWN 100x probe caught the bucket flood)."),
    ("audio_fingerprint_neardup",
     "audio bytes never shuffle: real PCM decode -> frame-energy delta "
     "fingerprint in one Arrow pass; the same collapse + 4 x 14-bit "
     "banding as the image leg — the probe corpus deliberately floods "
     "(377 distinct sample classes at any size), so the 100x cell IS the "
     "dup-flood stress."),
    ("video_frame_neardup",
     "video bytes never shuffle: container walk by declared frame sizes + "
     "per-frame real BMP decode + dHash in one Arrow pass; pairing is a "
     "df-capped frame-fingerprint inverted index (cap 64) — boilerplate "
     "frames (intro cards, black frames) are dropped, so posting-list "
     "self-joins stay bounded at any corpus size."),
    ("media_quality_gate",
     "one Arrow decode pass (bytes never shuffle), row-local verdicts, "
     "one |fmt| x |verdict| bounded map-side-combinable aggregate."),
    ("sql_table_udf_value_bands",
     "the SQL table function is expanded by Catalyst into its defining "
     "query: one pushed-scan aggregate over orders, |priorities x bands| "
     "bounded output."),
    ("sql_udf_net_charge",
     "the SQL UDF is inlined by Catalyst before optimization — the plan "
     "is identical to the hand-inlined expression: one pushed-filter scan "
     "into a map-side-combinable aggregate; DECIMAL(38,0) accumulator."),
    ("orders_unpivot_metrics",
     "aggregate first (|priorities| rows), THEN the row-local unpivot "
     "fan-out — the only exchange is the aggregate's; output is "
     "|priorities| x |metrics| bounded."),
]


def time_op(spark, name: str, sf_dir: str, runs: int) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.time() - t0)
        cache.release_all()
        spark.catalog.clearCache()
    return statistics.median(samples)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--ops", nargs="*", default=None,
                    help="probe only these ops; merge rows into the doc "
                    "section (others keep their committed numbers)")
    args = ap.parse_args()

    spark = get_spark("lakeforge-scale-probe-r11")
    spark.sparkContext.setLogLevel("ERROR")
    docgen_source.register(spark)

    doc_sizes = {"1x": 5_000, "10x": 50_000, "100x": 500_000}
    li_sizes = {"1x": 600_000, "10x": 6_000_000, "100x": 60_000_000}
    order = ["1x", "10x", "100x"]
    results: dict[str, dict[str, float]] = {op: {} for op, _ in OPS}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label in order:
            d = os.path.join(tmp, label)
            os.makedirs(d)
            make_docs_multilang(spark, doc_sizes[label], d)
            make_tpch(spark, li_sizes[label], d)
            enrich_tpch(spark, d)
            dirs[label] = d
        todo = [o for o, _ in OPS if args.ops is None or o in args.ops]
        for op in todo:
            for label in order:
                t = time_op(spark, op, dirs[label], args.runs)
                results[op][label] = round(t, 3)
                print(f"{op:32s} {label:>4s}: {t:7.3f}s", flush=True)
    if args.ops is not None:
        # carry forward committed rows for ops not re-probed this run
        import re as _re

        doc_path0 = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "docs", "SCALE_PROBE.md",
        )
        with open(doc_path0) as fh:
            txt = fh.read()
        for op, _ in OPS:
            if op in (args.ops or []) or results[op]:
                continue
            m = _re.search(
                rf"^\| {op} \| ([0-9.]+) \| ([0-9.]+) \| ([0-9.]+) ",
                txt, _re.M,
            )
            if m:
                results[op] = {"1x": float(m.group(1)),
                               "10x": float(m.group(2)),
                               "100x": float(m.group(3))}
        for op, _ in list(OPS):
            if not results[op]:
                raise SystemExit(f"no prior row for {op}; run without --ops")

    lines = [
        DOC_HEADER,
        "",
        f"Documents at {doc_sizes['1x']:,}/{doc_sizes['10x']:,}/"
        f"{doc_sizes['100x']:,} docs; TPC-H-shaped lineitem/orders at "
        f"{li_sizes['1x']:,}/{li_sizes['10x']:,}/{li_sizes['100x']:,} "
        f"rows.  Median of {args.runs}, caches released, noop sink.",
        "",
        "| op | t(1x) s | t(10x) s | t(100x) s | alpha (10x->100x) |",
        "|---|---|---|---|---|",
    ]
    for op, _ in OPS:
        r = results[op]
        alpha = math.log10(r["100x"] / r["10x"])
        lines.append(
            f"| {op} | {r['1x']:.3f} | {r['10x']:.3f} | {r['100x']:.3f} "
            f"| {alpha:.2f} |"
        )
    lines += ["", "Why the round-11 ships stay ~linear by construction:"]
    lines += [f"- `{op}`: {why}" for op, why in OPS]

    doc_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SCALE_PROBE.md",
    )
    with open(doc_path) as fh:
        existing = fh.read()
    if DOC_HEADER in existing:
        existing = existing[: existing.index(DOC_HEADER)].rstrip() + "\n"
    with open(doc_path, "w") as fh:
        fh.write(existing.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    print(f"wrote section to {doc_path}")
    spark.stop()


if __name__ == "__main__":
    main()
