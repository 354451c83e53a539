"""Scale probe for the round-12 ships — probe-on-ship (VERDICT r09 #5
discipline, kept per VERDICT r11 #7).

1x/10x/100x synthetic corpora, median of N runs, caches released,
alpha = log10(t100/t10).  The substring ops probe a corpus with PLANTED
cross-doc shared passages (3% of docs carry a 20-token passage drawn
from a pool that scales with the corpus, so anchor df stays ~3 at every
size — the pairing/island stages are exercised, not just the gram
pipeline).  The crossmodal ops reuse the r11 media fixtures, which
derive everything from doc_id.

Appends/replaces its own section in docs/SCALE_PROBE.md.

Usage: python tools/scale_probe_r12.py [--runs N] [--ops ...]
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

from pyspark.sql import functions as F

from lakeforge import cache
from lakeforge.io import docgen_source
from lakeforge.session import get_spark
from lakeforge.workload import QUERIES
from scale_probe_r10b import make_docs_multilang

DOC_HEADER = "## Round-12 ships (probed the round they ship)"

OPS = [
    ("docs_shared_substrings",
     "text never shuffles — grams ride the exchange as (doc_id, "
     "position, 60-bit hash); the anchor df filter is a map-side-"
     "combined aggregate; the postings self-join is bounded per anchor "
     "by C(df_cap=32, 2) x occ_cap^2; the island merge windows over "
     "per-(pair, diagonal) groups.  No pairwise doc comparison exists "
     "anywhere in the plan — cost is O(tokens + matched_anchor_pairs)."),
    ("docs_substring_coverage",
     "same bounded head as docs_shared_substrings; the added interval "
     "union is a per-doc running-max window over the (small) matched-"
     "interval set, and the output is one integer-ppm row per covered "
     "doc."),
    ("crossmodal_image_video_match",
     "media bytes never shuffle (decode + fingerprint in one Arrow "
     "mapInPandas pass per modality); the cross-modal join carries only "
     "4x14-bit band keys over DISTINCT image fps and df-capped frame "
     "postings, so buckets stay thin as the corpus grows."),
    ("crossmodal_asset_clusters",
     "edge generation is the three bounded candidate pipelines (fp-group "
     "collapse, pigeonhole bands, df-capped postings); components run on "
     "candidate edges only with ops/graph.py's bounded-iteration CC + "
     "localCheckpoint discipline — no all-pairs stage exists."),
]


def make_docs_shared(spark, rows: int, out_dir: str) -> None:
    """docgen corpus + planted cross-doc shared passages: docs with
    doc_id % 100 in {0,1,2} append passage pool[(doc_id // 100) % pool]
    (20 tokens) — each passage lands in ~3 docs at ANY corpus size, so
    anchor df is scale-invariant while passage count grows linearly."""
    make_docs_multilang(spark, rows, out_dir)
    pool = max(rows // 100, 1)
    passage = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit(f"p"),
                ((F.col("doc_id") / 100).cast("long") % pool).cast("string"),
                F.lit(f"w{i}"),
            )
            for i in range(20)
        ],
    )
    (
        spark.read.parquet(f"{out_dir}/documents.parquet")
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 100 < 3,
                F.concat_ws(" ", F.col("text"), passage),
            ).otherwise(F.col("text")),
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents2.parquet")
    )
    import shutil

    shutil.rmtree(f"{out_dir}/documents.parquet")
    os.rename(f"{out_dir}/documents2.parquet", f"{out_dir}/documents.parquet")


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
    ap.add_argument("--ops", nargs="*", default=None)
    args = ap.parse_args()

    spark = get_spark("lakeforge-scale-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    docgen_source.register(spark)

    doc_sizes = {"1x": 5_000, "10x": 50_000, "100x": 500_000}
    order = ["1x", "10x", "100x"]
    results: dict[str, dict[str, float]] = {op: {} for op, _ in OPS}
    with tempfile.TemporaryDirectory() as tmp:
        dirs = {}
        for label in order:
            d = os.path.join(tmp, label)
            os.makedirs(d)
            make_docs_shared(spark, doc_sizes[label], d)
            dirs[label] = d
        todo = [o for o, _ in OPS if args.ops is None or o in args.ops]
        for op in todo:
            for label in order:
                t = time_op(spark, op, dirs[label], args.runs)
                results[op][label] = round(t, 3)
                print(f"{op:32s} {label:>4s}: {t:7.3f}s", flush=True)
    if args.ops is not None:
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
        f"{doc_sizes['100x']:,} docs with planted shared passages (3% of "
        "docs, ~3-doc pools at every size); the crossmodal ops derive "
        "their media corpora from the same doc ids via the r11 fixtures. "
        f" Median of {args.runs}, caches released, noop sink.",
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
    lines += ["", "Why the round-12 ships stay ~linear by construction:"]
    lines += [f"- `{op}`: {why}" for op, why in OPS]

    doc_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "SCALE_PROBE.md",
    )
    with open(doc_path) as fh:
        txt = fh.read()
    block = "\n".join(lines) + "\n"
    if DOC_HEADER in txt:
        head, _, rest = txt.partition(DOC_HEADER)
        # the section runs to the next "## " header or EOF
        after = ""
        idx = rest.find("\n## ")
        if idx != -1:
            after = rest[idx + 1 :]
        txt = head + block + after
    else:
        txt = txt.rstrip() + "\n\n" + block
    with open(doc_path, "w") as fh:
        fh.write(txt)
    print(f"wrote section to {doc_path}")


if __name__ == "__main__":
    main()
