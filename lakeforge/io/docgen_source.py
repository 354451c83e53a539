"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API): a
deterministic, partition-parallel synthetic-document generator.

Why an engine needs this: benchmark/test corpora at TB scale should be
GENERATED in the executors, not written to storage first — dbldatagen-style.
The DataSource API is the supported way to plug such a generator in as a
real source: `spark.read.format("lakeforge_docgen").option("rows", N)`
plans one InputPartition per slice of the id range, and each executor
generates only its slice.  Nothing flows from the driver; scale-out is
linear in partitions.

Determinism contract: every field derives from the 60-bit md5 integers of
(doc_id, field, seed) — the SAME convention as functions/keys.py::md5_int —
so the corpus is bit-identical for a given (rows, seed) on any cluster
size/partitioning, and a DuckDB oracle can REGENERATE it from `range(N)`
with the matching md5 expressions (workload_llm.q_synthetic_docs_stats).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

# Small fixed vocabulary — indexable from SQL as a literal list.
VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()

N_SOURCES = 8
MIN_WORDS, WORD_SPREAD = 5, 20  # n_words = MIN + h % SPREAD

DOCGEN_SCHEMA = "doc_id bigint, source string, n_words bigint, text string"

# Alternate generated datasets (option("kind", ...)): deterministic
# embeddings / random-graph edges, for scale probes of the ANN and graph
# families (tools/scale_probe.py) — same md5 determinism contract.
EMB_SCHEMA = "vec_id bigint, embedding array<float>"
EDGE_SCHEMA = "edge_id bigint, src bigint, dst bigint"


def _h(doc_id: int, field: str, seed: int) -> int:
    """60-bit md5 int of (doc_id, field, seed) — chr(31)-joined like
    functions/keys.py::md5_int; DuckDB twin in workload_llm."""
    s = f"{doc_id}\x1f{field}\x1f{seed}".encode()
    return int(hashlib.md5(s).hexdigest()[:15], 16)


def gen_row(doc_id: int, seed: int) -> tuple[int, str, int, str]:
    src = f"site_{_h(doc_id, 'src', seed) % N_SOURCES}"
    n_words = MIN_WORDS + _h(doc_id, "len", seed) % WORD_SPREAD
    words = [
        VOCAB[_h(doc_id, f"w{j}", seed) % len(VOCAB)] for j in range(n_words)
    ]
    return doc_id, src, n_words, " ".join(words)


def gen_embedding_row(i: int, seed: int, dim: int) -> tuple[int, list[float]]:
    """Deterministic pseudo-embedding: each coordinate is an md5-derived
    uniform in [-1, 1] at micro resolution — the same value-domain shape
    as the testdata embeddings, regenerable on any engine."""
    return (
        i,
        [
            (_h(i, f"e{j}", seed) % 2_000_001 - 1_000_000) / 1e6
            for j in range(dim)
        ],
    )


def gen_edge_row(i: int, seed: int, n_nodes: int) -> tuple[int, int, int]:
    """Deterministic uniform random-graph edge over ``n_nodes`` vertices
    (Erdos-Renyi-style; self-loops possible and handled by graph ops)."""
    return (i, _h(i, "s", seed) % n_nodes, _h(i, "d", seed) % n_nodes)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class DocgenReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        if self.rows < 0:
            raise ValueError(f"rows must be >= 0, got {self.rows}")
        self.seed = int(options.get("seed", 0))
        self.num_partitions = int(options.get("numPartitions", 8))
        self.kind = options.get("kind", "docs")
        if self.kind not in ("docs", "embeddings", "edges"):
            raise ValueError(f"kind must be docs|embeddings|edges, got {self.kind}")
        self.dim = int(options.get("dim", 64))
        self.n_nodes = int(options.get("nNodes", max(self.rows // 10, 1)))

    def partitions(self):
        n, p = self.rows, max(1, self.num_partitions)
        step = (n + p - 1) // p
        return [
            _RangePartition(lo, min(lo + step, n), self.seed)
            for lo in range(0, n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            if self.kind == "embeddings":
                yield gen_embedding_row(i, partition.seed, self.dim)
            elif self.kind == "edges":
                yield gen_edge_row(i, partition.seed, self.n_nodes)
            else:
                yield gen_row(i, partition.seed)


class DocgenStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each microbatch generates the next ``batchRows``
    ids, up to ``rows`` total.  Offsets are just the next doc_id, so the
    stream is exactly-once replayable — `readBetweenOffsets(start, end)`
    regenerates any range bit-identically (determinism IS the recovery
    story; no write-ahead log of data needed, only offsets)."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.seed = int(options.get("seed", 0))
        self.batch_rows = int(options.get("batchRows", 100))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.rows)
        rows = [gen_row(i, self.seed) for i in range(lo, hi)]
        return iter(rows), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter(
            [gen_row(i, self.seed) for i in range(start["next"], end["next"])]
        )

    def commit(self, end):
        pass


class DocgenSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakeforge_docgen"

    def schema(self) -> str:
        kind = self.options.get("kind", "docs")
        if kind == "embeddings":
            return EMB_SCHEMA
        if kind == "edges":
            return EDGE_SCHEMA
        return DOCGEN_SCHEMA

    def reader(self, schema: StructType) -> DocgenReader:
        return DocgenReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> DocgenStreamReader:
        return DocgenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the prior one)."""
    spark.dataSource.register(DocgenSource)
