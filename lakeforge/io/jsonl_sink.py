"""Custom Python DataSource WRITE path (Spark 4 `DataSourceWriter`): a
JSONL sink with a real two-phase commit protocol.

The API contract every distributed sink must honor (and the reason this is
worth demonstrating): executors write TASK-TEMPORARY files and report them
in a `WriterCommitMessage`; only the DRIVER's `commit()` renames them to
their final names — so a job that dies mid-write leaves only `_tmp_` files
(cleaned by `abort()` / the next writer), and readers can never observe a
half-written dataset.  Speculative/retried tasks write distinct temp files
(uuid-suffixed); only the attempts the driver heard about get committed —
exactly-once output from at-least-once task execution.

Rows are serialized with sorted keys and `default=str` (dates/decimals),
one JSON object per line — `spark.read.json` round-trips the result.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


class JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    """NOTE: executors open ``path`` directly, so on a real cluster it
    must be shared storage (NFS/FUSE-mounted object store); on local[*]
    any directory works.  A cloud-native variant would write via an
    object-store client per partition and commit a manifest instead of
    renames — the two-phase protocol shown here is the same."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires option('path', ...)")
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(
                    json.dumps(row.asDict(recursive=True), sort_keys=True,
                               default=str)
                )
                fh.write("\n")
                n += 1
        return JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        # Final names carry a per-commit uuid so successive appends (e.g.
        # one commit per foreachBatch microbatch) never collide.
        commit_id = uuid.uuid4().hex[:12]
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(
                self.path, f"part-{commit_id}-{i:05d}.jsonl"
            )
            os.replace(m.tmp_path, final)
            total += m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(json.dumps({"rows": total, "files": len(messages)}))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "lakeforge_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(JsonlSink)
