"""Custom Python DataSource WRITE path (Spark 4 `DataSourceWriter`): a
JSONL sink with a real two-phase commit protocol.

The API contract every distributed sink must honor (and the reason this is
worth demonstrating): executors write TASK-TEMPORARY files and report them
in a `WriterCommitMessage`; only the DRIVER's `commit()` publishes them —
so a job that dies mid-write leaves only unpublished files (cleaned by
`abort()` / the next writer), and readers can never observe a half-written
dataset.  Speculative/retried tasks write distinct temp files
(uuid-suffixed); only the attempts the driver heard about get committed —
exactly-once output from at-least-once task execution.

Two commit protocols, selected with ``option("commit_protocol", ...)``:

- ``rename`` (default): `commit()` renames each task's temp file to its
  final ``part-`` name and writes ``_SUCCESS``.  Correct wherever rename
  is atomic (POSIX, HDFS).
- ``manifest``: task files are never renamed; `commit()` atomically
  publishes ``_manifest.json`` listing exactly the committed data files,
  and `read_jsonl_manifest()` reads only those.  This is the
  object-store-safe protocol (S3/GCS have no atomic rename): losing
  speculative attempts leave orphan files that no reader ever sees.

``mode("overwrite")`` is honored in `commit()` — the destructive delete of
the previous dataset happens only after every task has succeeded, so a
failed overwrite job leaves the prior data intact and readable.

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

MANIFEST = "_manifest.json"


class JsonlCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonlWriter(DataSourceWriter):
    """NOTE: executors open ``path`` directly, so on a real cluster it
    must be shared storage (NFS/FUSE-mounted object store); on local[*]
    any directory works.  For true object stores use
    ``commit_protocol=manifest`` — no renames, the manifest is the
    single atomic publish point."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl sink requires option('path', ...)")
        self.overwrite = overwrite
        self.protocol = options.get("commit_protocol", "rename")
        if self.protocol not in ("rename", "manifest"):
            raise ValueError(
                f"commit_protocol must be rename|manifest, got {self.protocol}"
            )

    def write(self, iterator) -> JsonlCommit:
        os.makedirs(self.path, exist_ok=True)
        # Manifest mode: the task file IS the final file (no rename ever);
        # it stays invisible until commit() lists it in the manifest.
        prefix = "data-" if self.protocol == "manifest" else "_tmp_"
        tmp = os.path.join(self.path, f"{prefix}{uuid.uuid4().hex}.jsonl")
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

    # -- driver side -------------------------------------------------------

    def _clear_previous(self) -> None:
        """Overwrite semantics: drop the previously published dataset.
        Runs inside commit() — i.e. only after every task succeeded — so a
        failed overwrite job never destroys the prior data."""
        prev_manifest = os.path.join(self.path, MANIFEST)
        published: set[str] = set()
        if os.path.exists(prev_manifest):
            try:
                published.update(
                    json.load(open(prev_manifest)).get("files", [])
                )
            except (OSError, ValueError):
                pass
        for name in os.listdir(self.path):
            if (
                name.startswith("part-")
                or name in ("_SUCCESS", MANIFEST)
                or name in published
            ):
                try:
                    os.remove(os.path.join(self.path, name))
                except OSError:
                    pass

    def commit(self, messages) -> None:
        live = [m for m in messages if m is not None]
        if self.overwrite:
            self._clear_previous()
        if self.protocol == "manifest":
            self._commit_manifest(live)
        else:
            self._commit_rename(live)

    def _commit_rename(self, messages) -> None:
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

    def _commit_manifest(self, messages) -> None:
        """Atomic publish without renaming data files: merge the committed
        file list into _manifest.json (written via a temp + one replace of
        the small manifest itself — the only rename, and of a tiny file;
        on a pure object store this would be a single conditional PUT)."""
        manifest_path = os.path.join(self.path, MANIFEST)
        files: list[str] = []
        rows = 0
        if not self.overwrite and os.path.exists(manifest_path):
            prev = json.load(open(manifest_path))
            files = list(prev.get("files", []))
            rows = int(prev.get("rows", 0))
        for m in messages:
            files.append(os.path.basename(m.tmp_path))
            rows += m.n_rows
        tmp = manifest_path + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as fh:
            fh.write(json.dumps({"rows": rows, "files": files}))
        os.replace(tmp, manifest_path)

    def abort(self, messages) -> None:
        # Per the DataSourceWriter contract, FAILED tasks report None —
        # skip them so abort cleans every reported temp file instead of
        # raising AttributeError on exactly the failure path it serves.
        for m in messages:
            if m is None:
                continue
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


def read_jsonl_manifest(spark, path: str):
    """Read a manifest-committed JSONL dataset: only files listed in
    ``_manifest.json`` are loaded, so orphaned speculative-attempt files
    and in-flight writes are invisible — snapshot isolation for readers."""
    manifest = json.load(open(os.path.join(path, MANIFEST)))
    paths = [os.path.join(path, f) for f in manifest["files"]]
    if not paths:
        raise ValueError(f"empty manifest at {path}")
    return spark.read.json(paths)
