"""Custom Python DataSource WRITER: a transactional JSONL directory sink.

The reader side of the Python DataSource API is covered by the ticker
source (sources/ticker.py); this is the WRITER side — the Spark-4 shape
of the reference's "serialize rows to JSON and put them in a bucket"
sink (reference ``scripts/stock_ingestor.py:29-37`` + MinIO put): each
task streams its partition to a staging part file and returns a commit
message; the driver makes the job visible ATOMICALLY by renaming the
staged parts into the target directory and writing a ``_SUCCESS``
manifest only after every task succeeded. A failed job leaves the
target untouched (``abort`` removes the staging dir) — the
write-visibility contract object-store pipelines need and the
reference's per-object puts lack (a crashed run leaves partial
objects visible).

Usage::

    spark.dataSource.register(JsonlDirDataSource)
    df.write.format("jsonldir").mode("append") \
        .option("path", "/lake/events_json").save()

Scale shape: one part file per task, no driver row traffic (the driver
sees only file-name commit messages), rename-based publish. On a real
object store the rename becomes a server-side copy/finalize — the
manifest-last protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

_STAGING = "__staging"


class InconsistentManifestError(RuntimeError):
    """A manifest lists parts missing on disk and cannot apportion rows.

    A dedicated type (not OSError) so the semantic refusal can never be
    confused with — or swallowed by — transient _SUCCESS read-error
    handling, and callers can catch it specifically.
    """


class _PartCommit(WriterCommitMessage):
    def __init__(self, staged_path: str, n_rows: int):
        self.staged_path = staged_path
        self.n_rows = n_rows


class _JsonlDirWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path", "")
        if not self.path:
            raise ValueError("jsonldir requires option('path', ...)")
        self.overwrite = overwrite
        self.staging = os.path.join(self.path, _STAGING, uuid.uuid4().hex)

    # executor-side: stream the partition to ONE staged part file
    def write(self, iterator: Iterator) -> _PartCommit:
        os.makedirs(self.staging, exist_ok=True)
        part = os.path.join(self.staging, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartCommit(part, n)

    # driver-side: publish staged parts, manifest LAST.
    #
    # Crash-ordering contract (both modes): staged parts rename in
    # FIRST (uuid names — never collide with live parts), the manifest
    # flips atomically SECOND, and only then (overwrite) are the old
    # generation's parts deleted. A crash before the manifest flip
    # leaves the previous generation fully intact and still described
    # by the previous manifest; a crash after it leaves at worst
    # orphaned old parts that no manifest references. In append mode
    # the manifest MERGES the pre-existing generation's files and row
    # count, so a manifest-trusting reader keeps seeing every
    # committed row, not just the last batch.
    def commit(self, messages) -> None:
        import shutil

        # Per-file row counts so the merged n_rows stays consistent
        # with the merged files list even when a previously listed part
        # was deleted out-of-band: a missing part drops BOTH its name
        # and its count. Legacy manifests (aggregate n_rows only) can't
        # apportion the count, so a missing part there fails loudly
        # instead of silently overcounting.
        prev_counts: dict[str, int] = {}
        success = os.path.join(self.path, "_SUCCESS")
        if os.path.isfile(success):
            try:
                with open(success, encoding="utf-8") as f:
                    prev = json.load(f)
                listed = list(prev.get("files", []))
                per_file = prev.get("file_rows")
                missing = [
                    name
                    for name in listed
                    if not os.path.isfile(os.path.join(self.path, name))
                ]
                if per_file is not None:
                    prev_counts = {
                        name: int(per_file.get(name, 0))
                        for name in listed
                        if name not in missing
                    }
                elif missing:
                    raise InconsistentManifestError(
                        "jsonldir manifest lists parts that are missing "
                        f"on disk ({missing}); the legacy aggregate-only "
                        "manifest cannot apportion n_rows, refusing to "
                        "publish an inconsistent merged manifest"
                    )
                else:
                    # legacy manifest, all parts present: attribute the
                    # aggregate to a sentinel so totals still merge.
                    prev_counts = dict.fromkeys(listed, 0)
                    if listed:
                        prev_counts[listed[0]] = int(prev.get("n_rows", 0))
            except (json.JSONDecodeError, ValueError):
                prev_counts = {}

        counts: dict[str, int] = {}
        for m in messages:
            if m is None:
                continue
            dest = os.path.join(self.path, os.path.basename(m.staged_path))
            os.replace(m.staged_path, dest)
            counts[os.path.basename(dest)] = m.n_rows

        if not self.overwrite:
            for name, n in prev_counts.items():
                counts.setdefault(name, n)
        files = sorted(counts)
        total = sum(counts.values())
        manifest = {
            "n_rows": total,
            "files": files,
            "file_rows": {name: counts[name] for name in files},
        }
        tmp = os.path.join(self.path, "._SUCCESS.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(json.dumps(manifest))
        os.replace(tmp, success)

        if self.overwrite:
            keep = set(files)
            for name in os.listdir(self.path):
                if (
                    name != _STAGING
                    and not name.startswith(".")
                    and name != "_SUCCESS"
                    and name not in keep
                    and os.path.isfile(os.path.join(self.path, name))
                ):
                    os.remove(os.path.join(self.path, name))
        shutil.rmtree(os.path.dirname(self.staging), ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(os.path.dirname(self.staging), ignore_errors=True)


class JsonlDirDataSource(DataSource):
    """``df.write.format("jsonldir")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "jsonldir"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlDirWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
