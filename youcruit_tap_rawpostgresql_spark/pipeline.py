"""Resumable multi-stage pipeline runner with materialized stage outputs.

A 100 TB curation job (extract → dedup cascade → quality filter → pack)
runs for hours; a mid-flight failure must not restart from zero, and a
re-run after editing ONE stage must recompute only that stage and its
downstream. This runner gives each stage:

- a MATERIALIZED output (parquet under ``root/<stage>/data``), so a
  completed stage is a durable artifact any later run (or other tool)
  can read;
- a LINEAGE FINGERPRINT (stage version token + the fingerprints of its
  dependencies, sha256-chained) plus a per-build BUILD ID, committed
  atomically AFTER the write — a stage is skipped on re-run iff its
  fingerprint matches AND every dependency's build id is the one it was
  built against. Editing a stage (bump its ``version``) invalidates
  everything downstream; REBUILDING a stage (crash recovery, force)
  also invalidates downstream even though the logical fingerprint is
  unchanged — the runner never assumes stages are deterministic. A
  partially-written stage (no meta file) is recomputed;
- deterministic topological execution of an explicit dependency DAG
  (cycles and unknown deps fail loudly at submit time, not mid-run).

This is deliberately NOT a scheduler: one process walks the DAG in
order. Parallel stage execution belongs to the cluster scheduler (each
stage is already a distributed Spark job); what the pipeline layer owns
is artifact durability + recompute minimality.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession

_META = "_PIPELINE_META.json"
_LOCK = "_PIPELINE_LOCK"


class ConcurrentBuildError(RuntimeError):
    """Another builder holds (or held) this pipeline root's lock.

    The runner is single-writer by design: two processes interleaving
    meta commits under one root could pair a stage's meta with another
    build's data. The lock makes that assumption fail LOUDLY at run()
    instead of corrupting lineage. A crashed builder leaves its lock
    behind — after verifying no builder is alive, call ``break_lock()``."""


@dataclass(frozen=True)
class Stage:
    """One pipeline stage.

    ``fn(spark, inputs)`` receives the materialized DataFrames of the
    stage's ``deps`` (by name) and returns the stage's output DataFrame.
    ``version`` is the stage's code-identity token: bump it when the
    stage's logic changes — it (not the Python source) drives
    invalidation, so refactors that don't change semantics don't
    trigger petabyte recomputes."""

    name: str
    fn: Callable[[SparkSession, Mapping[str, DataFrame]], DataFrame]
    deps: tuple[str, ...] = ()
    version: str = "1"


@dataclass
class StageResult:
    name: str
    path: str
    fingerprint: str
    skipped: bool


class MaterializedPipeline:
    def __init__(self, spark: SparkSession, root: str, stages: list[Stage]):
        self.spark = spark
        self.root = root
        self.stages = self._toposort(stages)

    @staticmethod
    def _toposort(stages: list[Stage]) -> list[Stage]:
        by_name = {s.name: s for s in stages}
        if len(by_name) != len(stages):
            raise ValueError("duplicate stage names")
        for s in stages:
            unknown = [d for d in s.deps if d not in by_name]
            if unknown:
                raise ValueError(f"stage {s.name!r}: unknown deps {unknown}")
        out: list[Stage] = []
        state: dict[str, int] = {}  # 0 visiting, 1 done

        def visit(name: str, chain: tuple[str, ...]) -> None:
            if state.get(name) == 1:
                return
            if state.get(name) == 0:
                raise ValueError(f"dependency cycle: {' -> '.join(chain + (name,))}")
            state[name] = 0
            for d in by_name[name].deps:
                visit(d, chain + (name,))
            state[name] = 1
            out.append(by_name[name])

        for s in stages:
            visit(s.name, ())
        return out

    def _fingerprint(self, stage: Stage, dep_fps: Mapping[str, str]) -> str:
        h = hashlib.sha256()
        h.update(stage.name.encode())
        h.update(b"\x00")
        h.update(stage.version.encode())
        for d in stage.deps:  # declared order — part of the identity
            h.update(b"\x00")
            h.update(dep_fps[d].encode())
        return h.hexdigest()

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    # --- storage layer: Hadoop FS when the root is a URI (s3a://, hdfs://),
    # plain local FS otherwise. Artifacts already go through df.write
    # (Hadoop-native); these cover the meta/cleanup side so the runner
    # works against object stores too.

    def _is_uri(self) -> bool:
        return "://" in self.root

    def _jfs(self, path: str):
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(conf), jpath, jvm

    def _meta_read(self, meta: str) -> dict | None:
        if not self._is_uri():
            if not os.path.exists(meta):
                return None
            with open(meta) as f:
                return json.load(f)
        fs, jpath, jvm = self._jfs(meta)
        if not fs.exists(jpath):
            return None
        stream = fs.open(jpath)
        try:
            # py4j passes byte arrays by value, so a fill-this-buffer
            # read loop cannot work from Python; commons-io (on Spark's
            # classpath) drains the stream JVM-side
            text = jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
            return json.loads(text)
        finally:
            stream.close()

    def _meta_write(self, meta: str, payload: dict) -> None:
        body = json.dumps(payload).encode()
        if not self._is_uri():
            with open(meta + ".tmp", "w") as f:
                f.write(body.decode())
            os.replace(meta + ".tmp", meta)  # atomic commit
            return
        fs, jpath, jvm = self._jfs(meta)
        tmp = jvm.org.apache.hadoop.fs.Path(meta + ".tmp")
        out = fs.create(tmp, True)
        try:
            out.write(body)
        finally:
            out.close()
        # rename is atomic on HDFS; on object stores it is copy+delete,
        # acceptable for a single small meta object
        fs.delete(jpath, False)
        fs.rename(tmp, jpath)

    def _rmtree(self, path: str) -> None:
        if not self._is_uri():
            shutil.rmtree(path, ignore_errors=True)
            return
        fs, jpath, _ = self._jfs(path)
        if fs.exists(jpath):
            fs.delete(jpath, True)

    # --- single-writer lock: exactly one builder per root at a time.
    # Local FS: O_CREAT|O_EXCL (atomic). Hadoop FS: create(path,
    # overwrite=False) — atomic on HDFS; on S3-style stores it is
    # best-effort (no atomic create-exclusive), which still catches the
    # realistic double-scheduler case. The lock carries holder identity
    # for the error message. It is NOT a lease with a TTL: a crashed
    # builder's lock stays until an operator verifies the process is
    # gone and calls break_lock() — silent expiry could hand the root to
    # a second builder while a stalled first one is still writing.

    def _lock_path(self) -> str:
        return os.path.join(self.root, _LOCK)

    def _acquire_lock(self) -> None:
        import datetime
        import socket

        payload = json.dumps(
            {
                "pid": os.getpid(),
                "host": socket.gethostname(),
                "acquired_utc": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(),
            }
        )
        lock = self._lock_path()
        if not self._is_uri():
            os.makedirs(self.root, exist_ok=True)
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                try:
                    with open(lock) as f:
                        holder = f.read().strip()
                except OSError:
                    holder = "<unreadable>"
                raise ConcurrentBuildError(
                    f"pipeline root {self.root!r} is locked by another "
                    f"builder: {holder}. If that builder crashed, verify "
                    "it is gone and call break_lock()."
                ) from None
            with os.fdopen(fd, "w") as f:
                f.write(payload)
            return
        fs, jpath, _ = self._jfs(lock)
        try:
            out = fs.create(jpath, False)  # overwrite=False
        except Exception as exc:
            raise ConcurrentBuildError(
                f"pipeline root {self.root!r} is locked by another "
                "builder. If that builder crashed, verify it is gone and "
                "call break_lock()."
            ) from exc
        try:
            out.write(payload.encode())
        finally:
            out.close()

    def _release_lock(self) -> None:
        lock = self._lock_path()
        if not self._is_uri():
            try:
                os.remove(lock)
            except FileNotFoundError:
                pass
            return
        fs, jpath, _ = self._jfs(lock)
        if fs.exists(jpath):
            fs.delete(jpath, False)

    def break_lock(self) -> None:
        """Remove a crashed builder's lock. Operator action — call only
        after verifying no builder process is alive on this root."""
        self._release_lock()

    def run(self, force: bool = False) -> dict[str, StageResult]:
        """Execute the DAG; returns per-stage results (skipped = served
        from the existing artifact). ``force=True`` recomputes all.

        Single-writer: acquires the root's builder lock for the whole
        walk; a second concurrent run() on the same root raises
        ``ConcurrentBuildError`` instead of interleaving meta commits."""
        self._acquire_lock()
        try:
            return self._run_locked(force)
        finally:
            self._release_lock()

    def _run_locked(self, force: bool) -> dict[str, StageResult]:
        import uuid

        results: dict[str, StageResult] = {}
        fps: dict[str, str] = {}
        build_ids: dict[str, str] = {}
        for stage in self.stages:
            fp = self._fingerprint(stage, fps)
            fps[stage.name] = fp
            sdir = self._stage_dir(stage.name)
            data = os.path.join(sdir, "data")
            meta = os.path.join(sdir, _META)
            committed = None if force else self._meta_read(meta)
            if committed is not None:
                dep_builds_ok = all(
                    committed.get("dep_build_ids", {}).get(d) == build_ids[d]
                    for d in stage.deps
                )
                if committed.get("fingerprint") == fp and dep_builds_ok:
                    build_ids[stage.name] = committed["build_id"]
                    results[stage.name] = StageResult(stage.name, data, fp, True)
                    continue
            # stale or absent: recompute. Remove first so a crash leaves
            # no meta (→ recompute on resume), never a meta over bad data
            self._rmtree(sdir)
            inputs = {
                d: self.spark.read.parquet(
                    os.path.join(self._stage_dir(d), "data")
                )
                for d in stage.deps
            }
            out = stage.fn(self.spark, inputs)
            out.write.mode("overwrite").parquet(data)
            build_id = uuid.uuid4().hex
            self._meta_write(
                meta,
                {
                    "fingerprint": fp,
                    "build_id": build_id,
                    "version": stage.version,
                    "deps": list(stage.deps),
                    "dep_build_ids": {d: build_ids[d] for d in stage.deps},
                },
            )
            build_ids[stage.name] = build_id
            results[stage.name] = StageResult(stage.name, data, fp, False)
        return results

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._stage_dir(name), "data")
        )
