"""Versioned snapshot tables: atomic publish, time travel, rollback.

A minimal transaction log over plain parquet — the lakehouse primitive
(Delta/Iceberg's core idea, reduced to its load-bearing invariant) that
the sink family needs once readers and writers overlap: writers stage
data invisibly and publish with ONE atomic action, readers resolve a
version via the log only, so every read is a consistent snapshot and
any historical version stays reproducible (the training-data
requirement: "which exact rows did run X train on?").

Layout under a table root::

    <root>/_log/00000001.json   commit records, one per version
    <root>/d-<uuid>/            immutable data directories (parquet)

A commit record lists the data directories that MAKE UP that version —
an overwrite commit lists only its own directory, an append commit
lists its parent's directories plus its own, and a rollback commit
lists exactly the directories of the version it restores (no data is
ever copied or rewritten; versions share directories structurally).
The record is written LAST, with create-exclusive semantics: a crash
anywhere before that leaves at most an orphan data directory that no
reader can ever resolve (vacuum reclaims it), and two racing writers
cannot both claim the same version — the loser re-reads the log and
retries against the new head (optimistic concurrency).  On HDFS the
exclusive create is native; on S3 it maps to put-if-absent — the same
contract Delta's commit protocol requires of its log store.

Scale posture: the log is O(versions) tiny JSON files read driver-side
(one listing + k reads, never a data scan); data directories are opaque
to the log, so a version's read plan is exactly
``spark.read.parquet(*dirs)`` — partition pruning, pushdown, and
schema merge behave as for any parquet table.  Append-heavy tables
compact through ``checkpoint_snapshot`` (fold the current version's
directories into one, commit the fold), bounding both the per-version
directory list and the small-files count — the same maintenance
contract as operators/vector_index.py::compact_vector_index.

Reference parity: the reference keeps one mutable Postgres table and
has no history (src/lambda/processQueue.ts overwrites rows in place);
this module is what that surface needs to become auditable at 100 TB.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"


def _log_dir(root: str) -> str:
    return os.path.join(root, _LOG)


def _record_path(root: str, version: int) -> str:
    return os.path.join(_log_dir(root), f"{version:08d}.json")


def versions(root: str) -> list[dict]:
    """All committed records, oldest first (empty for a fresh root)."""
    d = _log_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(d, name)) as f:
            out.append(json.load(f))
    return out


def latest_version(root: str) -> int:
    """Newest committed version number (0 = empty table)."""
    vs = versions(root)
    return vs[-1]["version"] if vs else 0


def _resolve(root: str, version: int | None) -> dict:
    vs = versions(root)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {root}")
    if version is None:
        return vs[-1]
    for rec in vs:
        if rec["version"] == version:
            return rec
    raise KeyError(f"version {version} not committed under {root}")


def _stage(df: DataFrame, root: str) -> str:
    """Write the data invisibly: a fresh uuid directory no commit record
    references yet.  Fully durable before the caller publishes."""
    name = f"d-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(os.path.join(root, name))
    return name


def _try_commit(root: str, record: dict) -> bool:
    """Atomically claim ``record['version']``: create-exclusive write of
    the commit file.  False if another writer already owns the slot."""
    os.makedirs(_log_dir(root), exist_ok=True)
    tmp = _record_path(root, record["version"]) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(record, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _record_path(root, record["version"]))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def commit_snapshot(df: DataFrame, root: str, *, mode: str = "overwrite",
                    meta: dict | None = None, _retries: int = 20) -> int:
    """Publish ``df`` as the table's next version and return it.

    ``mode="overwrite"``: the new version IS this data.
    ``mode="append"``: the new version is the parent's directories plus
    this data — no existing bytes are read or rewritten.

    The data lands fully before the commit record exists, so readers
    never observe a partial version; version claiming is optimistic
    (exclusive-create, retry against the new head on collision)."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    dir_name = _stage(df, root)
    for _ in range(_retries):
        head = versions(root)
        parent = head[-1] if head else None
        dirs = [dir_name]
        if mode == "append" and parent is not None:
            dirs = list(parent["dirs"]) + [dir_name]
        record = {
            "version": (parent["version"] if parent else 0) + 1,
            "dirs": dirs,
            "mode": mode,
            "meta": meta or {},
        }
        if _try_commit(root, record):
            return record["version"]
    raise RuntimeError(f"commit contention exhausted {_retries} retries")


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None) -> DataFrame:
    """A consistent snapshot: the latest committed version, or the exact
    historical one — immutable data dirs make time travel a plain
    multi-path parquet read."""
    rec = _resolve(root, version)
    return spark.read.parquet(*[os.path.join(root, d) for d in rec["dirs"]])


def rollback(root: str, to_version: int) -> int:
    """Restore a historical version AS a new commit (the audit trail
    keeps the bad versions; nothing is deleted).  Structural: the new
    record points at the old version's directories."""
    target = _resolve(root, to_version)
    for _ in range(20):
        head = versions(root)[-1]
        record = {
            "version": head["version"] + 1,
            "dirs": list(target["dirs"]),
            "mode": "rollback",
            "meta": {"restores": to_version},
        }
        if _try_commit(root, record):
            return record["version"]
    raise RuntimeError("commit contention exhausted retries")


def checkpoint_snapshot(spark: SparkSession, root: str) -> int:
    """Compaction commit: fold the current version's directory list into
    ONE rewritten directory and publish the fold as the next version.
    Bounds the per-version dir list (append-heavy tables) and the
    small-files count; historical versions still resolve — their
    directories are untouched until vacuum."""
    rec = _resolve(root, None)
    folded = _stage(read_snapshot(spark, root, rec["version"]), root)
    for _ in range(20):
        head = versions(root)[-1]
        if head["version"] != rec["version"]:
            raise RuntimeError("table advanced during checkpoint; rerun")
        record = {
            "version": head["version"] + 1,
            "dirs": [folded],
            "mode": "checkpoint",
            "meta": {"folds": rec["version"]},
        }
        if _try_commit(root, record):
            return record["version"]
    raise RuntimeError("commit contention exhausted retries")


def vacuum(root: str, *, keep_versions: int = 0) -> list[str]:
    """Delete data directories no retained version references: orphans
    from crashed writers, plus (with ``keep_versions=k``) directories
    only reachable from versions older than the newest k.  Returns the
    deleted directory names.  Never touches the log — history stays
    auditable even after its data ages out."""
    vs = versions(root)
    retained = vs[-keep_versions:] if keep_versions > 0 else vs
    live = {d for rec in retained for d in rec["dirs"]}
    gone = []
    for name in os.listdir(root):
        if name == _LOG or not name.startswith("d-"):
            continue
        if name not in live:
            shutil.rmtree(os.path.join(root, name))
            gone.append(name)
    return sorted(gone)


def commit_stream_batch(df: DataFrame, root: str, batch_id: int) -> int | None:
    """foreachBatch adapter: publish one micro-batch as an append commit,
    exactly once.  foreachBatch is at-least-once, so the batch id is
    recorded in the commit meta and a replay of an already-committed
    batch is a pure no-op (returns None) — the log IS the idempotence
    ledger, no mb partition dance needed (cf. streaming/vectors.py,
    which solves the same replay with dynamic partition overwrite
    because it has no log)."""
    for rec in versions(root):
        if rec["meta"].get("batch_id") == batch_id:
            return None
    return commit_snapshot(df, root, mode="append",
                           meta={"batch_id": batch_id})
