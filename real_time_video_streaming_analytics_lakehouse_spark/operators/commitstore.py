"""Pluggable put-if-absent commit stores for the native transaction log.

The whole correctness story of ``txlog`` (reference features D1–D8:
VACUUM / time travel / CDF / DELETE-UPDATE-MERGE, ``delta_setup.py``)
rests on ONE primitive: *atomically claim version N, failing if another
writer claimed it first*. Everything else in the log — commit JSON,
checkpoint manifests, the ``_last_checkpoint`` pointer — is plain
read/write of immutable or last-writer-wins objects.

On a local filesystem that primitive is ``os.link`` (EEXIST on a lost
race). At the 100 TB target the table lives on an object store, where
the same primitive is a conditional PUT (S3 ``If-None-Match: *``, GCS
``ifGenerationMatch=0``, Azure ``If-None-Match``) or an external lock
table (the DynamoDB scheme S3 needed before conditional PUT shipped) —
exactly how Delta's own LogStore abstraction is layered. This module
makes the primitive pluggable so the commit path has NO local-FS
assumption baked in:

* :class:`LocalFileCommitStore` — the production implementation here:
  commit JSON files under ``<root>/_txlog`` published with
  stage-then-hard-link, checkpoints with write-then-``os.replace``.
* :class:`InMemoryCommitStore` — a lock-guarded conditional-PUT fake
  with object-store semantics (no rename, no listing of half-written
  files): the test double that proves the log's optimistic-concurrency
  machinery (disjoint-retry, overlapping-rewrite conflicts, checkpoint
  consolidation) is independent of ``os.rename``/``os.link``.

Tables opt in per root via :func:`register_store`; unregistered roots
fall back to :class:`LocalFileCommitStore`, which preserves the on-disk
layout byte-for-byte (other processes — e.g. the Python data-source
stream reader worker — read the same files directly).

Data files are NOT in scope: they are immutable, uniquely named, and
invisible until a commit references them, so they need no atomic
primitive — any store Spark can read paths from works (this sandbox:
local FS).
"""

from __future__ import annotations

import io
import json
import os
import threading
import uuid

_LOG_DIR = "_txlog"
_LAST_CHECKPOINT = "_last_checkpoint.json"


class CommitConflictError(RuntimeError):
    """The put-if-absent PUT lost: this version was already claimed."""


class CommitStore:
    """Interface: the log-plane operations of one table's commit log.

    ``put_commit_if_absent`` is the only operation that needs atomicity
    (it IS the commit protocol). Checkpoints are idempotent overwrites
    (concurrent writers produce identical bytes for the same version);
    the pointer is advisory last-writer-wins.
    """

    def list_commits(self) -> list[int]:
        raise NotImplementedError

    def read_commit(self, version: int) -> dict:
        raise NotImplementedError

    def put_commit_if_absent(self, version: int, action: dict) -> None:
        raise NotImplementedError

    def delete_commit(self, version: int) -> None:
        """Remove one commit object (log-retention cleanup). Deleting a
        missing version is a no-op — cleanup must be idempotent."""
        raise NotImplementedError

    def list_checkpoints(self) -> list[int]:
        raise NotImplementedError

    def read_checkpoint(self, version: int) -> bytes:
        raise NotImplementedError

    def write_checkpoint(self, version: int, payload: bytes) -> None:
        raise NotImplementedError

    def write_pointer(self, payload: dict) -> None:
        raise NotImplementedError

    def read_pointer(self) -> dict | None:
        raise NotImplementedError

    def log_exists(self) -> bool:
        return bool(self.list_commits() or self.list_checkpoints())

    # -- data plane ---------------------------------------------------------
    # The commit plane above is fully pluggable; the DATA plane (data
    # files, CDC change files, deletion-vector bundles) must land under
    # the table root where Spark's readers can scan it. PUBLICATION of
    # staged output into the root routes through these two hooks so a
    # store backed by an object store can substitute its own move/copy
    # instead of inheriting a POSIX-rename assumption. Publication is
    # not the atomicity point (the commit PUT is): a half-published
    # file is an untracked stray until its commit lands, and VACUUM's
    # stray scan collects orphans.

    def publish_file(self, src: str, dest: str) -> None:
        """Move one staged file at absolute path ``src`` to absolute
        path ``dest`` (under the table root), creating parents."""
        raise NotImplementedError

    def publish_dir(self, src: str, dest: str) -> None:
        """Move a staged directory tree ``src`` to ``dest`` (under the
        table root), creating parents."""
        raise NotImplementedError


class LocalFileCommitStore(CommitStore):
    """Commit log as files under ``<root>/_txlog`` (the native layout).

    Put-if-absent = stage to a writer-unique tmp name, then ``os.link``
    to the final name: hard-linking raises ``FileExistsError`` if the
    version was already claimed — atomic on every POSIX filesystem,
    the same trick Delta's HDFSLogStore uses (rename-without-overwrite).
    """

    def __init__(self, root: str):
        self.root = root.removeprefix("file://").rstrip("/")

    def _dir(self) -> str:
        return os.path.join(self.root, _LOG_DIR)

    def _commit_path(self, version: int) -> str:
        return os.path.join(self._dir(), f"{version:020d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self._dir(), f"{version:020d}.checkpoint.parquet")

    def _list(self, suffix: str, skip_suffix: str | None = None) -> list[int]:
        d = self._dir()
        if not os.path.isdir(d):
            return []
        out = []
        for name in os.listdir(d):
            if not name.endswith(suffix):
                continue
            if skip_suffix and name.endswith(skip_suffix):
                continue
            try:
                out.append(int(name[: -len(suffix)]))
            except ValueError:
                continue
        return sorted(out)

    def list_commits(self) -> list[int]:
        return self._list(".json", skip_suffix=".tmp.json")

    def read_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as f:
            return json.load(f)

    def put_commit_if_absent(self, version: int, action: dict) -> None:
        os.makedirs(self._dir(), exist_ok=True)
        final = self._commit_path(version)
        tmp = final + f".{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp.json"
        with open(tmp, "w") as f:
            json.dump(action, f, separators=(",", ":"))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} of {self.root} was committed concurrently"
            ) from None
        finally:
            os.unlink(tmp)

    def delete_commit(self, version: int) -> None:
        try:
            os.unlink(self._commit_path(version))
        except FileNotFoundError:
            pass

    def list_checkpoints(self) -> list[int]:
        return self._list(".checkpoint.parquet")

    def read_checkpoint(self, version: int) -> bytes:
        with open(self._checkpoint_path(version), "rb") as f:
            return f.read()

    def write_checkpoint(self, version: int, payload: bytes) -> None:
        final = self._checkpoint_path(version)
        tmp = final + f".{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, final)

    def write_pointer(self, payload: dict) -> None:
        ptr = os.path.join(self._dir(), _LAST_CHECKPOINT)
        tmp = ptr + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, ptr)

    def read_pointer(self) -> dict | None:
        try:
            with open(os.path.join(self._dir(), _LAST_CHECKPOINT)) as f:
                return json.load(f)
        except (FileNotFoundError, NotADirectoryError):
            return None

    def publish_file(self, src: str, dest: str) -> None:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(src, dest)

    def publish_dir(self, src: str, dest: str) -> None:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(src, dest)


class InMemoryCommitStore(CommitStore):
    """Conditional-PUT commit store with object-store semantics.

    Models S3's ``PutObject`` + ``If-None-Match: *``: one lock-guarded
    check-and-insert per commit, no rename, no hard link, no directory
    listing of in-flight writes. Payloads are JSON round-tripped on both
    put and read so callers can never observe (or mutate) shared state —
    the same isolation a real object store gives.

    Test double only in this sandbox (single process; Spark's
    data-source worker processes can't see it), but the semantics are
    exactly what an S3/GCS-backed store provides, which is the point:
    every txlog concurrency guarantee proven against this store holds
    on an object store with conditional PUT.
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._commits: dict[int, str] = {}
        self._checkpoints: dict[int, bytes] = {}
        self._pointer: str | None = None

    def list_commits(self) -> list[int]:
        with self._lock:
            return sorted(self._commits)

    def read_commit(self, version: int) -> dict:
        with self._lock:
            try:
                payload = self._commits[version]
            except KeyError:
                raise FileNotFoundError(
                    f"no commit {version} in in-memory store"
                ) from None
        return json.loads(payload)

    def put_commit_if_absent(self, version: int, action: dict) -> None:
        payload = json.dumps(action, separators=(",", ":"))
        with self._lock:
            if version in self._commits:
                raise CommitConflictError(
                    f"version {version} was committed concurrently"
                )
            self._commits[version] = payload

    def delete_commit(self, version: int) -> None:
        with self._lock:
            self._commits.pop(version, None)

    def list_checkpoints(self) -> list[int]:
        with self._lock:
            return sorted(self._checkpoints)

    def read_checkpoint(self, version: int) -> bytes:
        with self._lock:
            try:
                return self._checkpoints[version]
            except KeyError:
                raise FileNotFoundError(
                    f"no checkpoint {version} in in-memory store"
                ) from None

    def write_checkpoint(self, version: int, payload: bytes) -> None:
        with self._lock:
            self._checkpoints[version] = bytes(payload)

    def write_pointer(self, payload: dict) -> None:
        with self._lock:
            self._pointer = json.dumps(payload)

    def read_pointer(self) -> dict | None:
        with self._lock:
            return None if self._pointer is None else json.loads(self._pointer)

    # Data plane: in this sandbox the staged parquet lives on the local
    # FS regardless of the commit plane (Spark must scan it), so the
    # publication hooks delegate to POSIX rename — a real object-store
    # implementation replaces these with its multipart copy + delete.
    def publish_file(self, src: str, dest: str) -> None:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(src, dest)

    def publish_dir(self, src: str, dest: str) -> None:
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.rename(src, dest)


# ---------------------------------------------------------------------------
# per-root registry

def normalize_root(path: str) -> str:
    """Canonical registry key for a table root: local paths lose their
    ``file://`` prefix (so ``file:///t`` and ``/t`` are the same table);
    every path loses trailing slashes."""
    return path.removeprefix("file://").rstrip("/")


_REGISTRY: dict[str, CommitStore] = {}


def register_store(root: str, store: CommitStore) -> None:
    """Route all commit-log operations for ``root`` through ``store``.

    Process-local (the registry is a module global): other processes —
    including Spark's Python data-source workers — resolve unregistered
    roots to :class:`LocalFileCommitStore` and read the files directly,
    so registering a non-file store makes the table visible ONLY to
    this process. That is the correct scope for the test double; a real
    object-store deployment would configure its store everywhere, like
    Delta's ``spark.delta.logStore.class``.
    """
    _REGISTRY[normalize_root(root)] = store


def unregister_store(root: str) -> None:
    _REGISTRY.pop(normalize_root(root), None)


def store_for(root: str) -> CommitStore:
    """The commit store governing ``root``: the registered one, else
    the local-file layout (byte-compatible with pre-registry tables)."""
    return _REGISTRY.get(normalize_root(root)) or LocalFileCommitStore(root)


def checkpoint_to_bytes(table) -> bytes:
    """Serialize a pyarrow table to parquet bytes (checkpoint payload)."""
    import pyarrow.parquet as pq

    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def checkpoint_from_bytes(payload: bytes):
    """Parse checkpoint parquet bytes back to a pyarrow table."""
    import pyarrow.parquet as pq

    return pq.read_table(io.BytesIO(payload))
