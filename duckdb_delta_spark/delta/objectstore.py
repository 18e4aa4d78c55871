"""Object-store conditional-PUT LogStore — the first real-deployment seam.

The reference wires real S3/GCS/Azure/R2 commit semantics through the
kernel's object-store clients (reference:
src/functions/delta_scan/delta_multi_file_list.cpp:65-335 builder config,
cloud auth via secrets). This engine abstracts the same requirement to
exactly one primitive (``LogStore.put_if_absent``, delta/log.py) and this
module supplies the object-store implementation of it:

* :class:`ObjectStoreClient` — the minimal client surface a cloud SDK
  must provide: ``put(key, data, if_none_match=True) → etag`` with
  atomic precondition semantics (S3 ``If-None-Match: *`` conditional
  PUT, GCS ``x-goog-if-generation-match: 0``, Azure ``If-None-Match``),
  plus ``get``/``head``. A production deployment implements this with
  boto3 / google-cloud-storage / azure-blob; nothing else in the engine
  changes.
* :class:`FilesystemObjectStore` — a faithful local model of those
  semantics used in tests and in this sandbox: one mutex around the
  exists-check + write (the atomicity a real conditional PUT provides
  server-side), per-key ETags, and INJECTABLE RACE HOOKS
  (``before_put``) so tests can land a competing commit in the window
  where a real store would — proving the engine's retry machinery
  end-to-end rather than assuming the filesystem's ``O_EXCL``.
* :class:`ObjectStoreLogStore` — the ``LogStore`` adapter: maps
  ``PreconditionFailedError`` to ``FileExistsError``, which the commit
  paths (append / DELETE / UPDATE / MERGE / OPTIMIZE / streaming sink)
  already turn into ``CommitConflictError`` + bounded retry.

Commit-path contract (same as S3 strong consistency, 2020+): a
successful conditional PUT is immediately visible to LIST and GET;
losers of the race observe PreconditionFailed, never partial data.
"""

from __future__ import annotations

import hashlib
import os
import threading
from typing import Callable

from duckdb_delta_spark.delta.log import LogStore


class PreconditionFailedError(Exception):
    """Conditional PUT refused: the key already exists (HTTP 412)."""


class ObjectStoreClient:
    """Minimal object-store client surface for the commit path."""

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> str:
        """Write ``key``; with ``if_none_match`` the write succeeds IFF
        the key does not exist (atomic, server-side), else raises
        :class:`PreconditionFailedError`. Returns the new ETag."""
        raise NotImplementedError

    def get(self, key: str) -> bytes:
        raise NotImplementedError

    def head(self, key: str) -> str | None:
        """ETag of ``key``, or None when absent."""
        raise NotImplementedError


class FilesystemObjectStore(ObjectStoreClient):
    """Local-filesystem model of S3-style conditional PUT.

    Storage is plain files (so every reader of ``_delta_log`` works
    unchanged); the conditional-PUT atomicity a real store provides
    server-side is modeled with a process-wide mutex per store instance
    shared across writers via :meth:`shared` — two writers using shared
    stores observe exactly the S3 race semantics: one wins, the other
    gets 412.

    ``before_put`` (test hook): called with ``(key, data)`` INSIDE the
    critical section, before the exists check — a registered hook can
    land a competing object first, simulating the concurrent-writer
    window. The conditional check runs after the hook, so the hook's
    write must win, exactly like a faster writer on a real store.
    """

    _SHARED: dict[str, "FilesystemObjectStore"] = {}
    _SHARED_LOCK = threading.Lock()

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._etags: dict[str, str] = {}
        self.puts = 0
        self.conflicts = 0
        self.before_put: Callable[[str, bytes], None] | None = None

    @classmethod
    def shared(cls, namespace: str) -> "FilesystemObjectStore":
        """One store per namespace (e.g. bucket/table) — writers that
        share a namespace share the mutex, like clients of one bucket."""
        with cls._SHARED_LOCK:
            store = cls._SHARED.get(namespace)
            if store is None:
                store = cls._SHARED[namespace] = cls()
            return store

    @staticmethod
    def _etag(data: bytes) -> str:
        return hashlib.md5(data).hexdigest()

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> str:
        with self._lock:
            self.puts += 1
            hook = self.before_put
            if hook is not None:
                self.before_put = None  # one-shot: the race happens once
                hook(key, data)
            if if_none_match and os.path.exists(key):
                self.conflicts += 1
                raise PreconditionFailedError(key)
            tmp = key + ".put.tmp"
            os.makedirs(os.path.dirname(key), exist_ok=True)
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, key)
            etag = self._etags[key] = self._etag(data)
            return etag

    def get(self, key: str) -> bytes:
        with open(key, "rb") as f:
            return f.read()

    def head(self, key: str) -> str | None:
        if not os.path.exists(key):
            return None
        return self._etags.get(key) or self._etag(self.get(key))


class ObjectStoreLogStore(LogStore):
    """LogStore over an :class:`ObjectStoreClient`: the commit paths'
    put-if-absent becomes one conditional PUT; a 412 surfaces as
    ``FileExistsError`` which the writers map to ``CommitConflictError``
    and retry against a fresh snapshot."""

    def __init__(self, client: ObjectStoreClient):
        self.client = client

    def put_if_absent(self, path: str, data: bytes) -> None:
        try:
            self.client.put(path, data, if_none_match=True)
        except PreconditionFailedError as exc:
            raise FileExistsError(str(exc)) from exc
