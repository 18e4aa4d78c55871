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


class S3ObjectStore(ObjectStoreClient):
    """boto3-semantics S3 client for the commit path.

    Maps the 3-method contract onto the S3 API: ``put`` with
    ``if_none_match`` issues ``PutObject`` + ``IfNoneMatch: '*'`` (the
    2024 S3 conditional-write primitive; also what R2/MinIO implement),
    a 412/PreconditionFailed response becomes
    :class:`PreconditionFailedError`; ``head`` maps 404 → None.

    boto3 is NOT imported at module import time: pass any client with
    the boto3 ``put_object``/``get_object``/``head_object`` surface
    (tests use a filesystem-backed fake with botocore-shaped errors), or
    let the constructor build a real one when boto3 is installed.

    Keys handed to the engine are paths; ``bucket``+stripped key follow
    S3 addressing. S3 strong consistency (2020+) provides the
    commit-path contract: a successful conditional PUT is immediately
    LIST/GET-visible, losers observe 412 and never partial data.
    """

    def __init__(self, bucket: str, client=None) -> None:
        if client is None:
            try:
                import boto3  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "S3ObjectStore needs boto3 (pip install boto3) or an "
                    "explicit client with the put_object/get_object/"
                    "head_object surface"
                ) from exc
            client = boto3.client("s3")
        self._s3 = client
        self.bucket = bucket

    @staticmethod
    def _key(key: str) -> str:
        return key.lstrip("/")

    @staticmethod
    def _status(exc) -> tuple[int | None, str | None]:
        """(HTTP status, error code) from a botocore-shaped ClientError
        — duck-typed so the module never imports botocore."""
        resp = getattr(exc, "response", None)
        if not isinstance(resp, dict):
            return None, None
        status = (resp.get("ResponseMetadata") or {}).get("HTTPStatusCode")
        code = (resp.get("Error") or {}).get("Code")
        return status, code

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> str:
        kwargs = {"Bucket": self.bucket, "Key": self._key(key),
                  "Body": data}
        if if_none_match:
            kwargs["IfNoneMatch"] = "*"
        try:
            resp = self._s3.put_object(**kwargs)
        except Exception as exc:  # noqa: BLE001 - botocore shape, see _status
            status, code = self._status(exc)
            if status == 412 or code in ("PreconditionFailed", "412"):
                raise PreconditionFailedError(key) from exc
            raise
        return (resp.get("ETag") or "").strip('"')

    def get(self, key: str) -> bytes:
        resp = self._s3.get_object(Bucket=self.bucket, Key=self._key(key))
        body = resp["Body"]
        return body.read() if hasattr(body, "read") else body

    def head(self, key: str) -> str | None:
        try:
            resp = self._s3.head_object(
                Bucket=self.bucket, Key=self._key(key))
        except Exception as exc:  # noqa: BLE001 - botocore shape, see _status
            status, code = self._status(exc)
            if status == 404 or code in ("404", "NoSuchKey", "NotFound"):
                return None
            raise
        return (resp.get("ETag") or "").strip('"')


class GCSObjectStore(ObjectStoreClient):
    """google-cloud-storage-semantics GCS client for the commit path.

    Maps the 3-method contract onto the GCS JSON API: ``put`` with
    ``if_none_match`` issues an upload with ``ifGenerationMatch=0`` —
    GCS's create-only precondition (the object may only be written if no
    live generation exists), the native equivalent of S3's
    ``If-None-Match: *``. A 412 PreconditionFailed response becomes
    :class:`PreconditionFailedError`; ``head`` maps 404 → None and
    returns the object's generation as the change token (GCS generations
    are the authoritative version handle; ETags on GCS vary by
    transcoding, generations never do).

    The SDK is NOT imported at module import time: pass any client with
    the ``bucket(name).blob(key)`` surface (tests use a filesystem-backed
    fake raising api_core-shaped 412/404 errors), or let the constructor
    build a real ``google.cloud.storage.Client`` when installed.
    GCS preconditioned writes are strongly consistent: a successful
    ``ifGenerationMatch=0`` upload is immediately LIST/GET-visible and
    losers observe 412, never partial data.
    """

    def __init__(self, bucket: str, client=None) -> None:
        if client is None:
            try:
                from google.cloud import storage  # type: ignore[import-not-found]
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "GCSObjectStore needs google-cloud-storage (pip install "
                    "google-cloud-storage) or an explicit client with the "
                    "bucket(name).blob(key) surface"
                ) from exc
            client = storage.Client()
        self._bucket = client.bucket(bucket)
        self.bucket = bucket

    @staticmethod
    def _key(key: str) -> str:
        return key.lstrip("/")

    @staticmethod
    def _status(exc) -> int | None:
        """HTTP status from an api_core-shaped error — duck-typed (the
        google.api_core GoogleAPICallError carries ``.code``)."""
        code = getattr(exc, "code", None)
        return code if isinstance(code, int) else None

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> str:
        blob = self._bucket.blob(self._key(key))
        kwargs = {}
        if if_none_match:
            kwargs["if_generation_match"] = 0  # create-only precondition
        try:
            blob.upload_from_string(data, **kwargs)
        except Exception as exc:  # noqa: BLE001 - api_core shape, see _status
            if self._status(exc) == 412 or type(exc).__name__ == "PreconditionFailed":
                raise PreconditionFailedError(key) from exc
            raise
        return str(getattr(blob, "generation", "") or "")

    def get(self, key: str) -> bytes:
        return self._bucket.blob(self._key(key)).download_as_bytes()

    def head(self, key: str) -> str | None:
        blob = self._bucket.blob(self._key(key))
        try:
            blob.reload()
        except Exception as exc:  # noqa: BLE001 - api_core shape, see _status
            if self._status(exc) == 404 or type(exc).__name__ == "NotFound":
                return None
            raise
        return str(getattr(blob, "generation", "") or "")


class AzureBlobObjectStore(ObjectStoreClient):
    """azure-storage-blob-semantics client for the commit path.

    Maps the 3-method contract onto Azure Blob Storage: ``put`` with
    ``if_none_match`` issues ``upload_blob(..., overwrite=False)``, which
    the SDK sends as ``Put Blob`` + ``If-None-Match: *`` — Azure rejects
    it with 409 ``BlobAlreadyExists`` when the blob is live (Azure's
    equivalent of the S3/GCS 412). Both shapes map to
    :class:`PreconditionFailedError`; ``head`` maps 404 → None.

    The SDK is NOT imported at module import time: pass any client with
    the ``ContainerClient`` surface (``upload_blob`` /
    ``download_blob(key).readall`` / ``get_blob_properties``); tests use
    a filesystem-backed fake raising azure-core-shaped errors. The
    constructor builds a real ``ContainerClient`` from a connection
    string only when no client is passed.
    """

    def __init__(self, container: str, client=None,
                 connection_string: str | None = None) -> None:
        if client is None:
            try:
                from azure.storage.blob import (  # type: ignore[import-not-found]
                    ContainerClient,
                )
            except ImportError as exc:  # pragma: no cover - env-dependent
                raise ImportError(
                    "AzureBlobObjectStore needs azure-storage-blob (pip "
                    "install azure-storage-blob) or an explicit client with "
                    "the ContainerClient surface"
                ) from exc
            if not connection_string:
                raise ValueError(
                    "AzureBlobObjectStore needs a connection_string when no "
                    "client is passed"
                )
            client = ContainerClient.from_connection_string(
                connection_string, container)
        self._cc = client
        self.container = container

    @staticmethod
    def _key(key: str) -> str:
        return key.lstrip("/")

    @staticmethod
    def _status(exc) -> tuple[int | None, str | None]:
        """(HTTP status, error code) from an azure-core-shaped error —
        duck-typed (HttpResponseError carries .status_code/.error_code)."""
        status = getattr(exc, "status_code", None)
        code = getattr(exc, "error_code", None)
        return (status if isinstance(status, int) else None,
                str(code) if code is not None else None)

    @staticmethod
    def _etag(props) -> str:
        return str(getattr(props, "etag", None)
                   or (props or {}).get("etag", "")).strip('"')

    def put(self, key: str, data: bytes, if_none_match: bool = False) -> str:
        try:
            props = self._cc.upload_blob(
                name=self._key(key), data=data, overwrite=not if_none_match)
        except Exception as exc:  # noqa: BLE001 - azure-core shape, see _status
            status, code = self._status(exc)
            if (status in (409, 412)
                    or code in ("BlobAlreadyExists", "ConditionNotMet")
                    or type(exc).__name__ == "ResourceExistsError"):
                raise PreconditionFailedError(key) from exc
            raise
        return self._etag(props)

    def get(self, key: str) -> bytes:
        return self._cc.download_blob(self._key(key)).readall()

    def head(self, key: str) -> str | None:
        try:
            props = self._cc.get_blob_properties(self._key(key))
        except Exception as exc:  # noqa: BLE001 - azure-core shape, see _status
            status, code = self._status(exc)
            if (status == 404 or code == "BlobNotFound"
                    or type(exc).__name__ == "ResourceNotFoundError"):
                return None
            raise
        return self._etag(props)
