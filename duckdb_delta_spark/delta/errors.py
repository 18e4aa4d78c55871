"""Error taxonomy.

Mirrors the reference's kernel-error-code → engine-exception mapping
(reference: src/delta_utils.cpp:767-820 ``KernelErrorEnumToString`` and the
golden messages in test/sql/main/test_error_messages.test:11-14), as a small
Python exception hierarchy. Each error carries a stable ``kind`` string so
callers (and tests) can match on taxonomy rather than message text.
"""

from __future__ import annotations


class DeltaError(Exception):
    """Base class for all engine errors."""

    kind = "DeltaError"

    def __init__(self, message: str):
        super().__init__(f"{self.kind}: {message}")
        self.message = message


class InvalidTableLocationError(DeltaError):
    """Path does not exist or holds no ``_delta_log`` directory."""

    kind = "InvalidTableLocationError"


class InvalidTableVersionError(DeltaError):
    """Requested time-travel version does not exist in the log."""

    kind = "InvalidTableVersionError"


class MalformedLogError(DeltaError):
    """A commit file could not be parsed, or the log has version gaps."""

    kind = "MalformedLogError"


class MissingVersionError(DeltaError):
    """The log is non-contiguous (a commit file is missing)."""

    kind = "MissingVersionError"


class SchemaError(DeltaError):
    """schemaString missing/unparseable, or column-mapping metadata broken."""

    kind = "SchemaError"


class UnsupportedFeatureError(DeltaError):
    """Protocol reader/writer feature beyond what this engine supports.

    The reference raises the same way for e.g. Change Data Feed
    (reference: src/delta_utils.cpp:805-806).
    """

    kind = "UnsupportedFeatureError"


class CommitConflictError(DeltaError):
    """Optimistic-concurrency failure: target ``N.json`` already exists.

    Reference analogue: commit-conflict error path in
    src/storage/delta_transaction_manager.cpp:20-32 (``HandleConflict``).
    """

    kind = "CommitConflictError"


class ConstraintViolationError(DeltaError):
    """NOT NULL (or other) constraint rejected an insert.

    Reference analogue: src/storage/delta_insert.cpp:186-203.
    """

    kind = "ConstraintViolationError"


class IdempotencyError(DeltaError):
    """Transaction app-version check failed on commit.

    Reference analogue: src/storage/delta_transaction.cpp:415-462.
    """

    kind = "IdempotencyError"


class TransactionError(DeltaError):
    """Generic transaction-lifecycle misuse (e.g. reading own uncommitted
    writes, reference: src/storage/delta_table_entry.cpp:50-52)."""

    kind = "TransactionError"


class DeletionVectorError(DeltaError):
    """Deletion-vector bytes failed checksum/format validation."""

    kind = "DeletionVectorError"
