"""Deletion-vector codec: Z85 + 64-bit RoaringBitmapArray + DV file framing.

The reference applies deletion vectors as per-file boolean selection masks
inside the scan (reference: src/functions/delta_scan/delta_multi_file_reader.cpp:24-48
``DeltaDeleteFilter::Filter``; bitmap fetched via ``ffi::selection_vector_from_dv``,
delta_multi_file_list.cpp:448-462). All protocol mechanics live in
delta-kernel-rs there; here we implement them directly from the public Delta
protocol spec (PROTOCOL.md, "Deletion Vectors" section):

* ``storageType`` ``u``: pathOrInlineDv = ``<optional prefix><20-char Z85 uuid>``,
  bytes live in ``<table>/<prefix>/deletion_vector_<uuid>.bin``.
* ``storageType`` ``i``: pathOrInlineDv = Z85 of the serialized bitmap itself.
* ``storageType`` ``p``: absolute file path.

DV file format (version 1): one version byte, then each DV at its
``offset``: ``<dataSize: int32 BE><data><crc32(data): int32 BE>`` where
``data = <magic 1681511377: int32 LE><portable RoaringBitmapArray>``.

Portable RoaringBitmapArray: ``<n_bitmaps: int64 LE>`` then n standard
32-bit roaring bitmaps (RoaringFormatSpec) with implicit keys 0..n-1; value
``v`` in bitmap ``i`` marks deleted row index ``i * 2^32 + v``.

Z85 here is the ZeroMQ Z85 alphabet (what delta-spark's Base85Codec uses),
*not* Python's ``base64.b85`` alphabet. Inputs whose length is not a
multiple of 4 are zero-padded; decoders truncate using the descriptor's
``sizeInBytes``.

Everything decodes to/encodes from sorted ``numpy.uint64`` arrays so scan-side
filtering is a vectorized ``searchsorted``, not per-row Python.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

import numpy as np

from duckdb_delta_spark.delta.errors import DeletionVectorError

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096


def z85_encode(data: bytes) -> str:
    """Z85-encode ``data`` (zero-padded to a multiple of 4 bytes)."""
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        (block,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[block % 85])
            block //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeletionVectorError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        block = 0
        for ch in text[i : i + 5]:
            try:
                block = block * 85 + _Z85_DECODE[ch]
            except KeyError:
                raise DeletionVectorError(f"invalid Z85 character {ch!r}") from None
        out += struct.pack(">I", block)
    return bytes(out)


def _decode_roaring32(buf: memoryview, base: int) -> np.ndarray:
    """Decode one standard 32-bit roaring bitmap starting at ``base``.

    Returns (values: uint32 ndarray, bytes_consumed).
    """
    (cookie,) = struct.unpack_from("<I", buf, base)
    pos = base + 4
    run_bitset = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n_containers = (cookie >> 16) + 1
        nbytes = (n_containers + 7) // 8
        run_bitset = bytes(buf[pos : pos + nbytes])
        pos += nbytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos)
        pos += 4
        has_offsets = True
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")

    keys = np.empty(n_containers, dtype=np.uint32)
    cards = np.empty(n_containers, dtype=np.int64)
    for i in range(n_containers):
        k, c_minus_1 = struct.unpack_from("<HH", buf, pos)
        keys[i] = k
        cards[i] = c_minus_1 + 1
        pos += 4
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for sequential decode

    chunks: list[np.ndarray] = []
    for i in range(n_containers):
        card = int(cards[i])
        hi = np.uint32(keys[i]) << np.uint32(16)
        is_run = bool(run_bitset) and (run_bitset[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, dtype="<u2", count=2 * n_runs, offset=pos).reshape(
                -1, 2
            )
            pos += 4 * n_runs
            vals = np.concatenate(
                [
                    np.arange(int(s), int(s) + int(l) + 1, dtype=np.uint32)
                    for s, l in runs
                ]
            ) if n_runs else np.empty(0, dtype=np.uint32)
        elif card <= _ARRAY_MAX_CARD:
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(
                np.uint32
            )
            pos += 2 * card
        else:
            words = np.frombuffer(buf, dtype="<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(words.view(np.uint8), bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        chunks.append(vals | hi)
    values = np.concatenate(chunks) if chunks else np.empty(0, dtype=np.uint32)
    return values, pos - base


def _encode_roaring32(values: np.ndarray) -> bytes:
    """Encode sorted unique uint32 values as a standard roaring bitmap
    (array/bitmap containers, cookie 12346 — what most writers emit)."""
    values = np.asarray(values, dtype=np.uint32)
    hi = (values >> np.uint32(16)).astype(np.uint16)
    lo = (values & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(hi, return_index=True)
    bounds = list(starts) + [len(values)]
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    desc = b""
    bodies: list[bytes] = []
    for i, k in enumerate(keys):
        vals = lo[bounds[i] : bounds[i + 1]]
        card = len(vals)
        desc += struct.pack("<HH", int(k), card - 1)
        if card <= _ARRAY_MAX_CARD:
            bodies.append(vals.astype("<u2").tobytes())
        else:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[vals] = 1
            bodies.append(np.packbits(bits, bitorder="little").tobytes())
    # offset header (always present for cookie 12346)
    off = len(header) + len(desc) + 4 * len(keys)
    offsets = b""
    for body in bodies:
        offsets += struct.pack("<I", off)
        off += len(body)
    return header + desc + offsets + b"".join(bodies)


def serialize_bitmap(row_indexes: np.ndarray) -> bytes:
    """Serialize sorted unique uint64 row indexes as magic + portable
    RoaringBitmapArray (the ``data`` payload of a DV)."""
    row_indexes = np.asarray(row_indexes, dtype=np.uint64)
    if len(row_indexes) == 0:
        n_bitmaps = 0
        payload = b""
    else:
        hi32 = (row_indexes >> np.uint64(32)).astype(np.uint32)
        lo32 = (row_indexes & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        n_bitmaps = int(hi32.max()) + 1
        parts = []
        for key in range(n_bitmaps):
            mask = hi32 == key
            parts.append(_encode_roaring32(lo32[mask]))
        payload = b"".join(parts)
    return struct.pack("<I", DV_MAGIC) + struct.pack("<Q", n_bitmaps) + payload


def deserialize_bitmap(data: bytes) -> np.ndarray:
    """Inverse of :func:`serialize_bitmap` → sorted uint64 row indexes."""
    if len(data) < 12:
        raise DeletionVectorError("DV payload too short")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != DV_MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<Q", data, 4)
    buf = memoryview(data)
    pos = 12
    out: list[np.ndarray] = []
    for key in range(n_bitmaps):
        try:
            vals, consumed = _decode_roaring32(buf, pos)
        except (struct.error, ValueError) as e:
            # an overclaimed n_bitmaps / truncated payload must surface
            # as the module's own error naming where it broke, not a raw
            # struct.error from an executor with no context
            raise DeletionVectorError(
                f"corrupt DV payload: bitmap {key + 1}/{n_bitmaps} at "
                f"byte {pos} of {len(data)}: {e}") from None
        pos += consumed
        if len(vals):
            out.append(vals.astype(np.uint64) | (np.uint64(key) << np.uint64(32)))
    if not out:
        return np.empty(0, dtype=np.uint64)
    res = np.concatenate(out)
    res.sort()
    return res


def dv_file_path(table_path: str, descriptor: dict) -> str:
    """Filesystem path of a file-backed (``u``/``p``) DV descriptor."""
    storage = descriptor["storageType"]
    if storage == "u":
        path_part = descriptor["pathOrInlineDv"]
        prefix, uuid_b85 = path_part[:-20], path_part[-20:]
        uid = _uuid.UUID(bytes=z85_decode(uuid_b85)[:16])
        dirname = os.path.join(table_path, prefix) if prefix else table_path
        return os.path.join(dirname, f"deletion_vector_{uid}.bin")
    if storage == "p":
        return descriptor["pathOrInlineDv"]
    raise DeletionVectorError(f"DV storageType {storage!r} has no file path")


def read_dv_from_descriptor(descriptor: dict, table_path: str) -> np.ndarray:
    """Resolve a DeletionVectorDescriptor (the ``add.deletionVector`` struct)
    to the sorted uint64 array of deleted row indexes."""
    storage = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if storage == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
        return deserialize_bitmap(data)
    if storage in ("u", "p"):
        path = dv_file_path(table_path, descriptor)
    else:
        raise DeletionVectorError(f"unknown DV storageType {storage!r}")
    # the spec's offset is optional (data follows the version byte when
    # absent); an EXPLICIT value must be honored, not coerced — `or 1`
    # would silently rewrite a (corrupt) offset 0 to 1 and misread
    raw_off = descriptor.get("offset")
    offset = 1 if raw_off is None else int(raw_off)
    with open(path, "rb") as f:
        raw = f.read()
    if not raw or raw[0] != 1:
        raise DeletionVectorError(f"unsupported DV file version in {path}")
    if offset < 1 or offset + 4 > len(raw):
        raise DeletionVectorError(
            f"DV descriptor offset {offset} is outside file {path} "
            f"({len(raw)} bytes)")
    (data_size,) = struct.unpack_from(">i", raw, offset)
    if data_size < 0 or offset + 4 + data_size + 4 > len(raw):
        raise DeletionVectorError(
            f"DV dataSize {data_size} at offset {offset} extends past "
            f"the end of {path} ({len(raw)} bytes) — truncated or "
            "corrupt DV file")
    data = raw[offset + 4 : offset + 4 + data_size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + data_size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise DeletionVectorError(f"DV checksum mismatch in {path}")
    return deserialize_bitmap(data)


def write_dv_file(
    table_path: str, bitmaps: list[np.ndarray], seed: str | None = None
) -> list[dict]:
    """Write one on-disk DV file holding one DV per entry of ``bitmaps``.

    Returns one DeletionVectorDescriptor dict per bitmap (storageType ``u``).
    Used by the writer/fixture layer; the reference only *reads* DVs.
    ``seed`` makes the (otherwise input-deterministic) filename unique —
    required when repeated deletes may write the same bitmap count, else
    the second write would clobber a file older versions still reference.
    """
    uid = _uuid.uuid5(
        _uuid.NAMESPACE_URL, f"dv:{table_path}:{seed or len(bitmaps)}"
    )
    fname = f"deletion_vector_{uid}.bin"
    blob = bytearray(b"\x01")
    descriptors = []
    for rows in bitmaps:
        rows = np.asarray(rows, dtype=np.uint64)
        data = serialize_bitmap(rows)
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descriptors.append(
            {
                "storageType": "u",
                "pathOrInlineDv": z85_encode(uid.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
                "cardinality": int(len(rows)),
            }
        )
    with open(os.path.join(table_path, fname), "wb") as f:
        f.write(bytes(blob))
    return descriptors


def inline_dv_descriptor(row_indexes: np.ndarray) -> dict:
    """Build an inline (storageType ``i``) descriptor for small DVs."""
    rows = np.asarray(row_indexes, dtype=np.uint64)
    data = serialize_bitmap(rows)
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data),
        "sizeInBytes": len(data),
        "cardinality": int(len(rows)),
    }
