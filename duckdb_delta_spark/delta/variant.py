"""Parquet Variant binary codec + shredded-write transform.

Write-side half of Delta "Variant Shredding" (PROTOCOL.md; the read side
— reassembling {metadata, value, typed_value} layouts — already rides
Spark's vectorized reader, see delta/snapshot.py reader features). A
shredded file stores each variant column as a struct:

    v: {metadata: binary, value: binary,
        typed_value: {f1: {value: binary, typed_value: T1}, ...}}

where ``typed_value.f.typed_value`` holds field ``f`` when it decodes as
the declared scalar type, ``typed_value.f.value`` (field residual) holds
it when it does not, and the object-level ``value`` carries the residual
object of all non-shredded fields. The row's ``metadata`` dictionary is
passed through UNCHANGED — residual objects reference the original field
ids, exactly as the spec requires.

The codec here parses the general Parquet Variant encoding (all header
widths, large objects/arrays) and re-encodes ONLY residual objects; leaf
bytes are sliced from the input verbatim, never re-encoded — so
round-trip fidelity is byte-exact for untouched fields. Deliberately
independent of ``testing/foreign.py``'s fixture encoder: tests cross-check
this writer's bytes against that spec-derived encoder, not against itself.

Scale shape: the shredding kernel is an Arrow-batched ``mapInPandas``
transform (one pass, embarrassingly parallel, no shuffle) — the same
documented Python-kernel seam as the multimodal decoders. Everything
before and after (conformance, write job, stats, commit) stays JVM-side.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# ---------------------------------------------------------------- decoding

#: primitive type_id → (struct fmt, python kind); sizes implied by fmt
_PRIMITIVE_FIXED = {
    3: ("<b", "long"), 4: ("<h", "long"), 5: ("<i", "long"),
    6: ("<q", "long"), 7: ("<d", "double"), 14: ("<f", "double"),
}
_PRIMITIVE_SIZES = {  # type_id → payload size for non-extracted scalars
    0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 4, 6: 8, 7: 8,
    8: 5, 9: 9, 10: 17, 11: 4, 12: 8, 13: 8, 14: 4,
    17: 8, 18: 8, 19: 8, 20: 16,
}


def parse_metadata(meta: bytes) -> list[str]:
    """Dictionary strings of a variant metadata buffer (any offset size)."""
    header = meta[0]
    if header & 0x0F != 1:
        raise ValueError(f"unsupported variant metadata version {header & 0x0F}")
    off_sz = ((header >> 6) & 0x3) + 1
    pos = 1

    def read_uint(p: int) -> int:
        return int.from_bytes(meta[p:p + off_sz], "little")

    n = read_uint(pos)
    pos += off_sz
    offs = [read_uint(pos + i * off_sz) for i in range(n + 1)]
    base = pos + (n + 1) * off_sz
    return [meta[base + offs[i]:base + offs[i + 1]].decode() for i in range(n)]


def _uint(buf: bytes, pos: int, size: int) -> int:
    return int.from_bytes(buf[pos:pos + size], "little")


def value_size(buf: bytes, pos: int = 0) -> int:
    """Total encoded size of the value starting at ``pos``."""
    b = buf[pos]
    basic = b & 0x3
    h = b >> 2
    if basic == 1:  # short string
        return 1 + h
    if basic == 0:  # primitive
        if h in (15, 16):  # binary / string: 4-byte length prefix
            return 1 + 4 + _uint(buf, pos + 1, 4)
        try:
            return 1 + _PRIMITIVE_SIZES[h]
        except KeyError:
            raise ValueError(f"unknown variant primitive type {h}") from None
    if basic == 2:  # object
        id_sz = ((h >> 2) & 0x3) + 1
        off_sz = (h & 0x3) + 1
        n_sz = 4 if (h >> 4) & 1 else 1
        n = _uint(buf, pos + 1, n_sz)
        header = 1 + n_sz + n * id_sz + (n + 1) * off_sz
        data_len = _uint(buf, pos + 1 + n_sz + n * id_sz + n * off_sz, off_sz)
        return header + data_len
    # array
    off_sz = (h & 0x3) + 1
    n_sz = 4 if (h >> 2) & 1 else 1
    n = _uint(buf, pos + 1, n_sz)
    header = 1 + n_sz + (n + 1) * off_sz
    data_len = _uint(buf, pos + 1 + n_sz + n * off_sz, off_sz)
    return header + data_len


def object_fields(buf: bytes) -> dict[int, bytes] | None:
    """{field_id: encoded child bytes} when ``buf`` encodes an object,
    else None. Child bytes are verbatim slices of the input. Offsets are
    per-field START positions (they need not be laid out in field order),
    so each child's extent comes from :func:`value_size`, not from the
    next offset; the final offset is only the total data length."""
    b = buf[0]
    if b & 0x3 != 2:
        return None
    h = b >> 2
    id_sz = ((h >> 2) & 0x3) + 1
    off_sz = (h & 0x3) + 1
    n_sz = 4 if (h >> 4) & 1 else 1
    n = _uint(buf, 1, n_sz)
    ids_base = 1 + n_sz
    offs_base = ids_base + n * id_sz
    data_base = offs_base + (n + 1) * off_sz
    out: dict[int, bytes] = {}
    for i in range(n):
        fid = _uint(buf, ids_base + i * id_sz, id_sz)
        lo = data_base + _uint(buf, offs_base + i * off_sz, off_sz)
        out[fid] = buf[lo:lo + value_size(buf, lo)]
    return out


def decode_scalar(buf: bytes):
    """(kind, value) for an encoded leaf; kind ∈ {null, boolean, long,
    double, string, other}. 'other' (decimals, dates, nested, binary …)
    routes the field to the residual, never a lossy coercion."""
    b = buf[0]
    basic = b & 0x3
    h = b >> 2
    if basic == 1:
        return "string", buf[1:1 + h].decode()
    if basic != 0:
        return "other", None
    if h == 0:
        return "null", None
    if h in (1, 2):
        return "boolean", h == 1
    if h in _PRIMITIVE_FIXED:
        fmt, kind = _PRIMITIVE_FIXED[h]
        return kind, struct.unpack_from(fmt, buf, 1)[0]
    if h == 16:
        ln = _uint(buf, 1, 4)
        return "string", buf[5:5 + ln].decode()
    return "other", None


# ---------------------------------------------------------------- encoding

def _pick_size(maxv: int) -> int:
    for sz in (1, 2, 3):
        if maxv < (1 << (8 * sz)):
            return sz
    return 4


def encode_object(fields: dict[int, bytes], names: list[str]) -> bytes:
    """Encode an object from {field_id: child bytes}, minimal header
    widths. The spec requires field ids listed in lexicographic
    field-NAME order (readers binary-search on it), and metadata
    dictionaries are NOT always sorted — so order by ``names[id]``."""
    ids = sorted(fields, key=lambda i: names[i])
    vals = [fields[i] for i in ids]
    offs = [0]
    for v in vals:
        offs.append(offs[-1] + len(v))
    n = len(ids)
    id_sz = _pick_size(max(ids, default=0))
    off_sz = _pick_size(offs[-1])
    large = n > 255
    h = ((1 if large else 0) << 4) | ((id_sz - 1) << 2) | (off_sz - 1)
    out = bytearray([0x02 | (h << 2)])
    out += n.to_bytes(4 if large else 1, "little")
    for i in ids:
        out += i.to_bytes(id_sz, "little")
    for o in offs:
        out += o.to_bytes(off_sz, "little")
    for v in vals:
        out += v
    return bytes(out)


# ----------------------------------------------------------- shred schema

_SCALAR_SPARK = {
    "long": T.LongType(), "bigint": T.LongType(),
    "string": T.StringType(), "double": T.DoubleType(),
    "boolean": T.BooleanType(),
}
_KIND_OF = {"long": "long", "bigint": "long", "string": "string",
            "double": "double", "boolean": "boolean"}


def shredded_struct_type(shred_schema: dict[str, str]) -> T.StructType:
    """Physical parquet type of one shredded variant column."""
    typed = T.StructType([
        T.StructField(f, T.StructType([
            T.StructField("value", T.BinaryType()),
            T.StructField("typed_value", _SCALAR_SPARK[t]),
        ]))
        for f, t in shred_schema.items()
    ])
    return T.StructType([
        T.StructField("metadata", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("typed_value", typed),
    ])


def shred_variant_column(
    df: DataFrame, col: str, shred_schema: dict[str, str]
) -> DataFrame:
    """Replace variant column ``col`` with its shredded physical struct.

    ``shred_schema``: field name → scalar type (long/string/double/
    boolean) — the "dominant scalar type" per field; rows where a field
    decodes differently ride the FIELD residual, fields outside the
    schema ride the OBJECT residual, and a non-object row (bare scalar /
    array) falls back entirely to ``value`` — all spec-legal layouts the
    read path already handles."""
    for t in shred_schema.values():
        if t not in _SCALAR_SPARK:
            raise ValueError(
                f"unsupported shred type {t!r} (one of {sorted(_SCALAR_SPARK)})"
            )
    out_type = shredded_struct_type(shred_schema)
    out_schema = T.StructType([
        T.StructField(f.name, out_type, True) if f.name == col else f
        for f in df.schema.fields
    ])
    targets = {f: _KIND_OF[t] for f, t in shred_schema.items()}

    def shred(batches):
        for pdf in batches:
            shredded = []
            for v in pdf[col]:
                if v is None:
                    shredded.append(None)
                    continue
                meta, val = v.metadata, v.value
                names = parse_metadata(meta)
                ids = {n: i for i, n in enumerate(names)}
                fields = object_fields(val)
                if fields is None:
                    shredded.append(
                        {"metadata": meta, "value": val, "typed_value": None})
                    continue
                typed: dict[str, dict | None] = {}
                for fname, kind in targets.items():
                    fid = ids.get(fname)
                    child = fields.pop(fid, None) if fid is not None else None
                    if child is None:  # field missing from this row
                        typed[fname] = {"value": None, "typed_value": None}
                        continue
                    got_kind, pyval = decode_scalar(child)
                    if got_kind == kind:
                        typed[fname] = {"value": None, "typed_value": pyval}
                    else:  # type mismatch → field residual, bytes verbatim
                        typed[fname] = {"value": child, "typed_value": None}
                resid = encode_object(fields, names) if fields else None
                shredded.append(
                    {"metadata": meta, "value": resid, "typed_value": typed})
            pdf = pdf.copy()
            pdf[col] = shredded
            yield pdf

    return df.mapInPandas(shred, out_schema)
