"""Hand-authored *foreign* Delta fixtures — the spec-interop gate.

Every other fixture in this repo is produced by its own ``DeltaWriter``, so
a self-consistent spec deviation (DV bit layout, checkpoint shape,
column-mapping metadata, path encoding) would be invisible: writer and
reader would agree with each other while both disagree with the spec.
These builders author tables the way OTHER engines lay them out —
delta-spark-style commit JSON (``engineInfo`` stamped, stats as JSON
strings, URL-encoded paths, Hive-escaped partition dirs), a classic
checkpoint parquet in delta-spark's column shape, and deletion-vector
bytes derived field-by-field from the published spec — using ONLY
``json``/``struct``/``pyarrow``, never ``DeltaWriter`` or the encoders in
``delta.dv``.

Reference analogue: the DAT suite and kernel golden tables play exactly
this role for the reference engine
(/root/reference/test/sql/dat/all.test:14-27,
 /root/reference/test/sql/golden_tests/generated.test:12-28). No
third-party Delta implementation is installable in this sandbox, so the
fixtures are derived from the public Delta protocol spec (PROTOCOL.md:
"Deletion Vectors", "Checkpoints", "Column Mapping", "File Paths") and the
public RoaringFormatSpec, with the derivation inline in comments.
"""

from __future__ import annotations

import json
import os
import struct
import urllib.parse
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# ---------------------------------------------------------------------------
# Independent spec encoders (deliberately NOT imported from delta.dv)
# ---------------------------------------------------------------------------

# ZeroMQ Z85 alphabet (https://rfc.zeromq.org/spec/32/) — what
# delta-spark's Base85Codec uses for DV uuids and inline bitmaps.
_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)


def z85(data: bytes) -> str:
    """Z85 per the ZeroMQ spec: 4-byte big-endian blocks → 5 chars,
    most significant digit first. Zero-pad to a 4-byte multiple."""
    data = data + b"\x00" * ((-len(data)) % 4)
    out = []
    for i in range(0, len(data), 4):
        (block,) = struct.unpack(">I", data[i : i + 4])
        digits = []
        for _ in range(5):
            digits.append(_Z85[block % 85])
            block //= 85
        out.extend(reversed(digits))
    return "".join(out)


def roaring32_array(values: list[int]) -> bytes:
    """One standard 32-bit roaring bitmap, array containers only
    (RoaringFormatSpec): cookie 12346 (int32 LE) + container count
    (int32 LE) + per-container <key:uint16 LE><card-1:uint16 LE> +
    offset header (int32 LE each, mandatory for cookie 12346) + sorted
    uint16 LE container payloads."""
    values = sorted(set(values))
    buckets: dict[int, list[int]] = {}
    for v in values:
        buckets.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(buckets)
    out = struct.pack("<II", 12346, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(buckets[k]) - 1)
    off = len(out) + 4 * len(keys)
    payloads = []
    for k in keys:
        body = b"".join(struct.pack("<H", v) for v in buckets[k])
        out += struct.pack("<I", off)
        payloads.append(body)
        off += len(body)
    return out + b"".join(payloads)


def roaring32_runs(runs: list[tuple[int, int]]) -> bytes:
    """One 32-bit roaring bitmap with a single RUN container covering
    ``runs`` = [(start16, length)] within key 0 — the shape
    ``runOptimize()``'d foreign bitmaps take. Format (RoaringFormatSpec,
    run cookie): <cookie 12347 | (count-1)<<16 : int32 LE>
    <run flag bitset: ceil(count/8) bytes> (no offset header below 4
    containers) <n_runs: uint16 LE> <start:uint16 LE><len-1... NO:
    length field is 'number of elements - 1' per spec> per run."""
    n_containers = 1
    cookie = 12347 | ((n_containers - 1) << 16)
    out = struct.pack("<I", cookie)
    out += bytes([0b1])  # container 0 is a run container
    card = sum(l + 1 for _, l in runs)
    out += struct.pack("<HH", 0, card - 1)  # key 0, cardinality-1
    out += struct.pack("<H", len(runs))
    for start, length in runs:
        out += struct.pack("<HH", start, length)
    return out


def dv_payload(bitmaps: list[bytes]) -> bytes:
    """DV ``data`` payload (PROTOCOL.md "Deletion Vector Format"):
    <magic 1681511377: int32 LE> <n_bitmaps: int64 LE> then the 32-bit
    bitmaps with implicit keys 0..n-1 (value v in bitmap i marks row
    i*2^32 + v)."""
    return (
        struct.pack("<I", 1681511377)
        + struct.pack("<q", len(bitmaps))
        + b"".join(bitmaps)
    )


def write_dv_file(
    table_dir: str, payloads: list[bytes], prefix: str = ""
) -> list[dict]:
    """On-disk DV file, spec framing: one version byte (1), then each DV
    at its descriptor ``offset``: <dataSize: int32 BE> <data>
    <crc32(data): int32 BE>. Returns storageType-``u`` descriptors whose
    ``pathOrInlineDv`` is ``<prefix><z85(16-byte uuid)>`` (20 chars of
    Z85 for the uuid; optional random prefix dir, delta-spark's
    ``randomPrefixLength``). ``cardinality`` must be set by the caller
    on the returned dicts (it is part of the descriptor, not the file)."""
    uid = uuid.uuid4()
    blob = bytearray(b"\x01")
    descs = []
    for data in payloads:
        offset = len(blob)
        blob += struct.pack(">i", len(data))
        blob += data
        blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        descs.append(
            {
                "storageType": "u",
                "pathOrInlineDv": prefix + z85(uid.bytes),
                "offset": offset,
                "sizeInBytes": len(data),
            }
        )
    dirname = os.path.join(table_dir, prefix) if prefix else table_dir
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, f"deletion_vector_{uid}.bin"), "wb") as f:
        f.write(bytes(blob))
    return descs


# ---------------------------------------------------------------------------
# delta-spark-layout log authoring
# ---------------------------------------------------------------------------

ENGINE_INFO = "Apache-Spark/3.5.1 Delta-Lake/3.2.0"


def hive_escape(value: str) -> str:
    """Hive partition-directory escaping (what delta-spark uses for
    physical partition dir names): percent-encode the chars Hive
    reserves. The add.path URL-encoding is applied ON TOP of this."""
    reserved = '"#%\'*/:=?\\{}[]^ \x7f'
    out = []
    for ch in value:
        if ch in reserved or ord(ch) < 0x20:
            out.append("%%%02X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def commit_info(operation: str) -> dict:
    return {
        "commitInfo": {
            "timestamp": 1_700_000_000_000,
            "operation": operation,
            "operationParameters": {},
            "engineInfo": ENGINE_INFO,
            "txnId": str(uuid.uuid4()),
        }
    }


def spark_field(name: str, typ: str, field_id: int | None = None,
                physical: str | None = None) -> dict:
    """Schema field in delta-spark's schemaString layout; with column
    mapping, per-field metadata carries delta.columnMapping.id +
    .physicalName (PROTOCOL.md "Column Mapping")."""
    meta: dict = {}
    if field_id is not None:
        meta["delta.columnMapping.id"] = field_id
        meta["delta.columnMapping.physicalName"] = physical
    return {"name": name, "type": typ, "nullable": True, "metadata": meta}


def write_commit(log_dir: str, version: int, actions: list[dict]) -> None:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")


def stats_json(tbl: pa.Table, cols: list[str]) -> str:
    """delta-spark-shape stats string: numRecords first, then
    minValues/maxValues/nullCount objects."""
    mins, maxs, nulls = {}, {}, {}
    for c in cols:
        col = tbl.column(c)
        nulls[c] = col.null_count
        if col.length() - col.null_count > 0:
            import pyarrow.compute as pc

            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            if hasattr(mn, "isoformat"):
                mn, mx = mn.isoformat(), mx.isoformat()
            mins[c], maxs[c] = mn, mx
    return json.dumps(
        {"numRecords": tbl.num_rows, "minValues": mins,
         "maxValues": maxs, "nullCount": nulls},
        separators=(",", ":"), default=str,
    )


def add_action(rel_path: str, full_path: str, tbl: pa.Table,
               partition_values: dict, stats_cols: list[str],
               dv: dict | None = None) -> dict:
    """delta-spark-shape add: path URL-encoded (PROTOCOL.md "File Paths":
    RFC 2396 relative path), partitionValues as a string map, stats as a
    JSON string."""
    add = {
        "path": urllib.parse.quote(rel_path, safe="/=-_.~"),
        "partitionValues": {k: (None if v is None else str(v))
                            for k, v in partition_values.items()},
        "size": os.path.getsize(full_path),
        "modificationTime": 1_700_000_000_000,
        "dataChange": True,
        "stats": stats_json(tbl, stats_cols),
    }
    if dv is not None:
        add["deletionVector"] = dv
    return {"add": add}


def part_file_name(index: int) -> str:
    return f"part-{index:05d}-{uuid.uuid4()}-c000.snappy.parquet"


# ---------------------------------------------------------------------------
# classic checkpoint parquet, delta-spark column shape
# ---------------------------------------------------------------------------

_STR_MAP = pa.map_(pa.string(), pa.string())
_DV_STRUCT = pa.struct(
    [("storageType", pa.string()), ("pathOrInlineDv", pa.string()),
     ("offset", pa.int32()), ("sizeInBytes", pa.int32()),
     ("cardinality", pa.int64())]
)
_CHECKPOINT_SCHEMA = pa.schema(
    [
        ("txn", pa.struct([("appId", pa.string()), ("version", pa.int64()),
                           ("lastUpdated", pa.int64())])),
        ("add", pa.struct([
            ("path", pa.string()), ("partitionValues", _STR_MAP),
            ("size", pa.int64()), ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()), ("stats", pa.string()),
            ("tags", _STR_MAP), ("deletionVector", _DV_STRUCT),
        ])),
        ("remove", pa.struct([
            ("path", pa.string()), ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
            ("extendedFileMetadata", pa.bool_()),
            ("partitionValues", _STR_MAP), ("size", pa.int64()),
            ("deletionVector", _DV_STRUCT),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()), ("name", pa.string()),
            ("description", pa.string()),
            ("format", pa.struct([("provider", pa.string()),
                                  ("options", _STR_MAP)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", _STR_MAP), ("createdTime", pa.int64()),
        ])),
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ])),
    ]
)


def write_classic_checkpoint(log_dir: str, version: int,
                             actions: list[dict]) -> None:
    """``<v>.checkpoint.parquet`` + ``_last_checkpoint``, one column per
    action type (delta-spark's classic single-part shape; map-typed
    partitionValues/configuration, stats as string)."""
    rows = []
    for a in actions:
        (key, val), = a.items()
        if key == "commitInfo":
            continue
        row = {c: None for c in _CHECKPOINT_SCHEMA.names}
        val = dict(val)
        if key in ("add", "remove") and "partitionValues" in val:
            val["partitionValues"] = list(
                (val["partitionValues"] or {}).items())
        if key == "metaData":
            val["configuration"] = list((val.get("configuration") or {}).items())
            fmt = dict(val.get("format") or {})
            fmt["options"] = list((fmt.get("options") or {}).items())
            val["format"] = fmt
        row[key] = val
        rows.append(row)
    tbl = pa.Table.from_pylist(rows, schema=_CHECKPOINT_SCHEMA)
    pq.write_table(tbl, os.path.join(
        log_dir, f"{version:020d}.checkpoint.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)


# ---------------------------------------------------------------------------
# the full foreign table used by queries()/oracle
# ---------------------------------------------------------------------------


def build_foreign_part(dest: str, sf_dir: str) -> None:
    """A delta-spark-layout table over ``part.parquet``, exercising in one
    place everything a foreign writer would produce:

    * hive-escaped partition dirs (``p_brand=Brand%2313``) with add.path
      URL-encoded ON TOP (``Brand%252313``)
    * stats as JSON strings, partitionValues as string maps
    * a spec-framed DV file (independent encoder) deleting every
      ``p_partkey % 7 == 0`` row — so the oracle is
      ``WHERE p_partkey % 7 <> 0`` over raw parquet
    * a classic checkpoint parquet at version 2 + _last_checkpoint
    * a post-checkpoint JSON commit (version 3)
    * a remove tombstone for a compacted-away file

    Semantics: rows of ``part`` with ``p_size <= 40`` (v3 re-adds what the
    tombstoned file held), minus the ``% 7`` DV rows on every live file.
    """
    src = pq.read_table(os.path.join(sf_dir, "part.parquet"))
    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            spark_field("p_partkey", "long"),
            spark_field("p_name", "string"),
            spark_field("p_brand", "string"),
            spark_field("p_size", "integer"),
            spark_field("p_retailprice", "double"),
        ],
    }, separators=(",", ":"))
    cols = ["p_partkey", "p_name", "p_brand", "p_size", "p_retailprice"]
    src = src.select(cols)
    meta = {
        "metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_part")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": ["p_brand"],
            "configuration": {},
            "createdTime": 1_700_000_000_000,
        }
    }
    proto = {
        "protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["appendOnly", "invariants",
                               "deletionVectors"],
        }
    }
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    import pyarrow.compute as pc

    brands = sorted(set(src.column("p_brand").to_pylist()))
    stats_cols = ["p_partkey", "p_name", "p_size", "p_retailprice"]

    def _write_part_file(tbl: pa.Table, brand: str, index: int):
        rel_dir = f"p_brand={hive_escape(brand)}"
        os.makedirs(os.path.join(dest, rel_dir), exist_ok=True)
        rel = f"{rel_dir}/{part_file_name(index)}"
        data = tbl.drop_columns(["p_brand"])
        pq.write_table(data, os.path.join(dest, rel))
        return rel, data

    # v1: one file per brand, p_size <= 25
    adds_v1, file_rows = [], {}
    lo = src.filter(pc.less_equal(src.column("p_size"), 25))
    for i, b in enumerate(brands):
        tbl = lo.filter(pc.equal(lo.column("p_brand"), b))
        if tbl.num_rows == 0:
            continue
        rel, data = _write_part_file(tbl, b, i)
        adds_v1.append(add_action(rel, os.path.join(dest, rel), data,
                                  {"p_brand": b}, stats_cols))
        file_rows[rel] = tbl
    write_commit(log_dir, 1, [commit_info("WRITE"), *adds_v1])

    # v2: a small file that v3 "compacts" away (remove + re-add), then
    # the classic checkpoint snapshotting v0..v2
    mid = src.filter(
        pc.and_(pc.greater(src.column("p_size"), 25),
                pc.less_equal(src.column("p_size"), 40)))
    b0 = brands[0]
    mid0 = mid.filter(pc.equal(mid.column("p_brand"), b0))
    rel_tmp, data_tmp = _write_part_file(mid0, b0, 90)
    add_tmp = add_action(rel_tmp, os.path.join(dest, rel_tmp), data_tmp,
                         {"p_brand": b0}, stats_cols)
    write_commit(log_dir, 2, [commit_info("WRITE"), add_tmp])
    write_classic_checkpoint(
        log_dir, 2, [proto, meta, *adds_v1, add_tmp])

    # v3: compaction-style remove of the v2 file + one replacement file
    # per remaining brand for the 25 < p_size <= 40 slice, each carrying
    # a DV that deletes its p_partkey % 7 == 0 rows. v1 files get DV'd
    # via remove+re-add (how foreign engines commit DV updates).
    actions_v3: list[dict] = [commit_info("OPTIMIZE")]
    actions_v3.append({"remove": {
        "path": urllib.parse.quote(rel_tmp, safe="/=-_.~"),
        "deletionTimestamp": 1_700_000_100_000, "dataChange": False,
        "extendedFileMetadata": True, "partitionValues": {"p_brand": b0},
        "size": os.path.getsize(os.path.join(dest, rel_tmp)),
    }})
    new_files: list[tuple[str, pa.Table, dict]] = []
    for i, b in enumerate(brands):
        tbl = mid.filter(pc.equal(mid.column("p_brand"), b))
        if tbl.num_rows == 0:
            continue
        rel, data = _write_part_file(tbl, b, 100 + i)
        new_files.append((rel, data, {"p_brand": b}))
    for rel, tbl in file_rows.items():
        new_files.append((rel, tbl.drop_columns(["p_brand"]),
                          dict(zip(["p_brand"],
                                   [tbl.column("p_brand")[0].as_py()]))))

    payloads, cards, with_dv = [], [], []
    for rel, data, pvals in new_files:
        keys = np.asarray(data.column("p_partkey").to_pylist())
        idx = np.nonzero(keys % 7 == 0)[0]
        if len(idx) == 0:
            continue
        # exercise both container kinds: runs when indexes are contiguous
        if len(idx) > 1 and np.all(np.diff(idx) == 1) and idx[-1] < 65536:
            payloads.append(dv_payload(
                [roaring32_runs([(int(idx[0]), int(len(idx) - 1))])]))
        else:
            payloads.append(dv_payload([roaring32_array(idx.tolist())]))
        cards.append(len(idx))
        with_dv.append((rel, data, pvals))
    descs = write_dv_file(dest, payloads, prefix="ab")
    for (rel, data, pvals), desc, card in zip(with_dv, descs, cards):
        desc["cardinality"] = card
        full = os.path.join(dest, rel)
        if rel in file_rows:  # previously-live file: remove + re-add
            actions_v3.append({"remove": {
                "path": urllib.parse.quote(rel, safe="/=-_.~"),
                "deletionTimestamp": 1_700_000_100_000,
                "dataChange": True, "extendedFileMetadata": True,
                "partitionValues": pvals,
                "size": os.path.getsize(full),
            }})
        actions_v3.append(add_action(rel, full, data, pvals, stats_cols,
                                     dv=desc))
    # DV-less new files still need their add
    dv_rels = {rel for rel, _, _ in with_dv}
    for rel, data, pvals in new_files:
        if rel not in dv_rels and rel not in file_rows:
            actions_v3.append(add_action(rel, os.path.join(dest, rel),
                                         data, pvals, stats_cols))
    write_commit(log_dir, 3, [*actions_v3])


def build_foreign_cm(dest: str, mode: str = "name") -> None:
    """Tiny column-mapped table laid out the way delta-spark emits it:
    physical names ``col-<uuid>`` (NOT this engine's ``col-0000`` shape),
    parquet ``PARQUET:field_id`` metadata, per-field
    delta.columnMapping.id/.physicalName, protocol (2,5) with the legacy
    implied feature sets (PROTOCOL.md "Column Mapping")."""
    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")
    phys_k = "col-" + str(uuid.uuid5(uuid.NAMESPACE_URL, "cm-k"))
    phys_v = "col-" + str(uuid.uuid5(uuid.NAMESPACE_URL, "cm-v"))

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            spark_field("k", "long", field_id=1, physical=phys_k),
            spark_field("v", "string", field_id=2, physical=phys_v),
        ],
    }, separators=(",", ":"))
    meta = {
        "metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, f"foreign_cm_{mode}")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": "2",
            },
            "createdTime": 1_700_000_000_000,
        }
    }
    proto = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    arrow_schema = pa.schema([
        pa.field(phys_k, pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field(phys_v, pa.string(), metadata={b"PARQUET:field_id": b"2"}),
    ])
    tbl = pa.Table.from_pydict(
        {phys_k: list(range(10)), phys_v: [f"v{i}" for i in range(10)]},
        schema=arrow_schema,
    )
    rel = part_file_name(0)
    pq.write_table(tbl, os.path.join(dest, rel))
    # stats keyed by PHYSICAL name (what delta-spark writes under mapping)
    add = {
        "path": rel,
        "partitionValues": {},
        "size": os.path.getsize(os.path.join(dest, rel)),
        "modificationTime": 1_700_000_000_000,
        "dataChange": True,
        "stats": json.dumps({
            "numRecords": 10,
            "minValues": {phys_k: 0, phys_v: "v0"},
            "maxValues": {phys_k: 9, phys_v: "v9"},
            "nullCount": {phys_k: 0, phys_v: 0},
        }, separators=(",", ":")),
    }
    write_commit(log_dir, 1, [commit_info("WRITE"), {"add": add}])


def write_multipart_checkpoint(
    log_dir: str, version: int, actions: list[dict], n_parts: int,
    with_stats_parsed: bool = False,
) -> None:
    """delta-spark's MULTI-PART classic checkpoint:
    ``<v>.checkpoint.<i>.<n>.parquet`` (1-based, zero-padded to 10),
    actions round-robined across parts, ``_last_checkpoint`` carrying
    ``parts``. With ``with_stats_parsed``, adds add.stats_parsed as a
    TYPED STRUCT column alongside the stats string — what delta-spark
    emits under ``checkpoint.writeStatsAsStruct`` — which readers that
    key off ``stats`` must tolerate."""
    schema = _CHECKPOINT_SCHEMA
    if with_stats_parsed:
        add_t = schema.field("add").type
        sp = pa.struct([
            ("numRecords", pa.int64()),
            ("minValues", pa.struct([("p_partkey", pa.int64())])),
            ("maxValues", pa.struct([("p_partkey", pa.int64())])),
            ("nullCount", pa.struct([("p_partkey", pa.int64())])),
        ])
        fields = [add_t.field(i) for i in range(add_t.num_fields)]
        fields.append(pa.field("stats_parsed", sp))
        schema = pa.schema([
            f if f.name != "add" else pa.field("add", pa.struct(fields))
            for f in schema
        ])

    rows = []
    for a in actions:
        (key, val), = a.items()
        if key == "commitInfo":
            continue
        row = {c: None for c in schema.names}
        val = dict(val)
        if key in ("add", "remove") and "partitionValues" in val:
            val["partitionValues"] = list((val["partitionValues"] or {}).items())
        if key == "metaData":
            val["configuration"] = list((val.get("configuration") or {}).items())
            fmt = dict(val.get("format") or {})
            fmt["options"] = list((fmt.get("options") or {}).items())
            val["format"] = fmt
        if key == "add" and with_stats_parsed and val.get("stats"):
            parsed = json.loads(val["stats"])
            val["stats_parsed"] = {
                "numRecords": parsed.get("numRecords"),
                "minValues": {"p_partkey":
                              (parsed.get("minValues") or {}).get("p_partkey")},
                "maxValues": {"p_partkey":
                              (parsed.get("maxValues") or {}).get("p_partkey")},
                "nullCount": {"p_partkey":
                              (parsed.get("nullCount") or {}).get("p_partkey")},
            }
        row[key] = val
        rows.append(row)

    parts: list[list] = [[] for _ in range(n_parts)]
    for i, row in enumerate(rows):
        parts[i % n_parts].append(row)
    for i, chunk in enumerate(parts):
        tbl = pa.Table.from_pylist(chunk, schema=schema)
        pq.write_table(tbl, os.path.join(
            log_dir,
            f"{version:020d}.checkpoint.{i + 1:010d}.{n_parts:010d}.parquet",
        ))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(rows),
                   "parts": n_parts}, f)


def write_foreign_v2_checkpoint(
    log_dir: str, version: int, actions: list[dict]
) -> None:
    """V2 checkpoint the way a v2Checkpoint-enabled foreign writer emits
    it (PROTOCOL.md "V2 spec checkpoints"): a UUID-named parquet manifest
    ``<v>.checkpoint.<uuid>.parquet`` carrying the non-file actions +
    ``checkpointMetadata`` + ``sidecar`` references, with the add/remove
    actions split across TWO parquet sidecars under ``_sidecars/``."""
    import uuid as _uuid

    file_rows, meta_rows = [], []
    for a in actions:
        (key, val), = a.items()
        if key == "commitInfo":
            continue
        val = dict(val)
        if key in ("add", "remove") and "partitionValues" in val:
            val["partitionValues"] = list((val["partitionValues"] or {}).items())
        if key == "metaData":
            val["configuration"] = list((val.get("configuration") or {}).items())
            fmt = dict(val.get("format") or {})
            fmt["options"] = list((fmt.get("options") or {}).items())
            val["format"] = fmt
        (file_rows if key in ("add", "remove") else meta_rows).append(
            (key, val))

    sidecar_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sidecar_dir, exist_ok=True)
    file_schema = pa.schema([
        _CHECKPOINT_SCHEMA.field("add"), _CHECKPOINT_SCHEMA.field("remove")])
    halves = [file_rows[0::2], file_rows[1::2]]
    sidecar_refs = []
    for chunk in halves:
        rows = []
        for key, val in chunk:
            row = {"add": None, "remove": None}
            row[key] = val
            rows.append(row)
        name = f"{_uuid.uuid4()}.parquet"
        full = os.path.join(sidecar_dir, name)
        pq.write_table(pa.Table.from_pylist(rows, schema=file_schema), full)
        sidecar_refs.append({
            "path": name, "sizeInBytes": os.path.getsize(full),
            "modificationTime": 1_700_000_000_000,
        })

    manifest_schema = pa.schema([
        _CHECKPOINT_SCHEMA.field("txn"),
        _CHECKPOINT_SCHEMA.field("metaData"),
        _CHECKPOINT_SCHEMA.field("protocol"),
        ("checkpointMetadata", pa.struct([
            ("version", pa.int64()),
            ("tags", _STR_MAP),
        ])),
        ("sidecar", pa.struct([
            ("path", pa.string()), ("sizeInBytes", pa.int64()),
            ("modificationTime", pa.int64()),
        ])),
    ])
    man_rows = []
    for key, val in meta_rows:
        row = {c: None for c in manifest_schema.names}
        row[key] = val
        man_rows.append(row)
    row = {c: None for c in manifest_schema.names}
    row["checkpointMetadata"] = {"version": version, "tags": []}
    man_rows.append(row)
    for ref in sidecar_refs:
        row = {c: None for c in manifest_schema.names}
        row["sidecar"] = ref
        man_rows.append(row)
    pq.write_table(
        pa.Table.from_pylist(man_rows, schema=manifest_schema),
        os.path.join(log_dir,
                     f"{version:020d}.checkpoint.{_uuid.uuid4()}.parquet"))
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        json.dump({"version": version, "size": len(man_rows)}, f)


def build_foreign_all_types(dest: str) -> None:
    """DAT ``all_primitive_types`` analogue, foreign-authored: every Delta
    primitive type in one table — byte/short/integer/long, float/double,
    decimal(10,2), string, binary, boolean, date, timestamp (UTC-adjusted)
    and timestamp_ntz — written with pyarrow + hand-written commit JSON in
    delta-spark's layout (typed stats incl. ISO-Z timestamps, a date
    partition column). Two files / two date partitions, 3 rows each."""
    import datetime as _dt
    import decimal as _decimal

    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    fields = [
        ("b_byte", "byte", pa.int8()),
        ("b_short", "short", pa.int16()),
        ("b_int", "integer", pa.int32()),
        ("b_long", "long", pa.int64()),
        ("b_float", "float", pa.float32()),
        ("b_double", "double", pa.float64()),
        ("b_dec", "decimal(10,2)", pa.decimal128(10, 2)),
        ("b_str", "string", pa.string()),
        ("b_bin", "binary", pa.binary()),
        ("b_bool", "boolean", pa.bool_()),
        ("b_ts", "timestamp", pa.timestamp("us", tz="UTC")),
        ("b_ts_ntz", "timestamp_ntz", pa.timestamp("us")),
        ("p_date", "date", pa.date32()),
    ]
    schema_string = json.dumps({
        "type": "struct",
        "fields": [spark_field(n, t) for n, t, _ in fields],
    }, separators=(",", ":"))
    meta = {
        "metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_all_types")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": ["p_date"],
            "configuration": {},
            "createdTime": 1_700_000_000_000,
        }
    }
    proto = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["timestampNtz"],
                          "writerFeatures": ["timestampNtz"]}}
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    file_schema = pa.schema([(n, t) for n, _, t in fields if n != "p_date"])

    def rows(base: int):
        utc = _dt.timezone.utc
        return {
            "b_byte": [base, base + 1, None],
            "b_short": [base * 10, base * 10 + 1, None],
            "b_int": [base * 100, base * 100 + 1, None],
            "b_long": [base * 1000, base * 1000 + 1, None],
            "b_float": [base + 0.5, base + 1.5, None],
            "b_double": [base + 0.25, base + 1.25, None],
            "b_dec": [_decimal.Decimal(f"{base}.25"),
                      _decimal.Decimal(f"{base}.75"), None],
            "b_str": [f"s{base:02d}", f"s{base + 1:02d}", None],
            "b_bin": [b"\x00\x01", bytes([base]), None],
            "b_bool": [True, False, None],
            "b_ts": [_dt.datetime(2024, 1, base, 12, 0, tzinfo=utc),
                     _dt.datetime(2024, 1, base, 13, 0, tzinfo=utc), None],
            "b_ts_ntz": [_dt.datetime(2024, 1, base, 12, 0),
                         _dt.datetime(2024, 1, base, 13, 0), None],
        }

    actions = [commit_info("WRITE")]
    for base, day in ((1, "2024-01-01"), (2, "2024-01-02")):
        tbl = pa.Table.from_pydict(rows(base), schema=file_schema)
        rel_dir = f"p_date={day}"
        os.makedirs(os.path.join(dest, rel_dir), exist_ok=True)
        rel = f"{rel_dir}/{part_file_name(base)}"
        pq.write_table(tbl, os.path.join(dest, rel))
        # delta-spark-shape typed stats: numbers plain, timestamps ISO-Z,
        # ntz ISO without Z, decimals as numbers; binary/bool excluded
        stats = {
            "numRecords": 3,
            "minValues": {
                "b_byte": base, "b_short": base * 10, "b_int": base * 100,
                "b_long": base * 1000, "b_float": base + 0.5,
                "b_double": base + 0.25, "b_dec": float(f"{base}.25"),
                "b_str": f"s{base:02d}",
                "b_ts": f"2024-01-{base:02d}T12:00:00.000Z",
                "b_ts_ntz": f"2024-01-{base:02d}T12:00:00.000",
            },
            "maxValues": {
                "b_byte": base + 1, "b_short": base * 10 + 1,
                "b_int": base * 100 + 1, "b_long": base * 1000 + 1,
                "b_float": base + 1.5, "b_double": base + 1.25,
                "b_dec": float(f"{base}.75"), "b_str": f"s{base + 1:02d}",
                "b_ts": f"2024-01-{base:02d}T13:00:00.000Z",
                "b_ts_ntz": f"2024-01-{base:02d}T13:00:00.000",
            },
            "nullCount": {
                "b_byte": 1, "b_short": 1, "b_int": 1, "b_long": 1,
                "b_float": 1, "b_double": 1, "b_dec": 1, "b_str": 1,
                "b_bin": 1, "b_bool": 1, "b_ts": 1, "b_ts_ntz": 1,
            },
        }
        actions.append({"add": {
            "path": urllib.parse.quote(rel, safe="/=-_.~"),
            "partitionValues": {"p_date": day},
            "size": os.path.getsize(os.path.join(dest, rel)),
            "modificationTime": 1_700_000_000_000,
            "dataChange": True,
            "stats": json.dumps(stats, separators=(",", ":")),
        }})
    write_commit(log_dir, 1, actions)


def build_foreign_nested_cm_dv(dest: str) -> None:
    """DAT ``nested_types``/``with_schema_change`` analogue with the three
    features foreign engines combine in practice — struct/array/map
    columns, **id-mode column mapping at every nesting level**, and a
    spec-byte deletion vector — in ONE table, because self-consistent
    deviations hide exactly in the interaction (a reader can pass each
    feature alone and still null out every nested field here).

    Layout, per delta-spark:

    * logical schema ``id long, info struct<name string, score double>,
      tags array<string>, attrs map<string, long>`` where ``id``,
      ``info``, ``info.name`` and ``info.score`` each carry
      ``delta.columnMapping.id``/``physicalName`` (nested fields are
      mapped INDEPENDENTLY of their parent, PROTOCOL.md "Column Mapping")
    * parquet files named/typed by PHYSICAL names with
      ``PARQUET:field_id`` on every level — id-mode readers must match by
      id even where names disagree
    * stats JSON keyed by physical names AT EVERY LEVEL
      (``minValues: {physInfo: {physScore: …}}``)
    * file 2 carries a storageType-``u`` DV (independent spec encoder)
      deleting its ``id % 3 == 0`` rows

    Expected content: ids 0..23 minus {12, 15, 18, 21};
    ``info.name = 'n<id>'``, ``info.score = id * 1.5``,
    ``tags = ['t', 't<id%3>']``, ``attrs = {'a': id, 'b': 2*id}``.
    """
    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    def phys(tag: str) -> str:
        return "col-" + str(uuid.uuid5(uuid.NAMESPACE_URL, f"ncd-{tag}"))

    p_id, p_info, p_name, p_score, p_tags, p_attrs = (
        phys("id"), phys("info"), phys("name"), phys("score"),
        phys("tags"), phys("attrs"),
    )

    def mfield(name: str, typ, fid: int, physical: str) -> dict:
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {"delta.columnMapping.id": fid,
                         "delta.columnMapping.physicalName": physical},
        }

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            mfield("id", "long", 1, p_id),
            mfield("info", {
                "type": "struct",
                "fields": [mfield("name", "string", 3, p_name),
                           mfield("score", "double", 4, p_score)],
            }, 2, p_info),
            mfield("tags", {"type": "array", "elementType": "string",
                            "containsNull": True}, 5, p_tags),
            mfield("attrs", {"type": "map", "keyType": "string",
                             "valueType": "long",
                             "valueContainsNull": True}, 6, p_attrs),
        ],
    }, separators=(",", ":"))
    meta = {
        "metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_nested_cm_dv")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "6",
            },
            "createdTime": 1_700_000_000_000,
        }
    }
    proto = {
        "protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["columnMapping", "deletionVectors"],
            "writerFeatures": ["columnMapping", "deletionVectors"],
        }
    }
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    arrow_schema = pa.schema([
        pa.field(p_id, pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
        pa.field(
            p_info,
            pa.struct([
                pa.field(p_name, pa.string(),
                         metadata={b"PARQUET:field_id": b"3"}),
                pa.field(p_score, pa.float64(),
                         metadata={b"PARQUET:field_id": b"4"}),
            ]),
            metadata={b"PARQUET:field_id": b"2"},
        ),
        pa.field(p_tags, pa.list_(pa.string()),
                 metadata={b"PARQUET:field_id": b"5"}),
        pa.field(p_attrs, pa.map_(pa.string(), pa.int64()),
                 metadata={b"PARQUET:field_id": b"6"}),
    ])

    def file_table(ids: list[int]) -> pa.Table:
        return pa.Table.from_pydict({
            p_id: ids,
            p_info: [{p_name: f"n{i}", p_score: i * 1.5} for i in ids],
            p_tags: [["t", f"t{i % 3}"] for i in ids],
            p_attrs: [[("a", i), ("b", 2 * i)] for i in ids],
        }, schema=arrow_schema)

    def nested_stats(ids: list[int]) -> str:
        return json.dumps({
            "numRecords": len(ids),
            "minValues": {p_id: min(ids),
                          p_info: {p_name: f"n{min(ids)}",
                                   p_score: min(ids) * 1.5}},
            "maxValues": {p_id: max(ids),
                          p_info: {p_name: f"n{max(ids)}",
                                   p_score: max(ids) * 1.5}},
            "nullCount": {p_id: 0, p_info: {p_name: 0, p_score: 0}},
        }, separators=(",", ":"))

    adds = []
    for idx, ids in enumerate([list(range(12)), list(range(12, 24))]):
        rel = part_file_name(idx)
        pq.write_table(file_table(ids), os.path.join(dest, rel))
        adds.append({
            "path": rel, "partitionValues": {},
            "size": os.path.getsize(os.path.join(dest, rel)),
            "modificationTime": 1_700_000_000_000, "dataChange": True,
            "stats": nested_stats(ids),
        })
    # DV on file 2: delete id % 3 == 0 → row indexes 0, 3, 6, 9
    (desc,) = write_dv_file(
        dest, [dv_payload([roaring32_array([0, 3, 6, 9])])])
    desc["cardinality"] = 4
    adds[1]["deletionVector"] = desc
    write_commit(log_dir, 1,
                 [commit_info("WRITE"), *({"add": a} for a in adds)])


# ---------------------------------------------------------------------------
# Variant binary + shredded-layout encoder (Parquet Variant spec;
# Delta PROTOCOL.md "Variant Data Type" + "Variant Shredding").
# Deliberately independent of Spark's encoder: fixture bytes are derived
# field-by-field from the published encoding so the engine's read path is
# checked against the SPEC, not against itself.
# ---------------------------------------------------------------------------

def variant_metadata(names: list[str]) -> bytes:
    """Variant metadata: version 1, sorted dictionary, 1-byte offsets
    (all fixture dictionaries are tiny). ``names`` must be sorted."""
    assert names == sorted(names), "dictionary must be sorted"
    data = b"".join(n.encode() for n in names)
    assert len(data) < 256
    offs = [0]
    for n in names:
        offs.append(offs[-1] + len(n.encode()))
    # header: version=1 (low nibble) | sorted_strings (bit 4);
    # offset_size_minus_one=0 (bits 6-7)
    return bytes([0x11, len(names)]) + bytes(offs) + data


def variant_null() -> bytes:
    return b"\x00"  # primitive type 0


def variant_bool(b: bool) -> bytes:
    return bytes([(1 if b else 2) << 2])


def variant_int8(i: int) -> bytes:
    return bytes([3 << 2]) + struct.pack("<b", i)


def variant_int64(i: int) -> bytes:
    return bytes([6 << 2]) + struct.pack("<q", i)


def variant_double(d: float) -> bytes:
    return bytes([7 << 2]) + struct.pack("<d", d)


def variant_str(s: str) -> bytes:
    b = s.encode()
    if len(b) < 64:  # short_string: basic_type 1, length in header
        return bytes([0x01 | (len(b) << 2)]) + b
    return bytes([16 << 2]) + struct.pack("<i", len(b)) + b


def variant_obj(fields: dict[int, bytes]) -> bytes:
    """Object from {field_id: encoded_value}; small header (1-byte ids
    and offsets). Ids index the row's metadata dictionary — with a
    sorted dictionary, ascending id order IS the spec's required
    field-name order."""
    ids = sorted(fields)
    vals = [fields[i] for i in ids]
    offs = [0]
    for v in vals:
        offs.append(offs[-1] + len(v))
    assert offs[-1] < 256 and all(i < 256 for i in ids)
    # basic_type=2; header bits all zero -> small 1-byte everything
    return bytes([0x02, len(ids)]) + bytes(ids) + bytes(offs) + b"".join(vals)


def variant_arr(vals: list[bytes]) -> bytes:
    offs = [0]
    for v in vals:
        offs.append(offs[-1] + len(v))
    assert offs[-1] < 256
    return bytes([0x03, len(vals)]) + bytes(offs) + b"".join(vals)


def _shred_field(typ: pa.DataType) -> pa.DataType:
    """A shredded object field / array element group: {value, typed_value}."""
    return pa.struct([pa.field("value", pa.binary()),
                      pa.field("typed_value", typ)])


def build_foreign_shredded_variant(dest: str, sf_dir: str) -> None:
    """A foreign table whose variant column is SHREDDED differently per
    file (Delta "Variant Shredding": the shredding schema is a per-file
    choice), over ``events.parquet``. Logical content is identical in
    every file: ``v = {"k": props.k, "t": event_type, "u": user_id}``
    with ``u`` omitted when ``user_id % 7 == 0`` — so a DuckDB oracle
    recomputes everything from the raw parquet columns.

    * file A (event_id % 3 == 0): legacy two-field encoding
      {metadata, value} — no shredding.
    * file B (% 3 == 1): object-shredded ``typed_value {k: int64,
      t: string}``; ``u`` rides the object-level residual ``value``;
      rows with ``user_id % 5 == 0`` put ``k`` in the FIELD residual
      (field.value variant binary, typed_value null) instead.
    * file C (% 3 == 2): a DIFFERENT shred schema — ``typed_value
      {u: int64}`` only; ``k`` and ``t`` ride the object residual.
      ``u`` absent ⇒ both value and typed_value null (spec: field
      missing).
    """
    src = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                        columns=["event_id", "user_id", "event_type",
                                 "props"])
    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    schema_string = json.dumps({
        "type": "struct",
        "fields": [spark_field("event_id", "long"),
                   spark_field("v", "variant")],
    }, separators=(",", ":"))
    meta = {"metaData": {
        "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_shredded_var")),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1_700_000_000_000,
    }}
    proto = {"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["variantType", "variantShredding"],
        "writerFeatures": ["appendOnly", "invariants",
                           "variantType", "variantShredding"],
    }}
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    # metadata dictionary shared by every row: sorted(k, t, u)
    META = variant_metadata(["k", "t", "u"])
    K, T_, U = 0, 1, 2

    ids = src.column("event_id").to_pylist()
    users = src.column("user_id").to_pylist()
    types_ = src.column("event_type").to_pylist()
    ks = [json.loads(p)["k"] for p in src.column("props").to_pylist()]

    rows_a, rows_b, rows_c = [], [], []
    for eid, u, t, k in zip(ids, users, types_, ks):
        has_u = u % 7 != 0
        bucket = eid % 3
        if bucket == 0:
            fields = {K: variant_int64(k), T_: variant_str(t)}
            if has_u:
                fields[U] = variant_int64(u)
            rows_a.append({"event_id": eid, "metadata": META,
                           "value": variant_obj(fields)})
        elif bucket == 1:
            resid = variant_obj({U: variant_int64(u)}) if has_u else None
            if u % 5 == 0:  # field-level residual for k
                kf = {"value": variant_int64(k), "typed_value": None}
            else:
                kf = {"value": None, "typed_value": k}
            rows_b.append({"event_id": eid, "metadata": META,
                           "value": resid,
                           "typed_value": {
                               "k": kf,
                               "t": {"value": None, "typed_value": t}}})
        else:
            resid = variant_obj({K: variant_int64(k), T_: variant_str(t)})
            uf = ({"value": None, "typed_value": u} if has_u
                  else {"value": None, "typed_value": None})
            rows_c.append({"event_id": eid, "metadata": META,
                           "value": resid,
                           "typed_value": {"u": uf}})

    adds = []

    def _write(rows: list[dict], vtype: pa.DataType, index: int):
        tbl = pa.table({
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "v": pa.array(
                [{k2: v for k2, v in r.items() if k2 != "event_id"}
                 for r in rows], vtype),
        })
        rel = part_file_name(index)
        pq.write_table(tbl, os.path.join(dest, rel))
        adds.append(add_action(rel, os.path.join(dest, rel), tbl, {},
                               ["event_id"]))

    legacy = pa.struct([pa.field("metadata", pa.binary()),
                        pa.field("value", pa.binary())])
    shred_b = pa.struct([
        pa.field("metadata", pa.binary()),
        pa.field("value", pa.binary()),
        pa.field("typed_value", pa.struct([
            pa.field("k", _shred_field(pa.int64())),
            pa.field("t", _shred_field(pa.string()))])),
    ])
    shred_c = pa.struct([
        pa.field("metadata", pa.binary()),
        pa.field("value", pa.binary()),
        pa.field("typed_value", pa.struct([
            pa.field("u", _shred_field(pa.int64()))])),
    ])
    _write(rows_a, legacy, 0)
    _write(rows_b, shred_b, 1)
    _write(rows_c, shred_c, 2)
    write_commit(log_dir, 1, [commit_info("WRITE"), *adds])


def build_foreign_clustered_defaults(dest: str) -> None:
    """A delta-spark-layout CLUSTERED table with COLUMN DEFAULTS — the two
    round-7 writer features as a FOREIGN artifact, so interop is proven
    against independently authored metadata, not this repo's writer:

    * protocol (1,7) listing ``clustering`` + ``domainMetadata`` +
      ``allowColumnDefaults`` (the delta-spark feature spelling)
    * ``delta.clustering`` domainMetadata with 2-element
      ``clusteringColumns`` physical-name paths
    * ``CURRENT_DEFAULT`` on column ``v`` inside the schemaString field
      metadata (delta-spark stores it exactly there)

    Content: k = 0..39, v = 'v<k>', c1 = k % 8, c2 = k // 8, two files
    split at k = 20.
    """
    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            spark_field("k", "long"),
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {"CURRENT_DEFAULT": "'foreign-default'"}},
            spark_field("c1", "long"),
            spark_field("c2", "long"),
        ],
    }, separators=(",", ":"))
    write_commit(log_dir, 0, [
        commit_info("CREATE TABLE"),
        {"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "invariants", "clustering",
                               "domainMetadata", "allowColumnDefaults"],
        }},
        {"metaData": {
            "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_clustered")),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1_700_000_000_000,
        }},
        {"domainMetadata": {
            "domain": "delta.clustering",
            "configuration": json.dumps(
                {"clusteringColumns": [["c1"], ["c2"]]},
                separators=(",", ":")),
            "removed": False,
        }},
    ])

    adds = []
    for i, (lo, hi) in enumerate(((0, 20), (20, 40))):
        ks = list(range(lo, hi))
        tbl = pa.table({
            "k": pa.array(ks, pa.int64()),
            "v": pa.array([f"v{k}" for k in ks]),
            "c1": pa.array([k % 8 for k in ks], pa.int64()),
            "c2": pa.array([k // 8 for k in ks], pa.int64()),
        })
        rel = part_file_name(i)
        pq.write_table(tbl, os.path.join(dest, rel))
        adds.append(add_action(rel, os.path.join(dest, rel), tbl, {},
                               ["k", "v", "c1", "c2"]))
    write_commit(log_dir, 1, [commit_info("WRITE")] + adds)


def build_foreign_staged_commits(dest: str) -> None:
    """A catalog-managed (CCv2 / coordinated-commits) table the way a
    catalog-backed writer leaves it: versions 0-1 PUBLISHED as canonical
    ``_delta_log/N.json``, version 2 existing ONLY as a staged commit
    ``_delta_log/_staged_commits/<v>.<uuid>.json`` — on a real UC table
    the catalog owns that tail and hands readers the paths (the
    ``log_tail`` attach option, reference delta_utils.cpp:884-888).
    A LIST-based reader must see version 1; a log_tail reader handed the
    staged path must see version 2."""
    import pyarrow as pa

    os.makedirs(dest, exist_ok=True)
    log_dir = os.path.join(dest, "_delta_log")

    schema_string = json.dumps({
        "type": "struct",
        "fields": [spark_field("k", "long")],
    }, separators=(",", ":"))
    meta = {"metaData": {
        "id": str(uuid.uuid5(uuid.NAMESPACE_URL, "foreign_staged")),
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1_700_000_000_000,
    }}
    proto = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    write_commit(log_dir, 0, [commit_info("CREATE TABLE"), proto, meta])

    def _file(index: int, lo: int, hi: int):
        tbl = pa.table({"k": pa.array(range(lo, hi), pa.int64())})
        rel = part_file_name(index)
        pq.write_table(tbl, os.path.join(dest, rel))
        return add_action(rel, os.path.join(dest, rel), tbl, {}, ["k"])

    write_commit(log_dir, 1, [commit_info("WRITE"), _file(0, 0, 10)])

    # version 2: staged-only (not yet published to N.json)
    staged_dir = os.path.join(log_dir, "_staged_commits")
    os.makedirs(staged_dir, exist_ok=True)
    add2 = _file(1, 10, 15)
    payload = "".join(
        json.dumps(a, separators=(",", ":")) + "\n"
        for a in [commit_info("WRITE"), add2]
    )
    staged = os.path.join(
        staged_dir,
        f"{2:020d}.{uuid.uuid5(uuid.NAMESPACE_URL, 'staged2').hex}.json",
    )
    with open(staged, "w", encoding="utf-8") as f:
        f.write(payload)
