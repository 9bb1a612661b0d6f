#!/usr/bin/env python3
"""Generate src/test/resources/mini.osm.pbf — a small REAL OpenStreetMap
PBF file, encoded INDEPENDENTLY of the Scala writer (stdlib only:
struct + zlib), straight from the public fileformat.proto /
osmformat.proto wire spec. PbfLikeSourceSpec decodes it with the Scala
reader and asserts every element bit-for-bit, so writer bugs cannot
cancel reader bugs (the round-trip tests alone could hide a shared
misreading of the spec).

Deliberately exercises the corners a lazy decoder gets wrong:
  - non-default granularity (200) + nonzero lat_offset/lon_offset
  - one UNCOMPRESSED (raw) blob next to zlib blobs
  - a DenseNodes group where only some nodes have tags
  - a non-dense Node message (sint64 id — different from Way's int64)
  - unknown fields that must be skipped (Info on a way, HeaderBlock
    bbox, a fabricated high-numbered extension field)
  - field order variation (granularity AFTER the primitivegroup)
  - blobs with and without indexdata

Run once from the repo root:  python3 tools/make_pbf_fixture.py
The expected decoded values are mirrored in PbfLikeSourceSpec; if you
change this file, update the spec to match.
"""
import struct
import zlib

OUT = "src/test/resources/mini.osm.pbf"


def varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement, 10-byte encoding
    out = b""
    while v > 0x7F:
        out += bytes([(v & 0x7F) | 0x80])
        v >>= 7
    return out + bytes([v])


def zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1


def key(field: int, wire: int) -> bytes:
    return varint((field << 3) | wire)


def f_varint(field: int, v: int) -> bytes:
    return key(field, 0) + varint(v)


def f_sint(field: int, v: int) -> bytes:
    return key(field, 0) + varint(zigzag(v))


def f_bytes(field: int, b: bytes) -> bytes:
    return key(field, 2) + varint(len(b)) + b


def f_str(field: int, s: str) -> bytes:
    return f_bytes(field, s.encode())


def packed(field: int, vals) -> bytes:
    return f_bytes(field, b"".join(varint(v) for v in vals))


def packed_sint_delta(field: int, vals) -> bytes:
    out, prev = b"", 0
    for v in vals:
        out += varint(zigzag(v - prev))
        prev = v
    return f_bytes(field, out)


def blob(blob_type: str, payload: bytes, indexdata: bytes | None,
         compress: bool) -> bytes:
    if compress:
        body = f_varint(2, len(payload)) + f_bytes(3, zlib.compress(payload))
    else:
        body = f_bytes(1, payload)
    header = f_str(1, blob_type)
    if indexdata is not None:
        header += f_bytes(2, indexdata)
    header += f_varint(3, len(body))
    return struct.pack(">i", len(header)) + header + body


def idx(lo: int, hi: int) -> bytes:
    return struct.pack(">qq", lo, hi)


# ---- OSMHeader (with a bbox the reader must skip) ----
header_block = (
    f_bytes(1, f_sint(1, -1800000000) + f_sint(2, 1800000000)
            + f_sint(3, 900000000) + f_sint(4, -900000000))
    + f_str(4, "OsmSchema-V0.6") + f_str(4, "DenseNodes")
    + f_str(16, "make_pbf_fixture.py")
)

# ---- Blob 1 (zlib, indexdata [10,13]): DenseNodes, granularity=200,
#      lat_offset=1000, lon_offset=-2000, granularity written AFTER the
#      group. nano = offset + 200*raw.
#      node 10: lat raw 5000  -> 1001000  lon raw -5000 -> -1002000
#               tags {highway: bus_stop, name: alpha}
#      node 11: lat raw 5010  -> 1003000  lon raw -4990 -> -1000000   no tags
#      node 12: lat raw 0     ->    1000  lon raw 0     ->    -2000   {name: beta}
#      node 13: lat raw -5000 ->  -999000 lon raw 5000  ->   998000   no tags
st1 = (f_bytes(1, b"") + f_bytes(1, b"highway") + f_bytes(1, b"bus_stop")
       + f_bytes(1, b"alpha") + f_bytes(1, b"name") + f_bytes(1, b"beta"))
dense = (packed_sint_delta(1, [10, 11, 12, 13])
         + packed_sint_delta(8, [5000, 5010, 0, -5000])
         + packed_sint_delta(9, [-5000, -4990, 0, 5000])
         + packed(10, [1, 2, 4, 3, 0, 0, 4, 5, 0, 0]))
pb1 = (f_bytes(1, st1)
       + f_bytes(2, f_bytes(2, dense))
       + f_varint(17, 200) + f_varint(19, 1000)
       + f_varint(20, (-2000) + (1 << 64)))  # negative int64 varint

# ---- Blob 2 (RAW i.e. uncompressed, NO indexdata): one classic Node
#      (sint64 id!) + one Way with an Info field (4) and an unknown
#      extension field 999 the decoder must skip. Default granularity.
st2 = (f_bytes(1, b"") + f_bytes(1, b"name") + f_bytes(1, b"gamma")
       + f_bytes(1, b"highway") + f_bytes(1, b"residential"))
node20 = (f_sint(1, 20) + packed(2, [1]) + packed(3, [2])
          + f_sint(8, 515000000) + f_sint(9, -1799000000))
info = f_varint(1, 3) + f_varint(2, 1700000000)  # version/timestamp: skip
way30 = (f_varint(1, 30) + packed(2, [3]) + packed(3, [4])
         + f_bytes(4, info)
         + packed_sint_delta(8, [20, 21, 22, 21])
         + f_bytes(999, b"future-extension"))
pb2 = (f_bytes(1, st2)
       + f_bytes(2, f_bytes(1, node20) + f_bytes(3, way30)))

# ---- Blob 3 (zlib, indexdata [40,40]): one Relation with roles_sid /
#      memids / member types.
st3 = (f_bytes(1, b"") + f_bytes(1, b"type") + f_bytes(1, b"multipolygon")
       + f_bytes(1, b"outer") + f_bytes(1, b"inner"))
rel40 = (f_varint(1, 40) + packed(2, [1]) + packed(3, [2])
         + packed(8, [3, 4])              # roles: outer, inner
         + packed_sint_delta(9, [30, 35]) # memids
         + packed(10, [1, 1]))            # member types: WAY, WAY
pb3 = f_bytes(1, st3) + f_bytes(2, f_bytes(4, rel40)) + f_varint(17, 100)

data = (blob("OSMHeader", header_block, None, compress=True)
        + blob("OSMData", pb1, idx(10, 13), compress=True)
        + blob("OSMData", pb2, None, compress=False)
        + blob("OSMData", pb3, idx(40, 40), compress=True))

with open(OUT, "wb") as f:
    f.write(data)
print(f"wrote {OUT}: {len(data)} bytes")
