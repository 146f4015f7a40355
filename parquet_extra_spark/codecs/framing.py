"""Binary section framing shared by every codec payload.

A codec payload is a sequence of *sections* (meta JSON, null bitmap,
packed codes, dictionary bytes, ...). Each section is independently
zstd-compressed when that actually shrinks it, so every codec gets a
"cascading zstd" outer layer for free — this is what keeps total encoded
bytes <= the reference Parquet(zstd) size even for high-entropy columns
(see BASELINE.json north_rule; analogous to parquet-mr's page compression
chosen at writer creation, reference ExampleParquetOutputFormat.java:7-14
+ ParquetExampleTest.scala:129).

Layout (little-endian varints):
    varint n_sections
    per section: varint raw_len, varint stored_len, u8 flag (0=raw, 1=zstd)
    concatenated section bytes
"""

from __future__ import annotations

import pyarrow as pa

_ZSTD_MIN = 64  # don't bother compressing tiny sections
# level 3 ≈ parquet-mr's zstd default; pa.compress() would use level 1,
# which loses the ≤-reference-Parquet(zstd) size bound by a few percent
_ZSTD = pa.Codec("zstd", compression_level=3)
_ZSTD_DEC = pa.Codec("zstd")


def _write_varint(n: int, out: bytearray) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def pack_sections(sections: list[bytes]) -> bytes:
    header = bytearray()
    _write_varint(len(sections), header)
    bodies: list[bytes] = []
    for raw in sections:
        raw = bytes(raw)
        stored, flag = raw, 0
        if len(raw) >= _ZSTD_MIN:
            z = _ZSTD.compress(raw, asbytes=True)
            if len(z) < len(raw):
                stored, flag = z, 1
        _write_varint(len(raw), header)
        _write_varint(len(stored), header)
        header.append(flag)
        bodies.append(stored)
    return bytes(header) + b"".join(bodies)


def unpack_sections(buf: bytes) -> list[bytes]:
    buf = bytes(buf)
    n, pos = _read_varint(buf, 0)
    metas = []
    for _ in range(n):
        raw_len, pos = _read_varint(buf, pos)
        stored_len, pos = _read_varint(buf, pos)
        flag = buf[pos]
        pos += 1
        metas.append((raw_len, stored_len, flag))
    sections: list[bytes] = []
    for raw_len, stored_len, flag in metas:
        body = buf[pos : pos + stored_len]
        pos += stored_len
        if flag == 1:
            body = _ZSTD_DEC.decompress(body, decompressed_size=raw_len, asbytes=True)
        sections.append(body)
    return sections
