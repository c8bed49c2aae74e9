"""Minimal pure-Python msgpack codec (stdlib only) for the reference's
native payloads.

The reference appends ``orso.Row.to_bytes()`` payloads
(``/root/reference/hadro/engine.py:131,170``); orso's public row layout is a
6-byte header — version byte ``0x10``, flags byte ``0x00``, 4-byte
big-endian payload length — followed by the row tuple packed as msgpack.
No msgpack codec ships in this environment, so this module implements the
subset of the public msgpack spec (https://github.com/msgpack/msgpack/blob/
master/spec.md) that row tuples use: nil/bool/int/float/str/bin/array/map
plus the timestamp extension (type -1) for datetimes.

Encoding choices mirror the canonical writers (smallest representation
first), so byte-for-byte round-trips match what ormsgpack produces for the
same values.
"""

from __future__ import annotations

import datetime as _dt
import struct

ROW_HEADER_PREFIX = b"\x10\x00"  # orso row version 0x10, flags 0x00
ROW_HEADER_SIZE = 6


class MpackError(ValueError):
    """Malformed msgpack bytes or unsupported type."""


# ------------------------------------------------------------------- encode
def packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        data = obj.encode("utf-8")
        n = len(data)
        if n < 32:
            out.append(0xA0 | n)
        elif n < 0x100:
            out += struct.pack(">BB", 0xD9, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += data
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n < 0x100:
            out += struct.pack(">BB", 0xC4, n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n < 16:
            out.append(0x90 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n < 16:
            out.append(0x80 | n)
        elif n < 0x10000:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    elif isinstance(obj, _dt.datetime):
        _pack_timestamp(obj, out)
    elif isinstance(obj, _dt.date):
        # dates have no msgpack core type; canonical writers emit the
        # ISO string
        _pack(obj.isoformat(), out)
    else:
        raise MpackError(f"unsupported type: {type(obj).__name__}")


def _pack_int(v: int, out: bytearray) -> None:
    if 0 <= v <= 0x7F:
        out.append(v)
    elif -32 <= v < 0:
        out.append(v & 0xFF)
    elif 0 < v <= 0xFF:
        out += struct.pack(">BB", 0xCC, v)
    elif 0 < v <= 0xFFFF:
        out += struct.pack(">BH", 0xCD, v)
    elif 0 < v <= 0xFFFFFFFF:
        out += struct.pack(">BI", 0xCE, v)
    elif 0 < v <= 0xFFFFFFFFFFFFFFFF:
        out += struct.pack(">BQ", 0xCF, v)
    elif -0x80 <= v < 0:
        out += struct.pack(">Bb", 0xD0, v)
    elif -0x8000 <= v < 0:
        out += struct.pack(">Bh", 0xD1, v)
    elif -0x80000000 <= v < 0:
        out += struct.pack(">Bi", 0xD2, v)
    elif -0x8000000000000000 <= v < 0:
        out += struct.pack(">Bq", 0xD3, v)
    else:
        raise MpackError("integer out of 64-bit range")


def _pack_timestamp(ts: _dt.datetime, out: bytearray) -> None:
    """msgpack timestamp extension (type -1): ts32 / ts64 / ts96 per spec."""
    if ts.tzinfo is not None:
        ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    epoch = _dt.datetime(1970, 1, 1)
    delta = ts - epoch
    secs = delta.days * 86400 + delta.seconds
    nsecs = delta.microseconds * 1000
    if 0 <= secs < 0x100000000 and nsecs == 0:
        out += struct.pack(">BBI", 0xD6, 0xFF, secs)
    elif 0 <= secs < 0x400000000:
        data64 = (nsecs << 34) | secs
        out += struct.pack(">BBQ", 0xD7, 0xFF, data64)
    else:
        out += struct.pack(">BBB", 0xC7, 12, 0xFF)
        out += struct.pack(">Iq", nsecs, secs)


# ------------------------------------------------------------------- decode
def unpackb(data: bytes):
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise MpackError(f"trailing bytes after object (at {pos}/{len(data)})")
    return obj


def _unpack(buf: memoryview, pos: int):
    if pos >= len(buf):
        raise MpackError("truncated msgpack data")
    b = buf[pos]
    pos += 1
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _unpack_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _unpack_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _take_str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:  # bin8
        (n,) = struct.unpack_from(">B", buf, pos)
        return _take_bytes(buf, pos + 1, n)
    if b == 0xC5:  # bin16
        (n,) = struct.unpack_from(">H", buf, pos)
        return _take_bytes(buf, pos + 2, n)
    if b == 0xC6:  # bin32
        (n,) = struct.unpack_from(">I", buf, pos)
        return _take_bytes(buf, pos + 4, n)
    if b == 0xC7:  # ext8
        n, code = struct.unpack_from(">Bb", buf, pos)
        return _unpack_ext(code, bytes(buf[pos + 2 : pos + 2 + n])), pos + 2 + n
    if b == 0xC8:  # ext16
        n, code = struct.unpack_from(">Hb", buf, pos)
        return _unpack_ext(code, bytes(buf[pos + 3 : pos + 3 + n])), pos + 3 + n
    if b == 0xC9:  # ext32
        n, code = struct.unpack_from(">Ib", buf, pos)
        return _unpack_ext(code, bytes(buf[pos + 5 : pos + 5 + n])), pos + 5 + n
    if b == 0xCA:  # float32
        (v,) = struct.unpack_from(">f", buf, pos)
        return v, pos + 4
    if b == 0xCB:  # float64
        (v,) = struct.unpack_from(">d", buf, pos)
        return v, pos + 8
    if b == 0xCC:
        return buf[pos], pos + 1
    if b == 0xCD:
        return struct.unpack_from(">H", buf, pos)[0], pos + 2
    if b == 0xCE:
        return struct.unpack_from(">I", buf, pos)[0], pos + 4
    if b == 0xCF:
        return struct.unpack_from(">Q", buf, pos)[0], pos + 8
    if b == 0xD0:
        return struct.unpack_from(">b", buf, pos)[0], pos + 1
    if b == 0xD1:
        return struct.unpack_from(">h", buf, pos)[0], pos + 2
    if b == 0xD2:
        return struct.unpack_from(">i", buf, pos)[0], pos + 4
    if b == 0xD3:
        return struct.unpack_from(">q", buf, pos)[0], pos + 8
    if 0xD4 <= b <= 0xD8:  # fixext 1/2/4/8/16
        n = 1 << (b - 0xD4)
        (code,) = struct.unpack_from(">b", buf, pos)
        return _unpack_ext(code, bytes(buf[pos + 1 : pos + 1 + n])), pos + 1 + n
    if b == 0xD9:  # str8
        (n,) = struct.unpack_from(">B", buf, pos)
        return _take_str(buf, pos + 1, n)
    if b == 0xDA:  # str16
        (n,) = struct.unpack_from(">H", buf, pos)
        return _take_str(buf, pos + 2, n)
    if b == 0xDB:  # str32
        (n,) = struct.unpack_from(">I", buf, pos)
        return _take_str(buf, pos + 4, n)
    if b == 0xDC:  # array16
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_array(buf, pos + 2, n)
    if b == 0xDD:  # array32
        (n,) = struct.unpack_from(">I", buf, pos)
        return _unpack_array(buf, pos + 4, n)
    if b == 0xDE:  # map16
        (n,) = struct.unpack_from(">H", buf, pos)
        return _unpack_map(buf, pos + 2, n)
    if b == 0xDF:  # map32
        (n,) = struct.unpack_from(">I", buf, pos)
        return _unpack_map(buf, pos + 4, n)
    raise MpackError(f"unknown msgpack type byte 0x{b:02x}")


def _take_str(buf: memoryview, pos: int, n: int):
    if pos + n > len(buf):
        raise MpackError("truncated string")
    return bytes(buf[pos : pos + n]).decode("utf-8"), pos + n


def _take_bytes(buf: memoryview, pos: int, n: int):
    if pos + n > len(buf):
        raise MpackError("truncated binary")
    return bytes(buf[pos : pos + n]), pos + n


def _unpack_array(buf: memoryview, pos: int, n: int):
    items = []
    for _ in range(n):
        v, pos = _unpack(buf, pos)
        items.append(v)
    return items, pos


def _unpack_map(buf: memoryview, pos: int, n: int):
    out = {}
    for _ in range(n):
        k, pos = _unpack(buf, pos)
        v, pos = _unpack(buf, pos)
        out[k] = v
    return out, pos


def _unpack_ext(code: int, data: bytes):
    if code == -1:  # timestamp extension
        if len(data) == 4:
            (secs,) = struct.unpack(">I", data)
            nsecs = 0
        elif len(data) == 8:
            (d64,) = struct.unpack(">Q", data)
            nsecs, secs = d64 >> 34, d64 & 0x3FFFFFFFF
        elif len(data) == 12:
            nsecs, secs = struct.unpack(">Iq", data)
        else:
            raise MpackError(f"bad timestamp ext length {len(data)}")
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(
            seconds=secs, microseconds=nsecs // 1000
        )
    raise MpackError(f"unsupported ext type {code}")


# ----------------------------------------------------------- orso row layer
def encode_row(values) -> bytes:
    """``orso.Row.to_bytes()``-compatible payload: 6-byte header (version
    0x10, flags 0x00, uint32 big-endian length) + msgpack tuple."""
    body = packb(tuple(values))
    return ROW_HEADER_PREFIX + struct.pack(">I", len(body)) + body


def decode_row(payload: bytes) -> tuple:
    """Inverse of :func:`encode_row`; validates the header and length."""
    if len(payload) < ROW_HEADER_SIZE:
        raise MpackError("payload shorter than orso row header")
    if payload[0] != ROW_HEADER_PREFIX[0]:
        raise MpackError(f"unknown orso row version 0x{payload[0]:02x}")
    (n,) = struct.unpack_from(">I", payload, 2)
    body = payload[ROW_HEADER_SIZE:]
    if len(body) != n:
        raise MpackError(f"row length mismatch: header says {n}, got {len(body)}")
    values = unpackb(body)
    if not isinstance(values, list):
        raise MpackError("row payload is not a msgpack array")
    return tuple(values)
