"""Arrow↔numpy dtype plumbing shared by all codecs.

Plays the role of the reference's physical-type table
(/root/reference/src/parquet/physical.zig:1-11) and its zero-copy logical
reinterpretations (/root/reference/src/parquet/logical.zig:50-228): every
supported Arrow type maps to a *physical* numpy representation (int64 lane,
float lane, or byte-string lane) plus a token so decode can reinterpret
zero-copy, exactly as the reference `@ptrCast`s logical over physical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# token -> (arrow type, numpy physical dtype or None for variable-width)
_TOKEN_TABLE: dict[str, tuple[pa.DataType, np.dtype | None]] = {
    "bool": (pa.bool_(), np.dtype("<u1")),
    "int8": (pa.int8(), np.dtype("<i1")),
    "int16": (pa.int16(), np.dtype("<i2")),
    "int32": (pa.int32(), np.dtype("<i4")),
    "int64": (pa.int64(), np.dtype("<i8")),
    "uint8": (pa.uint8(), np.dtype("<u1")),
    "uint16": (pa.uint16(), np.dtype("<u2")),
    "uint32": (pa.uint32(), np.dtype("<u4")),
    "uint64": (pa.uint64(), np.dtype("<u8")),
    "float32": (pa.float32(), np.dtype("<f4")),
    "float64": (pa.float64(), np.dtype("<f8")),
    "date32": (pa.date32(), np.dtype("<i4")),
    "date64": (pa.date64(), np.dtype("<i8")),
    "timestamp[s]": (pa.timestamp("s"), np.dtype("<i8")),
    "timestamp[ms]": (pa.timestamp("ms"), np.dtype("<i8")),
    "timestamp[us]": (pa.timestamp("us"), np.dtype("<i8")),
    "timestamp[ns]": (pa.timestamp("ns"), np.dtype("<i8")),
    "time32[ms]": (pa.time32("ms"), np.dtype("<i4")),
    "time64[us]": (pa.time64("us"), np.dtype("<i8")),
    "time64[ns]": (pa.time64("ns"), np.dtype("<i8")),
    "string": (pa.string(), None),
    "large_string": (pa.large_string(), None),
    "binary": (pa.binary(), None),
    "large_binary": (pa.large_binary(), None),
    # Float16 rides the uint16 physical lane (bit pattern), exactly the
    # reference's FIXED[2] reinterpretation
    # (/root/reference/src/parquet/logical.zig:216-228).
    "halffloat": (pa.float16(), np.dtype("<u2")),
}

_TYPE_TO_TOKEN = {str(t): tok for tok, (t, _) in _TOKEN_TABLE.items()}


def dtype_token(t: pa.DataType) -> str:
    # Parameterized tokens first: DECIMAL (reference:
    # /root/reference/src/parquet/logical.zig:230-249 — but lossless here,
    # 16-byte lanes, never f128), FIXED_LEN_BYTE_ARRAY widths
    # (/root/reference/src/parquet/dynamic.zig:47-55), and tz-AWARE
    # timestamps — Spark's TimestampType (and INT96-sourced columns) arrive
    # Arrow-side as timestamp[us, tz=...]; the tz rides in the token and the
    # physical lane stays the same i64 (the reference's TimestampLogical
    # reinterpretation, /root/reference/src/parquet/logical.zig:60-88, is
    # equally unit-only — tz is presentation metadata).
    if pa.types.is_decimal128(t):
        return f"decimal128({t.precision},{t.scale})"
    if pa.types.is_fixed_size_binary(t):
        return f"fixed[{t.byte_width}]"
    if pa.types.is_timestamp(t) and t.tz is not None:
        return f"timestamp[{t.unit},tz={t.tz}]"
    tok = _TYPE_TO_TOKEN.get(str(t))
    if tok is None:
        raise TypeError(f"unsupported arrow type for encoding: {t}")
    return tok


def arrow_type(token: str) -> pa.DataType:
    if token.startswith("decimal128("):
        p, s = token[len("decimal128(") : -1].split(",")
        return pa.decimal128(int(p), int(s))
    if token.startswith("fixed["):
        return pa.binary(int(token[len("fixed[") : -1]))
    if token.startswith("timestamp[") and "tz=" in token:
        unit, tz = token[len("timestamp[") : -1].split(",tz=")
        return pa.timestamp(unit, tz)
    return _TOKEN_TABLE[token][0]


def normalize_ingest(table: pa.Table) -> pa.Table:
    """Source-boundary normalization for legacy parquet inputs.

    INT96 timestamps (old Hive/Spark files) surface from pyarrow as
    ``timestamp[ns]`` — the reference decodes the same i96 nano values at
    /root/reference/src/parquet/dynamic.zig:6-58. Spark's native unit is
    microseconds, so convert ns→us here (truncating, like Spark's own INT96
    reader); every other column passes through untouched. The engine can
    also store ns bit-exact (the timestamp[ns] token) when Arrow-side
    readers want full fidelity — this helper is for Spark-bound pipelines.
    """
    fields = []
    changed = False
    for f in table.schema:
        if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
            fields.append(pa.field(f.name, pa.timestamp("us", tz=f.type.tz), f.nullable))
            changed = True
        else:
            fields.append(f)
    if not changed:
        return table
    return table.cast(pa.schema(fields), safe=False)


def decimal_lanes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null decimal128 array → (lo, hi) int64 lanes, zero-copy.

    Arrow stores decimal128 as 16-byte little-endian two's complement; the
    low word carries the magnitude bits (uint64 semantics, viewed int64 for
    the codec lane), the high word the sign extension — for real money
    precisions (≤18) the hi lane is constant and packs to ~nothing.
    """
    buf = arr.buffers()[1]
    raw = np.frombuffer(buf, dtype="<i8", count=2 * (len(arr) + arr.offset))
    pairs = raw.reshape(-1, 2)[arr.offset :]
    return np.ascontiguousarray(pairs[:, 0]), np.ascontiguousarray(pairs[:, 1])


def decimal_from_lanes(lo: np.ndarray, hi: np.ndarray, token: str) -> pa.Array:
    out = np.empty((len(lo), 2), dtype="<i8")
    out[:, 0] = lo
    out[:, 1] = hi
    return pa.Array.from_buffers(
        arrow_type(token), len(lo), [None, pa.py_buffer(out)]
    )


def numpy_dtype(token: str) -> np.dtype:
    if token.startswith("timestamp["):  # incl. tz-aware: always an i64 lane
        return np.dtype("<i8")
    d = _TOKEN_TABLE[token][1]
    if d is None:
        raise TypeError(f"{token} is variable-width; no fixed numpy dtype")
    return d


def is_string_like(token: str) -> bool:
    return token in ("string", "large_string", "binary", "large_binary")


def is_int_like(token: str) -> bool:
    """Types that reduce to an integer lane (incl. bool/date/timestamp)."""
    return not is_string_like(token) and token not in ("float32", "float64")


def to_physical(arr: pa.Array) -> np.ndarray:
    """Non-null fixed-width Arrow array → contiguous numpy physical view."""
    token = dtype_token(arr.type)
    if is_string_like(token):
        raise TypeError("use string_buffers() for string-like arrays")
    if token == "bool":
        # Arrow stores bools bit-packed (as the reference's PLAIN boolean,
        # /root/reference/src/parquet/physical.zig:14-20); widen to u1 lane.
        return arr.to_numpy(zero_copy_only=False).astype("<u1")
    np_dtype = numpy_dtype(token)
    buf = arr.buffers()[1]
    off = arr.offset
    return np.frombuffer(buf, dtype=np_dtype, count=len(arr) + off)[off:]


def to_int64_lane(arr: pa.Array) -> np.ndarray:
    """Physical view widened to int64 (wrap-exact round-trip via token)."""
    phys = to_physical(arr)
    if phys.dtype.kind == "u":
        return phys.astype(np.uint64, copy=False).view(np.int64) if phys.dtype.itemsize == 8 else phys.astype(np.int64)
    return phys.astype(np.int64, copy=False)


def from_int64_lane(values: np.ndarray, token: str) -> pa.Array:
    np_dtype = numpy_dtype(token)
    if np_dtype.kind == "u" and np_dtype.itemsize == 8:
        phys = values.view(np.uint64)
    else:
        phys = values.astype(np_dtype.base if token != "bool" else "<u1", copy=False)
    if token == "bool":
        return pa.array(phys.astype(bool))
    # zero-copy: py_buffer wraps the ndarray's buffer (and keeps it alive);
    # .tobytes() here used to cost one full extra pass per decoded column
    return pa.Array.from_buffers(
        arrow_type(token), len(values), [None, pa.py_buffer(np.ascontiguousarray(phys))]
    )


def string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null string/binary array → (lengths:int64, data:uint8) zero-copy.

    This is exactly the Arrow offsets+data layout the reference's
    DELTA_LENGTH_BYTE_ARRAY decode reconstructs
    (/root/reference/src/parquet/physical.zig:169-194).
    """
    token = dtype_token(arr.type)
    if token in ("string", "binary"):
        arr = arr.cast(pa.large_string() if token == "string" else pa.large_binary())
        off_dtype = "<i8"
    else:
        off_dtype = "<i8"
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + arr.offset + 1)[arr.offset :]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    lengths = np.diff(offsets)
    start, end = offsets[0], offsets[-1]
    return lengths.astype(np.int64, copy=False), data[start:end]


def strings_from_buffers(lengths: np.ndarray, data: np.ndarray | bytes, token: str) -> pa.Array:
    """Rebuild a string/binary array from lengths + concatenated bytes."""
    n = len(lengths)
    offsets = np.zeros(n + 1, dtype="<i8")
    np.cumsum(lengths, out=offsets[1:])
    data_np = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    big = pa.large_string() if token in ("string", "large_string") else pa.large_binary()
    out = pa.Array.from_buffers(
        big,
        n,
        [None, pa.py_buffer(offsets), pa.py_buffer(np.ascontiguousarray(data_np))],
    )
    return out.cast(arrow_type(token))
