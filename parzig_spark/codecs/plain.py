"""PLAIN codec — fixed-width little-endian values / length-prefixed bytes.

Re-creates the reference's PLAIN decode semantics in both directions
(/root/reference/src/parquet/physical.zig:13-57): ints/floats as raw
little-endian lanes, booleans bit-packed 1 bit LSB-first, byte arrays as
lengths + bytes. Deviation (documented): string lengths live in a contiguous
u32 lane *before* the data bytes instead of interleaved u32 prefixes — same
information, but vectorizable with numpy in one pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes
from .bitio import pack_bits_le, unpack_bits_le

NAME = "plain"


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    meta: dict = {"dtype": token}
    if dtypes.is_string_like(token):
        lengths, data = dtypes.string_buffers(arr)
        if len(lengths) and int(lengths.max()) >= 1 << 32:
            lens_blob = lengths.astype("<u8").tobytes()
            meta["len_width"] = 8
        else:
            lens_blob = lengths.astype("<u4").tobytes()
            meta["len_width"] = 4
        return lens_blob + data.tobytes(), meta
    if token == "bool":
        phys = dtypes.to_physical(arr)
        return pack_bits_le(phys.astype("<u8"), 1), meta
    phys = dtypes.to_physical(arr)
    return np.ascontiguousarray(phys).tobytes(), meta


def decode(blob, meta: dict, n: int) -> pa.Array:
    token = meta["dtype"]
    if dtypes.is_string_like(token):
        width = meta.get("len_width", 4)
        s0 = n * width
        lengths = np.frombuffer(blob[:s0], dtype=f"<u{width}").astype(np.int64)
        return dtypes.strings_from_buffers(lengths, np.frombuffer(blob[s0:], dtype=np.uint8), token)
    if token == "bool":
        bits = unpack_bits_le(blob, n, 1)
        return pa.array(bits.astype(bool))
    np_dtype = dtypes.numpy_dtype(token)
    values = np.frombuffer(blob, dtype=np_dtype, count=n)
    return pa.Array.from_buffers(
        dtypes.arrow_type(token), n, [None, pa.py_buffer(np.ascontiguousarray(values))]
    )
