"""BIT_PACKED codec — fixed-width packing of a whole integer-lane column.

Re-creates the reference's legacy BIT_PACKED level decode
(/root/reference/src/parquet/physical.zig:96-101) in both directions, with a
frame-of-reference shift so any narrow-*range* column (not just narrow-value)
packs tightly. Deviation (documented): we use little-endian bit order like
the reference's RLE hybrid (BitReader.zig) rather than the legacy big-endian
order — our decode defines our format.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes
from .bitio import bit_width_u64, pack_bits_le, unpack_bits_le

NAME = "bitpack"


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if dtypes.is_string_like(token) or token in ("float32", "float64"):
        raise TypeError(f"bitpack codec is for integer-lane types, got {token}")
    lane = dtypes.to_int64_lane(arr)
    frame = int(lane.min()) if len(lane) else 0
    shifted = lane.view(np.uint64) - np.uint64(frame & 0xFFFFFFFFFFFFFFFF)
    width = int(bit_width_u64(np.array([shifted.max() if len(lane) else 0], np.uint64))[0]) or 1
    return pack_bits_le(shifted, width), {"dtype": token, "width": width, "frame": frame}


def decode(blob, meta: dict, n: int) -> pa.Array:
    shifted = unpack_bits_le(blob, n, meta["width"])
    lane = (shifted + np.uint64(meta["frame"] & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    return dtypes.from_int64_lane(lane, meta["dtype"])
