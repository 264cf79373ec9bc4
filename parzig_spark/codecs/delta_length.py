"""DELTA_LENGTH_BYTE_ARRAY codec — FOR-coded lengths + concatenated bytes.

Re-creates /root/reference/src/parquet/physical.zig:169-194 in both
directions: the decode there rebuilds slices from prefix-summed lengths —
which is exactly the Arrow offsets+data layout, so encode is zero-copy off
the Arrow buffers. Lengths are block-FOR coded (delta_for mode="for": random
lengths rarely benefit from deltas, but a min-frame does).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import delta_for, dtypes

NAME = "delta_length"


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if not dtypes.is_string_like(token):
        raise TypeError(f"delta_length codec is for string-like types, got {token}")
    lengths, data = dtypes.string_buffers(arr)
    lens_blob, lens_meta = delta_for.encode(pa.array(lengths, pa.int64()), mode="for")
    meta = {"dtype": token, "lens_meta": lens_meta, "sections": [len(lens_blob), int(data.nbytes)]}
    return lens_blob + data.tobytes(), meta


def decode(blob, meta: dict, n: int) -> pa.Array:
    s0, _ = meta["sections"]
    mv = memoryview(blob)
    lengths = delta_for.decode(mv[:s0], meta["lens_meta"], n).to_numpy(zero_copy_only=False)
    return dtypes.strings_from_buffers(lengths, np.frombuffer(mv[s0:], np.uint8), meta["dtype"])
