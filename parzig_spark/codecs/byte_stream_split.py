"""BYTE_STREAM_SPLIT codec — byte-plane transposition for floats.

Re-creates /root/reference/src/parquet/physical.zig:236-257 in both
directions: value i's byte k is stored at plane k (`value_buf[i + len*k]`),
which groups exponent bytes together so an outer block codec compresses
them far better than interleaved IEEE754 floats. Encode/decode are a single
numpy reshape+transpose (zero arithmetic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes

NAME = "byte_stream_split"


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if dtypes.is_string_like(token) or token == "bool":
        raise TypeError(f"byte_stream_split is for fixed-width types, got {token}")
    phys = np.ascontiguousarray(dtypes.to_physical(arr))
    width = phys.dtype.itemsize
    planes = phys.view(np.uint8).reshape(len(phys), width).T
    return np.ascontiguousarray(planes).tobytes(), {"dtype": token, "width": width}


def decode(blob, meta: dict, n: int) -> pa.Array:
    token = meta["dtype"]
    width = meta["width"]
    planes = np.frombuffer(blob, dtype=np.uint8, count=n * width).reshape(width, n)
    phys = np.ascontiguousarray(planes.T).reshape(-1).view(dtypes.numpy_dtype(token))
    return pa.Array.from_buffers(
        dtypes.arrow_type(token), n, [None, pa.py_buffer(np.ascontiguousarray(phys))]
    )
