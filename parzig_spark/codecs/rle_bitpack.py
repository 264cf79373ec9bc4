"""RLE / bit-packed hybrid — the workhorse for levels, indices, low-card ints.

Re-creates the reference's hybrid decode semantics
(/root/reference/src/parquet/physical.zig:71-94) in both directions:
a ULEB128 header per run — LSB=0 → RLE run of (header>>1) repeats of one
bit-packed value; LSB=1 → bit-packed run. Deviation (documented): our
bit-packed run header carries the *exact* value count ((count<<1)|1) instead
of Parquet's groups-of-8, so mid-stream runs need no padding; values are
packed LSB-first little-endian exactly like the reference's BitReader
(/root/reference/src/parquet/BitReader.zig:19-66).

Encode is vectorized: run boundaries via np.diff, long runs become RLE,
consecutive short runs coalesce into one bit-packed span packed in a single
numpy pass. The per-segment Python loop is O(#segments), not O(n).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes
from .bitio import (
    bit_width_u64,
    decode_uleb128,
    encode_uleb128,
    pack_bits_le,
    unpack_bits_le,
)

NAME = "rle"

def _min_rle_run(width: int) -> int:
    """Run length where an RLE segment beats staying in a bit-packed span.

    An RLE segment costs ~(varint header + ceil(width/8) value bytes) and
    splits the surrounding span (one more header), so require ~1.5× the
    break-even run of 8*(1+vbytes)/width bits, floor 8.
    """
    vbytes = (width + 7) // 8
    return max(8, (12 * (1 + vbytes) + width - 1) // width)


def encode_u64(values: np.ndarray, width: int | None = None) -> tuple[bytes, int]:
    """Encode a uint64 array; returns (blob, bit_width). Core kernel."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if width is None:
        width = int(bit_width_u64(np.array([v.max() if n else 0], dtype=np.uint64))[0]) or 1
    if n == 0:
        return b"", width
    # Run-length extraction.
    change = np.flatnonzero(v[1:] != v[:-1])
    starts = np.concatenate(([0], change + 1))
    run_lens = np.diff(np.concatenate((starts, [n])))
    is_rle = run_lens >= _min_rle_run(width)
    out = bytearray()
    vbytes = (width + 7) // 8
    i = 0
    nruns = len(starts)
    while i < nruns:
        if is_rle[i]:
            count = int(run_lens[i])
            out += encode_uleb128(count << 1)
            out += int(v[starts[i]]).to_bytes(vbytes, "little")
            i += 1
        else:
            # Coalesce consecutive short runs into one bit-packed span.
            j = i
            while j < nruns and not is_rle[j]:
                j += 1
            span_start = int(starts[i])
            span_end = int(starts[j]) if j < nruns else n
            count = span_end - span_start
            out += encode_uleb128((count << 1) | 1)
            out += pack_bits_le(v[span_start:span_end], width)
            i = j
    return bytes(out), width


def decode_u64(blob, n: int, width: int) -> np.ndarray:
    out = np.empty(n, dtype=np.uint64)
    pos = 0
    filled = 0
    buf = memoryview(blob)
    vbytes = (width + 7) // 8
    while filled < n:
        header, pos = decode_uleb128(buf, pos)
        count = header >> 1
        if header & 1:
            nbytes = (count * width + 7) // 8
            out[filled : filled + count] = unpack_bits_le(buf[pos : pos + nbytes], count, width)
            pos += nbytes
        else:
            val = int.from_bytes(buf[pos : pos + vbytes], "little")
            pos += vbytes
            out[filled : filled + count] = val
        filled += count
    return out


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if dtypes.is_string_like(token) or token in ("float32", "float64"):
        raise TypeError(f"rle codec is for integer-lane types, got {token}")
    lane = dtypes.to_int64_lane(arr)
    # Frame-of-reference shift so negatives pack tightly (wrap-exact uint64).
    frame = int(lane.min()) if len(lane) else 0
    shifted = (lane.view(np.uint64) - np.uint64(frame & 0xFFFFFFFFFFFFFFFF))
    blob, width = encode_u64(shifted)
    return blob, {"dtype": token, "width": width, "frame": frame}


def decode(blob, meta: dict, n: int) -> pa.Array:
    shifted = decode_u64(blob, n, meta["width"])
    lane = (shifted + np.uint64(meta["frame"] & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    return dtypes.from_int64_lane(lane, meta["dtype"])
