"""RLE / bit-packed hybrid — the workhorse for levels, indices, low-card ints.

Re-creates the reference's hybrid decode semantics
(/root/reference/src/parquet/physical.zig:71-94) in both directions:
a header per run — LSB=0 → RLE run of (header>>1) repeats of one value;
LSB=1 → bit-packed run. Deviations (documented): headers are a contiguous
u32 side-channel in front of the payload instead of Parquet's interleaved
ULEB128 stream, runs carry exact value counts (no groups-of-8 padding),
and all bit-packed spans share ONE contiguous LSB-first little-endian bit
stream (the bit order the reference's BitReader consumes,
/root/reference/src/parquet/BitReader.zig:19-66).

Why the layout change: interleaved varint headers force a per-segment
Python loop on decode (~65k iterations for a 64 MB int64 partition — the
old decode-throughput ceiling). With fixed-width headers up front, decode
is four numpy calls end to end: frombuffer(headers) → one unpack of the
whole bit stream → np.repeat of RLE fills → one masked scatter. Encode is
equally loop-free (run segmentation via np.diff, RLE/bit-pack split via
np.repeat masks). Contiguous same-kind sections also compress better under
the outer block codec than interleaved headers did.

Blob layout: [n_seg u32][headers u32·n_seg: count<<1|is_bitpacked]
[RLE values vbytes·n_rle][bit-packed payload].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes
from .bitio import bit_width_u64, pack_bits_le, unpack_bits_le

NAME = "rle"

_MAX_COUNT = (1 << 31) - 1  # u32 headers; one blob is one partition-column


def _min_rle_run(width: int) -> int:
    """Run length where an RLE segment beats staying in a bit-packed span.

    An RLE segment costs (4-byte header + ceil(width/8) value bytes) and
    splits the surrounding span (one more 4-byte header), so break-even is
    8*(8+vbytes)/width bits; floor 8.
    """
    vbytes = (width + 7) // 8
    return max(8, (8 * (8 + vbytes) + width - 1) // width)


def encode_u64(values: np.ndarray, width: int | None = None) -> tuple[bytes, int]:
    """Encode a uint64 array; returns (blob, bit_width). Core kernel."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n > _MAX_COUNT:
        raise ValueError(f"rle blob limited to {_MAX_COUNT} values, got {n}")
    if width is None:
        width = int(bit_width_u64(np.array([v.max() if n else 0], dtype=np.uint64))[0]) or 1
    if n == 0:
        return b"", width
    vbytes = (width + 7) // 8
    # Run segmentation (vectorized).
    change = np.flatnonzero(v[1:] != v[:-1])
    starts = np.concatenate(([0], change + 1)).astype(np.int64)
    run_lens = np.diff(np.concatenate((starts, [n])))
    is_rle = run_lens >= _min_rle_run(width)
    # Coalesce consecutive short runs into bit-packed spans: a run starts a
    # new segment iff it is the first run, it is RLE, or the previous run
    # was RLE.
    if len(starts) == 1:
        seg_first = np.array([0], dtype=np.int64)
    else:
        new_seg = np.concatenate(([True], is_rle[1:] | is_rle[:-1]))
        seg_first = np.flatnonzero(new_seg).astype(np.int64)
    seg_start_vals = starts[seg_first]
    seg_end_vals = np.concatenate((seg_start_vals[1:], [n]))
    seg_counts = (seg_end_vals - seg_start_vals).astype(np.uint32)
    seg_is_bp = ~is_rle[seg_first]
    headers = (seg_counts.astype(np.uint32) << np.uint32(1)) | seg_is_bp.astype(np.uint32)
    # RLE values: one per RLE segment, vbytes LE each (vectorized slice of
    # the u64 little-endian byte matrix).
    rle_vals = v[seg_start_vals[~seg_is_bp]]
    rle_bytes = rle_vals.view(np.uint8).reshape(-1, 8)[:, :vbytes].tobytes()
    # Bit-packed payload: every value belonging to a bit-packed segment, in
    # order, packed as ONE contiguous stream.
    bp_mask = np.repeat(seg_is_bp, seg_counts.astype(np.int64))
    packed = pack_bits_le(v[bp_mask], width)
    out = bytearray()
    out += np.uint32(len(headers)).tobytes()
    out += headers.astype("<u4").tobytes()
    out += rle_bytes
    out += packed
    return bytes(out), width


def decode_u64(blob, n: int, width: int) -> np.ndarray:
    """Vectorized inverse: headers → one unpack + one repeat + one scatter."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    buf = np.frombuffer(blob, dtype=np.uint8)
    n_seg = int(np.frombuffer(buf[:4], dtype="<u4")[0])
    headers = np.frombuffer(buf[4 : 4 + 4 * n_seg], dtype="<u4")
    counts = (headers >> np.uint32(1)).astype(np.int64)
    is_bp = (headers & np.uint32(1)).astype(bool)
    vbytes = (width + 7) // 8
    n_rle = int((~is_bp).sum())
    pos = 4 + 4 * n_seg
    rle_raw = buf[pos : pos + n_rle * vbytes]
    pos += n_rle * vbytes
    rle_vals = np.zeros((n_rle, 8), dtype=np.uint8)
    rle_vals[:, :vbytes] = rle_raw.reshape(n_rle, vbytes)
    rle_vals = rle_vals.view("<u8").reshape(n_rle)
    total_bp = int(counts[is_bp].sum())
    unpacked = unpack_bits_le(buf[pos:], total_bp, width)
    out = np.empty(n, dtype=np.uint64)
    bp_mask = np.repeat(is_bp, counts)
    out[bp_mask] = unpacked
    out[~bp_mask] = np.repeat(rle_vals, counts[~is_bp])
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
