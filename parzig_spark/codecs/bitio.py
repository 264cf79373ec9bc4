"""Bit-level primitives: little-endian bit packing and LEB128 varints.

Semantics mirror the reference's bit reader (little-endian bit order within
bytes, values packed LSB-first: /root/reference/src/parquet/BitReader.zig:19-66)
and the ULEB128 varints used by its RLE hybrid and delta decoders
(/root/reference/src/parquet/physical.zig:71-94,103-167). Golden cross-check:
bytes {0x05,0x39,0x77} at width 3 decode to 0..7
(/root/reference/src/parquet/physical.zig:259-267) — pinned in tests.

All kernels are vectorized numpy; no per-value Python in pack/unpack.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "pack_bits_le",
    "unpack_bits_le",
    "bit_width_u64",
    "encode_uleb128",
    "decode_uleb128",
    "zigzag_encode_i64",
    "zigzag_decode_u64",
]


def bit_width_u64(values: np.ndarray) -> np.ndarray:
    """Element-wise minimal bit width (0 for value 0), vectorized.

    Works on uint64 without float round-off (log2 is unsafe past 2^53).
    """
    v = np.asarray(values, dtype=np.uint64).copy()
    w = np.zeros(v.shape, dtype=np.uint64)
    for s in (np.uint64(32), np.uint64(16), np.uint64(8), np.uint64(4), np.uint64(2), np.uint64(1)):
        m = v >= (np.uint64(1) << s)
        w += s * m
        v >>= s * m
    w += v > 0
    return w


def pack_bits_le(values: np.ndarray, width: int) -> bytes:
    """Pack unsigned ints into ``width`` bits each, LSB-first within bytes.

    Matches the bit order the reference's BitReader consumes
    (/root/reference/src/parquet/BitReader.zig:39-55).

    Fast path (width ≤ 56, the symmetric twin of unpack's 8-byte gather):
    8 values always span exactly ``width`` BYTES, so blocks of 8 pack into
    ceil(width/8) uint64 lane accumulators with one constant-shift OR per
    (value, lane) — ~width/8 bytes of traffic per value instead of the 64+
    of the (n, 64) bit-matrix route it replaces (which encode throughput
    of every FOR/bitpack/RLE lane was bound by).
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    out_bytes = (n * width + 7) // 8
    if width > 56:
        v = np.ascontiguousarray(values, dtype="<u8")
        bits = np.unpackbits(v.view(np.uint8).reshape(n, 8), axis=1, bitorder="little")[:, :width]
        return np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    v = np.ascontiguousarray(values, dtype="<u8")
    mask = np.uint64((1 << width) - 1)
    nb = (n + 7) // 8
    if n != nb * 8:
        vp = np.zeros(nb * 8, dtype="<u8")
        vp[:n] = v
        v = vp
    blocks = v.reshape(nb, 8)
    n_lanes = (width + 7) // 8  # 64-bit lanes per 8-value block
    lanes = np.zeros((nb, n_lanes), dtype="<u8")
    for i in range(8):
        col = blocks[:, i] & mask
        start = i * width
        for j in range(n_lanes):
            rel = start - 64 * j
            if rel >= 64 or rel <= -width:
                continue
            if rel >= 0:
                lanes[:, j] |= col << np.uint64(rel)
            else:
                lanes[:, j] |= col >> np.uint64(-rel)
    # each block contributes exactly `width` bytes, little-endian
    block_bytes = lanes.view(np.uint8).reshape(nb, n_lanes * 8)[:, :width]
    return np.ascontiguousarray(block_bytes).reshape(-1)[:out_bytes].tobytes()


def unpack_bits_le(buf: bytes | np.ndarray, n: int, width: int, offset_bits: int = 0) -> np.ndarray:
    """Inverse of :func:`pack_bits_le` → uint64 array of length ``n``.

    Fast path (width ≤ 56): per-value 8-byte little-endian gather + element
    shift + mask — ~8 bytes of memory traffic per value, vs 64+ for the
    bit-matrix route (np.unpackbits to (n,64) then packbits), which decode
    throughput was previously bound by. A value at bit offset o (o ≤ 7)
    with width ≤ 56 always fits inside the u64 loaded at its start byte;
    wider widths take the exact bit-matrix path.
    """
    if n == 0 or width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    if width <= 56:
        pos = offset_bits + np.arange(n, dtype=np.int64) * width
        byte_idx = pos >> 3
        bit_off = (pos & 7).astype(np.uint64)
        need = int(byte_idx[-1]) + 8
        if len(raw) < need:
            raw = np.concatenate([raw, np.zeros(need - len(raw), dtype=np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(raw, 8)[byte_idx]
        vals = np.ascontiguousarray(win).view("<u8").reshape(n)
        mask = np.uint64((1 << width) - 1)
        return (vals >> bit_off) & mask
    total_bits = offset_bits + n * width
    nbytes = (total_bits + 7) // 8
    bits = np.unpackbits(raw[:nbytes], bitorder="little")[offset_bits : offset_bits + n * width]
    bits = bits.reshape(n, width)
    # Pad each row to 64 bits and reinterpret as little-endian uint64.
    padded = np.zeros((n, 64), dtype=np.uint8)
    padded[:, :width] = bits
    return np.packbits(padded, axis=1, bitorder="little").view("<u8").reshape(n)


def encode_uleb128(value: int) -> bytes:
    """Unsigned LEB128 (as in /root/reference/src/thrift/protocol/compact.zig:4-12)."""
    if value < 0:
        raise ValueError("uleb128 requires non-negative")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_uleb128(buf, pos: int) -> tuple[int, int]:
    """Returns (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag_encode_i64(values: np.ndarray) -> np.ndarray:
    """Zigzag map int64 → uint64 ((v<<1)^(v>>63)), wrap-exact.

    Mirrors /root/reference/src/thrift/protocol/compact.zig:14-20.
    """
    v = np.asarray(values).astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode_u64(values: np.ndarray) -> np.ndarray:
    u = np.asarray(values, dtype=np.uint64)
    return ((u >> np.uint64(1)) ^ (np.uint64(0) - (u & np.uint64(1)))).view(np.int64)
