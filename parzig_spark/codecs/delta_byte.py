"""DELTA_BYTE_ARRAY codec — incremental (prefix) string compression.

Re-creates /root/reference/src/parquet/physical.zig:196-234 in both
directions: value[i] = value[i-1][:prefix_len[i]] + suffix[i]. Wins on
sorted or clustered string columns (paths, URLs, identifiers).

Both directions are fully vectorized despite the sequential-looking chain:

- encode: adjacent common prefixes via a (n, 64) first-bytes matrix
  (cumprod of byte equality), suffix extraction via a diff-mask cumsum —
  prefixes are capped at 64 bytes, which captures virtually all sharing;
- decode: the chain value[i] ← value[i-1] only ever copies bytes at
  column positions k < 64, and for a fixed k the dependency is exactly a
  forward-fill along rows — resolved with one maximum.accumulate gather per
  column. 64 vectorized passes, no per-row Python.

Layout: [FOR(prefix_lens)][FOR(suffix_lens)][suffix bytes].
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import delta_for, dtypes

NAME = "delta_byte"
PREFIX_CAP = 64


def _first_bytes_matrix(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """(n, PREFIX_CAP) matrix of each value's first bytes.

    ONE windowed gather (sliding_window_view + row fancy-index) — no index
    matrix, no validity masking. Rows may carry the next value's bytes past
    their own length; that is sound because the caller bounds every prefix
    by min(len_i, len_{i-1}) ≤ PREFIX_CAP, and positions below that cap are
    real bytes of both values."""
    n = len(lengths)
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    padded = np.zeros(max(len(data), 1) + PREFIX_CAP, dtype=np.uint8)
    padded[: len(data)] = data
    return np.lib.stride_tricks.sliding_window_view(padded, PREFIX_CAP)[offsets]


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if not dtypes.is_string_like(token):
        raise TypeError(f"delta_byte codec is for string-like types, got {token}")
    lengths, data = dtypes.string_buffers(arr)
    n = len(lengths)
    if n == 0:
        prefix = np.zeros(0, dtype=np.int64)
    else:
        m = _first_bytes_matrix(lengths, data)
        eq = m[1:] == m[:-1]
        # leading-equal count per row = index of the first mismatch
        # (argmin on the bool row; all-equal rows need the explicit cap) —
        # two reductions instead of a cumprod+sum pass
        run = np.argmin(eq, axis=1)
        run[eq.all(axis=1)] = PREFIX_CAP
        cap = np.minimum(lengths[1:], lengths[:-1])
        prefix = np.concatenate(([0], np.minimum(run, np.minimum(cap, PREFIX_CAP))))
    suffix_lens = lengths - prefix
    # Drop each value's first prefix[i] bytes via a diff-mask cumsum.
    total = int(lengths.sum())
    offsets = np.zeros(n, dtype=np.int64)
    if n:
        np.cumsum(lengths[:-1], out=offsets[1:])
    # prefix regions [off_i, off_i+prefix_i) are disjoint (each lies inside
    # its own value's span), so the running sum is only ever 0/1 — int8
    # lanes cut the diff-mask cumsum traffic 8×
    d = np.zeros(total + 1, dtype=np.int8)
    np.add.at(d, offsets, 1)
    np.add.at(d, offsets + prefix, -1)
    keep = np.cumsum(d[:total], dtype=np.int8) == 0
    suffix_data = data[keep]
    p_blob, p_meta = delta_for.encode(pa.array(prefix, pa.int64()), mode="for")
    s_blob, s_meta = delta_for.encode(pa.array(suffix_lens, pa.int64()), mode="for")
    meta = {
        "dtype": token,
        "p_meta": p_meta,
        "s_meta": s_meta,
        "sections": [len(p_blob), len(s_blob), int(suffix_data.nbytes)],
    }
    return p_blob + s_blob + suffix_data.tobytes(), meta


def decode(blob, meta: dict, n: int) -> pa.Array:
    s0, s1, _ = meta["sections"]
    mv = memoryview(blob)
    prefix = delta_for.decode(mv[:s0], meta["p_meta"], n).to_numpy(zero_copy_only=False)
    suffix_lens = delta_for.decode(mv[s0 : s0 + s1], meta["s_meta"], n).to_numpy(
        zero_copy_only=False
    )
    suffix_data = np.frombuffer(mv[s0 + s1 :], dtype=np.uint8)
    lengths = prefix + suffix_lens
    total = int(lengths.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.zeros(n, dtype=np.int64)
    if n:
        np.cumsum(lengths[:-1], out=offsets[1:])
    # Scatter suffix bytes into their final positions (complement of the
    # prefix regions — same diff-mask as encode).
    d = np.zeros(total + 1, dtype=np.int8)  # disjoint regions: sum stays 0/1
    np.add.at(d, offsets, 1)
    np.add.at(d, offsets + prefix, -1)
    is_suffix = np.cumsum(d[:total], dtype=np.int8) == 0
    out[is_suffix] = suffix_data
    pmax = int(prefix.max()) if n else 0
    if pmax > 0:
        # Column-wise forward-fill for byte positions k < max prefix. Every
        # copied byte reads a byte its source row OWNS (scattered above from
        # suffix_data, never itself a copy), so copy order is irrelevant —
        # which lets the row dimension chunk freely. Chunking matters: the
        # old whole-table (n, 64) index/gather matrices allocated hundreds
        # of MB of fresh temporaries per few-MB column, and this host faults
        # fresh pages in at ~100 MB/s (CLAUDE.md) — a 187k-row decode spent
        # 1.8 s here. Fixed-size chunks reuse allocator-recycled buffers and
        # k stops at the real max prefix instead of PREFIX_CAP.
        k = np.arange(pmax, dtype=np.int64)
        carry = np.full(pmax, -1, dtype=np.int64)  # last owning row so far
        chunk = max(1, (1 << 19) // max(pmax, 1))
        for r0 in range(0, n, chunk):
            r1 = min(r0 + chunk, n)
            rows = np.arange(r0, r1, dtype=np.int64)
            own = k[None, :] >= prefix[r0:r1, None]
            src = np.where(own, rows[:, None], -1)
            np.maximum.accumulate(src, axis=0, out=src)
            src = np.maximum(src, carry[None, :])
            carry = src[-1].copy()
            copy_mask = ~own & (k[None, :] < lengths[r0:r1, None])
            wi, wk = np.nonzero(copy_mask)
            if wi.size:
                srcv = src[wi, wk]
                out[offsets[r0 + wi] + wk] = out[offsets[srcv] + wk]
    return dtypes.strings_from_buffers(lengths, out, meta["dtype"])
