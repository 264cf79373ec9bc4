"""FSST — Fast Static Symbol Table string compression.

NOT in the reference (its closest analog is DELTA_BYTE_ARRAY prefix
compression, /root/reference/src/parquet/physical.zig:196-234); implemented
from the public paper: P. Boncz, T. Neumann, V. Leis, "FSST: Fast Random
Access String Compression", VLDB 2020. Up to 255 symbols of 1–8 bytes,
trained in a few iterations on a bounded sample by maximizing
apparent-gain = frequency × symbol length; code 255 escapes a literal byte.

Deviations from the paper (documented — ours is a storage format, not an
in-memory layout):

- escaped literal bytes go to a *separate* literal stream instead of being
  inlined after the escape code, which removes the sequential escape
  ambiguity and makes decode fully vectorizable;
- the paper's AVX512 kernel is replaced by a *chunk-parallel numpy* encoder:
  the greedy parse advances the cursor of every 256-byte chunk
  simultaneously, deciding each cursor with the paper's own probe shape
  (§4.2): ONE hash slot keyed on the first 3 bytes holding the longest
  symbol per slot, then direct 2-byte / 1-byte tables — a fixed handful of
  whole-array gathers per step, never per-token Python. Matches never
  cross a chunk boundary (≤7 wasted bytes per 256, and it is what makes
  the parse embarrassingly parallel); shorter symbols shadowed by a slot's
  winner cost a little ratio, never correctness (any tokenization decodes
  identically).

The codec compresses the column's concatenated UTF-8 buffer; original string
lengths ride along block-FOR coded so decode re-slices exactly
(bit-identical round-trip, verified via sha256 in the pipeline).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from . import delta_for, dtypes
from .bitio import decode_uleb128, encode_uleb128

NAME = "fsst"

MAX_SYMBOLS = 255  # code 255 reserved for escape
MAX_SYMBOL_LEN = 8
TRAIN_SAMPLE_BYTES = 1 << 15  # paper trains on ≤16 KiB; 32 KiB stratified
TRAIN_ITERATIONS = 4
ESCAPE = 255
CHUNK = 256  # parallel-parse chunk; token matches never cross a boundary
_SEGMENT = 8 << 20  # match-table build segment (bounds temp memory)


def _build_parse_tables(symbols: list[bytes]) -> tuple:
    """Parse tables in the paper's shape (FSST §4.2, 'longest symbol per
    hash slot'): ONE hash probe decides every symbol of length >= 3, direct
    2^16 / 2^8 tables decide lengths 2 and 1 — three fixed vector ops per
    cursor instead of a probe per symbol length.

    Hash: slot = (first3bytes * mult) >> 48 into 2^16 slots; each slot
    stores the big-endian 8-byte-window key of ONE symbol (collisions keep
    the longest, then the higher-gain = lower code), its length, and the
    shift that masks a window down to that length. A miss falls to the
    2-byte then 1-byte table, else escape — shorter same-prefix symbols
    shadowed by a slot's winner cost a little ratio, never correctness
    (any tokenization decodes identically)."""
    mult = np.uint64(0x9E3779B97F4A7C15)
    slot_key = np.zeros(1 << 16, dtype=np.uint64)
    slot_mask = np.zeros(1 << 16, dtype=np.uint64)  # empty slot: mask 0
    # packed side-gather per slot: len | code<<16 (len 0 = empty; its
    # mask 0 makes (w & 0) == 0 true, which the len-0 guard removes)
    slot_meta = np.zeros(1 << 16, dtype=np.uint32)
    # length-2 / length-1 direct tables: ESCAPE = no symbol (real codes
    # are <= 254; 255 is the reserved escape, so the sentinel is free)
    code2 = np.full(1 << 16, ESCAPE, dtype=np.uint8)
    code1 = np.full(1 << 8, ESCAPE, dtype=np.uint8)
    for code, s in enumerate(symbols):
        L = len(s)
        if L == 1:
            if code1[s[0]] == ESCAPE:
                code1[s[0]] = code
        elif L == 2:
            k = s[0] | (s[1] << 8)  # little-endian 2-byte key
            if code2[k] == ESCAPE:
                code2[k] = code
        else:
            # LITTLE-endian window keys: byte i of the text sits at bits
            # 8i, so "starts with symbol" is one mask-and-compare and the
            # per-step byteswap pass disappears
            k3 = int.from_bytes(s[:3], "little")
            slot = (k3 * int(mult)) % (1 << 64) >> 48
            if (slot_meta[slot] & 0xFF) >= L:
                continue  # keep the longest (earlier code wins ties)
            slot_key[slot] = np.uint64(int.from_bytes(s, "little"))
            slot_mask[slot] = np.uint64((1 << (8 * L)) - 1)
            slot_meta[slot] = L | (code << 16)
    return (mult, slot_key, slot_mask, slot_meta, code2, code1)


_COMPRESS_SEGMENT = 2 << 20  # multiple of CHUNK; bounds per-step temporaries


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    """Chunk-parallel greedy encode → varint(n_literals) + literals + codes.

    The input is processed in 2 MB segments (chunk boundaries align, so the
    output is byte-identical to a single pass): per-step temporaries stay
    ~cache-sized and allocator-recycled — with one giant pass they are
    tens of MB each and every allocation becomes a kernel mmap + first-touch
    fault on this host (measured 30× slowdown at 54 MB inputs).
    """
    n = len(data)
    if n == 0:
        return encode_uleb128(0)
    tables = _build_parse_tables(symbols)
    lit_parts: list[bytes] = []
    code_parts: list[bytes] = []
    n_lits = 0
    for off in range(0, n, _COMPRESS_SEGMENT):
        lits, codes = _compress_segment(data[off : off + _COMPRESS_SEGMENT], tables)
        n_lits += len(lits)
        lit_parts.append(lits)
        code_parts.append(codes)
    return encode_uleb128(n_lits) + b"".join(lit_parts) + b"".join(code_parts)


def _compress_segment(data: bytes, tables: tuple) -> tuple[bytes, bytes]:
    """One segment's greedy parse → (literals, codes). The parse advances
    the cursor of every CHUNK-byte chunk simultaneously; each step is a
    FIXED three-probe decision per cursor (≥3-byte hash slot, direct
    2-byte, direct 1-byte — _build_parse_tables), so per-step cost is a
    handful of whole-array numpy ops with no data-dependent Python."""
    mult, slot_key, slot_mask, slot_meta, code2, code1 = tables
    n = len(data)
    arr = np.frombuffer(data, dtype=np.uint8)
    arrp = np.zeros(n + MAX_SYMBOL_LEN, dtype=np.uint8)
    arrp[:n] = arr
    nchunks = (n + CHUNK - 1) // CHUNK
    cursors = np.arange(nchunks, dtype=np.int64) * CHUNK
    chunk_ends = np.minimum(cursors + CHUNK, n)
    # (step, chunk) layout: each step writes ONE contiguous-ish row via
    # fancy column indices instead of strided 2D scatter
    out_codes = np.zeros((CHUNK, nchunks), dtype=np.uint8)
    out_lits = np.zeros((CHUNK, nchunks), dtype=np.uint8)
    counts = np.zeros(nchunks, dtype=np.int64)
    active_idx = np.arange(nchunks)
    # one 8-byte windowed gather per step; keys stay LITTLE-endian (byte i
    # of the text at bits 8i), so matching is mask-and-compare — no
    # byteswap pass
    win = np.lib.stride_tricks.sliding_window_view(arrp, MAX_SYMBOL_LEN)
    m24 = np.uint64(0xFFFFFF)
    m16 = np.uint64(0xFFFF)
    m8 = np.uint64(0xFF)
    step = 0
    while len(active_idx):
        cur = cursors[active_idx]
        na = len(cur)
        w = win[cur].view("<u8").reshape(na)
        rem = chunk_ends[active_idx] - cur
        slot = (((w & m24) * mult) >> np.uint64(48)).astype(np.intp)  # u64 wraps
        meta = slot_meta[slot]
        ln3 = meta & np.uint32(0xFF)
        hit3 = (
            (ln3 != 0)
            & ((w & slot_mask[slot]) == slot_key[slot])
            & (rem >= ln3)
        )
        c2 = code2[(w & m16).astype(np.intp)]
        hit2 = ~hit3 & (c2 != ESCAPE) & (rem >= 2)
        c1 = code1[(w & m8).astype(np.intp)]
        bl = np.where(hit3, ln3.astype(np.int64), np.where(hit2, 2, 1))
        bc = np.where(
            hit3, (meta >> np.uint32(16)).astype(np.uint8),
            np.where(hit2, c2, c1),
        ).astype(np.uint8)
        out_codes[step, active_idx] = bc
        out_lits[step, active_idx] = (w & m8).astype(np.uint8)
        counts[active_idx] += 1
        cursors[active_idx] = cur + bl
        still = cursors[active_idx] < chunk_ends[active_idx]
        active_idx = active_idx[still]
        step += 1
    # back to per-chunk token order for the output streams
    out_codes = out_codes[:step].T.copy()
    out_lits = out_lits[:step].T
    valid = np.arange(step) < counts[:, None]
    codes_stream = out_codes[valid]
    lit_mask = valid & (out_codes == ESCAPE)
    literals = np.ascontiguousarray(out_lits)[lit_mask]
    return literals.tobytes(), codes_stream.tobytes()


_DECOMP_SEG_TOKENS = 1 << 20  # bounds per-pass temporaries (~8 MB)


def decompress(blob, symbols: list[bytes], out_size: int) -> bytes:
    """Vectorized column-wise scatter from the symbol matrix, processed in
    ~1M-token slices: the only full-size allocations are the zero-copy
    codes view and the output buffer — every temporary stays small enough
    for the allocator to recycle (one giant pass page-faults multi-GB of
    fresh temporaries on this host)."""
    buf = memoryview(blob)
    n_lit, pos = decode_uleb128(buf, 0)
    literals = np.frombuffer(buf[pos : pos + n_lit], dtype=np.uint8)
    codes = np.frombuffer(buf[pos + n_lit :], dtype=np.uint8)  # zero-copy
    matrix = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
    lens = np.zeros(256, dtype=np.int32)
    for i, s in enumerate(symbols):
        matrix[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    lens[ESCAPE] = 1
    out = np.empty(out_size, dtype=np.uint8)
    base = 0  # output offset of the current token slice
    pos_lit = 0
    for s in range(0, len(codes), _DECOMP_SEG_TOKENS):
        c = codes[s : s + _DECOMP_SEG_TOKENS]
        tok_lens = lens[c]
        starts = np.empty(len(c) + 1, dtype=np.int64)
        starts[0] = base
        np.cumsum(tok_lens, out=starts[1:])
        starts[1:] += base
        if starts[-1] > out_size:
            raise ValueError(f"fsst decode overflow: {int(starts[-1])} > {out_size}")
        # column-wise scatter: byte j of every token with len > j
        for j in range(MAX_SYMBOL_LEN):
            sel = tok_lens > j
            if not sel.any():
                break
            out[starts[:-1][sel] + j] = matrix[c[sel], j]
        esc = c == ESCAPE
        k = int(esc.sum())
        if k:
            out[starts[:-1][esc]] = literals[pos_lit : pos_lit + k]
            pos_lit += k
        base = int(starts[-1])
    if base != out_size:
        raise ValueError(f"fsst decode size mismatch: {base} != {out_size}")
    return out.tobytes()


def _tokenize(sample: np.ndarray, symbols: list[bytes]) -> list[bytes]:
    """Token sequence of a (small) sample under the current table — derived
    from the real encoder's output, so training sees exactly the parse the
    encoder will produce. Per-token Python only on the bounded sample."""
    body = compress(sample.tobytes(), symbols)
    buf = memoryview(body)
    n_lit, pos = decode_uleb128(buf, 0)
    literals = bytes(buf[pos : pos + n_lit])
    codes = bytes(buf[pos + n_lit :])
    toks = []
    li = 0
    for c in codes:
        if c == ESCAPE:
            toks.append(literals[li : li + 1])
            li += 1
        else:
            toks.append(symbols[c])
    return toks


def train(
    data: bytes,
    sample_bytes: int = TRAIN_SAMPLE_BYTES,
    iterations: int = TRAIN_ITERATIONS,
) -> list[bytes]:
    """Iterative apparent-gain symbol selection (paper §4.4, simplified).

    The sample is *stratified*: evenly-spaced 512-byte slices across the
    whole buffer, so a multi-language corpus contributes symbols from every
    region rather than just the head.
    """
    if not data:
        return []
    if len(data) <= sample_bytes:
        sample = np.frombuffer(data, dtype=np.uint8)
    else:
        n_slices = max(1, sample_bytes // 512)
        starts = np.linspace(0, len(data) - 512, n_slices).astype(np.int64)
        whole = np.frombuffer(data, dtype=np.uint8)
        sample = np.concatenate([whole[s : s + 512] for s in starts])
    symbols: list[bytes] = []
    for _ in range(iterations):
        if not symbols:
            byte_freq = np.bincount(sample, minlength=256)
            cand: Counter = Counter()
            for b in np.flatnonzero(byte_freq):
                cand[bytes([int(b)])] = int(byte_freq[b])
            if len(sample) > 1:
                pairs = sample[:-1].astype(np.uint16) * 256 + sample[1:]
                pair_freq = np.bincount(pairs, minlength=65536)
                top = np.argsort(pair_freq)[-512:]
                for p in top:
                    if pair_freq[p]:
                        cand[bytes([int(p) >> 8, int(p) & 0xFF])] = int(pair_freq[p]) * 2
        else:
            tokens = _tokenize(sample, symbols)
            freq = Counter(tokens)
            cand = Counter()
            for tok, f in freq.items():
                cand[tok] += f * len(tok)
            prev = None
            for tok in tokens:
                if prev is not None and len(prev) + len(tok) <= MAX_SYMBOL_LEN:
                    cand[prev + tok] += len(prev) + len(tok)
                prev = tok
        symbols = [s for s, _ in cand.most_common(MAX_SYMBOLS)]
    return symbols


def encode(arr: pa.Array, symbols: list[bytes] | None = None) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    if not dtypes.is_string_like(token):
        raise TypeError(f"fsst codec is for string-like types, got {token}")
    lengths, data = dtypes.string_buffers(arr)
    raw = data.tobytes()
    if symbols is None:
        symbols = train(raw)
    body = compress(raw, symbols)
    lens_blob, lens_meta = delta_for.encode(pa.array(lengths, pa.int64()), mode="for")
    meta = {
        "dtype": token,
        "symbols": [s.hex() for s in symbols],  # symbol table → manifest
        "raw_size": len(raw),
        "lens_meta": lens_meta,
        "sections": [len(lens_blob), len(body)],
    }
    return lens_blob + body, meta


def decode(blob, meta: dict, n: int) -> pa.Array:
    s0, _ = meta["sections"]
    mv = memoryview(blob)
    lengths = delta_for.decode(mv[:s0], meta["lens_meta"], n).to_numpy(zero_copy_only=False)
    symbols = [bytes.fromhex(h) for h in meta["symbols"]]
    raw = decompress(mv[s0:], symbols, meta["raw_size"])
    return dtypes.strings_from_buffers(lengths, np.frombuffer(raw, np.uint8), meta["dtype"])
