"""FSST — Fast Static Symbol Table string compression.

NOT in the reference (its closest analog is DELTA_BYTE_ARRAY prefix
compression, /root/reference/src/parquet/physical.zig:196-234); implemented
from the public paper: P. Boncz, T. Neumann, V. Leis, "FSST: Fast Random
Access String Compression", VLDB 2020. Up to 255 symbols of 1–8 bytes,
trained in a few iterations on a bounded sample by maximizing
apparent-gain = frequency × symbol length; code 255 escapes a literal byte.

Deviations from the paper (documented — ours is a storage format, not an
in-memory layout): escaped literal bytes go to a *separate* literal stream
instead of being inlined after the escape code, which removes the sequential
escape ambiguity and makes decode fully vectorizable in numpy (symbol-matrix
gather + ragged mask, zero per-byte Python). Encode tokenizes with a
longest-first compiled regex alternation (C-speed matching; one Python
callback per emitted token, not per byte).

The codec compresses the column's concatenated UTF-8 buffer; original string
lengths ride along block-FOR coded so decode re-slices exactly
(bit-identical round-trip, verified via sha256 in the pipeline).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

from . import delta_for, dtypes
from .bitio import decode_uleb128, encode_uleb128

NAME = "fsst"

MAX_SYMBOLS = 255  # code 255 reserved for escape
MAX_SYMBOL_LEN = 8
TRAIN_SAMPLE_BYTES = 1 << 16
TRAIN_ITERATIONS = 4
ESCAPE = 255


def _compile(symbols: list[bytes]) -> re.Pattern:
    # Longest-first alternation == greedy longest match at each position;
    # trailing (?s:.) catches any single byte as an escape literal.
    alts = sorted(symbols, key=len, reverse=True)
    pattern = b"|".join(re.escape(s) for s in alts) + (b"|" if alts else b"") + b"(?s:.)"
    return re.compile(pattern)


def train(data: bytes, sample_bytes: int = TRAIN_SAMPLE_BYTES) -> list[bytes]:
    """Iterative apparent-gain symbol selection (paper §4.4, simplified)."""
    sample = data[:sample_bytes]
    if not sample:
        return []
    symbols: list[bytes] = []
    for _ in range(TRAIN_ITERATIONS):
        if not symbols:
            # Bootstrap round: tokens are single bytes — count bytes and
            # 2-grams vectorized.
            arr = np.frombuffer(sample, dtype=np.uint8)
            byte_freq = np.bincount(arr, minlength=256)
            cand: Counter = Counter()
            for b in np.flatnonzero(byte_freq):
                cand[bytes([b])] = int(byte_freq[b])
            if len(arr) > 1:
                pairs = arr[:-1].astype(np.uint16) * 256 + arr[1:]
                pair_freq = np.bincount(pairs, minlength=65536)
                top = np.argsort(pair_freq)[-512:]
                for p in top:
                    if pair_freq[p]:
                        cand[bytes([p >> 8, p & 0xFF])] = int(pair_freq[p]) * 2
        else:
            patt = _compile(symbols)
            tokens = patt.findall(sample)
            freq = Counter(tokens)
            cand = Counter()
            for tok, f in freq.items():
                cand[tok] += f * len(tok)
            prev = None
            for tok in tokens:
                if prev is not None and len(prev) + len(tok) <= MAX_SYMBOL_LEN:
                    cand[prev + tok] += (len(prev) + len(tok))
                prev = tok
        symbols = [s for s, _ in cand.most_common(MAX_SYMBOLS)]
    return symbols


def compress(data: bytes, symbols: list[bytes]) -> bytes:
    """Greedy longest-match encode → varint(n_literals) + literals + codes."""
    code_of = {s: bytes([i]) for i, s in enumerate(symbols)}
    literals = bytearray()
    esc = bytes([ESCAPE])

    def repl(m: re.Match) -> bytes:
        s = m.group(0)
        c = code_of.get(s)
        if c is not None:
            return c
        literals.extend(s)  # catch-all matched a single unknown byte
        return esc

    codes = _compile(symbols).sub(repl, data) if symbols else None
    if codes is None:
        literals.extend(data)
        codes = esc * len(data)
    return encode_uleb128(len(literals)) + bytes(literals) + codes


def decompress(blob, symbols: list[bytes], out_size: int) -> bytes:
    """Fully vectorized: gather (256,8) symbol matrix rows, ragged-mask out."""
    buf = memoryview(blob)
    n_lit, pos = decode_uleb128(buf, 0)
    literals = np.frombuffer(buf[pos : pos + n_lit], dtype=np.uint8)
    codes = np.frombuffer(buf[pos + n_lit :], dtype=np.uint8)
    matrix = np.zeros((256, MAX_SYMBOL_LEN), dtype=np.uint8)
    lens = np.zeros(256, dtype=np.int64)
    for i, s in enumerate(symbols):
        matrix[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    lens[ESCAPE] = 1
    rows = matrix[codes]  # (n_codes, 8)
    if n_lit:
        esc_rows = codes == ESCAPE
        rows[esc_rows, 0] = literals
    tok_lens = lens[codes]
    mask = np.arange(MAX_SYMBOL_LEN) < tok_lens[:, None]
    out = rows[mask]
    if len(out) != out_size:
        raise ValueError(f"fsst decode size mismatch: {len(out)} != {out_size}")
    return out.tobytes()


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
