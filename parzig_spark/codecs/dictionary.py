"""Dictionary codec — distinct values + RLE/bit-packed hybrid indices.

Re-creates the reference's PLAIN_DICTIONARY / RLE_DICTIONARY semantics
(/root/reference/src/parquet/physical.zig:59-62 — 1-byte bit width then
hybrid-coded indices; gather at
/root/reference/src/parquet/rowGroupReader.zig:167-177) and its
dictionary-page PLAIN value storage (rowGroupReader.zig:372-383).
Encode: pyarrow dictionary_encode (hash-based, vectorized) → hybrid indices
(this is where constant/low-cardinality columns collapse, e.g. the
reference's rle-dict-snappy-checksum fixture of 1000 identical strings,
/root/reference/src/parquet_testing.zig:834-856). Dictionary values are
stored via the PLAIN codec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dtypes, plain
from .bitio import bit_width_u64
from .rle_bitpack import decode_u64, encode_u64

NAME = "dict"


def encode(arr: pa.Array) -> tuple[bytes, dict]:
    token = dtypes.dtype_token(arr.type)
    denc = arr.dictionary_encode()
    dict_values = denc.dictionary
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    card = len(dict_values)
    width = int(bit_width_u64(np.array([max(card - 1, 0)], np.uint64))[0]) or 1
    idx_blob, _ = encode_u64(indices, width)
    val_blob, val_meta = plain.encode(dict_values)
    meta = {
        "dtype": token,
        "card": card,
        "index_width": width,
        "val_len": len(val_blob),
    }
    if "len_width" in val_meta:
        meta["len_width"] = val_meta["len_width"]
    return val_blob + idx_blob, meta


def decode(blob, meta: dict, n: int) -> pa.Array:
    s0 = meta["val_len"]
    val_meta = {"dtype": meta["dtype"]}
    if "len_width" in meta:
        val_meta["len_width"] = meta["len_width"]
    dict_values = plain.decode(memoryview(blob)[:s0], val_meta, meta["card"])
    indices = decode_u64(memoryview(blob)[s0:], n, meta["index_width"])
    # np.take-equivalent gather, JVM-free and vectorized in Arrow C++.
    return dict_values.take(pa.array(indices.astype(np.int64)))
