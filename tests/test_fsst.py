"""FSST kernel unit tests: format edges, chunk boundaries, escape handling."""

import numpy as np
import pyarrow as pa
import pytest

from parzig_spark.codecs import decode_column, encode_column
from parzig_spark.codecs.fsst import (
    CHUNK,
    ESCAPE,
    _build_parse_tables,
    compress,
    decompress,
    train,
)


def roundtrip_bytes(data: bytes, symbols):
    body = compress(data, symbols)
    return decompress(body, symbols, len(data))


def test_empty_and_tiny():
    assert roundtrip_bytes(b"", []) == b""
    assert roundtrip_bytes(b"x", []) == b"x"
    assert roundtrip_bytes(b"x", [b"x"]) == b"x"


def test_no_symbols_all_escapes():
    data = bytes(range(256)) * 3
    assert roundtrip_bytes(data, []) == data


def test_escape_byte_as_data():
    # 0xFF (the escape code value) appearing in the data must round-trip.
    data = b"\xff" * 100 + b"a\xffb" * 50
    symbols = train(data)
    assert roundtrip_bytes(data, symbols) == data
    assert roundtrip_bytes(data, []) == data


def test_symbol_spanning_chunk_boundary_not_matched():
    # A symbol that would straddle a CHUNK boundary must be split, and the
    # result still round-trips exactly.
    sym = b"ABCDEFGH"
    data = b"." * (CHUNK - 4) + sym + b"." * 100
    out = roundtrip_bytes(data, [sym, b"."])
    assert out == data


def test_greedy_longest_match_preferred():
    symbols = [b"ab", b"abcd", b"a"]
    body = compress(b"abcdabab", symbols)
    # varint(0 literals) + codes: abcd(1) ab(0) ab(0)
    assert body == bytes([0, 1, 0, 0])


def test_full_symbol_table_255():
    symbols = [bytes([i, i]) for i in range(255)]
    data = b"".join(bytes([i, i]) * 2 for i in range(255))
    assert roundtrip_bytes(data, symbols) == data


def test_parse_tables_shape():
    """Every symbol lands in its table: 1/2-byte in the direct tables,
    >=3-byte in the hash slots (longest per slot); parsing a string equal
    to each symbol yields exactly that symbol's code."""
    symbols = [bytes([i]) for i in range(200)] + [b"abcdefg", b"zzzzzzz", b"abc"]
    mult, slot_key, slot_mask, slot_meta, code2, code1 = _build_parse_tables(symbols)
    assert (code1 != 255).sum() == 200
    assert (slot_meta != 0).sum() >= 2  # abcdefg + zzzzzzz (abc may share)
    for code, s in enumerate(symbols):
        if len(s) < 3:
            continue
        body = compress(s, symbols)
        # single symbol -> one code token unless a longer slot-mate shadows
        n_lit = body[0]
        codes = body[1 + n_lit:]
        out = decompress(memoryview(body)[0:], symbols, len(s))
        assert out == s


def test_train_deterministic():
    data = (b"def foo():\n    return 42\n" * 100)[:4096]
    assert train(data) == train(data)


def test_binary_roundtrip_random():
    rng = np.random.default_rng(3)
    data = rng.bytes(100_000)
    symbols = train(data)
    assert roundtrip_bytes(data, symbols) == data


def test_decompress_rejects_wrong_size():
    body = compress(b"hello world", [b"hello", b" ", b"world"])
    with pytest.raises(ValueError):
        decompress(body, [b"hello", b" ", b"world"], 5)


def test_utf8_multibyte_roundtrip():
    arr = pa.array(["🚀🚀 你好 Здравствуй café " * 20] * 50 + ["", "x"])
    blob, meta = encode_column(arr, "fsst")
    assert decode_column(blob, meta).equals(arr)
    assert len(meta["codec_meta"]["symbols"]) > 0
