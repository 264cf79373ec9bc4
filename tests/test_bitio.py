import numpy as np
import pytest

from parzig_spark.codecs.bitio import (
    bit_width_u64,
    decode_uleb128,
    encode_uleb128,
    pack_bits_le,
    unpack_bits_le,
    zigzag_decode_u64,
    zigzag_encode_i64,
)


def test_reference_golden_bitpack():
    # Cross-check against the reference decoder's little-endian golden:
    # bytes {0x88,0xC6,0xFA} at width 3 decode to 0..7
    # (/root/reference/src/parquet/BitReader.zig:68-76). (The other golden,
    # {0x05,0x39,0x77} at physical.zig:259-267, is the legacy *big-endian*
    # BIT_PACKED order, which our format deliberately does not use.)
    values = np.arange(8, dtype=np.uint64)
    assert pack_bits_le(values, 3) == bytes([0x88, 0xC6, 0xFA])
    out = unpack_bits_le(bytes([0x88, 0xC6, 0xFA]), 8, 3)
    np.testing.assert_array_equal(out, values)


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8, 13, 17, 31, 32, 33, 63, 64])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(42)
    hi = (1 << width) - 1
    values = rng.integers(0, hi, size=1000, dtype=np.uint64, endpoint=True)
    blob = pack_bits_le(values, width)
    assert len(blob) == (1000 * width + 7) // 8
    np.testing.assert_array_equal(unpack_bits_le(blob, 1000, width), values)


def test_pack_empty_and_zero_width():
    assert pack_bits_le(np.zeros(0, np.uint64), 5) == b""
    np.testing.assert_array_equal(unpack_bits_le(b"", 0, 5), np.zeros(0, np.uint64))
    np.testing.assert_array_equal(unpack_bits_le(b"", 4, 0), np.zeros(4, np.uint64))


def test_bit_width():
    np.testing.assert_array_equal(
        bit_width_u64(np.array([0, 1, 2, 3, 7, 8, 255, 256, 2**63, 2**64 - 1], dtype=np.uint64)),
        [0, 1, 2, 2, 3, 4, 8, 9, 64, 64],
    )


@pytest.mark.parametrize("v", [0, 1, 127, 128, 300, 2**21, 2**35, 2**63])
def test_uleb128(v):
    blob = encode_uleb128(v)
    out, pos = decode_uleb128(blob, 0)
    assert out == v and pos == len(blob)


def test_zigzag_wrap_exact():
    vals = np.array([0, -1, 1, -2, 2, 2**62, -(2**62), 2**63 - 1, -(2**63)], dtype=np.int64)
    zz = zigzag_encode_i64(vals)
    np.testing.assert_array_equal(zigzag_decode_u64(zz), vals)
