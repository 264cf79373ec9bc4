"""Round-trip the reference's OWN test fixtures through our engine.

The north rule's fixture criterion, verbatim: decoded columns bit-identical
to the source "while total compressed bytes per column come in at or below
parzig's Parquet reference output on its own test fixtures (e.g. its
snappy/RLE-dict sample files decoded round-trip)". The fixtures are the 44
parquet files under /root/reference/testdata (the corpus
/root/reference/src/parquet_testing.zig and logical.zig:267-1071 decode,
written by Polars per File.zig:254) — every physical/logical type parzig's
reader handles, with and without nulls, under snappy/zstd/gzip/uncompressed
outer codecs.

pyarrow plays the independent decoder for the fixture bytes (parzig is a
decoder, not a writer — see parzig_spark/reference.py); the size budget is
the established symmetric convention: our blob + decode-manifest metadata
vs pyarrow's self-describing single-column file, written with the same
compression codec the fixture itself uses.
"""

import glob
import os

import pyarrow.parquet as pq
import pytest

from parzig_spark.codecs import decode_column, encode_column
from parzig_spark.reference import our_column_size, parquet_column_size
from parzig_spark.selector import choose_codec

FIXTURE_DIR = "/root/reference/testdata"
FIXTURES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.parquet")))

pytestmark = pytest.mark.skipif(not FIXTURES, reason="reference fixtures absent")


def _fixture_compression(path: str) -> str:
    md = pq.ParquetFile(path).metadata
    codec = md.row_group(0).column(0).compression.lower()
    return {"uncompressed": "none"}.get(codec, codec)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_reference_fixture_roundtrip_and_budget(path):
    table = pq.read_table(path)
    compression = _fixture_compression(path)
    for name in table.column_names:
        col = table.column(name).combine_chunks()
        codec, _lineage = choose_codec(col)
        blob, meta = encode_column(col, codec)

        # bit-identical decode (codec layer keeps the stored unit/width)
        decoded = decode_column(blob, meta)
        assert decoded.cast(col.type).equals(col), f"{path}:{name} ({codec})"

        # compressed-size budget vs the reference output, same outer codec
        ours = our_column_size(blob, meta)
        ref = parquet_column_size(col, compression=compression)
        assert ours <= ref, (
            f"{path}:{name}: ours {ours} > reference {ref} "
            f"(codec {codec}, fixture compression {compression})"
        )


SNAPPY_GOLDEN = os.path.join(FIXTURE_DIR, "compress", "snappy", "Isaac.Newton-Opticks.txt")


@pytest.mark.skipif(not os.path.exists(SNAPPY_GOLDEN), reason="snappy golden absent")
def test_snappy_golden_pair_conformance():
    """The exact golden pair the reference's snappy decoder is tested
    against (/root/reference/src/compress/snappy.zig:219-327, borrowed from
    golang/snappy): the committed .rawsnappy bytes must decompress to the
    committed plaintext through the snappy codec our outer layer exposes,
    and our own snappy outer round-trips the same plaintext through
    encode_column/decode_column."""
    import pyarrow as pa

    with open(SNAPPY_GOLDEN, "rb") as f:
        txt = f.read()
    with open(SNAPPY_GOLDEN + ".rawsnappy", "rb") as f:
        raw = f.read()
    assert pa.Codec("snappy").decompress(raw, decompressed_size=len(txt), asbytes=True) == txt

    col = pa.array([txt.decode("latin-1")])
    blob, meta = encode_column(col, "plain", outer="snappy")
    assert meta.get("outer", {}).get("codec") == "snappy"
    assert decode_column(blob, meta).cast(col.type).equals(col)
