"""Compressed-size budget vs the Parquet reference writer (BASELINE.md row 2):
our auto-selected encoding must come in at or below pyarrow's dict+RLE+snappy
Parquet column size on the reference-style fixtures and on real testdata."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parzig_spark.codecs import encode_column
from parzig_spark.reference import our_column_size, parquet_column_size
from parzig_spark.selector import choose_codec

RNG = np.random.default_rng(11)
SF_DIR = "/root/testdata/sf0.01"


def _budget_check(arr, label):
    codec, lineage = choose_codec(arr)
    blob, meta = encode_column(arr, codec)
    ours = our_column_size(blob, meta)
    ref = parquet_column_size(arr)
    assert ours <= ref, f"{label}: ours {ours} > parquet reference {ref} (codec {codec})"
    return ours, ref, codec


def test_rle_dict_fixture_family():
    # The reference's rle-dict-snappy-checksum fixture shape: 1000 identical
    # strings + a constant int column (/root/reference/src/parquet_testing.zig:834-856).
    _budget_check(pa.array(["4a747b92-d997-4b1b-bc66-b6f9a600076f"] * 1000), "const_string")
    _budget_check(pa.array([0] * 1000, pa.int64()), "const_int")


def test_sorted_and_lowcard():
    _budget_check(pa.array(np.arange(50000, dtype=np.int64)), "sorted_ints")
    _budget_check(
        pa.array(RNG.choice(["python", "zig", "rust", "go"], 20000).tolist()), "lowcard"
    )


@pytest.mark.parametrize(
    "table,column",
    [
        ("lineitem", "l_returnflag"),
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_quantity"),
        ("orders", "o_orderpriority"),
        ("orders", "o_orderdate"),
        ("events", "props"),
        ("documents", "text"),
        ("documents", "lang"),
    ],
)
def test_real_testdata_columns(table, column):
    arr = pq.read_table(f"{SF_DIR}/{table}.parquet", columns=[column]).column(column)
    arr = arr.combine_chunks()
    ours, ref, codec = _budget_check(arr, f"{table}.{column}")
