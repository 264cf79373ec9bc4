"""Property-based round-trip fuzzing (hypothesis) — beyond the reference's
test strategy (SURVEY.md §5 notes it has no randomized testing). Every
supported codec must round-trip arbitrary values + null patterns
bit-identically, and the auto-selected codec must never lose to the size
budget invariant blob <= plain-blob * 1.05 on compressible data."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parzig_spark.codecs import decode_column, encode_column
from parzig_spark.selector import choose_codec

INT_CODECS = ("plain", "rle", "bitpack", "dict", "delta", "for")
STR_CODECS = ("plain", "dict", "delta_length", "delta_byte", "fsst")

int_lists = st.lists(
    st.one_of(st.integers(min_value=-(2**63), max_value=2**63 - 1), st.none()),
    max_size=300,
)
str_lists = st.lists(
    st.one_of(st.text(max_size=200), st.none()),
    max_size=200,
)


@settings(max_examples=60, deadline=None)
@given(values=int_lists, codec=st.sampled_from(INT_CODECS))
def test_int_codecs_roundtrip_any(values, codec):
    arr = pa.array(values, pa.int64())
    blob, meta = encode_column(arr, codec)
    assert decode_column(blob, meta).equals(arr)


@settings(max_examples=60, deadline=None)
@given(values=str_lists, codec=st.sampled_from(STR_CODECS))
def test_str_codecs_roundtrip_any(values, codec):
    arr = pa.array(values, pa.string())
    blob, meta = encode_column(arr, codec)
    out = decode_column(blob, meta)
    assert out.cast(pa.string()).equals(arr)


@settings(max_examples=40, deadline=None)
@given(values=st.lists(st.binary(max_size=300), max_size=120))
def test_binary_fsst_roundtrip_any(values):
    arr = pa.array(values, pa.binary())
    blob, meta = encode_column(arr, "fsst")
    assert decode_column(blob, meta).cast(pa.binary()).equals(arr)


@settings(max_examples=30, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.floats(allow_nan=False), st.none()), max_size=200
    )
)
def test_float_bss_roundtrip_any(values):
    arr = pa.array(values, pa.float64())
    blob, meta = encode_column(arr, "byte_stream_split")
    assert decode_column(blob, meta).equals(arr)


@settings(max_examples=25, deadline=None)
@given(values=int_lists)
def test_auto_selection_roundtrips(values):
    arr = pa.array(values, pa.int64())
    codec, _ = choose_codec(arr)
    blob, meta = encode_column(arr, codec)
    assert decode_column(blob, meta).equals(arr)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    run_len=st.integers(min_value=1, max_value=50),
    card=st.integers(min_value=1, max_value=20),
)
def test_structured_ints_selected_beats_plain(seed, run_len, card):
    rng = np.random.default_rng(seed)
    vals = np.repeat(rng.integers(0, card, 64), run_len).astype(np.int64)
    arr = pa.array(vals, pa.int64())
    codec, _ = choose_codec(arr)
    chosen, _ = encode_column(arr, codec, outer=None)
    plain, _ = encode_column(arr, "plain", outer=None)
    assert len(chosen) <= len(plain) * 1.05


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.one_of(
            st.decimals(
                min_value=-(10**20), max_value=10**20, allow_nan=False, places=4
            ),
            st.none(),
        ),
        max_size=150,
    )
)
def test_decimal_roundtrip_any(values):
    arr = pa.array(values, pa.decimal128(30, 4))
    blob, meta = encode_column(arr, "decimal")
    assert decode_column(blob, meta).equals(arr)


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(st.binary(min_size=8, max_size=8), max_size=150),
    codec=st.sampled_from(("plain", "dict", "delta_length")),
)
def test_fixed_binary_roundtrip_any(values, codec):
    arr = pa.array(values, pa.binary(8))
    blob, meta = encode_column(arr, codec)
    out = decode_column(blob, meta)
    assert out.equals(arr) and out.type == pa.binary(8)


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=0, max_value=2**16 - 1), max_size=200
    ),
    codec=st.sampled_from(("plain", "for", "rle", "dict")),
)
def test_float16_roundtrip_any(values, codec):
    # arbitrary bit patterns incl. NaN/inf/denormal payloads — the codec
    # path must be bit-exact regardless of float semantics
    h = pa.array(np.array(values, dtype=np.uint16).view(np.float16))
    blob, meta = encode_column(h, codec)
    out = decode_column(blob, meta)
    assert out.view(pa.uint16()).equals(h.view(pa.uint16()))


@given(
    st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=50),
    st.text(min_size=0, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_string_stats_bounds_sound(values, probe):
    """Property: for ANY string column, every value lies within the
    recorded truncated bounds — the soundness invariant partition pruning
    depends on (an unsound bound silently drops rows)."""
    import pyarrow as pa

    from parzig_spark.operators.encode import column_minmax

    arr = pa.array(values, pa.string())
    lo, hi = column_minmax(arr)
    assert lo is not None
    for v in values:
        assert lo <= v
        if hi is not None:
            assert v <= hi
    # and the pruning decision itself: if probe is outside [lo, hi], no
    # value can equal probe (the equality-exclusion rule)
    if hi is not None and (probe < lo or probe > hi):
        assert probe not in values


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.one_of(st.integers(min_value=-(2**62), max_value=2**62), st.none()),
        min_size=0,
        max_size=400,
    ),
    codec=st.sampled_from(("plain", "for", "delta")),
    page_values=st.sampled_from((7, 32, 100)),
)
def test_paged_layout_roundtrip_any(values, codec, page_values):
    """PAGED layout fuzz: arbitrary values/null patterns at awkward strides
    round-trip bit-identically; page stats and blooms never contradict the
    data (every present value passes its page's bloom)."""
    from parzig_spark.codecs.stats import bloom_may_contain

    arr = pa.array(values, pa.int64())
    blob, meta = encode_column(arr, codec, page_values=page_values)
    assert decode_column(blob, meta).equals(arr)
    if meta.get("codec") != "paged":
        assert len(values) <= page_values
        return
    dom = meta.get("bloom_domain")
    pos = 0
    for p in meta["pages"]:
        page_vals = [v for v in values[pos : pos + p["n"]] if v is not None]
        if page_vals:
            assert int(p["min"]) == min(page_vals)  # int64 stats are str(int)
            assert int(p["max"]) == max(page_vals)
            if dom and "bloom" in p:
                for v in page_vals[:20]:
                    assert bloom_may_contain(p["bloom"], dom, v)
        pos += p["n"]


@settings(max_examples=30, deadline=None)
@given(
    values=st.lists(st.one_of(st.text(max_size=40), st.none()), max_size=300),
    page_values=st.sampled_from((13, 64)),
)
def test_paged_strings_roundtrip_any(values, page_values):
    arr = pa.array(values, pa.string())
    blob, meta = encode_column(arr, "dict", page_values=page_values)
    assert decode_column(blob, meta).cast(pa.string()).equals(arr)
