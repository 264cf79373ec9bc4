"""End-to-end distributed encode → manifest → decode → verify, plus the
resume and skew scenarios from FIXTURES.md §F5."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import decode_table, encode_table, verify_roundtrip
from parzig_spark.plans.manifest import ManifestStore
from parzig_spark.sources import source_code_table

KEYS = ["repo", "path", "commit"]


@pytest.fixture(scope="module")
def corpus(spark):
    df = source_code_table(spark, n_rows=3000, partitions=8)
    df.cache().count()
    return df


def _encode(spark, corpus, root, **kw):
    summary = encode_table(
        corpus,
        root,
        group_cols=["repo", "lang"],
        salt_cols=["path", "commit"],
        sort_cols=KEYS,
        size_col="content",
        target_bytes=256 << 10,  # small target → giant repo must salt out
        **kw,
    )
    return summary.toPandas()


def test_roundtrip_end_to_end(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    summary = _encode(spark, corpus, root)
    assert (summary["committed"]).all()
    assert summary["n_values"].sum() == 3000 * 5  # 5 columns

    decoded = decode_table(spark, root)
    report = verify_roundtrip(corpus, decoded, KEYS, ["lang", "content"])
    assert report["ok"], report

    # compression: encoded bytes well under raw bytes
    raw = summary["raw_bytes"].sum()
    enc = summary["enc_bytes"].sum()
    assert enc < raw * 0.5, (raw, enc)


def test_skew_salting(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    summary = _encode(spark, corpus, root)
    content = summary[summary["column"] == "content"]
    mega_pids = set()
    # The giant repo (~40% of rows) must span multiple partitions.
    store = ManifestStore(root)
    import json

    import pyarrow.parquet as pq

    for pid in store.committed_pids():
        t = pq.read_table(os.path.join(store.manifest_dir, f"part-{pid}.parquet"))
        mega_pids.add(pid)
    n_parts = len(store.committed_pids())
    assert n_parts >= 4, f"expected salting to fan out partitions, got {n_parts}"
    # No partition should dwarf the median by raw content bytes (excluding
    # the deliberate multi-MB single-row outlier, which no partitioner can
    # split below row granularity).
    sizes = sorted(content["raw_bytes"])
    median = sizes[len(sizes) // 2]
    big = [s for s in sizes if s > 4 * median and s > 4_000_000]
    assert len(big) <= 1, f"skewed partitions: {sizes}"


def test_resume_skips_committed(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    first = _encode(spark, corpus, root)
    all_pids = set(first["pid"])
    store = ManifestStore(root)
    assert store.committed_pids() == all_pids

    # Simulate a partial failure: discard K partitions' commits entirely.
    victims = sorted(all_pids)[:3]
    for pid in victims:
        os.remove(store._marker_path(pid))
        os.remove(os.path.join(store.manifest_dir, f"part-{pid}.parquet"))
        shutil.rmtree(os.path.join(store.blob_dir, str(pid)))

    second = _encode(spark, corpus, root)
    # Only the victims were re-encoded; committed partitions were anti-joined
    # away before any work.
    assert set(second["pid"]) == set(victims)
    assert store.committed_pids() == all_pids

    decoded = decode_table(spark, root)
    report = verify_roundtrip(corpus, decoded, KEYS, ["lang", "content"])
    assert report["ok"], report


def test_rerun_is_noop(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    _encode(spark, corpus, root)
    again = _encode(spark, corpus, root)
    assert len(again) == 0, "fully-committed store must re-encode nothing"


def test_column_pruned_decode(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    _encode(spark, corpus, root)
    langs = decode_table(spark, root, columns=["lang"])
    assert langs.columns == ["lang"]
    src_counts = {
        r["lang"]: r["count"] for r in corpus.groupBy("lang").count().collect()
    }
    dec_counts = {r["lang"]: r["count"] for r in langs.groupBy("lang").count().collect()}
    assert src_counts == dec_counts


def test_source_table_deterministic(spark):
    a = source_code_table(spark, n_rows=500, partitions=2)
    b = source_code_table(spark, n_rows=500, partitions=7)
    assert a.orderBy(*KEYS).collect() == b.orderBy(*KEYS).collect()
    # edge rows present
    edge = {r["content"] for r in a.filter(F.length("content") <= 1).collect()}
    assert "" in edge and "x" in edge


def test_store_config_guard(spark, corpus, tmp_path):
    root = str(tmp_path / "store")
    _encode(spark, corpus, root)
    with pytest.raises(Exception, match="refusing to resume"):
        encode_table(
            corpus,
            root,
            group_cols=["lang"],  # different partitioning identity
            salt_cols=["path"],
            size_col="content",
            target_bytes=256 << 10,
        ).count()
