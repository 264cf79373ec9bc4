"""Inspection tables (files/snapshots) + snapshot rollback + the snapshot
version-numbering and visibility invariants they depend on."""

import os
import tempfile

import pyspark.sql.functions as F
import pytest

from parzig_spark.operators import (
    decode_table,
    delete_rows,
    encode_table,
    files_table,
    gc_store,
    rollback_store,
    snapshots_table,
)
from parzig_spark.plans.manifest import ManifestStore


def _docs_df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("zh").alias("lang"),
        # every third n_chars is NULL — exercises the stat_nulls lane
        F.when(F.col("id") % 3 != 0, F.col("id") % 97).alias("n_chars"),
    )


def _encode(spark, df, root, namespace=None, resume=False):
    encode_table(
        df,
        root,
        group_cols=["lang"],
        salt_cols=["doc_id"],
        sort_cols=["doc_id"],
        target_bytes=1 << 20,
        resume=resume,
        **({"pid_namespace": namespace, "bucket_bits": 16} if namespace else {}),
    ).count()


@pytest.fixture()
def two_batch_root(spark):
    """Batch 1 (doc_id < 300) sealed as snapshot 0; batch 2 appended and
    sealed as snapshot 1."""
    df = _docs_df(spark)
    root = tempfile.mkdtemp(prefix="parzig_inspect_")
    _encode(spark, df.filter("doc_id < 300"), root, namespace=1)
    ManifestStore(root).write_snapshot()
    _encode(spark, df.filter("doc_id >= 300"), root, namespace=2, resume=True)
    ManifestStore(root).write_snapshot()
    return root


def test_files_table_accounts_for_every_value(spark):
    df = _docs_df(spark)
    root = tempfile.mkdtemp(prefix="parzig_files_")
    _encode(spark, df, root)
    agg = {
        r["column"]: r
        for r in files_table(spark, root)
        .groupBy("column")
        .agg(
            F.sum("n_values").alias("nv"),
            F.sum("stat_nulls").alias("nn"),
            F.sum(F.col("stat_sum").cast("decimal(38,0)")).cast("long").alias("s"),
        )
        .collect()
    }
    assert set(agg) == {"doc_id", "text", "lang", "n_chars"}
    for col in agg:
        assert agg[col]["nv"] == 400
    assert agg["doc_id"]["nn"] == 0
    assert agg["n_chars"]["nn"] == df.filter("n_chars IS NULL").count()
    assert agg["doc_id"]["s"] == sum(range(400))
    expect = df.agg(F.sum("n_chars")).first()[0]
    assert agg["n_chars"]["s"] == expect
    assert agg["text"]["s"] is None  # strings record no sum


def test_files_table_pinned_snapshot(spark, two_batch_root):
    head = files_table(spark, two_batch_root)
    v0 = files_table(spark, two_batch_root, snapshot=0)
    assert v0.agg(F.max("n_values")).first()[0] is not None
    assert v0.select("pid").distinct().count() < head.select("pid").distinct().count()
    # pinned listing's value accounting = first batch only
    nv = (
        v0.filter(F.col("column") == "doc_id").agg(F.sum("n_values")).first()[0]
    )
    assert nv == 300


def test_snapshots_table(spark, two_batch_root):
    rows = snapshots_table(spark, two_batch_root).orderBy("version").collect()
    assert [r["version"] for r in rows] == [0, 1]
    assert rows[0]["n_partitions"] < rows[1]["n_partitions"]
    assert rows[0]["n_manifest_rows"] == rows[0]["n_partitions"] * 4
    assert rows[1]["enc_bytes"] > rows[0]["enc_bytes"]
    assert all(r["n_delete_ops"] == 0 for r in rows)


def test_rollback_restores_previous_view(spark, two_batch_root):
    root = two_batch_root
    delete_rows(spark, root, [("doc_id", "<", 25)])
    assert decode_table(spark, root).count() == 400 - 25
    stats = rollback_store(root, 0)
    assert stats["retired_partitions"] > 0
    assert stats["retired_delete_ops"] == 1
    dec = decode_table(spark, root)
    assert dec.count() == 300  # delete undone, batch 2 invisible
    assert dec.agg(F.max("doc_id")).first()[0] == 299
    # snapshots_table now shows the sealing snapshot as the latest version
    vs = [r["version"] for r in snapshots_table(spark, root).collect()]
    assert max(vs) == 2


def test_rollback_roll_forward_before_gc(spark, two_batch_root):
    root = two_batch_root
    rollback_store(root, 0)
    assert decode_table(spark, root).count() == 300
    stats = rollback_store(root, 1)  # forward again: markers re-created
    assert stats["restored_partitions"] > 0
    assert decode_table(spark, root).count() == 400


def test_rollback_then_gc_reclaims_and_blocks_forward(spark, two_batch_root):
    root = two_batch_root
    rollback_store(root, 0)
    stats = gc_store(root)
    assert stats["orphan_dirs"] > 0 and stats["bytes_reclaimed"] > 0
    assert decode_table(spark, root).count() == 300  # rolled-back view intact
    # forward rollback refuses: gc reclaimed either the snapshot file
    # itself or the artifacts it references
    with pytest.raises(ValueError, match="reclaimed|no snapshot"):
        rollback_store(root, 1)


def test_fresh_snapshot_heals_marker_retirement(spark):
    """Crash window: markers removed but no sealing snapshot written — the
    exact-set check must recompact instead of serving the stale superset."""
    df = _docs_df(spark, n=200)
    root = tempfile.mkdtemp(prefix="parzig_heal_")
    _encode(spark, df, root)
    store = ManifestStore(root)
    store.write_snapshot()
    victim = sorted(store.committed_pids())[0]
    os.unlink(store._marker_path(victim))
    manifests = store.read_manifests()
    assert victim not in set(manifests.column("pid").to_pylist())
    assert set(manifests.column("pid").to_pylist()) == store.committed_pids()


def test_snapshot_versions_monotonic_after_gc(spark):
    df = _docs_df(spark, n=100)
    root = tempfile.mkdtemp(prefix="parzig_vers_")
    _encode(spark, df, root)
    store = ManifestStore(root)
    for _ in range(3):
        store.write_snapshot()  # versions 0,1,2
    gc_store(root)  # keeps only snap-000002
    path = store.write_snapshot()
    assert path.endswith("snap-000003.parquet")
    assert store.latest_snapshot() == path
