"""UPSERT (MERGE) over immutable blobs: replace-by-key bitmaps + namespaced
append under one content-derived op; replay convergence, crash-window
recovery, snapshot isolation, compaction purge.
"""

import os

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import (
    compact_store,
    decode_table,
    encode_table,
    upsert_rows,
    verify_roundtrip,
)
from parzig_spark.plans.manifest import ManifestStore


def _base(spark):
    return spark.range(0, 20_000).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
    )


def _updates(spark):
    """Replace k in [100, 150) with v = -1; insert k in [50000, 50010)."""
    return spark.range(100, 150).union(spark.range(50_000, 50_010)).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id").alias("k"),
        F.lit(-1).cast("long").alias("v"),
    )


def _expected(spark):
    base, upd = _base(spark), _updates(spark)
    return base.join(upd.select("k"), on="k", how="left_anti").unionByName(upd)


@pytest.fixture()
def store(spark, tmp_path):
    root = str(tmp_path / "upstore")
    encode_table(
        _base(spark), root, group_cols=["grp"], salt_cols=["k"],
        target_bytes=64 << 10, resume=False,
    ).count()
    return root


def test_upsert_replace_and_insert(spark, store):
    stats = upsert_rows(spark, store, _updates(spark), key_cols=["k"])
    assert stats["committed"]
    assert stats["rows_replaced"] == 50
    assert stats["rows_inserted"] == 60
    dec = decode_table(spark, store)
    assert verify_roundtrip(_expected(spark), dec, ["k"], ["grp", "v"])["ok"]


def test_upsert_replay_converges(spark, store):
    """Running the identical merge twice yields the same final table — the
    second run re-matches the rows the first one wrote (fresh op) but the
    row set is a fixed point."""
    upd = _updates(spark)
    upsert_rows(spark, store, upd, key_cols=["k"])
    stats2 = upsert_rows(spark, store, upd, key_cols=["k"])
    assert stats2["committed"]
    dec = decode_table(spark, store)
    assert verify_roundtrip(_expected(spark), dec, ["k"], ["grp", "v"])["ok"]


def test_upsert_crash_window_recovery(spark, store):
    """Crash just before the op marker (inserts committed, deletes
    invisible): a replay derives a fresh op against the now-duplicated
    keys and converges to the merged table."""
    upd = _updates(spark)
    stats = upsert_rows(spark, store, upd, key_cols=["k"])
    st = ManifestStore(store)
    marker = os.path.join(st.deletes_dir(), f"_committed_{stats['op_id']}")
    os.unlink(marker)  # simulate the crash window: deletes never committed
    # head readers now see BOTH versions of the matched keys
    dup = decode_table(spark, store).filter(
        (F.col("k") >= 100) & (F.col("k") < 150)
    )
    assert dup.count() == 100
    upsert_rows(spark, store, upd, key_cols=["k"])
    dec = decode_table(spark, store)
    assert verify_roundtrip(_expected(spark), dec, ["k"], ["grp", "v"])["ok"]


def test_upsert_snapshot_isolation(spark, store):
    """A snapshot written before the merge still reads the pre-merge
    table (sidecar pins both the pid set and the delete-op set)."""
    st = ManifestStore(store)
    st.write_snapshot()
    pre_version = 0
    upsert_rows(spark, store, _updates(spark), key_cols=["k"])
    pre = decode_table(spark, store, snapshot=pre_version)
    assert verify_roundtrip(_base(spark), pre, ["k"], ["grp", "v"])["ok"]


def test_upsert_compaction_purges(spark, store, tmp_path):
    """Compacting after a merge materializes post-merge rows: the
    destination store carries no delete files and decodes identically."""
    upsert_rows(spark, store, _updates(spark), key_cols=["k"])
    dst = str(tmp_path / "merged_compact")
    compact_store(spark, store, dst, target_bytes=32 << 20).count()
    assert ManifestStore(dst).committed_delete_ops() == []
    dec = decode_table(spark, dst)
    assert verify_roundtrip(_expected(spark), dec, ["k"], ["grp", "v"])["ok"]


def test_upsert_validates_input(spark, store):
    with pytest.raises(ValueError, match="missing store columns"):
        upsert_rows(
            spark, store,
            _updates(spark).drop("v"), key_cols=["k"],
        )
    with pytest.raises(ValueError, match="key_cols not in store schema"):
        upsert_rows(spark, store, _updates(spark), key_cols=["nope"])


def test_upsert_pure_insert_and_empty(spark, store):
    """No matching keys → pure append; empty updates → no-op."""
    ins = spark.range(90_000, 90_020).select(
        (F.col("id") % 5).cast("string").alias("grp"),
        F.col("id").alias("k"),
        F.lit(7).cast("long").alias("v"),
    )
    stats = upsert_rows(spark, store, ins, key_cols=["k"])
    assert stats["rows_replaced"] == 0
    assert stats["rows_inserted"] == 20
    assert decode_table(spark, store).count() == 20_020
    empty = ins.filter(F.lit(False))
    stats0 = upsert_rows(spark, store, empty, key_cols=["k"])
    assert not stats0["committed"] and stats0["rows_inserted"] == 0
