"""Snapshot changelog (operators/changes.py): inserts from appended
partitions, deletes from merge-on-read ops, symmetry under rollback — the
Iceberg CDC analog on (_pid, _pos) physical addresses.
"""

from pyspark.sql import functions as F

from parzig_spark.operators import (
    changes_table,
    delete_rows,
    encode_table,
)
from parzig_spark.plans.manifest import ManifestStore


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 4).cast("int").alias("grp"),
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("val"),
    )


def _store(spark, tmp_path):
    """v0 = rows 0..3999; v1 = + rows 4000..5999; v2 = + delete k<1000."""
    root = str(tmp_path / "cdc")
    common = dict(group_cols=["grp"], salt_cols=["k"], target_bytes=64 << 10)
    encode_table(
        _batch(spark, 0, 4_000), root, resume=False, pid_namespace=1,
        bucket_bits=16, **common,
    ).count()
    store = ManifestStore(root)
    store.write_snapshot()  # v0
    encode_table(
        _batch(spark, 4_000, 6_000), root, resume=True, pid_namespace=2,
        bucket_bits=16, **common,
    ).count()
    store.write_snapshot()  # v1
    delete_rows(spark, root, [("k", "<", 1_000)])
    store.write_snapshot()  # v2
    return root


def _rows(df):
    return sorted(
        (r["k"], r["_change_type"]) for r in df.select("k", "_change_type").collect()
    )


def test_append_window_is_pure_inserts(spark, tmp_path):
    root = _store(spark, tmp_path)
    got = _rows(changes_table(spark, root, 0, 1))
    assert got == [(k, "insert") for k in range(4_000, 6_000)]


def test_delete_window_is_pure_deletes(spark, tmp_path):
    root = _store(spark, tmp_path)
    got = _rows(changes_table(spark, root, 1, 2))
    assert got == [(k, "delete") for k in range(1_000)]


def test_combined_window_and_symmetry(spark, tmp_path):
    root = _store(spark, tmp_path)
    fwd = _rows(changes_table(spark, root, 0, 2))
    expect = [(k, "delete") for k in range(1_000)] + [
        (k, "insert") for k in range(4_000, 6_000)
    ]
    assert fwd == sorted(expect)
    rev = _rows(changes_table(spark, root, 2, 0))
    flipped = sorted(
        (k, "insert" if t == "delete" else "delete") for k, t in expect
    )
    assert rev == flipped
    # degenerate window: nothing changed
    assert _rows(changes_table(spark, root, 1, 1)) == []


def test_column_projection_and_default_to(spark, tmp_path):
    root = _store(spark, tmp_path)
    df = changes_table(spark, root, 1, columns=["k"])  # to = latest (v2)
    assert df.columns == ["k", "_change_type"]
    assert _rows(df) == [(k, "delete") for k in range(1_000)]
