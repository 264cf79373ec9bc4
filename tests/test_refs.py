"""Named snapshot refs (tags/branches): pointer semantics, decode-by-name,
and the GC liveness pin — the Iceberg refs / expire_snapshots contract."""

import tempfile

import pyspark.sql.functions as F
import pytest

from parzig_spark.operators import (
    create_ref,
    decode_table,
    drop_ref,
    encode_table,
    files_table,
    gc_store,
    list_refs,
    read_ref,
    refs_table,
    resolve_ref,
    rollback_store,
    update_ref,
)
from parzig_spark.plans.manifest import ManifestStore


def _docs_df(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.when(F.col("id") % 3 == 0, "en").otherwise("zh").alias("lang"),
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
    df = _docs_df(spark)
    root = tempfile.mkdtemp(prefix="parzig_refs_")
    _encode(spark, df.filter("doc_id < 300"), root, namespace=1)
    ManifestStore(root).write_snapshot()
    _encode(spark, df.filter("doc_id >= 300"), root, namespace=2, resume=True)
    ManifestStore(root).write_snapshot()
    return root


def test_ref_lifecycle(spark, two_batch_root):
    root = two_batch_root
    assert list_refs(root) == []
    rec = create_ref(root, "audit", version=0)
    assert rec == {"name": "audit", "kind": "tag", "snapshot": 0}
    # default version = latest snapshot
    assert create_ref(root, "prod", kind="branch")["snapshot"] == 1
    assert resolve_ref(root, "audit") == 0
    assert read_ref(root, "missing") is None
    with pytest.raises(ValueError, match="no ref"):
        resolve_ref(root, "missing")
    assert [r["name"] for r in list_refs(root)] == ["audit", "prod"]
    rows = {r["name"]: r for r in refs_table(spark, root).collect()}
    assert rows["audit"]["kind"] == "tag" and rows["audit"]["snapshot"] == 0
    assert rows["prod"]["kind"] == "branch" and rows["prod"]["snapshot"] == 1
    assert drop_ref(root, "prod") is True
    assert drop_ref(root, "prod") is False
    assert [r["name"] for r in list_refs(root)] == ["audit"]


def test_tag_immutable_branch_movable(two_batch_root):
    root = two_batch_root
    create_ref(root, "audit", version=0)
    # identical replay is a no-op; a different version refuses
    assert create_ref(root, "audit", version=0)["snapshot"] == 0
    with pytest.raises(ValueError, match="immutable"):
        create_ref(root, "audit", version=1)
    with pytest.raises(ValueError, match="immutable"):
        update_ref(root, "audit", 1)
    create_ref(root, "prod", kind="branch", version=0)
    assert update_ref(root, "prod", 1)["snapshot"] == 1
    assert resolve_ref(root, "prod") == 1
    with pytest.raises(ValueError, match="create_ref first"):
        update_ref(root, "new", 0)


def test_ref_validation(two_batch_root):
    root = two_batch_root
    with pytest.raises(ValueError, match="invalid ref name"):
        create_ref(root, "../escape")
    with pytest.raises(ValueError, match="invalid ref name"):
        create_ref(root, "")
    with pytest.raises(ValueError, match="kind"):
        create_ref(root, "x", kind="lightweight")
    with pytest.raises(ValueError, match="no snapshot"):
        create_ref(root, "x", version=99)


def test_decode_by_ref_matches_snapshot(spark, two_batch_root):
    root = two_batch_root
    create_ref(root, "audit", version=0)
    by_ref = decode_table(spark, root, ref="audit")
    assert by_ref.count() == 300
    assert by_ref.agg(F.max("doc_id")).first()[0] == 299
    assert files_table(spark, root, ref="audit").select(
        "pid"
    ).distinct().count() == files_table(spark, root, snapshot=0).select(
        "pid"
    ).distinct().count()
    with pytest.raises(ValueError, match="not both"):
        decode_table(spark, root, ref="audit", snapshot=0)


def test_ref_pins_artifacts_against_gc(spark, two_batch_root):
    """The operational point of a tag: rollback retires batch 2, but a tag
    at the pre-rollback version keeps its snapshot AND the retired blobs
    alive through gc — the tagged read still sees all 400 rows. Dropping
    the ref releases the pin and the next gc reclaims."""
    root = two_batch_root
    create_ref(root, "pre-rollback", version=1)
    rollback_store(root, 0)
    stats = gc_store(root)
    assert decode_table(spark, root).count() == 300  # head = rolled back
    dec = decode_table(spark, root, ref="pre-rollback")
    assert dec.count() == 400  # pinned view fully intact after gc
    assert dec.agg(F.max("doc_id")).first()[0] == 399
    assert drop_ref(root, "pre-rollback") is True
    stats = gc_store(root)
    assert stats["orphan_dirs"] > 0 and stats["old_snapshots"] > 0
    with pytest.raises(ValueError):
        decode_table(spark, root, snapshot=1)  # snapshot file reclaimed


def test_superseded_but_tagged_snapshot_survives_gc(spark, two_batch_root):
    root = two_batch_root
    create_ref(root, "audit", version=0)
    gc_store(root)  # would reclaim superseded snap-0 without the tag
    assert decode_table(spark, root, ref="audit").count() == 300
    assert decode_table(spark, root).count() == 400
