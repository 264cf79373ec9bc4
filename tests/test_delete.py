"""Row-level deletes (merge-on-read): delete bitmaps over immutable blobs,
snapshot-consistent time travel, compaction purge, GC of crashed ops.
"""

import os

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import (
    compact_store,
    decode_table,
    delete_rows,
    encode_table,
    gc_store,
    verify_roundtrip,
)
from parzig_spark.plans.manifest import ManifestStore
from parzig_spark.sources import source_code_table

KEYS = ["repo", "path", "commit"]


@pytest.fixture()
def store(spark, tmp_path):
    corpus = source_code_table(spark, n_rows=1500, partitions=8)
    corpus.cache().count()
    root = str(tmp_path / "store")
    encode_table(
        corpus,
        root,
        group_cols=["repo", "lang"],
        salt_cols=["path", "commit"],
        sort_cols=KEYS,
        size_col="content",
        target_bytes=512 << 10,
        resume=False,
    ).count()
    return corpus, root


def test_delete_rows_basic(spark, store):
    corpus, root = store
    target_lang = corpus.select("lang").first()["lang"]
    n_match = corpus.filter(corpus.lang == target_lang).count()
    stats = delete_rows(spark, root, [("lang", "==", target_lang)])
    assert stats["committed"]
    assert stats["rows_matched"] == n_match
    assert stats["rows_deleted"] == n_match
    dec = decode_table(spark, root)
    assert dec.count() == corpus.count() - n_match
    assert dec.filter(dec.lang == target_lang).count() == 0
    # surviving rows bit-exact
    survivors = corpus.filter(corpus.lang != target_lang)
    assert verify_roundtrip(survivors, dec, KEYS, ["lang", "content"])["ok"]


def test_delete_rows_idempotent_replay(spark, store):
    corpus, root = store
    target_lang = corpus.select("lang").first()["lang"]
    first = delete_rows(spark, root, [("lang", "==", target_lang)])
    again = delete_rows(spark, root, [("lang", "==", target_lang)])
    assert first["committed"] and not again["committed"]
    assert again["rows_deleted"] == 0
    dec = decode_table(spark, root)
    assert dec.filter(dec.lang == target_lang).count() == 0


def test_delete_conjunctive_and_accumulating_ops(spark, store):
    corpus, root = store
    langs = sorted(r["lang"] for r in corpus.select("lang").distinct().collect())
    l1, l2 = langs[0], langs[1]
    giant = "org0/megarepo"
    delete_rows(spark, root, [("lang", "==", l1), ("repo", "==", giant)])
    delete_rows(spark, root, [("lang", "==", l2)])
    dec = decode_table(spark, root)
    expected = corpus.filter(
        ~((corpus.lang == l1) & (corpus.repo == giant)) & (corpus.lang != l2)
    )
    assert verify_roundtrip(expected, dec, KEYS, ["lang", "content"])["ok"]


def test_delete_not_equal_predicate(spark, store):
    """!= deletes everything except one lang; the stats-pruning path must
    accept the op (a partition is excludable only when its envelope pins
    every value to exactly v)."""
    corpus, root = store
    keep_lang = corpus.select("lang").first()["lang"]
    stats = delete_rows(spark, root, [("lang", "!=", keep_lang)])
    assert stats["committed"]
    dec = decode_table(spark, root)
    expected = corpus.filter(corpus.lang == keep_lang)
    assert verify_roundtrip(expected, dec, KEYS, ["lang", "content"])["ok"]


def test_delete_in_list_predicate(spark, store):
    """IN-list deletes: one op removes several langs at once; the pruning
    path excludes a partition only when EVERY listed value is excludable."""
    corpus, root = store
    langs = sorted(r["lang"] for r in corpus.select("lang").distinct().collect())
    doomed = langs[:2]
    n_match = corpus.filter(corpus.lang.isin(doomed)).count()
    stats = delete_rows(spark, root, [("lang", "in", doomed)])
    assert stats["committed"]
    assert stats["rows_deleted"] == n_match
    dec = decode_table(spark, root)
    expected = corpus.filter(~corpus.lang.isin(doomed))
    assert verify_roundtrip(expected, dec, KEYS, ["lang", "content"])["ok"]


def test_delete_time_travel_pre_delete_view(spark, store):
    """A snapshot written BEFORE the delete must still see the rows — the
    sidecar records the committed op set at snapshot time."""
    corpus, root = store
    ManifestStore(root).write_snapshot()  # version 0: pre-delete
    target_lang = corpus.select("lang").first()["lang"]
    delete_rows(spark, root, [("lang", "==", target_lang)])
    # head read: deleted
    assert decode_table(spark, root).filter(F.col("lang") == target_lang).count() == 0
    # pinned pre-delete read: rows still there
    old = decode_table(spark, root, snapshot=0)
    n = corpus.filter(corpus.lang == target_lang).count()
    assert old.filter(F.col("lang") == target_lang).count() == n
    # a snapshot written AFTER the delete sees the post-delete view
    ManifestStore(root).write_snapshot()  # version 1
    new = decode_table(spark, root, snapshot=1)
    assert new.filter(F.col("lang") == target_lang).count() == 0


def test_delete_with_paged_store_and_predicates(spark, tmp_path):
    """Deletes compose with the PAGED layout's section skipping: the keep
    mask slices to the surviving page row ranges."""
    corpus = source_code_table(spark, n_rows=1200, partitions=4)
    corpus.cache().count()
    root = str(tmp_path / "paged")
    encode_table(
        corpus, root, group_cols=["repo", "lang"], salt_cols=["path", "commit"],
        sort_cols=KEYS, size_col="content", target_bytes=1 << 20,
        resume=False, page_values=128,
    ).count()
    langs = sorted(r["lang"] for r in corpus.select("lang").distinct().collect())
    delete_rows(spark, root, [("lang", "==", langs[0])])
    dec = decode_table(spark, root, predicates=[("lang", "==", langs[1])])
    expected = corpus.filter(corpus.lang == langs[1])
    got = dec.filter(dec.lang == langs[1])
    assert verify_roundtrip(expected, got, KEYS, ["lang", "content"])["ok"]
    # and the deleted lang is gone even when asked for directly
    dec2 = decode_table(spark, root, predicates=[("lang", "==", langs[0])])
    assert dec2.filter(dec2.lang == langs[0]).count() == 0


def test_compaction_purges_deletes(spark, store, tmp_path):
    corpus, root = store
    target_lang = corpus.select("lang").first()["lang"]
    delete_rows(spark, root, [("lang", "==", target_lang)])
    dst = str(tmp_path / "purged")
    compact_store(spark, root, dst, target_bytes=4 << 20).count()
    d = ManifestStore(dst)
    assert d.committed_delete_ops() == [], "destination must carry no deletes"
    dec = decode_table(spark, dst)
    survivors = corpus.filter(corpus.lang != target_lang)
    assert verify_roundtrip(survivors, dec, KEYS, ["lang", "content"])["ok"]
    # physical purge: destination manifests count post-delete rows
    total = sum(
        r["n_values"]
        for r in d.read_manifests().to_pylist()
        if r["column"] == "content"
    )
    assert total == survivors.count()


def test_gc_reclaims_uncommitted_delete_op(spark, store):
    corpus, root = store
    s = ManifestStore(root)
    # forge a crashed delete op: bitmaps written, marker never created
    op_dir = s.deletes_dir("deadbeef" * 3)
    os.makedirs(op_dir)
    with open(os.path.join(op_dir, "123.bin"), "wb") as f:
        f.write(b"\x01" * 64)
    stats = gc_store(root)
    assert stats["orphan_dirs"] >= 1
    assert not os.path.exists(op_dir)
    # a committed op survives GC
    target_lang = corpus.select("lang").first()["lang"]
    delete_rows(spark, root, [("lang", "==", target_lang)])
    ops = s.committed_delete_ops()
    gc_store(root)
    assert s.committed_delete_ops() == ops
    assert decode_table(spark, root).filter(F.col("lang") == target_lang).count() == 0
