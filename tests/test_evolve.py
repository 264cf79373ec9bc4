"""Schema evolution: add_columns backfills derived columns into a new store
root without re-encoding existing blobs (hardlinked across), with per-
partition digest proof that the caller's rows align with the stored order.
"""

import os

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import add_columns, decode_table, encode_table
from parzig_spark.plans.manifest import ManifestStore
from parzig_spark.sources import source_code_table

KEYS = ["repo", "path", "commit"]


@pytest.fixture(scope="module")
def base_store(spark, tmp_path_factory):
    corpus = source_code_table(spark, n_rows=2000, partitions=8)
    corpus.cache().count()
    root = str(tmp_path_factory.mktemp("evolve") / "src")
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


def _widened(corpus):
    return corpus.withColumn(
        "n_tokens", F.size(F.split(F.col("content"), r"\s+"))
    ).withColumn("content_len", F.octet_length("content"))


def test_add_columns_backfill(spark, base_store, tmp_path):
    corpus, src_root = base_store
    dst_root = str(tmp_path / "dst")
    summary = add_columns(
        _widened(corpus), src_root, dst_root, ["n_tokens", "content_len"]
    ).toPandas()
    assert set(summary["column"]) == {"n_tokens", "content_len"}
    assert (summary["committed"]).all()

    dec = decode_table(spark, dst_root)
    assert set(dec.columns) == set(corpus.columns) | {"n_tokens", "content_len"}
    # new column values round-trip exactly
    exp = {
        (r["repo"], r["path"], r["commit"]): (r["n_tokens"], r["content_len"])
        for r in _widened(corpus).collect()
    }
    got = {
        (r["repo"], r["path"], r["commit"]): (r["n_tokens"], r["content_len"])
        for r in dec.select(*KEYS, "n_tokens", "content_len").collect()
    }
    assert got == exp
    # original content still bit-exact
    from parzig_spark.operators import verify_roundtrip

    assert verify_roundtrip(corpus, dec, KEYS, ["lang", "content"])["ok"]


def test_add_columns_hardlinks_existing_blobs(spark, base_store, tmp_path):
    _, src_root = base_store
    corpus, _ = base_store
    dst_root = str(tmp_path / "dst")
    add_columns(_widened(corpus), src_root, dst_root, ["n_tokens", "content_len"]).count()
    src, dst = ManifestStore(src_root), ManifestStore(dst_root)
    pid = sorted(src.committed_pids())[0]
    s = os.stat(os.path.join(src.blob_dir, str(pid), "content.bin"))
    d = os.stat(os.path.join(dst.blob_dir, str(pid), "content.bin"))
    assert (s.st_dev, s.st_ino) == (d.st_dev, d.st_ino), (
        "existing blobs must hardlink, not copy — bytes moved scale with the "
        "new columns only"
    )
    assert os.path.exists(os.path.join(dst.blob_dir, str(pid), "n_tokens.bin"))


def test_add_columns_rejects_drifted_rows(spark, base_store, tmp_path):
    corpus, src_root = base_store
    dst_root = str(tmp_path / "dst")
    # perturb one row's key column: pids still mostly collide with stored
    # ones, but the in-bucket digest cannot match → loud refusal
    drifted = _widened(corpus).withColumn(
        "repo",
        F.when(F.col("path") == corpus.select("path").first()["path"], F.lit("evil"))
        .otherwise(F.col("repo")),
    )
    with pytest.raises(Exception, match="does not match the stored digest|no source manifest"):
        add_columns(drifted, src_root, dst_root, ["n_tokens", "content_len"]).count()


def test_add_columns_validates_inputs(spark, base_store, tmp_path):
    corpus, src_root = base_store
    dst_root = str(tmp_path / "dst")
    with pytest.raises(ValueError, match="lacks required columns"):
        add_columns(corpus, src_root, dst_root, ["n_tokens"])
    with pytest.raises(ValueError, match="already in store"):
        add_columns(_widened(corpus), src_root, dst_root, ["lang"])


def test_drop_columns(spark, base_store, tmp_path):
    corpus, src_root = base_store
    dst_root = str(tmp_path / "dropped")
    from parzig_spark.operators import drop_columns

    stats = drop_columns(src_root, dst_root, ["lang"])
    assert stats["partitions"] > 0
    dec = decode_table(spark, dst_root)
    assert set(dec.columns) == set(corpus.columns) - {"lang"}
    # kept blobs are hardlinks; surviving data bit-exact
    src, dst = ManifestStore(src_root), ManifestStore(dst_root)
    pid = sorted(src.committed_pids())[0]
    s = os.stat(os.path.join(src.blob_dir, str(pid), "content.bin"))
    d = os.stat(os.path.join(dst.blob_dir, str(pid), "content.bin"))
    assert (s.st_dev, s.st_ino) == (d.st_dev, d.st_ino)
    assert not os.path.exists(os.path.join(dst.blob_dir, str(pid), "lang.bin"))
    from parzig_spark.operators import verify_roundtrip

    assert verify_roundtrip(corpus.drop("lang"), dec, KEYS, ["content"])["ok"]
    # guards
    with pytest.raises(ValueError, match="not in store"):
        drop_columns(src_root, str(tmp_path / "x"), ["nope"])
    with pytest.raises(ValueError, match="cannot drop every column"):
        drop_columns(
            src_root, str(tmp_path / "y"),
            ["repo", "path", "commit", "lang", "content"],
        )


def test_add_columns_resume_noop(spark, base_store, tmp_path):
    corpus, src_root = base_store
    dst_root = str(tmp_path / "dst")
    add_columns(_widened(corpus), src_root, dst_root, ["n_tokens", "content_len"]).count()
    again = add_columns(
        _widened(corpus), src_root, dst_root, ["n_tokens", "content_len"]
    ).toPandas()
    assert len(again) == 0, "fully-backfilled store must re-encode nothing"
