"""Metadata-scale data-quality checks (operators/quality.py): exact
verdicts from manifest stats with decode fallback for delete-touched and
set-less partitions; the audit gate between stage_batch and publish_ref.
"""

import pytest
from pyspark.sql import functions as F

from parzig_spark.operators import (
    check_store,
    delete_rows,
    encode_table,
    stage_batch,
)


def _src(spark, n=8_000, null_every=0):
    lang = F.concat(F.lit("l"), (F.col("id") % 4).cast("string"))
    if null_every:
        lang = F.when(F.col("id") % null_every == 0, None).otherwise(lang)
    return spark.range(0, n).select(
        (F.col("id") % 8).cast("int").alias("grp"),
        F.col("id").alias("k"),
        lang.alias("lang"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid"),
    )


def _store(spark, tmp_path, df, name="qstore"):
    root = str(tmp_path / name)
    encode_table(
        df, root, group_cols=["grp"], salt_cols=["k"],
        target_bytes=64 << 10, resume=False,
    ).count()
    return root


def _results(df):
    return {
        (r["check"], r["column"]): (r["passed"], r["observed"])
        for r in df.collect()
    }


def test_clean_store_all_pass(spark, tmp_path):
    root = _store(spark, tmp_path, _src(spark))
    out = check_store(spark, root, [
        ("row_count_between", None, (8_000, 8_000)),
        ("no_nulls", "lang", None),
        ("null_fraction_at_most", "lang", 0.0),
        ("values_in_set", "lang", ["l0", "l1", "l2", "l3"]),
        ("min_at_least", "k", 0),
        ("max_at_most", "k", 7_999),
        ("min_at_least", "lang", "l0"),
        ("max_at_most", "lang", "l3"),
    ])
    res = _results(out)
    assert all(passed for passed, _ in res.values()), res


def test_violations_detected(spark, tmp_path):
    root = _store(spark, tmp_path, _src(spark, null_every=10), name="qviol")
    out = check_store(spark, root, [
        ("row_count_between", None, (1, 7_999)),
        ("no_nulls", "lang", None),
        ("null_fraction_at_most", "lang", 0.2),
        ("values_in_set", "lang", ["l0", "l1", "l2"]),  # l3 violates
        ("min_at_least", "k", 1),    # min is 0
        ("max_at_most", "k", 7_000),  # max is 7999
        ("max_at_most", "lang", "l2"),  # max is l3
    ])
    res = _results(out)
    assert res[("row_count_between", None)] == (False, "rows=8000")
    assert res[("no_nulls", "lang")][0] is False
    assert res[("null_fraction_at_most", "lang")][0] is True  # 10% <= 20%
    passed, obs = res[("values_in_set", "lang")]
    assert passed is False and "l3" in obs
    assert res[("min_at_least", "k")] == (False, "min=0")
    assert res[("max_at_most", "k")] == (False, "max=7999")
    assert res[("max_at_most", "lang")] == (False, "max=l3")


def test_delete_aware_counts(spark, tmp_path):
    root = _store(spark, tmp_path, _src(spark), name="qdel")
    delete_rows(spark, root, [("k", "<", 2_000)])
    res = _results(check_store(spark, root, [
        ("row_count_between", None, (6_000, 6_000)),
        ("min_at_least", "k", 2_000),
        ("no_nulls", "lang", None),
    ]))
    assert all(passed for passed, _ in res.values()), res


def test_high_cardinality_decode_fallback(spark, tmp_path):
    """uid has no recorded sets: domain and bound checks decode, exactly."""
    root = _store(spark, tmp_path, _src(spark, n=2_000), name="qhc")
    res = _results(check_store(spark, root, [
        ("values_in_set", "uid", [f"u{i}" for i in range(2_000)]),
        ("values_in_set", "uid", [f"u{i}" for i in range(1_999)]),  # u1999 out
        ("min_at_least", "uid", "u0"),
    ]))
    # dict keys collide for the duplicated check name+column; assert via rows
    rows = check_store(spark, root, [
        ("values_in_set", "uid", [f"u{i}" for i in range(1_999)]),
    ]).collect()
    assert rows[0]["passed"] is False and "u1999" in rows[0]["observed"]
    assert res[("min_at_least", "uid")][0] is True


def test_audit_staged_branch(spark, tmp_path):
    """The WAP gate: a staged batch smuggling an out-of-domain value fails
    the branch audit while the published head still passes."""
    root = _store(spark, tmp_path, _src(spark), name="qwap")
    bad_batch = spark.range(8_000, 8_100).select(
        (F.col("id") % 8).cast("int").alias("grp"),
        F.col("id").alias("k"),
        F.lit("INVALID").alias("lang"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid"),
    )
    info = stage_batch(spark, bad_batch, root, wap_id="suspect")
    checks = [("values_in_set", "lang", ["l0", "l1", "l2", "l3"])]
    head = _results(check_store(spark, root, checks))
    branch = _results(check_store(spark, root, checks, ref=info["branch"]))
    assert head[("values_in_set", "lang")][0] is True
    passed, obs = branch[("values_in_set", "lang")]
    assert passed is False and "INVALID" in obs


def test_where_scopes_audit_to_staged_slice(spark, tmp_path):
    """check_store(where=...) — the real WAP audit shape: expectations run
    over ONLY the rows matching the predicate. The old store holds an
    out-of-domain lang; the audited fresh slice (k >= 8000) is clean, so
    the scoped audit passes while the store-wide one fails — and the
    plan shows the scoped audit decoded at most the slice's boundary
    partitions, never the base store."""
    base = _src(spark).withColumn(
        "lang", F.when(F.col("k") == 7, F.lit("LEGACY")).otherwise(F.col("lang"))
    )
    root = _store(spark, tmp_path, base, name="qwhere")
    fresh = spark.range(8_000, 9_000).select(
        (F.lit(99)).cast("int").alias("grp"),
        F.col("id").alias("k"),
        F.concat(F.lit("l"), (F.col("id") % 4).cast("string")).alias("lang"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid"),
    )
    encode_table(
        fresh, root, group_cols=["grp"], salt_cols=["k"],
        target_bytes=64 << 10, resume=True, pid_namespace=7, bucket_bits=16,
    ).count()
    checks = [
        ("row_count_between", None, (1_000, 1_000)),
        ("values_in_set", "lang", ["l0", "l1", "l2", "l3"]),
        ("min_at_least", "k", 8_000),
    ]
    scoped, plan = check_store(
        spark, root, checks, where=[("k", ">=", 8_000)], return_plan=True
    )
    res = _results(scoped)
    assert res[("row_count_between", None)][0] is True
    assert res[("values_in_set", "lang")][0] is True
    assert res[("min_at_least", "k")][0] is True
    # store-wide audit still catches the legacy violator
    wide = _results(check_store(spark, root, [checks[1]]))
    assert wide[("values_in_set", "lang")][0] is False
    # economics: the base store's partitions were pruned or metadata-only;
    # at most the fresh slice's own partitions decoded
    assert plan["pruned"] > 0
    assert plan["decoded"] <= 4, plan
    assert plan["total"] == plan["pruned"] + plan["metadata"] + plan["decoded"]


def test_check_validation(spark, tmp_path):
    root = _store(spark, tmp_path, _src(spark, n=100), name="qval")
    with pytest.raises(ValueError):
        check_store(spark, root, [("bogus", "lang", None)])
    with pytest.raises(ValueError):
        check_store(spark, root, [("no_nulls", "nope", None)])
    with pytest.raises(ValueError):
        check_store(spark, root, [("row_count_between", None, (5, 1))])


def test_bound_checks_on_all_null_string(spark, tmp_path):
    """An all-null string column's EMPTY sets must not trip ANSI
    element_at: bound checks are vacuously true, domain check passes."""
    df = spark.range(0, 2_000).select(
        (F.col("id") % 2).cast("int").alias("grp"),
        F.col("id").alias("k"),
        F.lit(None).cast("string").alias("lang"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("uid"),
    )
    root = _store(spark, tmp_path, df, name="qallnull")
    res = _results(check_store(spark, root, [
        ("min_at_least", "lang", "a"),
        ("max_at_most", "lang", "zzz"),
        ("values_in_set", "lang", ["x"]),
        ("null_fraction_at_most", "lang", 1.0),
    ]))
    assert all(passed for passed, _ in res.values()), res
    assert res[("min_at_least", "lang")][1] == "no non-null values"
