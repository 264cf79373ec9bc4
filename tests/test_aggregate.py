"""Metadata-only aggregate pushdown (operators/aggregate.py): COUNT/SUM/
MIN/MAX from manifest stats, hybrid metadata+decode under predicates,
delete-aware fallback, SQL null semantics.
"""

import tempfile

from pyspark.sql import functions as F

from parzig_spark.operators import (
    aggregate_store,
    delete_rows,
    encode_table,
)

AGGS = [
    ("count", "*"), ("count", "w"), ("null_count", "w"),
    ("sum", "v"), ("min", "k"), ("max", "k"),
]


def _expected(df, predicates_expr=None):
    d = df if predicates_expr is None else df.filter(predicates_expr)
    r = d.agg(
        F.count(F.lit(1)).alias("count_star"),
        F.count("w").alias("count_w"),
        F.sum(F.col("w").isNull().cast("long")).alias("null_count_w"),
        F.sum("v").alias("sum_v"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    ).collect()[0]
    return {
        "count_star": r["count_star"], "count_w": r["count_w"],
        "null_count_w": r["null_count_w"] or 0,
        "sum_v": r["sum_v"], "min_k": r["min_k"], "max_k": r["max_k"],
    }


def _source(spark):
    return spark.range(0, 50_000).select(
        (F.col("id") / 8192).cast("int").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") * 3).alias("v"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 7).alias("w"),
    )


def _store(spark, df, tmp_path, name="aggstore"):
    root = str(tmp_path / name)
    encode_table(
        df, root, group_cols=["grp"], salt_cols=["k"],
        target_bytes=128 << 10, resume=False,
    ).count()
    return root


def test_aggregate_metadata_only(spark, tmp_path):
    """No predicates, no deletes: every partition answers from stats —
    zero decoded partitions — and matches the DataFrame aggregation."""
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    out, plan = aggregate_store(spark, root, AGGS, return_plan=True)
    assert plan["pids_decoded"] == 0
    assert plan["pids_metadata"] == plan["pids_total"]
    assert out.collect()[0].asDict() == _expected(df)


def test_aggregate_hybrid_predicate(spark, tmp_path):
    """A range predicate splits partitions three ways (pruned / fully
    covered / partial) and the combined answer is row-exact."""
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    out, plan = aggregate_store(
        spark, root, AGGS, predicates=[("k", "<=", 30_000)], return_plan=True
    )
    assert plan["pids_pruned"] > 0
    assert plan["pids_metadata"] > 0
    assert plan["pids_decoded"] > 0
    assert out.collect()[0].asDict() == _expected(df, F.col("k") <= 30_000)


def test_aggregate_after_delete_routes_to_decode(spark, tmp_path):
    """Merge-on-read deletes invalidate metadata answers for the touched
    partitions — those decode, everything else stays metadata-only, and
    the result reflects the deletion."""
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    delete_rows(spark, root, [("k", "<", 5_000)])
    out, plan = aggregate_store(spark, root, AGGS, return_plan=True)
    assert plan["pids_decoded"] > 0
    assert plan["pids_metadata"] > 0  # untouched partitions stay metadata
    assert out.collect()[0].asDict() == _expected(df, F.col("k") >= 5_000)


def test_aggregate_float_sum_falls_back(spark, tmp_path):
    """sum() on a float column is not metadata-eligible (order-dependent):
    the whole query runs through the decode path and is still correct."""
    df = spark.range(0, 20_000).select(
        (F.col("id") / 8192).cast("int").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") * 0.5).alias("f"),
    )
    root = _store(spark, df, tmp_path, "floatstore")
    out, plan = aggregate_store(
        spark, root, [("count", "*"), ("sum", "f")], return_plan=True
    )
    assert plan["pids_metadata"] == 0
    got = out.collect()[0]
    assert got["count_star"] == 20_000
    assert got["sum_f"] == sum(i for i in range(20_000)) / 2  # native double sum


def test_aggregate_string_equality_pin(spark, tmp_path):
    """A string equality predicate on the grouping column: partitions pinned
    to exactly that value (stat_min == stat_max == v) answer from metadata."""
    df = spark.range(0, 30_000).select(
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("lang"),
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    root = str(tmp_path / "strstore")
    encode_table(
        df, root, group_cols=["lang"], salt_cols=["k"],
        target_bytes=128 << 10, resume=False,
    ).count()
    out, plan = aggregate_store(
        spark, root,
        [("count", "*"), ("sum", "v"), ("min", "k"), ("max", "k")],
        predicates=[("lang", "==", "g1")],
        return_plan=True,
    )
    assert plan["pids_pruned"] > 0      # pure-g0/g2 partitions drop
    assert plan["pids_metadata"] > 0    # pure-g1 partitions pin to the value
    # bin-packing merges small groups, so lang-straddling partitions exist
    # and legitimately decode — but never the whole store
    assert plan["pids_decoded"] < plan["pids_total"] - plan["pids_pruned"]
    exp = df.filter(F.col("lang") == "g1").agg(
        F.count(F.lit(1)), F.sum("v"), F.min("k"), F.max("k")
    ).collect()[0]
    got = out.collect()[0]
    assert [got["count_star"], got["sum_v"], got["min_k"], got["max_k"]] == list(exp)


def test_aggregate_empty_result_sql_semantics(spark, tmp_path):
    """Predicates matching nothing: count 0, sum/min/max NULL — SQL empty-
    aggregation semantics."""
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    out = aggregate_store(
        spark, root, AGGS, predicates=[("k", ">", 10_000_000)]
    )
    got = out.collect()[0]
    assert got["count_star"] == 0 and got["count_w"] == 0
    assert got["null_count_w"] == 0
    assert got["sum_v"] is None and got["min_k"] is None and got["max_k"] is None


def test_aggregate_in_list_predicate(spark, tmp_path):
    """IN-list predicates compose with the aggregate surface (partial
    coverage: multi-value lists never fully cover a multi-value partition)."""
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    keys = [5, 17_000, 44_441]
    out = aggregate_store(
        spark, root,
        [("count", "*"), ("sum", "v")],
        predicates=[("k", "in", keys)],
    )
    got = out.collect()[0]
    assert got["count_star"] == 3
    assert got["sum_v"] == sum(3 * k for k in keys)


def test_aggregate_rejects_bad_input(spark, tmp_path):
    df = _source(spark)
    root = _store(spark, df, tmp_path)
    import pytest

    with pytest.raises(ValueError, match="unsupported aggregate fn"):
        aggregate_store(spark, root, [("avg", "v")])
    with pytest.raises(ValueError, match="name a column"):
        aggregate_store(spark, root, [("sum", "*")])
    with pytest.raises(ValueError, match="unknown column"):
        aggregate_store(spark, root, [("sum", "nope")])
    # ADVICE r4 #4: ("distinct","*") must fail upfront with a clear
    # ValueError, never a KeyError deep in the COUNT(DISTINCT) branch
    with pytest.raises(ValueError, match="name a column"):
        aggregate_store(spark, root, [("distinct", "*")])
