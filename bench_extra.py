"""Phase-split profiling harness for the encode/decode lanes (round 6).

NOT the driver bench (bench.py is frozen) — this isolates where roundtrip
lane seconds go, per optimization guide §1: a passthrough control runs the
identical shuffle + canonical sort + mapInArrow boundary with a consume-only
kernel, so (encode_job - passthrough) ≈ codec+digest+stats+blob-write cost,
and passthrough ≈ shuffle/sort/Arrow-boundary cost that no codec change can
touch.

Usage: python bench_extra.py [lineitem|decimal|corpus|all]  (env as bench.py)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    import pyarrow as pa
    from pyspark.sql import functions as F

    from parzig_spark.operators import decode_table, encode_table
    from parzig_spark.operators.encode import plan_partitions
    from parzig_spark.session import get_spark

    spark = get_spark(app_name="parzig_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    out: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = round(time.perf_counter() - t0, 3)
        return r

    def passthrough(df, group_cols, salt_cols, sort_cols, size_col=None,
                    target_bytes=32 << 20):
        """The encode job's exact shuffle+sort+boundary with a no-op kernel."""
        with_pid, n_buckets = plan_partitions(
            df, group_cols, salt_cols, target_bytes, size_col)
        shuffled = with_pid.repartition(n_buckets, "pid").sortWithinPartitions(
            F.col("pid").asc(), *[F.col(c).asc_nulls_last() for c in sort_cols])

        def consume(batches):
            n = 0
            for b in batches:
                n += b.num_rows
            yield pa.RecordBatch.from_pylist(
                [{"n": n}], schema=pa.schema([("n", pa.int64())]))

        return shuffled.mapInArrow(consume, schema="n long")

    def lane_lineitem():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        spark.sparkContext.setJobDescription("lineitem passthrough control")
        timed("li_passthrough", lambda: passthrough(
            li, ["l_returnflag", "l_linestatus"], ["l_orderkey"],
            ["l_orderkey", "l_linenumber"]).count())
        root = tempfile.mkdtemp(prefix="px_li_")
        try:
            spark.sparkContext.setJobDescription("lineitem encode")
            t0 = time.perf_counter()
            summary = encode_table(
                li, root, group_cols=["l_returnflag", "l_linestatus"],
                salt_cols=["l_orderkey"], sort_cols=["l_orderkey", "l_linenumber"],
                target_bytes=32 << 20, resume=False)
            out["li_encode_plan"] = round(time.perf_counter() - t0, 3)
            rows = timed("li_encode_job", lambda: summary.collect())
            out["li_codec_kernel_s"] = round(sum(r["encode_s"] for r in rows), 3)
            out["li_n_buckets"] = len({r["pid"] for r in rows})
            spark.sparkContext.setJobDescription("lineitem decode")
            t0 = time.perf_counter()
            dec = decode_table(spark, root)
            out["li_decode_plan"] = round(time.perf_counter() - t0, 3)
            timed("li_decode_job", lambda: dec.count())
            spark.sparkContext.setJobDescription("lineitem decode+agg")
            timed("li_decode_agg", lambda: dec.groupBy("l_returnflag").count().collect())
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def lane_decimal():
        src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            F.col("l_extendedprice").cast("decimal(15,2)").alias("price_dec"))
        spark.sparkContext.setJobDescription("decimal passthrough control")
        timed("dec_passthrough", lambda: passthrough(
            src, ["l_returnflag"], ["l_orderkey"],
            ["l_orderkey", "l_linenumber", "l_returnflag", "price_dec"]).count())
        root = tempfile.mkdtemp(prefix="px_dec_")
        try:
            spark.sparkContext.setJobDescription("decimal encode")
            t0 = time.perf_counter()
            summary = encode_table(
                src, root, group_cols=["l_returnflag"], salt_cols=["l_orderkey"],
                target_bytes=32 << 20, resume=False)
            out["dec_encode_plan"] = round(time.perf_counter() - t0, 3)
            rows = timed("dec_encode_job", lambda: summary.collect())
            out["dec_codec_kernel_s"] = round(sum(r["encode_s"] for r in rows), 3)
            spark.sparkContext.setJobDescription("decimal decode")
            dec = decode_table(spark, root)
            timed("dec_decode_job", lambda: dec.count())
        finally:
            shutil.rmtree(root, ignore_errors=True)

    def lane_corpus():
        from parzig_spark.sources import source_code_table
        corpus = source_code_table(spark, n_rows=120000, partitions=cpus).cache()
        corpus.count()
        spark.sparkContext.setJobDescription("corpus passthrough control")
        timed("corpus_passthrough", lambda: passthrough(
            corpus, ["repo", "lang"], ["path", "commit"],
            ["repo", "path", "commit"], size_col="content",
            target_bytes=16 << 20).count())
        root = tempfile.mkdtemp(prefix="px_corp_")
        try:
            spark.sparkContext.setJobDescription("corpus encode")
            t0 = time.perf_counter()
            summary = encode_table(
                corpus, root, group_cols=["repo", "lang"],
                salt_cols=["path", "commit"], sort_cols=["repo", "path", "commit"],
                size_col="content", target_bytes=16 << 20, resume=False)
            out["corpus_encode_plan"] = round(time.perf_counter() - t0, 3)
            rows = timed("corpus_encode_job", lambda: summary.collect())
            out["corpus_codec_kernel_s"] = round(sum(r["encode_s"] for r in rows), 3)
            spark.sparkContext.setJobDescription("corpus decode")
            dec = decode_table(spark, root)
            timed("corpus_decode_job", lambda: dec.count())
        finally:
            shutil.rmtree(root, ignore_errors=True)
        corpus.unpersist()

    # untimed warm-up: JVM, python workers, numpy page-fault warm
    warm = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(200000)
    root = tempfile.mkdtemp(prefix="px_warm_")
    try:
        encode_table(warm, root, group_cols=["o_orderstatus"],
                     salt_cols=["o_orderkey"], target_bytes=8 << 20,
                     resume=False).count()
        decode_table(spark, root).count()
    finally:
        shutil.rmtree(root, ignore_errors=True)

    if which in ("lineitem", "all"):
        lane_lineitem()
    if which in ("decimal", "all"):
        lane_decimal()
    if which in ("corpus", "all"):
        lane_corpus()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
