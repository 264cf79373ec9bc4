"""spark-submit entrypoint: encode a source-code table into a manifest store.

Deployment shape per the north rule:

    spark-submit --py-files parzig_spark.zip jobs/encode_job.py \\
        --input /path/or/table --store /path/to/store \\
        [--group-cols repo,lang] [--salt-cols path,commit] \\
        [--size-col content] [--target-mb 64] [--synthetic-rows N]

Re-running after a partial failure is the resume path: committed partitions
are anti-joined away before any input rows are read. On completion the
driver compacts a manifest snapshot (Iceberg manifest-list analog).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="parquet path of the source table")
    p.add_argument("--synthetic-rows", type=int, help="use the synthetic corpus instead")
    p.add_argument("--store", required=True)
    p.add_argument("--group-cols", default="repo,lang")
    p.add_argument("--salt-cols", default="path,commit")
    p.add_argument("--sort-cols", default=None)
    p.add_argument("--size-col", default="content")
    p.add_argument("--target-mb", type=int, default=64)
    p.add_argument("--no-resume", action="store_true")
    args = p.parse_args()

    from parzig_spark.operators import encode_table
    from parzig_spark.plans.manifest import ManifestStore
    from parzig_spark.session import get_spark
    from parzig_spark.sources import source_code_table

    spark = get_spark(app_name="parzig_encode")
    if args.synthetic_rows:
        df = source_code_table(spark, n_rows=args.synthetic_rows)
    elif args.input:
        df = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --synthetic-rows is required")

    t0 = time.perf_counter()
    summary = encode_table(
        df,
        args.store,
        group_cols=args.group_cols.split(","),
        salt_cols=args.salt_cols.split(","),
        sort_cols=args.sort_cols.split(",") if args.sort_cols else None,
        size_col=args.size_col if args.size_col in df.columns else None,
        target_bytes=args.target_mb << 20,
        resume=not args.no_resume,
    ).toPandas()
    wall = time.perf_counter() - t0
    ManifestStore(args.store).write_snapshot()
    report = {
        "partitions_encoded": int(summary["pid"].nunique()) if len(summary) else 0,
        "rows": int(summary[summary["column"] == summary["column"].iloc[0]]["n_values"].sum()) if len(summary) else 0,
        "raw_bytes": int(summary["raw_bytes"].sum()),
        "enc_bytes": int(summary["enc_bytes"].sum()),
        "wall_s": round(wall, 2),
        "gbps": round(summary["raw_bytes"].sum() / wall / 1e9, 4),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
