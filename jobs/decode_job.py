"""spark-submit entrypoint: decode a manifest store, optionally verifying
against the original source table (sha256 per row).

    spark-submit --py-files parzig_spark.zip jobs/decode_job.py \\
        --store /path/to/store [--out /path/out.parquet] \\
        [--verify-against /path/source.parquet --keys repo,path,commit]
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
    p.add_argument("--store", required=True)
    p.add_argument("--columns", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--verify-against", default=None)
    p.add_argument("--keys", default="repo,path,commit")
    args = p.parse_args()

    from parzig_spark.operators import decode_table, verify_roundtrip
    from parzig_spark.session import get_spark

    spark = get_spark(app_name="parzig_decode")
    t0 = time.perf_counter()
    decoded = decode_table(
        spark, args.store, columns=args.columns.split(",") if args.columns else None
    )
    report: dict = {}
    if args.out:
        decoded.write.mode("overwrite").parquet(args.out)
        report["out"] = args.out
    rows = decoded.count()
    report["rows"] = rows
    report["wall_s"] = round(time.perf_counter() - t0, 2)
    if args.verify_against:
        source = spark.read.parquet(args.verify_against)
        report["verify"] = verify_roundtrip(source, decoded, args.keys.split(","))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
