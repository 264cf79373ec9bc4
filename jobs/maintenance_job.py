"""spark-submit CLI for store maintenance — the deployment surface of the
compaction / GC / delete / evolution operators (same shape as
jobs/encode_job.py; ship the package with --py-files parzig_spark.zip).

Usage:
  spark-submit maintenance_job.py compact  <src_root> <dst_root> [target_mb]
  spark-submit maintenance_job.py gc       <root> [min_age_s]
  spark-submit maintenance_job.py delete   <root> <column> <op> <value>
  spark-submit maintenance_job.py snapshot <root>
  spark-submit maintenance_job.py rollback <root> <version>
  spark-submit maintenance_job.py files    <root>
  spark-submit maintenance_job.py snapshots <root>
  spark-submit maintenance_job.py tag      <root> <name> [version]
  spark-submit maintenance_job.py branch   <root> <name> [version]
  spark-submit maintenance_job.py drop-ref <root> <name>
  spark-submit maintenance_job.py refs     <root>
  spark-submit maintenance_job.py stage    <root> <batch_parquet> <wap_id>
  spark-submit maintenance_job.py publish  <root> <branch>
  spark-submit maintenance_job.py audit    <root> [ref]
  spark-submit maintenance_job.py check    <root> <checks_json> [ref]

`delete` values parse as int → float → string; ops: == != < <= > >=
startswith. `stage` reads the batch from a parquet path and stages it
under wap_id (publish with `publish`, discard with `drop-ref`). `audit`
scrubs blob digests (optionally at a ref); `check` evaluates a JSON list
of [name, column, arg] expectations (see operators/quality.py), exiting
non-zero when any check fails — the WAP gate as one CLI step.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_value(s: str):
    for cast in (int, float):
        try:
            return cast(s)
        except ValueError:
            continue
    return s


def main(argv: list[str]) -> int:
    cmd = argv[0]
    if cmd == "gc":
        from parzig_spark.operators import gc_store

        stats = gc_store(argv[1], min_age_s=float(argv[2]) if len(argv) > 2 else 0.0)
        print(json.dumps({"cmd": "gc", **stats}))
        return 0
    if cmd == "snapshot":
        from parzig_spark.plans.manifest import ManifestStore

        path = ManifestStore(argv[1]).write_snapshot()
        print(json.dumps({"cmd": "snapshot", "path": path}))
        return 0
    if cmd == "rollback":
        from parzig_spark.operators import rollback_store

        stats = rollback_store(argv[1], int(argv[2]))
        print(json.dumps({"cmd": "rollback", **stats}))
        return 0
    if cmd in ("tag", "branch"):
        from parzig_spark.operators import create_ref

        version = int(argv[3]) if len(argv) > 3 else None
        rec = create_ref(argv[1], argv[2], kind=cmd, version=version)
        print(json.dumps({"cmd": cmd, **rec}))
        return 0
    if cmd == "drop-ref":
        from parzig_spark.operators import drop_ref

        print(json.dumps({"cmd": cmd, "dropped": drop_ref(argv[1], argv[2])}))
        return 0
    if cmd == "refs":
        from parzig_spark.operators import list_refs

        print(json.dumps({"cmd": cmd, "refs": list_refs(argv[1])}))
        return 0
    if cmd == "publish":
        from parzig_spark.operators import publish_ref

        stats = publish_ref(argv[1], argv[2])
        print(json.dumps({"cmd": cmd, **stats}))
        return 0

    from parzig_spark.session import get_spark

    spark = get_spark(app_name=f"parzig_{cmd}")
    try:
        if cmd == "compact":
            from parzig_spark.operators import compact_store

            target = (int(argv[3]) if len(argv) > 3 else 64) << 20
            summary = compact_store(spark, argv[1], argv[2], target_bytes=target)
            rows = summary.groupBy().agg(
                {"enc_bytes": "sum", "n_values": "sum"}
            ).first()
            print(
                json.dumps(
                    {
                        "cmd": "compact",
                        "enc_bytes": int(rows["sum(enc_bytes)"] or 0),
                        "n_values": int(rows["sum(n_values)"] or 0),
                    }
                )
            )
            return 0
        if cmd == "delete":
            from parzig_spark.operators import delete_rows

            root, column, op, value = argv[1], argv[2], argv[3], _parse_value(argv[4])
            stats = delete_rows(spark, root, [(column, op, value)])
            print(json.dumps({"cmd": "delete", **stats}))
            return 0
        if cmd == "files":
            from parzig_spark.operators import files_table

            agg = files_table(spark, argv[1]).groupBy().agg(
                {"pid": "approx_count_distinct", "enc_bytes": "sum", "n_values": "max"}
            ).first()
            print(json.dumps({"cmd": "files", "summary": {k: v for k, v in agg.asDict().items()}}))
            return 0
        if cmd == "snapshots":
            from parzig_spark.operators import snapshots_table

            rows = [r.asDict() for r in snapshots_table(spark, argv[1]).collect()]
            print(json.dumps({"cmd": "snapshots", "snapshots": rows}))
            return 0
        if cmd == "stage":
            from parzig_spark.operators import stage_batch

            df = spark.read.parquet(argv[2])
            info = stage_batch(spark, df, argv[1], wap_id=argv[3])
            print(json.dumps({"cmd": "stage", **info}))
            return 0
        if cmd == "audit":
            from pyspark.sql import functions as F

            from parzig_spark.operators.verify import verify_store

            ref = argv[2] if len(argv) > 2 else None
            bad = verify_store(spark, argv[1], ref=ref).filter(~F.col("ok")).count()
            print(json.dumps({"cmd": "audit", "ref": ref, "corrupt_blobs": int(bad)}))
            return 0 if bad == 0 else 1
        if cmd == "check":
            from parzig_spark.operators import check_store

            checks = [
                (c[0], c[1], tuple(c[2]) if isinstance(c[2], list) and c[0] == "row_count_between" else c[2])
                for c in json.loads(argv[2])
            ]
            ref = argv[3] if len(argv) > 3 else None
            rows = [r.asDict() for r in check_store(spark, argv[1], checks, ref=ref).collect()]
            print(json.dumps({"cmd": "check", "ref": ref, "results": rows}))
            return 0 if all(r["passed"] for r in rows) else 1
        print(f"unknown command {cmd!r}", file=sys.stderr)
        return 2
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
