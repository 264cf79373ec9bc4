"""Profile the corpus encode job: per-column codec time vs everything else.

Splits the encode wall into (a) per-column codec seconds from the summary
rows (encode_s covers choose+encode only), (b) the residual — shuffle, sort,
sha256 digest, stats, blob writes. Points at the next throughput lever.

Usage: python jobs/profile_encode.py [rows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    from pyspark.sql import functions as F

    from parzig_spark.operators import encode_table
    from parzig_spark.session import get_spark
    from parzig_spark.sources import source_code_table

    spark = get_spark(app_name="profile_encode", master="local[32]", shuffle_partitions=32)
    corpus = source_code_table(spark, n_rows=rows, partitions=32).cache()
    raw_bytes = corpus.select(
        (
            F.sum(F.octet_length("content"))
            + F.sum(
                F.octet_length("repo")
                + F.octet_length("path")
                + F.octet_length("commit")
                + F.octet_length("lang")
            )
        ).alias("b")
    ).collect()[0]["b"]

    for rep in range(2):
        root = tempfile.mkdtemp(prefix="parzig_prof_")
        summary_df = encode_table(
            corpus,
            root,
            group_cols=["repo", "lang"],
            salt_cols=["path", "commit"],
            sort_cols=["repo", "path", "commit"],
            size_col="content",
            target_bytes=16 << 20,
            resume=False,
        )
        t0 = time.perf_counter()
        rows_out = summary_df.collect()
        wall = time.perf_counter() - t0
        per_col: dict[tuple[str, str], list[float]] = {}
        for r in rows_out:
            k = (r["column"], r["codec"])
            per_col.setdefault(k, [0.0, 0, 0])[0] += r["encode_s"]
            per_col[k][1] += r["raw_bytes"]
            per_col[k][2] += r["enc_bytes"]
        codec_total = sum(v[0] for v in per_col.values())
        print(f"\nrep {rep}: job wall {wall:.2f}s  raw {raw_bytes/1e9:.3f} GB  "
              f"-> {raw_bytes/wall/1e9:.3f} GB/s job")
        print(f"  codec cpu-seconds total: {codec_total:.2f}  "
              f"(residual = shuffle+sort+digest+stats+io, concurrency-hidden)")
        for (col, codec), (s, rb, eb) in sorted(per_col.items(), key=lambda kv: -kv[1][0]):
            print(f"  {col:10s} {codec:14s} {s:7.2f}s  {rb/1e6:9.1f} MB raw  "
                  f"{eb/1e6:8.2f} MB enc  {rb/max(s,1e-9)/1e9:6.2f} GB/s")
        import shutil

        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
