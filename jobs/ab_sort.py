"""Interleaved A/B: JVM-side canonical sort vs Python-side pa.sort_by.

One Spark session, one cached corpus; each rep runs BOTH variants
back-to-back (same background interference), reporting per-rep job walls
and the per-variant best — the only comparison methodology that resolves a
10-20% effect under this host's ±2-4× drift (CLAUDE.md).

Usage: python jobs/ab_sort.py [rows] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from parzig_spark.operators import encode_table
    from parzig_spark.session import get_spark
    from parzig_spark.sources import source_code_table

    spark = get_spark(app_name="ab_sort", master="local[32]", shuffle_partitions=32)
    corpus = source_code_table(spark, n_rows=rows, partitions=32).cache()
    corpus.count()

    def run(jvm: bool) -> float:
        os.environ["SPARK_GRAFT_JVM_SORT"] = "1" if jvm else "0"
        root = tempfile.mkdtemp(prefix="parzig_ab_")
        try:
            df = encode_table(
                corpus, root, group_cols=["repo", "lang"],
                salt_cols=["path", "commit"], sort_cols=["repo", "path", "commit"],
                size_col="content", target_bytes=16 << 20, resume=False,
            )
            t0 = time.perf_counter()
            df.count()
            return time.perf_counter() - t0
        finally:
            shutil.rmtree(root, ignore_errors=True)

    run(True)  # warm-up, untimed
    best = {"jvm": float("inf"), "py": float("inf")}
    for r in range(reps):
        for name, jvm in (("jvm", True), ("py", False)):
            dt = run(jvm)
            best[name] = min(best[name], dt)
            print(f"rep {r} {name}: {dt:.2f}s", flush=True)
    print(f"best jvm={best['jvm']:.2f}s py={best['py']:.2f}s "
          f"ratio py/jvm={best['py'] / best['jvm']:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
