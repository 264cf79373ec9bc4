"""Dump .explain('formatted') for the round-6-touched queries.

Usage: python jobs/dump_plans_r06.py <out_dir> <suffix> [entry_dir]

entry_dir defaults to the repo root; pass a git worktree of the
round-start commit to produce the *_before.txt plans with the old code.
Roundtrip lanes execute their encode imperatively when called, so the
dumped plan is the decode(+aggregate) side — the part that HAS a plan.
"""

from __future__ import annotations

import os
import sys

out_dir = sys.argv[1]
suffix = sys.argv[2]
entry_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
sys.path.insert(0, entry_dir)

QUERIES = [
    "embedding_near_dups",
    "simhash",
    "dedup_exact",
    "join_segment_revenue",
    "ann_lsh_topk",
    "minhash_candidates",
    "roundtrip_nested",
    "roundtrip_forced_codecs",
    "roundtrip_decimal",
    "roundtrip_lineitem_q1",
]


def main() -> None:
    import __spark_entry__ as entry
    from parzig_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="dump_plans_r06", shuffle_partitions=32)
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in QUERIES:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print("dumped", name, flush=True)


if __name__ == "__main__":
    main()
