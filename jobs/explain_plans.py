"""Dump physical plans for the engine's key dataflows → EXPLAIN.md.

Evidence that the declarative parts stay in Catalyst's fast path:
- parquet scans show PushedFilters / narrow ReadSchema (column pruning);
- the small dimension join goes BroadcastHashJoin;
- aggregations are hash-based with partial (map-side) aggregation;
- WholeStageCodegen spans cover the JVM-side expressions.

Usage: python jobs/explain_plans.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entrymod
    from parzig_spark.operators.encode import plan_partitions
    from parzig_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="explain", master="local[4]", shuffle_partitions=4)
    sections = []

    def grab(title: str, df, note: str, max_lines: int = 400) -> None:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        text = buf.getvalue().strip()
        lines = text.splitlines()
        if len(lines) > max_lines:
            # the operator tree at the top is the readable part; the node
            # detail dump below repeats it — cap the doc, keep it honest
            text = "\n".join(lines[:max_lines]) + (
                f"\n... [{len(lines) - max_lines} node-detail lines elided]"
            )
        sections.append(f"## {title}\n\n{note}\n\n```\n{text}\n```\n")

    qs = entrymod.queries()

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pruned = li.filter(F.col("l_shipdate") <= "1995-01-01").select("l_orderkey", "l_quantity")
    grab(
        "Filter + projection pushdown (lineitem scan)",
        pruned,
        "The parquet scan must show `PushedFilters: [LessThanOrEqual(l_shipdate,...)]` "
        "and a two-column `ReadSchema` — predicate and projection reach the reader.",
    )

    grab(
        "TPC-H Q1 aggregation",
        qs["tpch_q1"](spark, sf_dir),
        "HashAggregate appears twice (partial map-side combine before the exchange, "
        "final after) inside WholeStageCodegen spans.",
    )

    grab(
        "Broadcast join (customer dimension)",
        qs["join_segment_revenue"](spark, sf_dir),
        "The customer side must be `BroadcastHashJoin` (explicit F.broadcast); the "
        "orders/lineitem join is size-driven (AQE may also pick broadcast at sf0.01).",
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    with_pid, _ = plan_partitions(docs, ["lang", "source"], ["doc_id"], 16 << 20, "text")
    grab(
        "Encode partition planning (sizing pass + salted pid)",
        with_pid,
        "One column-pruned aggregation for group sizes, broadcast back, then pure "
        "Catalyst expressions (xxhash64/pmod) — a single shuffle total for the encode.",
    )

    import tempfile

    from parzig_spark.functions import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    idx_path = tempfile.mkdtemp(prefix="explain_lshidx_")
    sim.build_lsh_index(emb.filter(F.col("vec_id") != 0), idx_path, n_planes=6, dim=64)
    grab(
        "Materialized LSH ANN probe (bucket partition pruning)",
        sim.lsh_topk_indexed(spark, idx_path, list(qrow["embedding"]), k=20, n_planes=6),
        "The index is parquet partitioned by `bucket`; the probe's IN-filter lands in "
        "`PartitionFilters`, so only the query's Hamming-radius-1 bucket directories "
        "are read — the scan never touches the other ~57/64 buckets.",
    )

    ivf_path = tempfile.mkdtemp(prefix="explain_ivfidx_")
    sim.build_ivf_index(emb.filter(F.col("vec_id") != 0), ivf_path, k_clusters=16)
    grab(
        "Materialized IVF ANN probe (cluster partition pruning)",
        sim.ivf_topk_indexed(spark, ivf_path, list(qrow["embedding"]), k=20, nprobe=4),
        "Data-adaptive variant of the LSH probe: the index is parquet partitioned by "
        "`cluster` (k-means cells); the nprobe nearest cells land in "
        "`PartitionFilters`, so the probe scans 4/16 cluster directories.",
    )

    from parzig_spark.operators import decode_table, encode_table
    from parzig_spark.plans.manifest import ManifestStore

    store_root = tempfile.mkdtemp(prefix="explain_store_")
    encode_table(
        docs, store_root, group_cols=["lang", "source"], salt_cols=["doc_id"],
        size_col="text", target_bytes=1 << 20, resume=False,
    ).count()
    grab(
        "Manifest-stats decode pruning",
        decode_table(spark, store_root, predicates=[("doc_id", ">=", 400)]),
        "Manifests come from one snapshot parquet via spark.read; partitions whose "
        "recorded [stat_min, stat_max] cannot satisfy the predicate are anti-joined "
        "away before any blob is opened (decode-side Statistics skipping).",
    )

    grab(
        "String-predicate decode pruning (truncated-sound bounds)",
        decode_table(spark, store_root, predicates=[("lang", "==", "zh")]),
        "Same anti-join shape driven by STRING stats: a truncated 16-code-point "
        "lower bound and a truncated-then-incremented upper bound (Parquet "
        "Statistics semantics) — equality on `lang` prunes every partition whose "
        "string range excludes the value.",
    )

    store2 = tempfile.mkdtemp(prefix="explain_prefix_store_")
    encode_table(
        docs, store2, group_cols=["source"], salt_cols=["doc_id"],
        size_col="text", target_bytes=1 << 20, resume=False,
    ).count()
    grab(
        "String RANGE + PREFIX decode pruning",
        decode_table(
            spark, store2,
            predicates=[("source", ">=", "src15"), ("source", "startswith", "src1")],
        ),
        "Range (`>=`) comparisons run directly on the truncated-but-sound string "
        "bounds; a prefix predicate (`LIKE 'src1%'`) maps to the interval "
        "[p, next(p)) — partitions whose [stat_min, stat_max] envelope misses the "
        "interval are anti-joined away before any blob read. Both predicates here "
        "AND together: only src15–src19 partitions survive.",
    )

    store3 = tempfile.mkdtemp(prefix="explain_paged_store_")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    encode_table(
        orders, store3, group_cols=["o_orderstatus"], salt_cols=["o_orderkey"],
        sort_cols=["o_orderkey"], target_bytes=64 << 20, resume=False,
        page_values=4096,
    ).count()
    grab(
        "Sub-partition (page-level) decode skipping — PAGED layout",
        decode_table(spark, store3, predicates=[("o_orderkey", "<=", 5000)]),
        "The store is in the PAGED layout (4096-value sections, per-page min/max "
        "— the ColumnIndex analog). The Spark plan is the usual manifest anti-join "
        "+ mapInArrow; the page skipping happens INSIDE each decode task: only "
        "sections whose [min, max] can satisfy the predicate are read "
        "(read_blob_ranges seeks to their byte ranges) and decoded — bytes touched "
        "scale with selectivity, not partition size. Equality predicates "
        "additionally consult per-page blooms (the BloomFilterHeader analog), "
        "which prune pages whose [min, max] spans the whole domain.",
    )

    grab(
        "Partition-level BLOOM pruning — point lookup off the sort order",
        decode_table(spark, store2, predicates=[("doc_id", "==", 371)]),
        "A point predicate on a column UNCORRELATED with the partitioning "
        "(doc_id across source-grouped partitions): every partition's "
        "[stat_min, stat_max] envelope spans the domain, so min/max prunes "
        "nothing — the manifest's partition-level equality bloom "
        "(stat_bloom, format v5; the BloomFilterHeader analog) proves the "
        "value absent from most partitions, and the anti-join drops them "
        "BEFORE any decode task is scheduled. The probe is an Arrow-batched "
        "UDF over manifest rows — metadata scale, one short row per "
        "(partition, column), never data scale. Inside surviving "
        "partitions, per-page blooms (PAGED stores) skip sections the same "
        "way.",
    )

    from parzig_spark.operators import aggregate_store

    grab(
        "Aggregate pushdown — COUNT/SUM/MIN/MAX from manifest stats",
        aggregate_store(
            spark, store3,
            [("count", "*"), ("sum", "o_orderkey"),
             ("min", "o_orderkey"), ("max", "o_orderkey")],
            predicates=[("o_orderkey", "<=", 30_000)],
        ),
        "aggregate_store under a range predicate: everything left of the "
        "final union is METADATA scale — manifest rows aggregate per "
        "partition into covered/partial classes (exact stat_sum/stat_nulls "
        "decimal strings, format v6), fully-covered partitions contribute "
        "their stats verbatim, and the mapInArrow decode subtree runs ONLY "
        "over the partitions the predicate straddles (left-semi join on "
        "the partial pid set). No blob is opened for a fully-covered "
        "partition; with no predicates and no deletes the decode subtree "
        "is empty and a 100-TB COUNT/SUM touches zero data files.",
    )

    grab(
        "Exact distinct-set pruning + COUNT(DISTINCT) pushdown (format v7)",
        aggregate_store(
            spark, store2,
            [("count", "*"), ("distinct", "source")],
            predicates=[("lang", "==", "zh")],
        ),
        "A point predicate on low-cardinality lang across source-grouped "
        "partitions, aggregating COUNT(DISTINCT source): pruning consults "
        "each partition's EXACT stat_distinct set (from_json + "
        "array_contains — pure Catalyst over manifest rows, no Python "
        "probe, no bloom false positives), partitions whose whole lang "
        "set is 'zh' are fully covered (the forall inclusion dual — "
        "min/max can only pin single-valued string partitions), and the "
        "distinct count unions the covered partitions' exploded sets with "
        "the decoded straddlers' values before one countDistinct.",
    )

    store4 = tempfile.mkdtemp(prefix="explain_groupby_")
    encode_table(
        docs, store4, group_cols=["lang"], salt_cols=["doc_id"],
        size_col="text", target_bytes=16 << 10, resume=False,
    ).count()
    grab(
        "GROUP BY pushdown — partition-aligned rollup",
        aggregate_store(
            spark, store4,
            [("count", "*"), ("sum", "n_chars"), ("distinct", "source")],
            group_by=["lang"],
        ),
        "aggregate_store(group_by=['lang']) over a lang-partitioned store "
        "(the Hive/Iceberg partition-column aggregate): partitions whose "
        "size-1 stat_distinct set proves them single-valued + null-free "
        "on lang contribute their exact stats to that group's row with "
        "ZERO decode — the group key itself is read from the set "
        "(element_at + cast) — and only hash-packed mixed partitions feed "
        "the mapInArrow decode subtree, grouped natively. At 100 TB a "
        "rollup over the store's own partitioning answers from manifests "
        "alone.",
    )

    from parzig_spark.operators import compact_store

    dstc = tempfile.mkdtemp(prefix="explain_compact_")
    grab(
        "Store compaction rewrite (shuffle-free)",
        compact_store(spark, store_root, dstc, target_bytes=32 << 20),
        "The rewrite_data_files analog: the ONLY thing distributed is a tiny "
        "merge-group spec DataFrame (one row per group — json pid lists), "
        "repartitioned so each task rewrites one group. Data bytes never cross "
        "tasks: each task reads its own source blobs, re-encodes, commits one "
        "destination partition. No exchange of table data anywhere in the plan.",
    )

    ManifestStore(store_root).write_snapshot()
    grab(
        "Incremental (CDC) read since a snapshot",
        decode_table(spark, store_root, since_snapshot=0),
        "decode_table(since_snapshot=N): a broadcast anti-join of manifest rows "
        "against the base snapshot's pid set drops already-consumed partitions "
        "before any blob is opened — the append-scan a downstream consumer tails; "
        "time travel (snapshot=N) is the same plan reading a pinned snapshot "
        "parquet instead of the head.",
    )

    from parzig_spark.operators import changes_table, delete_rows

    delete_rows(spark, store_root, [("repo", "==", "org0/megarepo")])
    ManifestStore(store_root).write_snapshot()
    grab(
        "Row-level changelog between snapshots (insert/delete CDC)",
        changes_table(spark, store_root, 0),
        "changes_table(v_from, v_to): two decode subtrees, both restricted "
        "by a pid semi-join to the AFFECTED partitions only (snapshot "
        "pid-set symmetric difference + partitions touched by delete ops "
        "in exactly one sidecar — driver-side set arithmetic over "
        "metadata), anti-joined both ways on the stable (_pid, _pos) "
        "physical row address and union-tagged insert/delete. Unchanged "
        "partitions never appear in either subtree: CDC cost scales with "
        "the changed data, not the store.",
    )

    out = "# EXPLAIN — physical plans of the key dataflows\n\n" + "\n".join(sections)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md")
    with open(path, "w") as f:
        f.write(out)
    print(f"wrote {path} ({len(out)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
