"""Distributed encode: DataFrame → per-partition column blobs + manifests.

The Spark translation of the reference's (single-threaded) column-chunk
write path it never had: partitions play row groups
(/root/reference/src/parquet/File.zig:93-95), one encoded blob per
(partition, column) plays the column chunk, and the manifest row plays
ColumnMetaData. Everything heavy runs inside one vectorized ``mapInArrow`` pass — no
per-row Python, no pandas object churn, no driver collect of data.

Skew handling (north rule): partition ids are salted content-derived
hashes. A first lightweight aggregation measures bytes per (repo, lang)
group; groups bigger than the target partition size get a per-row salt
``pmod(xxhash64(salt_cols), nsalt)`` so one giant repo fans out over many
partitions, while small groups stay whole for dictionary/FSST locality. The
physical shuffle is ``repartition(NP, pid)`` — hash, not range, because a
partition id must never straddle two tasks (range boundaries can split only
between distinct sort keys, but the atomic manifest commit needs the
guarantee per bucket, and hash-on-pid gives it exactly).

Idempotence under retries (SURVEY.md §7 hard-part (d)): pid is derived from
data, rows are canonically sorted before encoding, and the manifest commit
is first-marker-wins — a speculative duplicate task rewrites byte-identical
blobs and then no-ops.
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import dtypes, encode_column
from ..plans.manifest import FORMAT_VERSION, ManifestStore
from ..selector import choose_codec

SUMMARY_SCHEMA = (
    "pid long, column string, codec string, n_values long, raw_bytes long, "
    "enc_bytes long, encode_s double, committed boolean"
)


def column_digest(arr: pa.Array) -> str:
    """Canonical sha256 of a column's logical content (order-sensitive).

    Hash input bytes are identical to the original ``.tobytes()``
    formulation (same little-endian lanes in the same order), but every
    buffer feeds ``hashlib`` directly via the buffer protocol — the
    intermediate copies used to cost more per byte than the hash itself
    (digest was the single largest per-byte CPU term in the encode task)."""
    h = hashlib.sha256()
    if arr.null_count:
        h.update(np.ascontiguousarray(np.asarray(arr.is_null())))
        arr = arr.drop_null()
    t = arr.type
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        h.update(
            np.ascontiguousarray(
                arr.value_lengths().to_numpy(zero_copy_only=False).astype("<i8", copy=False)
            )
        )
        h.update(column_digest(arr.flatten()).encode())
    elif pa.types.is_map(t):
        # Hash per-entry lengths (np.diff of offsets), not raw offsets — a
        # sliced-but-logically-equal map array must digest identically to its
        # decoded (rebased-offset) twin, mirroring the list branch.
        offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False)).astype(
            "<i8", copy=False
        )
        h.update(np.ascontiguousarray(np.diff(offsets)))
        h.update(column_digest(arr.keys).encode())
        h.update(column_digest(arr.items).encode())
    elif pa.types.is_struct(t):
        for i in range(t.num_fields):
            h.update(t.field(i).name.encode())
            h.update(column_digest(arr.field(i)).encode())
    elif pa.types.is_decimal128(t):
        lo, hi = dtypes.decimal_lanes(arr)
        h.update(np.ascontiguousarray(lo))
        h.update(np.ascontiguousarray(hi))
    elif pa.types.is_fixed_size_binary(t):
        w = t.byte_width
        raw = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
        h.update(np.ascontiguousarray(raw[arr.offset * w : (arr.offset + len(arr)) * w]))
    else:
        token = dtypes.dtype_token(t)
        if dtypes.is_string_like(token):
            lengths, data = dtypes.string_buffers(arr)
            h.update(np.ascontiguousarray(lengths.astype("<i8", copy=False)))
            h.update(np.ascontiguousarray(data))
        else:
            h.update(np.ascontiguousarray(dtypes.to_physical(arr)))
    return h.hexdigest()


# Stat kernels live with the codecs (the paged layout computes per-page
# stats there); re-exported here for the established import surface.
from ..codecs.stats import STR_STAT_CHARS as _STR_STAT_CHARS  # noqa: F401
from ..codecs.stats import column_agg_stats, column_bloom, column_distinct, column_minmax, string_upper_bound  # noqa: F401


def plan_partitions(
    df: DataFrame,
    group_cols: list[str],
    salt_cols: list[str],
    target_bytes: int = 64 << 20,
    size_col: str | None = None,
    min_buckets: int | None = None,
    size_sample_mod: int = 1,
    pid_namespace: int | None = None,
    bucket_bits: int = 24,
    broadcast_group_limit: int = 65536,
) -> tuple[DataFrame, int]:
    """Attach a deterministic, skew-defused partition id column ``pid``.

    Two-sided balancing in one sizing pass (column-pruned aggregation, all
    remaining arithmetic Catalyst expressions):

    - **skew (giant groups)**: any (group_cols) group larger than
      ``target_bytes`` gets a per-row salt ``pmod(xxhash64(salt_cols),
      nsalt)`` so one giant repo fans out over ~nsalt partitions;
    - **fragmentation (tiny groups)**: pid = xxhash64(group, salt) is then
      bucketed modulo ``n_buckets = max(min_buckets, total/target)``, so
      thousands of small groups pack into byte-bounded partitions instead of
      paying per-partition encode/manifest overhead each (at 10^12 files the
      group count is ~repos×langs — far above any sane partition count).

    ``pid_namespace`` folds a caller-supplied dataset fingerprint into the
    high pid bits ((63 - bucket_bits)-bit namespace ``<<`` bucket_bits-bit
    bucket) so independent datasets encoded into one store (streaming
    micro-batches) can never collide on pid: without it, a later batch whose
    buckets alias committed pids would be silently anti-joined away on
    resume. Callers with few buckets per dataset (micro-batches) should
    shrink ``bucket_bits`` to widen the namespace.

    Scale path: group sizing stays fully distributed. Only when the group
    count is at most ``broadcast_group_limit`` is the salt table collected
    into a broadcast LocalRelation (saves recomputing the aggregation);
    above it the salt table is persisted and joined distributed — no
    unbounded ``collect()`` on the driver.
    """
    spark = df.sparkSession
    size_expr = F.octet_length(F.col(size_col)) if size_col else F.lit(256)
    # Optional sized-sample planning (size_sample_mod > 1): at 10^12 files a
    # full scan just to plan partitions is wasteful — a deterministic 1-in-k
    # hash sample estimates group sizes to a few percent. Hash-based (not
    # df.sample) and salted with a distinct constant so the estimate — and
    # therefore every pid — is a pure data function, identical on any
    # cluster size or partitioning (resume invariant), and uncorrelated
    # with the salt expression. Default is exact (the sizing scan is
    # column-pruned; cheap next to the encode itself).
    if size_sample_mod > 1:
        sampled = df.filter(
            F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols], F.lit(0x5A17)), F.lit(size_sample_mod)) == 0
        )
    else:
        sampled = df
    sample_mod = size_sample_mod
    sizes = (
        sampled.groupBy(*group_cols)
        .agg((F.sum(size_expr) * sample_mod).alias("_grp_bytes"))
        .withColumn(
            "_nsalt",
            F.greatest(F.lit(1), F.ceil(F.col("_grp_bytes") / F.lit(target_bytes))).cast("int"),
        )
    )
    # One sizing scan, ONE Spark action in the common path: collect at most
    # limit+1 rows of the per-group table. Getting ≤ limit rows proves we
    # hold the complete group set (totals computed driver-side); limit+1
    # rows means the group count is unbounded → switch to the fully
    # distributed path (persisted salt table + executor-side join + 1-row
    # totals action) so the driver never materializes millions of groups.
    sizes = sizes.persist()  # both planning actions reuse the one sizing scan
    size_rows = sizes.limit(broadcast_group_limit + 1).collect()
    distributed = len(size_rows) > broadcast_group_limit
    if distributed:
        totals = sizes.agg(F.sum("_grp_bytes").alias("_total")).first()
        total_bytes = int(totals["_total"] or 0)
        # Unpersist before the (lazy) join below: the encode job recomputes
        # the sizing aggregation once more during its shuffle, which costs
        # one extra column-pruned scan in this rare >65k-groups path but
        # never leaks a groups-sized cached table into session storage for
        # the lifetime of a long-running (e.g. streaming) driver.
        sizes.unpersist()
    else:
        total_bytes = sum(r["_grp_bytes"] or 0 for r in size_rows)
        sizes.unpersist()
    # n_buckets is a *data* property (bytes/target), never a cluster
    # property: partition ids must be identical across cluster sizes or a
    # resume on a different cluster re-encodes everything.
    if min_buckets is None:
        min_buckets = 1
    n_buckets = max(min_buckets, -(-int(total_bytes) // target_bytes))
    if pid_namespace is not None:
        n_buckets = min(n_buckets, 1 << bucket_bits)
    if distributed:
        # AQE picks the physical join; the persisted aggregate is reused,
        # so this still costs one sizing scan total.
        out = df.join(sizes.select(*group_cols, "_nsalt"), on=group_cols, how="left")
    else:
        nsalt_df = spark.createDataFrame(
            [tuple(r[c] for c in group_cols) + (r["_nsalt"],) for r in size_rows],
            df.select(*group_cols).schema.add("_nsalt", "integer"),
        )
        out = df.join(F.broadcast(nsalt_df), on=group_cols, how="left")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.coalesce(F.col("_nsalt"), F.lit(1)))
    bucket = F.pmod(
        F.xxhash64(*[F.col(c) for c in group_cols], salt.cast("long")), F.lit(n_buckets)
    )
    if pid_namespace is not None:
        ns_base = (pid_namespace & ((1 << (63 - bucket_bits)) - 1)) << bucket_bits
        pid = (F.lit(ns_base).cast("long") + bucket).alias("pid")
    else:
        pid = bucket
    return out.withColumn("pid", pid).drop("_nsalt"), n_buckets


def encode_partition_arrays(
    store_root: str,
    pid: int,
    table: pa.Table,
    columns: list[str],
    *,
    outer: str | None = "auto",
    codec_overrides: dict[str, str] | None = None,
    codec_plan: dict[str, str] | None = None,
    plan_lineage: dict[str, str] | None = None,
    page_values: int | None = None,
) -> tuple[list[dict], dict[str, bytes]]:
    """Encode ONE partition's table into (manifest rows, blobs) — the
    per-pid kernel shared by the mapInArrow encode task and the DataSource
    writer (sources/datasource.py ParzigWriter). Pure function of the data
    (plus the codec plan), so retried tasks produce byte-identical blobs."""
    local_store = ManifestStore(store_root)
    rows, blobs = [], {}
    for column in columns:
        # zero-copy bucket slice: every scalar/list codec path (and
        # column_digest/column_minmax/nbytes) is slice-aware, so the
        # per-bucket compaction copy is skipped — one less full data
        # pass per task. Map/struct compact: their offsets/field
        # accessors don't normalize slices across pyarrow versions.
        col = table.column(column)
        arr = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
        if arr.offset and (
            pa.types.is_map(arr.type) or pa.types.is_struct(arr.type)
        ):
            arr = pa.concat_arrays([arr])
        t0 = time.perf_counter()
        override = (codec_overrides or {}).get(column)
        planned = (codec_plan or {}).get(column)
        if override is not None:
            codec = override
            lineage_json = json.dumps({"plan": "override"}, separators=(",", ":"))
        elif planned is not None:
            codec, lineage_json = planned, plan_lineage[column]
        else:
            codec, lineage = choose_codec(arr, outer=outer)
            lineage_json = json.dumps(lineage, separators=(",", ":"))
        blob, meta = encode_column(arr, codec, outer=outer, page_values=page_values)
        dt = time.perf_counter() - t0
        digest = column_digest(arr)
        smin, smax = column_minmax(arr)
        sbloom, sbloom_dom = column_bloom(arr)
        ssum, snulls = column_agg_stats(arr)
        sdistinct = column_distinct(arr)
        blobs[column] = blob
        rows.append(
            {
                "stat_min": smin,
                "stat_max": smax,
                "stat_bloom": sbloom,
                "stat_bloom_dom": sbloom_dom,
                "stat_sum": ssum,
                "stat_nulls": snulls,
                "stat_distinct": sdistinct,
                "pid": pid,
                "column": column,
                "codec": codec,
                "n_values": len(arr),
                "raw_bytes": arr.nbytes,
                "enc_bytes": len(blob),
                "meta_json": json.dumps(meta, separators=(",", ":")),
                "lineage_json": lineage_json,
                "sha256": digest,
                "encode_s": dt,
                "blob_file": local_store.blob_path(pid, column),
            }
        )
    return rows, blobs


def encode_table(
    df: DataFrame,
    store_root: str,
    group_cols: list[str],
    salt_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    size_col: str | None = None,
    target_bytes: int = 64 << 20,
    num_partitions: int | None = None,
    resume: bool = True,
    outer: str | None = "auto",
    pid_namespace: int | None = None,
    bucket_bits: int = 24,
    plan_sample_rows: int = 8192,
    codec_overrides: dict[str, str] | None = None,
    page_values: int | None = None,
) -> DataFrame:
    """Encode ``df`` into ``store_root``; returns the per-column summary.

    The returned DataFrame is the job's action — materializing it runs the
    encode. With ``resume=True``, partitions whose commit marker already
    exists are anti-joined away before any data is read (checkpoint/resume
    per the north rule).

    ``plan_sample_rows > 0`` chooses each column's codec ONCE on the driver
    from a small sample (column stats are stable across buckets of one
    table), instead of trial-encoding 2–4 candidates in every bucket — the
    per-bucket selector was 2× trial encodes × candidates × columns ×
    buckets of pure overhead. Codec choice never feeds pid derivation, so
    this cannot affect resume identity; within one job all task attempts
    share the driver's plan, keeping retried blobs byte-identical.

    ``codec_overrides`` pins named columns to explicit codecs (bypassing the
    selector) — the per-encoding conformance lever, mirroring the
    reference's per-encoding golden tests
    (/root/reference/src/parquet_testing.zig:332,834-856).

    ``page_values`` stores scalar columns in the PAGED layout (fixed value
    stride, per-section min/max — the ColumnIndex analog): decode-side
    predicates then skip whole sections *within* a partition, reading only
    the surviving byte ranges of each blob. Part of the store identity
    (page boundaries must be a pure data property for resume).
    """
    spark = df.sparkSession
    salt_cols = salt_cols or [c for c in df.columns if c not in group_cols][:1]
    if sort_cols is None:
        # canonical order key: every non-nested column (Arrow can't sort
        # list/map/struct, and they'd be poor keys anyway)
        sort_cols = [
            c for c, t in df.dtypes if not t.startswith(("array", "map", "struct"))
        ]
    store = ManifestStore(store_root)
    store.ensure_config(
        {
            "format": FORMAT_VERSION,
            "group_cols": group_cols,
            "salt_cols": salt_cols,
            "sort_cols": sort_cols,
            "size_col": size_col,
            "target_bytes": target_bytes,
            "columns": list(df.columns),
            **({"page_values": page_values} if page_values else {}),
        }
    )
    # Overlap the two O(1) planning actions: the codec-plan sample job runs
    # on a helper thread while the driver blocks on the sizing aggregation
    # inside plan_partitions (Spark schedules concurrent jobs from separate
    # threads). Actions on this host cost ~1-3 s each in fixed latency, so
    # hiding one behind the other cuts plan wall nearly in half; at real
    # input sizes both remain constant-cost noise.
    sample_box: dict[str, object] = {}
    sample_thread = None
    if plan_sample_rows > 0:
        def _take_sample():
            try:
                sample_box["table"] = df.limit(plan_sample_rows).toArrow()
            except Exception as exc:  # surface on join, never kill the thread
                sample_box["error"] = exc

        sample_thread = threading.Thread(target=_take_sample, daemon=True)
        sample_thread.start()

    with_pid, n_buckets = plan_partitions(
        df, group_cols, salt_cols, target_bytes, size_col,
        pid_namespace=pid_namespace, bucket_bits=bucket_bits,
    )

    codec_plan: dict[str, str] = {}
    plan_lineage: dict[str, str] = {}
    # Single-bucket tables choose once in-task anyway; the sampled plan only
    # pays for itself when it replaces many per-bucket selector runs.
    if sample_thread is not None:
        sample_thread.join()
    if plan_sample_rows > 0 and n_buckets > 1:
        if "error" in sample_box:
            raise sample_box["error"]
        sample = sample_box["table"]
        if sample.num_rows:
            for column in df.columns:
                if codec_overrides and column in codec_overrides:
                    continue
                try:
                    codec, lineage = choose_codec(sample.column(column), outer=outer)
                except (TypeError, ValueError):
                    continue
                codec_plan[column] = codec
                plan_lineage[column] = json.dumps(
                    {"plan": "table_sample", "sample_rows": sample.num_rows, **lineage},
                    separators=(",", ":"),
                )

    if resume:
        committed = store.committed_pids()
        if committed:
            committed_df = spark.createDataFrame(
                [(int(p),) for p in committed], "pid long"
            )
            with_pid = with_pid.join(F.broadcast(committed_df), on="pid", how="left_anti")

    # One task per bucket: per-task cost is then a data property, identical
    # at every cluster size (scheduler balances tasks over whatever slots
    # exist) — required for honest N→4N scaling comparisons.
    np_part = num_partitions or n_buckets
    data_cols = [c for c in df.columns]
    shuffled = with_pid.repartition(np_part, "pid")
    import os as _os
    jvm_sort = _os.environ.get("SPARK_GRAFT_JVM_SORT", "1") != "0"
    if sort_cols and jvm_sort:
        # Push the canonical (pid, *sort_cols) sort into the JVM: Tungsten
        # sorts binary rows (spill-capable — an oversized partition sorts
        # through disk instead of OOMing the Python worker, which
        # pa.Table.sort_by cannot do), and the Python side then skips its
        # argsort + full-table take. Ordering semantics are identical to
        # the pa.sort_by it replaces: ascending, nulls last, byte-wise
        # UTF8 comparison, NaN greatest — so blobs are byte-identical
        # under either path. Locally the two are a measured wash
        # (jobs/ab_sort.py, interleaved best-of-4: ratio 1.013); the JVM
        # default is chosen for the spill story on real executors.
        # SPARK_GRAFT_JVM_SORT=0 restores the Python-side sort.
        shuffled = shuffled.sortWithinPartitions(
            F.col("pid").asc(), *[F.col(c).asc_nulls_last() for c in sort_cols]
        )

    def encode_partition(batches):
        """Iterator[pa.RecordBatch] -> Iterator[pa.RecordBatch] (mapInArrow).

        Pure-Arrow: no pandas round-trip — string columns never become
        Python objects, which halves memory traffic per byte (the scaling
        bottleneck on bandwidth-limited hosts).

        ONE data copy for grouping + canonical order: the task's batches
        concat once, then a single multi-key sort on (pid, *sort_cols) both
        groups rows by bucket AND orders them canonically — buckets are then
        zero-copy contiguous slices. (The previous per-batch pid-take plus
        per-bucket sort moved every byte three times; on a bandwidth-capped
        host data passes are the encode job's real budget.)
        """
        incoming = [pa.Table.from_batches([b]) for b in batches]
        if not incoming:
            return
        full = pa.concat_tables(incoming)
        del incoming
        if full.num_rows == 0:
            return  # a task can receive only zero-row batches
        if sort_cols and jvm_sort:
            # rows arrive pre-sorted by (pid, *sort_cols) — the JVM sort
            # above — so grouping is pure boundary detection on the pid
            # lane; concat_tables was zero-copy, so no full-table copy
            # happens Python-side at all
            pids_np = full.column("pid").to_numpy(zero_copy_only=False)
        elif sort_cols:
            full = full.sort_by(
                [("pid", "ascending")] + [(c, "ascending") for c in sort_cols]
            )
            pids_np = full.column("pid").to_numpy(zero_copy_only=False)
        else:
            # no canonical columns (all-nested table): group by pid only,
            # stable to preserve arrival order within a bucket
            pids_np = full.column("pid").to_numpy(zero_copy_only=False)
            order = np.argsort(pids_np, kind="stable")
            full = full.take(pa.array(order))
            pids_np = pids_np[order]
        data_t = full.select(data_cols)
        bounds = np.flatnonzero(np.diff(pids_np)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pids_np)]))
        out_rows = []
        local_store = ManifestStore(store_root)
        for s, e in zip(starts, ends):
            pid = int(pids_np[s])
            table = data_t.slice(s, e - s)
            rows, blobs = encode_partition_arrays(
                store_root, pid, table, data_cols, outer=outer,
                codec_overrides=codec_overrides, codec_plan=codec_plan,
                plan_lineage=plan_lineage, page_values=page_values,
            )
            already = local_store.is_committed(pid)
            if not already:
                local_store.write_partition(pid, rows, blobs)
            for r in rows:
                out_rows.append(
                    {
                        "pid": pid,
                        "column": r["column"],
                        "codec": r["codec"],
                        "n_values": r["n_values"],
                        "raw_bytes": r["raw_bytes"],
                        "enc_bytes": r["enc_bytes"],
                        "encode_s": r["encode_s"],
                        "committed": not already,
                    }
                )
        schema = pa.schema(
            [
                ("pid", pa.int64()),
                ("column", pa.string()),
                ("codec", pa.string()),
                ("n_values", pa.int64()),
                ("raw_bytes", pa.int64()),
                ("enc_bytes", pa.int64()),
                ("encode_s", pa.float64()),
                ("committed", pa.bool_()),
            ]
        )
        yield pa.RecordBatch.from_pylist(out_rows, schema=schema)

    return shuffled.mapInArrow(encode_partition, schema=SUMMARY_SCHEMA)
