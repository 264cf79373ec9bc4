"""Schema evolution: add derived columns to a store without re-encoding it.

The backfill shape a training-data pipeline hits constantly: a new feature
(token counts, quality score, language id) must land next to a 100-TB
content column. Re-encoding the whole store moves every byte; this operator
moves only the NEW column's bytes. The reference has no write path at all —
the store layout both sides maintain is its ColumnMetaData analog
(/root/reference/src/generated/parquet.zig:382-419); column-set evolution
itself is the Iceberg ``ADD COLUMN`` + backfill analog.

How alignment works (and is *proven*, not assumed): partition ids and
in-partition order are pure functions of the data (the store invariant), so
running the SAME original columns through the SAME plan reproduces each
partition's exact row order. Each task then re-digests one original column
from its batch and compares it to the source manifest's recorded sha256 —
any drift between the caller's DataFrame and the stored data (edited rows,
different row set, wrong source) fails the task loudly before anything is
written. Existing blobs hardlink into the destination (byte-moves ∝ new
columns only); manifests merge; the commit protocol is unchanged.

Limitations: batch-encoded stores only (a streaming store's pid namespaces
are per-batch fingerprints this operator cannot re-derive — its missing
source manifests fail loudly); the caller's DataFrame must carry every
original column plus the new ones.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import encode_column
from ..plans.manifest import ManifestStore
from ..selector import choose_codec
from .encode import (
    SUMMARY_SCHEMA,
    column_agg_stats,
    column_bloom,
    column_digest,
    column_distinct,
    column_minmax,
    plan_partitions,
)


def _carry_deletes(src: ManifestStore, dst: ManifestStore) -> None:
    """Hardlink committed delete-op bitmaps (and markers) across — pids are
    identical in an evolved store, so row-level deletes stay in force."""
    for op in src.committed_delete_ops():
        op_src, op_dst = src.deletes_dir(op), dst.deletes_dir(op)
        os.makedirs(op_dst, exist_ok=True)
        for f in os.listdir(op_src):
            if ".tmp-" in f:
                continue
            s_p, d_p = os.path.join(op_src, f), os.path.join(op_dst, f)
            if not os.path.exists(d_p):
                try:
                    os.link(s_p, d_p)
                except OSError:
                    shutil.copy2(s_p, d_p)
        marker = os.path.join(dst.deletes_dir(), f"_committed_{op}")
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            pass


def drop_columns(src_root: str, dst_root: str, cols: list[str]) -> dict:
    """Produce ``dst_root`` = ``src_root`` minus ``cols`` — the DROP COLUMN
    analog. Purely metadata + hardlinks (no Spark job, no data pass): kept
    blobs hardlink across, manifests rewrite without the dropped rows, and
    the store config's column list shrinks. Returns
    {"partitions", "dropped_blobs"}. Dropping every column, or an unknown
    column, fails loudly."""
    src = ManifestStore(src_root)
    src.check_format()
    with open(os.path.join(src_root, "store_config.json")) as f:
        src_config = json.load(f)
    orig_cols: list[str] = src_config["columns"]
    unknown = [c for c in cols if c not in orig_cols]
    if unknown:
        raise ValueError(f"drop_columns: not in store: {unknown}")
    kept = [c for c in orig_cols if c not in cols]
    if not kept:
        raise ValueError("drop_columns: cannot drop every column")
    dst = ManifestStore(dst_root)
    dst.ensure_config({**src_config, "columns": kept})
    _carry_deletes(src, dst)
    n_parts = n_dropped = 0
    for pid in sorted(src.committed_pids()):
        if dst.is_committed(pid):
            continue
        src_dir = os.path.join(src.blob_dir, str(pid))
        dst_dir = os.path.join(dst.blob_dir, str(pid))
        os.makedirs(dst_dir, exist_ok=True)
        for name in kept:
            s_p = os.path.join(src_dir, f"{name}.bin")
            d_p = os.path.join(dst_dir, f"{name}.bin")
            if os.path.exists(s_p) and not os.path.exists(d_p):
                try:
                    os.link(s_p, d_p)
                except OSError:
                    shutil.copy2(s_p, d_p)
        n_dropped += len(cols)
        t = pq.read_table(os.path.join(src.manifest_dir, f"part-{pid}.parquet"))
        keep_mask = pa.compute.is_in(t.column("column"), value_set=pa.array(kept))
        t = t.filter(keep_mask)
        fixed = pa.array([dst.blob_path(pid, c) for c in t.column("column").to_pylist()])
        t = t.set_column(t.column_names.index("blob_file"), "blob_file", fixed)
        pq.write_table(t, os.path.join(dst.manifest_dir, f"part-{pid}.parquet"))
        try:
            fd = os.open(dst._marker_path(pid), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            pass
        n_parts += 1
    return {"partitions": n_parts, "dropped_blobs": n_dropped}


def add_columns(
    df: DataFrame,
    src_root: str,
    dst_root: str,
    new_cols: list[str],
    resume: bool = True,
    outer: str | None = "auto",
) -> DataFrame:
    """Produce ``dst_root`` = ``src_root`` + encoded ``new_cols``.

    ``df`` must hold every column the source store was encoded from PLUS
    ``new_cols`` (the backfill recompute shape). Returns the per-column
    summary for the new columns; materializing it runs the job. Existing
    blobs/manifests transfer via hardlink (copy fallback), so bytes moved
    scale with the new columns, not the store.
    """
    src = ManifestStore(src_root)
    src.check_format()
    with open(os.path.join(src_root, "store_config.json")) as f:
        src_config = json.load(f)
    orig_cols: list[str] = src_config["columns"]
    missing = [c for c in orig_cols + new_cols if c not in df.columns]
    if missing:
        raise ValueError(f"add_columns: df lacks required columns {missing}")
    overlap = [c for c in new_cols if c in orig_cols]
    if overlap:
        raise ValueError(f"add_columns: columns already in store: {overlap}")
    sort_cols: list[str] = src_config.get("sort_cols") or []
    page_values = src_config.get("page_values")
    # one original column per task re-digests as the alignment proof; the
    # first sort column is the cheapest that uniquely witnesses row order
    check_col = sort_cols[0] if sort_cols else orig_cols[0]

    dst = ManifestStore(dst_root)
    dst.ensure_config({**src_config, "columns": orig_cols + new_cols})
    # deletes carry over (pids identical); note the alignment digest below
    # checks PHYSICAL rows — the caller passes the original full data, not
    # a post-delete decode (a decoded-then-widened frame fails loudly)
    _carry_deletes(src, dst)

    with_pid, _ = plan_partitions(
        df,
        src_config["group_cols"],
        src_config["salt_cols"],
        src_config["target_bytes"],
        src_config.get("size_col"),
    )
    if resume:
        committed = dst.committed_pids()
        if committed:
            committed_df = df.sparkSession.createDataFrame(
                [(int(p),) for p in sorted(committed)], "pid long"
            )
            with_pid = with_pid.join(
                F.broadcast(committed_df), on="pid", how="left_anti"
            )

    shuffled = with_pid.repartition("pid").sortWithinPartitions(
        F.col("pid").asc(), *[F.col(c).asc_nulls_last() for c in sort_cols]
    )
    needed = [c for c in dict.fromkeys([check_col, *new_cols])]

    def backfill(batches):
        import numpy as np

        src_local = ManifestStore(src_root)
        dst_local = ManifestStore(dst_root)
        incoming = [pa.Table.from_batches([b]) for b in batches]
        if not incoming:
            return
        full = pa.concat_tables(incoming)
        del incoming
        if full.num_rows == 0:
            return
        pids_np = full.column("pid").to_numpy(zero_copy_only=False)
        data_t = full.select(needed)
        bounds = np.flatnonzero(np.diff(pids_np)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pids_np)]))
        out_rows = []
        for s, e in zip(starts, ends):
            pid = int(pids_np[s])
            table = data_t.slice(s, e - s)
            src_manifest_path = os.path.join(
                src_local.manifest_dir, f"part-{pid}.parquet"
            )
            if not os.path.exists(src_manifest_path):
                raise ValueError(
                    f"add_columns: pid {pid} has no source manifest in "
                    f"{src_root} — the DataFrame's rows do not reproduce the "
                    "stored partitioning (edited data, or a streaming-"
                    "namespaced store)"
                )
            src_rows = pq.read_table(src_manifest_path).to_pylist()
            # alignment proof: this batch's check column must digest to the
            # byte-identical value the source store recorded for this pid
            check_arr = table.column(check_col)
            check_arr = (
                check_arr.chunk(0)
                if check_arr.num_chunks == 1
                else check_arr.combine_chunks()
            )
            recorded = next(
                (r["sha256"] for r in src_rows if r["column"] == check_col), None
            )
            if column_digest(check_arr) != recorded:
                raise ValueError(
                    f"add_columns: pid {pid} column {check_col!r} does not "
                    "match the stored digest — the DataFrame's rows drifted "
                    "from the stored data; refusing to write misaligned "
                    "columns"
                )
            if dst_local.is_committed(pid):
                continue  # speculative retry of a committed partition
            # hardlink the existing blobs across
            src_dir = os.path.join(src_local.blob_dir, str(pid))
            dst_dir = os.path.join(dst_local.blob_dir, str(pid))
            os.makedirs(dst_dir, exist_ok=True)
            for fname in os.listdir(src_dir):
                s_p, d_p = os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
                if not os.path.exists(d_p):
                    try:
                        os.link(s_p, d_p)
                    except OSError:
                        shutil.copy2(s_p, d_p)
            new_rows, blobs = [], {}
            for name in new_cols:
                col = table.column(name)
                arr = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
                t0 = time.perf_counter()
                codec, lineage = choose_codec(arr, outer=outer)
                blob, meta = encode_column(
                    arr, codec, outer=outer, page_values=page_values
                )
                dt = time.perf_counter() - t0
                smin, smax = column_minmax(arr)
                sbloom, sbloom_dom = column_bloom(arr)
                ssum, snulls = column_agg_stats(arr)
                sdistinct = column_distinct(arr)
                blobs[name] = blob
                new_rows.append(
                    {
                        "stat_min": smin,
                        "stat_max": smax,
                        "stat_bloom": sbloom,
                        "stat_bloom_dom": sbloom_dom,
                        "stat_sum": ssum,
                        "stat_nulls": snulls,
                        "stat_distinct": sdistinct,
                        "pid": pid,
                        "column": name,
                        "codec": codec,
                        "n_values": len(arr),
                        "raw_bytes": arr.nbytes,
                        "enc_bytes": len(blob),
                        "meta_json": json.dumps(meta, separators=(",", ":")),
                        "lineage_json": json.dumps(
                            {"plan": "add_columns", **lineage}, separators=(",", ":")
                        ),
                        "sha256": column_digest(arr),
                        "encode_s": dt,
                        "blob_file": dst_local.blob_path(pid, name),
                    }
                )
            # merged manifest (source rows re-pointed + new rows), blobs,
            # then marker — the standard atomic commit, via write_partition
            for r in src_rows:
                r["blob_file"] = dst_local.blob_path(pid, r["column"])
            merged = src_rows + new_rows
            # write_partition writes blobs we pass it; existing ones are
            # already hardlinked, so pass only the new blobs
            dst_local.write_partition(pid, merged, blobs)
            for r in new_rows:
                out_rows.append(
                    {
                        "pid": pid,
                        "column": r["column"],
                        "codec": r["codec"],
                        "n_values": r["n_values"],
                        "raw_bytes": r["raw_bytes"],
                        "enc_bytes": r["enc_bytes"],
                        "encode_s": r["encode_s"],
                        "committed": True,
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

    return shuffled.mapInArrow(backfill, schema=SUMMARY_SCHEMA)
