"""UPSERT (MERGE): replace-by-key over immutable blobs — delete bitmaps
for the matched old rows + an append of the new rows, under one
content-derived op.

The Iceberg ``MERGE INTO ... WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
THEN INSERT`` analog (replace-all-matches semantics), composed entirely
from machinery the store already trusts:

- **match** — one key-column decode with ``include_pid_pos`` joined
  against the update keys (a plain shuffle join, data scale, no driver
  materialization) yields the ``(pid, pos)`` set of stored rows to retire;
- **retire** — tasks write per-partition delete bitmaps into an UNMARKED
  op dir (invisible), exactly like delete_rows;
- **insert** — the updates encode into the same store under a pid
  namespace derived from the op id (the streaming-batch aliasing guard:
  new pids can never collide with committed ones, and a replay lands on
  the same pids and resume-skips);
- **commit** — the op marker (store-level, atomic) makes the deletes
  visible; a snapshot written afterwards gives downstream readers the
  merged view as one version.

Crash/replay: the op id is a pure function of (key columns, update-key
content digest, committed pid set). Replaying an INCOMPLETE op (crash
before the marker, no insert partitions committed yet) derives the same
id and resumes it in place — bitmaps rewritten byte-identical, inserts
resume-skipped, marker re-committed. A replay after the committed set
changed (including by this op's own partial or full inserts) derives a
FRESH op that re-matches the live keys — retiring whatever version is
current and inserting again — so any number of replays converge to the
same final table; superseded op dirs and fully-retired partitions are
gc/compaction fodder. Visibility caveat (documented; Iceberg needs a
metadata swap for the same): a HEAD reader between insert-commit and
op-marker sees both versions of a matched key; snapshot readers never do —
pin with ``decode_table(snapshot=...)`` for full isolation.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import encode_u64
from ..plans.manifest import ManifestStore
from ..plans.manifest import claim_namespace
from .decode import decode_table
from .delete import DELETE_SUMMARY_SCHEMA, load_delete_mask
from .encode import encode_table


def upsert_op_id(spark_updates_digest: str, key_cols: list[str], committed_pids) -> str:
    """Content-derived op id: same update keys over the same committed set
    → same id (idempotent replay); different updates or later appends → a
    fresh op."""
    payload = json.dumps(
        {
            "keys": list(key_cols),
            "updates": spark_updates_digest,
            "pids": sorted(int(p) for p in committed_pids),
        },
        separators=(",", ":"),
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:24]


def upsert_rows(
    spark: SparkSession,
    store_root: str,
    updates: DataFrame,
    key_cols: list[str],
) -> dict:
    """Merge ``updates`` into the store: stored rows whose ``key_cols``
    tuple appears in ``updates`` are retired (all matches — callers wanting
    SQL MERGE's one-match rule enforce key uniqueness upstream), and every
    update row is appended. Returns {"op_id", "committed",
    "partitions_touched", "rows_replaced", "rows_inserted"}.

    ``updates`` must carry every store column (they become full stored
    rows); duplicate keys WITHIN ``updates`` are inserted as-is —
    deduplicate upstream if last-writer-wins is wanted."""
    store = ManifestStore(store_root)
    store.check_format()
    with open(os.path.join(store_root, "store_config.json")) as f:
        cfg = json.load(f)
    store_cols = cfg.get("columns") or []
    missing = [c for c in store_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing store columns: {missing}")
    bad_keys = [c for c in key_cols if c not in store_cols]
    if bad_keys:
        raise ValueError(f"key_cols not in store schema: {bad_keys}")
    updates = updates.select(store_cols)

    # one deterministic, order-independent digest pass over the update keys
    # (sum of per-row xxhash64 in a 38-digit accumulator never overflows
    # and never depends on partitioning)
    dig_row = updates.select(
        F.sum(F.xxhash64(*key_cols).cast("decimal(38,0)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n_updates = int(dig_row["n"] or 0)
    digest = f"{dig_row['s']}/{n_updates}"
    committed = store.committed_pids()
    op_id = upsert_op_id(digest, key_cols, committed)
    marker = os.path.join(store.deletes_dir(), f"_committed_{op_id}")
    if os.path.exists(marker):
        return {
            "op_id": op_id, "committed": False,
            "partitions_touched": 0, "rows_replaced": 0,
            "rows_inserted": 0,
        }
    if n_updates == 0:
        return {
            "op_id": op_id, "committed": False,
            "partitions_touched": 0, "rows_replaced": 0, "rows_inserted": 0,
        }
    existing_ops = store.committed_delete_ops()

    # ---- match: (pid, pos) of stored rows whose key is being replaced ----
    stored_keys = decode_table(
        spark, store_root, columns=list(key_cols), include_pid_pos=True
    )
    upd_keys = updates.select(key_cols).distinct()
    matches = stored_keys.join(upd_keys, on=list(key_cols), how="left_semi").select(
        F.col("_pid").alias("pid"), F.col("_pos").alias("pos")
    )
    # physical row counts ride along for bitmap sizing (metadata join)
    snap = spark.read.parquet(store.fresh_snapshot())
    ref_col = store_cols[0]
    pid_n = snap.filter(F.col("column") == ref_col).select("pid", "n_values")
    matched = matches.join(pid_n, on="pid", how="inner")

    def write_bitmaps(batches):
        local = ManifestStore(store_root)
        op_dir = local.deletes_dir(op_id)
        os.makedirs(op_dir, exist_ok=True)
        by_pid: dict[int, tuple[int, list]] = {}
        for batch in batches:
            pids = batch.column("pid").to_numpy(zero_copy_only=False)
            poss = batch.column("pos").to_numpy(zero_copy_only=False)
            ns = batch.column("n_values").to_numpy(zero_copy_only=False)
            for p, q, n in zip(pids, poss, ns):
                by_pid.setdefault(int(p), (int(n), []))[1].append(int(q))
        out = []
        for pid, (n_phys, positions) in by_pid.items():
            mask = np.zeros(n_phys, dtype=bool)
            mask[np.asarray(positions, dtype=np.int64)] = True
            prior = load_delete_mask(local, pid, n_phys, existing_ops)
            n_new = int(mask.sum() if prior is None else (mask & ~prior).sum())
            blob, _ = encode_u64(mask.astype(np.uint64), width=1)
            final = os.path.join(op_dir, f"{pid}.bin")
            tmp = final + f".tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
            out.append(
                {"pid": pid, "n_rows": n_phys, "n_match": int(mask.sum()),
                 "n_new": n_new}
            )
        schema = pa.schema(
            [("pid", pa.int64()), ("n_rows", pa.int64()),
             ("n_match", pa.int64()), ("n_new", pa.int64())]
        )
        yield pa.RecordBatch.from_pylist(out, schema=schema)

    summary = (
        matched.repartition(spark.sparkContext.defaultParallelism * 2, "pid")
        .mapInArrow(write_bitmaps, schema=DELETE_SUMMARY_SCHEMA)
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("parts"),
            F.sum("n_new").alias("new"),
        )
        .first()
    )

    # ---- insert: append under an op-derived pid namespace ------------------
    namespace = int.from_bytes(
        hashlib.sha256(("upsert:" + op_id).encode()).digest()[:6], "big"
    ) & ((1 << 47) - 1)
    claim_namespace(store_root, namespace, "upsert-" + op_id)
    encode_table(
        updates,
        store_root,
        group_cols=cfg["group_cols"],
        salt_cols=cfg["salt_cols"],
        sort_cols=cfg.get("sort_cols"),
        size_col=cfg.get("size_col"),
        target_bytes=cfg["target_bytes"],
        resume=True,
        pid_namespace=namespace,
        bucket_bits=16,
        page_values=cfg.get("page_values"),
    ).count()

    # ---- commit: the op marker retires the old rows atomically -------------
    committed_now = store.commit_delete_op(op_id, {})
    store.write_snapshot()
    return {
        "op_id": op_id,
        "committed": committed_now,
        "partitions_touched": int(summary["parts"] or 0),
        "rows_replaced": int(summary["new"] or 0),
        "rows_inserted": n_updates,
    }
