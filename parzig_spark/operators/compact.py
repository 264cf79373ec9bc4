"""Store maintenance: partition compaction and orphan-blob GC.

The 100-TB operational gap the encode/decode pair leaves open: a store fed
by many small encode jobs (streaming micro-batches, incremental backfills)
accumulates thousands of under-sized partitions, and every decode then pays
per-partition fixed costs (task schedule, manifest row, blob open, outer
decompress) out of proportion to the bytes moved. Compaction is the
Iceberg ``rewrite_data_files`` analog over our manifest store; GC is
``remove_orphan_files``. The reference has no write path at all, so there
is nothing to cite beyond the store layout both operators maintain (the
ColumnMetaData analog, /root/reference/src/generated/parquet.zig:382-419).

Scale shape: NO shuffle anywhere. The plan is pure driver arithmetic over
the manifest summary (bytes per pid — KBs even at 10^12 files via the
snapshot), and the rewrite is an embarrassingly parallel map: one task per
merge group reads only its own source blobs, re-encodes, and commits one
destination partition. Wall-clock scales with bytes rewritten / executors,
exactly like the encode job itself.

Determinism/resume: a merge group's destination pid is a pure function of
its sorted source pids (content-derived themselves), rows are re-sorted by
the store's canonical sort_cols before encoding, and the destination commit
is the same first-marker-wins protocol — so retries rewrite byte-identical
blobs and a resumed compaction skips committed groups before reading any
blob.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession

from ..codecs import decode_column, encode_column
from ..plans.manifest import FORMAT_VERSION, ManifestStore
from .encode import SUMMARY_SCHEMA, column_agg_stats, column_bloom, column_digest, column_distinct, column_minmax


def _dst_pid(src_pids: list[int]) -> int:
    """Destination pid for a merge group: pure function of the (sorted)
    source pids, which are themselves content-derived — so compaction
    preserves the store invariant that pids never depend on task ids,
    parallelism, or wall clock (CLAUDE.md)."""
    h = hashlib.sha256(json.dumps(sorted(int(p) for p in src_pids)).encode()).digest()
    return int.from_bytes(h[:8], "big") & ((1 << 62) - 1)


def _zorder_indices(table: pa.Table, zorder_cols: list[str]) -> pa.Array:
    """Row order interleaving the bits of the given columns' RANKS — the
    Iceberg ``rewrite_data_files(strategy => 'zorder')`` analog: after the
    rewrite, pages are Morton-curve tiles of the k-dimensional value
    space, so per-page [min, max] stats stay tight on EVERY z-ordered
    column and a selective predicate on any one of them skips most pages
    (a linear sort only ever serves its leading column).

    Ranks (dense, via np.unique inverse) rather than raw values: the curve
    is then skew- and scale-invariant — a column with values {1, 2, 10^9}
    tiles as evenly as {1, 2, 3}. Nulls rank lowest. Each column gets
    64 // k bits of the interleaved key; ranks wider than that are
    right-shifted first (coarser tiles, still a valid curve). Pure numpy,
    O(n log n) per rewrite group, no driver involvement."""
    import numpy as np

    k = len(zorder_cols)
    bits = 64 // k
    rank_arrs = []
    for name in zorder_cols:
        col = table.column(name)
        arr = col.chunk(0) if col.num_chunks == 1 else col.combine_chunks()
        mask = np.asarray(arr.is_null().to_numpy(zero_copy_only=False), dtype=bool)
        vals = arr.to_numpy(zero_copy_only=False)
        ranks = np.zeros(len(vals), dtype=np.uint64)
        if (~mask).any():
            valid = vals[~mask]
            _, inv = np.unique(valid, return_inverse=True)
            # nulls occupy rank 0; real values start at 1
            ranks[~mask] = inv.astype(np.uint64) + 1
            width = int(ranks.max()).bit_length()
            if width > bits:
                ranks >>= width - bits
        rank_arrs.append(ranks)
    key = np.zeros(len(table), dtype=np.uint64)
    for b in range(bits):
        for j, ranks in enumerate(rank_arrs):
            key |= ((ranks >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + j)
    return pa.array(np.argsort(key, kind="stable"))


def plan_compaction(
    store: ManifestStore, target_bytes: int = 64 << 20
) -> list[list[int]]:
    """Greedy bin-pack of committed partitions into merge groups.

    Driver cost is O(partitions) over the manifest snapshot's (pid,
    raw_bytes) summary — KBs per million partitions, no blob I/O. Packing
    key is RAW bytes (decoded size bounds the rewrite task's memory, and it
    is the same unit encode_table targets). Partitions already at ≥ half
    the target stay untouched (rewriting them buys nothing), matching the
    ``min-input-files``-style guard of Iceberg's rewrite action. Groups are
    built over ascending pids, so the plan is deterministic for a given
    committed set."""
    m = store.read_manifests()
    if m.num_rows == 0:
        return []
    per_pid: dict[int, int] = {}
    for pid, nbytes in zip(
        m.column("pid").to_pylist(), m.column("raw_bytes").to_pylist()
    ):
        per_pid[int(pid)] = per_pid.get(int(pid), 0) + int(nbytes or 0)
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for pid in sorted(per_pid):
        b = per_pid[pid]
        if b >= target_bytes // 2:
            continue  # already big enough — leave in place
        if cur and cur_bytes + b > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(pid)
        cur_bytes += b
    if cur:
        groups.append(cur)
    # a group of one small partition still rewrites into the destination
    # store (compaction's contract: dst holds EVERY source row), but two
    # stores sharing no partitions is the common outcome worth noting in
    # the summary rather than skipping here.
    return groups


def compact_store(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    target_bytes: int = 64 << 20,
    resume: bool = True,
    outer: str | None = "auto",
    sort_cols: list[str] | None = None,
    page_values: int | None = None,
    zorder_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite ``src_root``'s under-sized partitions into ``dst_root``.

    Returns the per-column summary DataFrame (same schema as encode_table);
    materializing it runs the job. Partitions already ≥ target/2 raw bytes
    are copied through blob-for-blob (no re-encode — their bytes are
    already the right shape), so ``dst_root`` always holds the complete
    row set of ``src_root`` and can be decoded/verified standalone.

    ``sort_cols`` overrides the canonical in-partition order for REWRITTEN
    partitions and ``page_values`` stores them in the PAGED layout — the
    Iceberg ``rewrite_data_files(strategy => 'sort')`` analog at page
    granularity: ordering cannot change a PARTITION's [min, max] envelope
    (membership does that — re-cluster across partitions by re-encoding
    with different group_cols), but inside a partition it concentrates
    each value range into few pages, so per-page stats/bloom skipping on
    the sorted column reads far fewer sections. Default keeps the source
    store's order and unpaged layout.

    ``zorder_cols`` instead orders rewritten rows along a Morton curve
    over the given columns' ranks (``strategy => 'zorder'``): pages become
    k-dimensional tiles, so per-page pruning works on EVERY listed column
    — the right rewrite when queries filter on more than one axis (a
    linear sort serves only its leading column). Mutually exclusive with
    ``sort_cols``; pair with ``page_values``.
    """
    if zorder_cols is not None:
        if sort_cols:
            raise ValueError("zorder_cols and sort_cols are mutually exclusive")
        if len(zorder_cols) < 2:
            raise ValueError("zorder_cols needs >= 2 columns (use sort_cols for 1)")
    src = ManifestStore(src_root)
    src.check_format()
    with open(os.path.join(src_root, "store_config.json")) as f:
        src_config = json.load(f)
    if sort_cols is None and zorder_cols is None:
        sort_cols = src_config.get("sort_cols") or []
    sort_cols = sort_cols or []
    groups = plan_compaction(src, target_bytes)
    grouped_pids = {p for g in groups for p in g}
    # merge-on-read → copy-on-write handoff: any partition carrying a
    # committed delete bitmap must REWRITE (the rewrite filters deleted
    # rows out), never pass through blob-for-blob — the destination store
    # materializes post-delete rows and carries no delete files at all
    delete_ops = src.committed_delete_ops()
    purge_pids = {
        pid
        for pid in src.committed_pids()
        if src.delete_bitmap_paths(pid, delete_ops)
    }
    for pid in sorted(purge_pids - grouped_pids):
        groups.append([pid])
        grouped_pids.add(pid)
    passthrough = sorted(src.committed_pids() - grouped_pids)

    dst = ManifestStore(dst_root)
    dst.ensure_config(
        {
            "format": FORMAT_VERSION,
            "compacted_from": {
                k: src_config.get(k)
                for k in ("group_cols", "salt_cols", "sort_cols", "columns")
            },
            "target_bytes": target_bytes,
            "columns": src_config.get("columns"),
            "sort_cols": sort_cols,
            **({"zorder_cols": zorder_cols} if zorder_cols else {}),
            **({"page_values": page_values} if page_values else {}),
        }
    )

    # Passthrough partitions: blob-for-blob hardlink/copy + manifest reuse.
    # Driver-side file ops bounded by partition count (not bytes — hardlink
    # when the stores share a filesystem).
    for pid in passthrough:
        if dst.is_committed(pid):
            continue
        src_dir = os.path.join(src.blob_dir, str(pid))
        dst_dir = os.path.join(dst.blob_dir, str(pid))
        os.makedirs(dst_dir, exist_ok=True)
        for fname in os.listdir(src_dir):
            s, d = os.path.join(src_dir, fname), os.path.join(dst_dir, fname)
            if not os.path.exists(d):
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
        # manifest rides along with blob_file re-pointed at the destination
        # store (it is informational lineage, but a path into another store
        # would be a lie)
        t = pq.read_table(os.path.join(src.manifest_dir, f"part-{pid}.parquet"))
        cols = t.column_names
        fixed = pa.array(
            [dst.blob_path(pid, c) for c in t.column("column").to_pylist()]
        )
        t = t.set_column(cols.index("blob_file"), "blob_file", fixed)
        pq.write_table(t, os.path.join(dst.manifest_dir, f"part-{pid}.parquet"))
        try:
            fd = os.open(dst._marker_path(pid), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            pass

    work = groups
    if resume:
        work = [g for g in groups if not dst.is_committed(_dst_pid(g))]

    if not work:
        return spark.createDataFrame([], SUMMARY_SCHEMA)

    return _rewrite_groups_job(
        spark, src_root, dst_root, work, src_config, delete_ops,
        sort_cols, zorder_cols, outer, page_values, commit=True,
    )


def _rewrite_groups_job(
    spark, src_root, dst_root, work, src_config, delete_ops,
    sort_cols, zorder_cols, outer, page_values, commit,
):
    """One task per merge group (the group spec is the only thing shuffled
    to executors — bytes move only within each task): decode the group's
    source partitions, purge deleted rows, canonical re-sort/z-order,
    re-encode into the destination pid. ``commit=False`` stages the
    destination partitions WITHOUT markers — the in-place rewrite's
    invisible first phase (rewrite_store flips markers on the driver)."""
    spec_df = spark.createDataFrame(
        [(json.dumps(g),) for g in work], "group_json string"
    ).repartition(len(work))

    def rewrite(batches):
        src_local = ManifestStore(src_root)
        dst_local = ManifestStore(dst_root)
        for batch in batches:
            for spec in batch.column("group_json").to_pylist():
                pids = json.loads(spec)
                new_pid = _dst_pid(pids)
                already = dst_local.is_committed(new_pid)
                out_rows = []
                if not already:
                    # per-column: decode each source partition, concat in
                    # ascending-pid order, canonical re-sort, re-encode with
                    # the codec the source manifests already chose (the
                    # table-level sampled plan made it uniform across pids)
                    metas: dict[str, list[tuple[int, dict, str]]] = {}
                    for pid in pids:
                        t = pq.read_table(
                            os.path.join(
                                src_local.manifest_dir, f"part-{pid}.parquet"
                            )
                        )
                        for row in t.to_pylist():
                            metas.setdefault(row["column"], []).append(
                                (pid, json.loads(row["meta_json"]), row["codec"])
                            )
                    columns = src_config.get("columns") or sorted(metas)
                    # per-pid delete masks (purge): deleted rows never reach
                    # the destination store
                    keeps: dict[int, pa.Array] = {}
                    if delete_ops:
                        from .delete import load_delete_mask

                        for pid, m, _ in sorted(metas[columns[0]]):
                            deleted = load_delete_mask(
                                src_local, pid, m["n"], delete_ops
                            )
                            if deleted is not None and deleted.any():
                                keeps[pid] = pa.array(~deleted)
                    decoded: dict[str, pa.Array] = {}
                    for name in columns:
                        parts = []
                        for pid, m, _ in sorted(metas[name]):
                            a = decode_column(src_local.read_blob(pid, name), m)
                            if pid in keeps:
                                a = a.filter(keeps[pid])
                            parts.append(a)
                        decoded[name] = pa.chunked_array(parts).combine_chunks()
                    table = pa.table(decoded)
                    if zorder_cols and all(c in decoded for c in zorder_cols):
                        table = table.take(_zorder_indices(table, zorder_cols))
                    else:
                        usable_sort = [c for c in sort_cols if c in decoded]
                        if usable_sort:
                            table = table.sort_by(
                                [(c, "ascending") for c in usable_sort]
                            )
                    rows, blobs = [], {}
                    for name in columns:
                        arr = table.column(name)
                        arr = (
                            arr.chunk(0) if arr.num_chunks == 1 else arr.combine_chunks()
                        )
                        codec = sorted(metas[name])[0][2]
                        t0 = time.perf_counter()
                        blob, meta = encode_column(
                            arr, codec, outer=outer, page_values=page_values
                        )
                        dt = time.perf_counter() - t0
                        smin, smax = column_minmax(arr)
                        sbloom, sbloom_dom = column_bloom(arr)
                        ssum, snulls = column_agg_stats(arr)
                        sdistinct = column_distinct(arr)
                        blobs[name] = blob
                        rows.append(
                            {
                                "stat_min": smin,
                                "stat_max": smax,
                                "stat_bloom": sbloom,
                                "stat_bloom_dom": sbloom_dom,
                                "stat_sum": ssum,
                                "stat_nulls": snulls,
                                "stat_distinct": sdistinct,
                                "pid": new_pid,
                                "column": name,
                                "codec": codec,
                                "n_values": len(arr),
                                "raw_bytes": arr.nbytes,
                                "enc_bytes": len(blob),
                                "meta_json": json.dumps(meta, separators=(",", ":")),
                                "lineage_json": json.dumps(
                                    {"plan": "compaction", "src_pids": sorted(pids)},
                                    separators=(",", ":"),
                                ),
                                "sha256": column_digest(arr),
                                "encode_s": dt,
                                "blob_file": dst_local.blob_path(new_pid, name),
                            }
                        )
                    dst_local.write_partition(new_pid, rows, blobs, commit=commit)
                    out_rows = [
                        {
                            "pid": new_pid,
                            "column": r["column"],
                            "codec": r["codec"],
                            "n_values": r["n_values"],
                            "raw_bytes": r["raw_bytes"],
                            "enc_bytes": r["enc_bytes"],
                            "encode_s": r["encode_s"],
                            "committed": True,
                        }
                        for r in rows
                    ]
                else:
                    out_rows = [
                        {
                            "pid": new_pid,
                            "column": "",
                            "codec": "",
                            "n_values": 0,
                            "raw_bytes": 0,
                            "enc_bytes": 0,
                            "encode_s": 0.0,
                            "committed": False,
                        }
                    ]
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

    return spec_df.mapInArrow(rewrite, schema=SUMMARY_SCHEMA)


def _rewrites_dir(root: str) -> str:
    return os.path.join(root, "rewrites")


def rewrite_records(root: str) -> list[dict]:
    """All durable rewrite intent records, oldest first — each
    ``{"groups": [{"dst": pid, "src": [pids]}], "purged_ops": [...]}``.
    Metadata-scale lineage: changes_table and the stream reader consult
    these to keep pure rewrites CDC-silent."""
    d = _rewrites_dir(root)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".json") or ".tmp-" in f:
            continue
        with open(os.path.join(d, f)) as fh:
            out.append(json.load(fh))
    return out


def repair_rewrites(root: str) -> int:
    """Finish any crashed in-place rewrite flip: for every intent group
    whose destination marker landed but whose source markers survive, the
    crash hit the per-group marker surgery window — remove the sources
    (the destination provably holds their rows: its staging completed
    before any flip began). Groups whose destination never committed were
    never flipped and stay pending (re-running rewrite_store redoes them
    from byte-identical staging). Returns the number of groups repaired."""
    store = ManifestStore(root)
    fixed = 0
    for rec in rewrite_records(root):
        for g in rec["groups"]:
            if not store.is_committed(int(g["dst"])):
                continue
            for s in g["src"]:
                if store.is_committed(int(s)):
                    try:
                        os.unlink(store._marker_path(int(s)))
                        fixed += 1
                    except FileNotFoundError:
                        pass
    return fixed


def rewrite_store(
    spark: SparkSession,
    root: str,
    target_bytes: int = 64 << 20,
    outer: str | None = "auto",
    sort_cols: list[str] | None = None,
    page_values: int | None = None,
    zorder_cols: list[str] | None = None,
) -> dict:
    """IN-PLACE compaction — the Iceberg ``rewrite_data_files`` COMMIT
    semantics over one store (compact_store's cross-root rewrite keeps the
    source untouched; this one advances the store itself):

    1. **Stage (distributed, invisible)**: each merge group re-encodes into
       its content-derived destination pid inside THIS store, WITHOUT a
       commit marker — readers keep the pre-rewrite view throughout.
       Merge-on-read delete bitmaps purge during the rewrite, exactly like
       compact_store.
    2. **Intent (driver, durable)**: the full src→dst mapping plus the
       delete ops it purged lands in ``{root}/rewrites/`` (tmp+rename)
       BEFORE any marker moves — the changelog/stream CDC-silence proof
       and the crash-repair log.
    3. **Flip (driver, marker surgery)**: per group, commit the
       destination, then retire the sources; a crash inside one group's
       window is healed by :func:`repair_rewrites` (run automatically at
       the start of every rewrite). Same single-driver maintenance
       discipline as rollback_store.
    4. **Seal**: ``write_snapshot`` records the post-rewrite view; the
       purged delete ops stay committed but now target only retired pids
       (no-ops) until gc.

    Returns ``{"groups", "rewritten_pids", "dst_pids", "snapshot"}``.
    A later ``changes_table`` / readStream window spanning this rewrite
    reports ZERO rows for it (pure rewrites are CDC-silent, like Iceberg).
    """
    store = ManifestStore(root)
    store.check_format()
    repair_rewrites(root)
    with open(os.path.join(root, "store_config.json")) as f:
        config = json.load(f)
    if sort_cols is None and zorder_cols is None:
        sort_cols = config.get("sort_cols") or []
    sort_cols = sort_cols or []
    groups = plan_compaction(store, target_bytes)
    grouped = {p for g in groups for p in g}
    delete_ops = store.committed_delete_ops()
    purge_pids = {
        pid for pid in store.committed_pids()
        if store.delete_bitmap_paths(pid, delete_ops)
    }
    for pid in sorted(purge_pids - grouped):
        groups.append([pid])
    if not groups:
        snap = store.write_snapshot()
        return {"groups": 0, "rewritten_pids": [], "dst_pids": [],
                "snapshot": snap}

    # phase 1: stage invisibly (skip groups a finished flip already owns)
    work = [g for g in groups if not store.is_committed(_dst_pid(g))]
    if work:
        _rewrite_groups_job(
            spark, root, root, work, config, delete_ops,
            sort_cols, zorder_cols, outer, page_values, commit=False,
        ).count()

    # phase 2: durable intent before any marker moves
    mapping = [
        {"dst": _dst_pid(g), "src": sorted(int(p) for p in g)} for g in groups
    ]
    rec = {"groups": mapping, "purged_ops": sorted(delete_ops)}
    digest = hashlib.sha256(
        json.dumps(rec, sort_keys=True).encode()
    ).hexdigest()[:16]
    d = _rewrites_dir(root)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"rw-{digest}.json")
    tmp = final + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(rec, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)

    # phase 3: flip each group (dst marker, then retire sources)
    for g in mapping:
        store.commit_partition(int(g["dst"]))
        for s in g["src"]:
            try:
                os.unlink(store._marker_path(int(s)))
            except FileNotFoundError:
                pass
    snap = store.write_snapshot()
    return {
        "groups": len(mapping),
        "rewritten_pids": sorted(p for g in mapping for p in g["src"]),
        "dst_pids": sorted(g["dst"] for g in mapping),
        "snapshot": snap,
    }


def gc_store(root: str, min_age_s: float = 0.0, keep_snapshots: int = 0) -> dict:
    """Remove artifacts no committed partition references — the
    ``remove_orphan_files`` analog. Orphans exist by design: a task killed
    between blob write and marker creation leaves an invisible (never
    decoded) but space-consuming partition dir; speculative duplicates
    leave ``.tmp-*`` files; snapshot compaction leaves superseded
    snapshots.

    ``min_age_s`` guards in-flight work in production (an encode job's
    partitions are uncommitted until their marker lands): only artifacts
    older than this are touched. Tests pass 0.

    ``keep_snapshots`` is a retention horizon: keep that many of the
    newest SUPERSEDED snapshots (ref-pinned ones survive regardless) so
    time-travel readers and readStream checkpoints that lag the head —
    a stream's next micro-batch diffs against its last COMMITTED version
    (sources/datasource.py ParzigStreamReader.partitions) — still find
    their snapshot. Streams that pass ``streamId`` pin themselves with a
    branch ref instead; this horizon is the defense for ones that don't
    (Iceberg ``expire_snapshots(retain_last=N)`` analog).

    Driver-side listdir of blob/manifest dirs — O(partitions); at real
    scale this runs as a periodic maintenance job exactly like Iceberg's.
    Returns counts: {"orphan_dirs", "orphan_manifests", "tmp_files",
    "old_snapshots", "bytes_reclaimed"}.
    """
    store = ManifestStore(root)
    committed = store.committed_pids()
    # Refs pin liveness (Iceberg expire_snapshots semantics): a tagged or
    # branched snapshot version keeps its snapshot file AND every artifact
    # it references — partitions (blob dir + manifest) and delete ops —
    # alive until the ref is dropped, even when the head view has retired
    # them (rollback/compaction). Plain time-travel reads of UNPINNED old
    # versions remain best-effort-until-gc, as documented.
    from .refs import pinned_versions

    pinned = pinned_versions(root)
    live_pids = set(committed)
    live_ops = set(store.committed_delete_ops())
    for version in pinned:
        try:
            live_pids |= store.snapshot_pids(version)
            live_ops |= set(store.snapshot_delete_ops(version))
        except ValueError:
            # ref at an already-reclaimed snapshot (pre-refs gc): nothing
            # left to pin — the ref is dangling and harmless
            pass
    now = time.time()
    stats = {
        "orphan_dirs": 0,
        "orphan_manifests": 0,
        "tmp_files": 0,
        "old_snapshots": 0,
        "bytes_reclaimed": 0,
    }

    def old_enough(path: str) -> bool:
        try:
            return now - os.path.getmtime(path) >= min_age_s
        except OSError:
            return False

    def tree_bytes(path: str) -> int:
        total = 0
        for dirpath, _, files in os.walk(path):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total

    # uncommitted blob dirs + stray tmp files inside committed ones
    if os.path.isdir(store.blob_dir):
        for entry in os.listdir(store.blob_dir):
            p = os.path.join(store.blob_dir, entry)
            if entry.isdigit() and int(entry) not in live_pids:
                if old_enough(p):
                    stats["bytes_reclaimed"] += tree_bytes(p)
                    shutil.rmtree(p, ignore_errors=True)
                    stats["orphan_dirs"] += 1
            elif os.path.isdir(p):
                for f in os.listdir(p):
                    if ".tmp-" in f:
                        fp = os.path.join(p, f)
                        if old_enough(fp):
                            stats["bytes_reclaimed"] += os.path.getsize(fp)
                            os.unlink(fp)
                            stats["tmp_files"] += 1

    # manifests without a marker, and manifest tmp litter
    if os.path.isdir(store.manifest_dir):
        for f in os.listdir(store.manifest_dir):
            fp = os.path.join(store.manifest_dir, f)
            if ".tmp-" in f:
                if old_enough(fp):
                    stats["bytes_reclaimed"] += os.path.getsize(fp)
                    os.unlink(fp)
                    stats["tmp_files"] += 1
            elif f.startswith("part-") and f.endswith(".parquet"):
                pid = int(f[len("part-") : -len(".parquet")])
                if pid not in live_pids and old_enough(fp):
                    stats["bytes_reclaimed"] += os.path.getsize(fp)
                    os.unlink(fp)
                    stats["orphan_manifests"] += 1

    # uncommitted delete-op dirs (crashed delete job) + tmp litter inside
    # committed ones — the marker is the visibility boundary, so an
    # unmarked op dir was never observable by any reader
    del_dir = store.deletes_dir()
    if os.path.isdir(del_dir):
        for entry in os.listdir(del_dir):
            p = os.path.join(del_dir, entry)
            if entry.startswith("_committed_"):
                continue
            if os.path.isdir(p) and entry not in live_ops:
                if old_enough(p):
                    stats["bytes_reclaimed"] += tree_bytes(p)
                    shutil.rmtree(p, ignore_errors=True)
                    stats["orphan_dirs"] += 1
            elif os.path.isdir(p):
                for f in os.listdir(p):
                    if ".tmp-" in f:
                        fp = os.path.join(p, f)
                        if old_enough(fp):
                            stats["bytes_reclaimed"] += os.path.getsize(fp)
                            os.unlink(fp)
                            stats["tmp_files"] += 1

    # superseded snapshots (readers only ever open the latest)
    snap_dir = os.path.join(root, "snapshots")
    if os.path.isdir(snap_dir):
        snaps = sorted(
            (f for f in os.listdir(snap_dir) if f.endswith(".parquet")),
            key=lambda f: int(f[len("snap-"):-len(".parquet")]),
        )
        for f in snaps[: -(1 + max(0, int(keep_snapshots)))]:
            if int(f[len("snap-"):-len(".parquet")]) in pinned:
                continue  # ref-pinned snapshot: live until the ref drops
            fp = os.path.join(snap_dir, f)
            if old_enough(fp):
                stats["bytes_reclaimed"] += os.path.getsize(fp)
                os.unlink(fp)
                stats["old_snapshots"] += 1
                # the delete-op sidecar travels with its snapshot
                side = fp[: -len(".parquet")] + ".deletes.json"
                if os.path.exists(side):
                    stats["bytes_reclaimed"] += os.path.getsize(side)
                    os.unlink(side)
        for f in os.listdir(snap_dir):
            if ".tmp-" in f:
                fp = os.path.join(snap_dir, f)
                if old_enough(fp):
                    stats["bytes_reclaimed"] += os.path.getsize(fp)
                    os.unlink(fp)
                    stats["tmp_files"] += 1
    return stats
