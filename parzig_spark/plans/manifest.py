"""Manifest checkpoint store — the engine's FileMetaData/ColumnMetaData.

A manifest row plays the role of the reference's ColumnMetaData
(/root/reference/src/generated/parquet.zig:382-419): codec choice, symbol
tables (inside meta_json), value counts, compressed/uncompressed sizes,
sha256 digest, plus per-partition throughput metrics and selector lineage —
everything BASELINE.json's north_rule requires for resumable runs.

Backend: an Iceberg-shaped append-only layout on a filesystem the executors
share — one parquet manifest file + one blob directory per partition, made
visible by an atomically-created ``_committed_{pid}`` marker (write-ahead
blobs, rename, then marker: a partition is committed iff its marker exists,
so a killed run leaves only invisible garbage, never a halfapplied commit;
the same role Iceberg snapshot manifests play). The driver docstring notes
the production swap: with an Iceberg runtime jar on the classpath this
interface maps 1:1 onto an Iceberg metadata table (no jar in this sandbox —
SURVEY.md §7).

Resume = anti-join the input's partition ids against committed markers.
Idempotence: partition ids are content-derived hashes, not task ids, and
rows are canonically sorted before encoding, so Spark retries rewrite
byte-identical blobs.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_SCHEMA = pa.schema(
    [
        ("pid", pa.int64()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("n_values", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("meta_json", pa.string()),  # codec meta incl. dict/FSST symbol table
        ("lineage_json", pa.string()),  # selector stats + trial sizes
        ("sha256", pa.string()),  # digest of the decoded column's canonical bytes
        ("encode_s", pa.float64()),
        ("blob_file", pa.string()),
        # Per-column min/max (canonical strings; numerics parse as double,
        # temporals are ISO-ordered) — decode-side partition pruning, the
        # role of Parquet Statistics the reference parses but never uses
        # (/root/reference/src/generated/parquet.zig:55-76).
        ("stat_min", pa.string()),
        ("stat_max", pa.string()),
        # Partition-level equality bloom (base64 bitmap + key domain) — the
        # BloomFilterHeader analog at partition granularity
        # (/root/reference/src/generated/parquet.zig:312-325): prunes whole
        # partitions on point predicates where min/max can't (columns
        # uncorrelated with the sort order). Null for unbloomable types.
        ("stat_bloom", pa.string()),
        ("stat_bloom_dom", pa.string()),
        # Exact per-partition aggregates (v6) — metadata-only COUNT/SUM/
        # MIN/MAX answers without opening a blob (the Parquet footer /
        # Iceberg partition-stats aggregate-pushdown analog). stat_sum is
        # a decimal string (exact, order-independent) for integer-lane
        # columns, null otherwise; stat_nulls is the column's null count.
        ("stat_sum", pa.string()),
        ("stat_nulls", pa.int64()),
        # Capped EXACT distinct-value set (v7) — JSON array of canonical
        # strings when the partition holds ≤64 distinct non-null values of
        # an integer/string column ("[]" for all-null partitions), null
        # otherwise. Exact membership both directions: equality/IN pruning
        # with no bloom false positives, IN-list full-coverage proofs, and
        # metadata-only COUNT(DISTINCT) by set union (codecs/stats.py
        # column_distinct; operators/aggregate.py).
        ("stat_distinct", pa.string()),
    ]
)


# Bump whenever blob layouts or the manifest schema change incompatibly
# (v2: sectioned RLE/delta headers, stat_min/stat_max manifest columns,
# leveled zstd outer; v3: streaming pid layout 47-bit namespace × 16-bit
# bucket + namespace claim markers, truncated string min/max stats; v4:
# optional PAGED column layout — fixed value-stride sections with per-page
# min/max stats for sub-partition skipping; v5: partition-level equality
# blooms in the stat_bloom/stat_bloom_dom manifest columns; v6: exact
# per-partition stat_sum/stat_nulls aggregate stats for metadata-only
# COUNT/SUM/MIN/MAX — operators/aggregate.py; v7: capped exact
# distinct-value sets in stat_distinct for exact equality/IN pruning and
# metadata-only COUNT(DISTINCT)).
# ensure_config embeds it in the store identity, so a resume against an
# older store fails loudly instead of mixing formats; check_format gives
# decoders the same loud failure.
FORMAT_VERSION = 7


class ManifestStore:
    def __init__(self, root: str):
        self.root = root
        self.manifest_dir = os.path.join(root, "manifests")
        self.blob_dir = os.path.join(root, "blobs")
        self.marker_dir = os.path.join(root, "markers")
        for d in (self.manifest_dir, self.blob_dir, self.marker_dir):
            os.makedirs(d, exist_ok=True)

    # -- store config (partitioning identity) --------------------------------
    def ensure_config(self, config: dict) -> None:
        """First writer pins the store's partitioning identity; later runs
        must match or fail loudly. pid derivation is a pure data function of
        (group_cols, salt_cols, target_bytes, columns) — resuming with
        different parameters would interleave incompatible partitionings in
        one store and decode duplicated rows."""
        path = os.path.join(self.root, "store_config.json")
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
            if existing != config:
                raise ValueError(
                    f"store {self.root} was encoded with {existing}; "
                    f"refusing to resume with {config} (pids would not match)"
                )
            return
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(config, f, sort_keys=True)
        os.replace(tmp, path)

    def check_format(self) -> None:
        """Fail loudly when the store was written by an incompatible engine
        version (or isn't one of our stores at all) instead of mis-parsing
        its blobs/manifests downstream."""
        path = os.path.join(self.root, "store_config.json")
        if not os.path.exists(path):
            raise ValueError(f"{self.root}: no store_config.json — not an encoded store")
        with open(path) as f:
            config = json.load(f)
        found = config.get("format")
        if found != FORMAT_VERSION:
            raise ValueError(
                f"{self.root}: store format {found!r} != engine format "
                f"{FORMAT_VERSION} — re-encode with this engine version"
            )

    # -- commit protocol ----------------------------------------------------
    def _marker_path(self, pid: int) -> str:
        return os.path.join(self.marker_dir, f"_committed_{pid}")

    def is_committed(self, pid: int) -> bool:
        return os.path.exists(self._marker_path(pid))

    def committed_pids(self) -> set[int]:
        return {
            int(f.rsplit("_", 1)[1])
            for f in os.listdir(self.marker_dir)
            if f.startswith("_committed_")
        }

    def write_partition(
        self, pid: int, rows: list[dict], blobs: dict[str, bytes],
        commit: bool = True,
    ) -> None:
        """Atomic per-partition commit: blobs → manifest → marker.

        ``commit=False`` stages the data WITHOUT the marker (invisible to
        every reader) — the executor half of a two-phase write like the
        DataSource writer, whose driver-side commit() later seals exactly
        the partitions its tasks reported via :meth:`commit_partition`.
        Uncommitted leftovers from failed attempts are gc_store orphans."""
        if self.is_committed(pid):
            return  # retry of an already-committed partition: no-op
        tmp_tag = uuid.uuid4().hex[:8]
        part_blob_dir = os.path.join(self.blob_dir, str(pid))
        os.makedirs(part_blob_dir, exist_ok=True)
        for column, blob in blobs.items():
            final = os.path.join(part_blob_dir, f"{column}.bin")
            tmp = final + f".tmp-{tmp_tag}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
        table = pa.Table.from_pylist(rows, schema=MANIFEST_SCHEMA)
        final = os.path.join(self.manifest_dir, f"part-{pid}.parquet")
        tmp = final + f".tmp-{tmp_tag}"
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        if commit:
            self.commit_partition(pid)

    def commit_partition(self, pid: int) -> None:
        """Seal a staged partition: O_CREAT|O_EXCL marker creation is the
        commit point (idempotent — a second sealer is a no-op)."""
        try:
            fd = os.open(self._marker_path(pid), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            pass

    # -- snapshots (manifest-list) -------------------------------------------
    def write_snapshot(self) -> str:
        """Compact the committed manifest set into one snapshot parquet —
        the Iceberg manifest-list analog. At 10^12-file scale a reader must
        not listdir millions of markers; it reads the latest snapshot in
        O(1). Written by the (single) job driver after the encode action, so
        plain last-writer-wins versioned files suffice (Iceberg swaps a
        catalog pointer for the same reason)."""
        table = self._read_manifest_files()
        snap_dir = os.path.join(self.root, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        # max+1, NOT len(): gc_store deletes superseded snapshot files, and a
        # len()-derived version would then sort BELOW the surviving latest —
        # an invisible snapshot that readers never pick up.
        existing = [
            int(f[len("snap-"):-len(".parquet")])
            for f in os.listdir(snap_dir)
            if f.startswith("snap-") and f.endswith(".parquet")
        ]
        version = max(existing) + 1 if existing else 0
        final = os.path.join(snap_dir, f"snap-{version:06d}.parquet")
        tag = uuid.uuid4().hex[:8]
        # sidecar first, manifest parquet second: the snapshot "exists" only
        # once its parquet lands, so it never appears without its op list
        ops = self.committed_delete_ops()
        side = os.path.join(snap_dir, f"snap-{version:06d}.deletes.json")
        tmp = side + f".tmp-{tag}"
        with open(tmp, "w") as f:
            json.dump(ops, f)
        os.replace(tmp, side)
        tmp = final + f".tmp-{tag}"
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        return final

    def snapshot_delete_ops(self, version: int) -> list[str]:
        """Delete ops committed when this snapshot was written — a pinned
        (time-travel) read applies exactly these. Pre-sidecar snapshots
        (older stores) fall back to the empty list: their rows were written
        before row-level deletes existed."""
        side = os.path.join(
            self.root, "snapshots", f"snap-{version:06d}.deletes.json"
        )
        if not os.path.exists(side):
            return []
        with open(side) as f:
            return json.load(f)

    def latest_snapshot(self) -> str | None:
        snap_dir = os.path.join(self.root, "snapshots")
        if not os.path.isdir(snap_dir):
            return None
        snaps = sorted(f for f in os.listdir(snap_dir) if f.endswith(".parquet"))
        return os.path.join(snap_dir, snaps[-1]) if snaps else None

    def snapshot_path(self, version: int) -> str:
        """Path of a specific snapshot version — the time-travel handle.
        Versions are the monotonically increasing suffix write_snapshot
        assigns (the Iceberg snapshot-id analog). Raises if absent."""
        path = os.path.join(self.root, "snapshots", f"snap-{version:06d}.parquet")
        if not os.path.exists(path):
            raise ValueError(f"{self.root}: no snapshot version {version}")
        return path

    def snapshot_pids(self, version: int) -> set[int]:
        """Partition ids visible at a snapshot version (O(1) driver read of
        that snapshot's pid column)."""
        t = pq.read_table(self.snapshot_path(version), columns=["pid"])
        return {int(p) for p in t.column("pid").to_pylist()}

    # -- row-level deletes (merge-on-read) -----------------------------------
    # Layout: deletes/{op_id}/{pid}.bin (RLE width-1 bitmap over the
    # partition's physical rows, 1 = deleted) + deletes/_committed_{op_id}.
    # An op is visible iff its marker exists — the same write-ahead shape as
    # partition commits, lifted to store level so a multi-partition delete
    # is atomic: a crash mid-op leaves invisible garbage, never a
    # half-applied delete. Snapshots record the committed op set at write
    # time, so time travel replays exactly the deletes that existed then.
    def deletes_dir(self, op_id: str | None = None) -> str:
        d = os.path.join(self.root, "deletes")
        return os.path.join(d, op_id) if op_id else d

    def committed_delete_ops(self) -> list[str]:
        d = self.deletes_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            f[len("_committed_"):]
            for f in os.listdir(d)
            if f.startswith("_committed_")
        )

    def delete_touched_pids(self, ops: "list[str] | None" = None) -> set[int]:
        """Partitions carrying at least one committed delete bitmap — one
        listdir per op (each returns only the pids that op touched), never
        a scan over all partitions. Metadata answers over these pids are
        stale by construction; aggregate_store routes them to the decode
        path. ``ops`` overrides the op set (pass a snapshot sidecar's list
        to get the pids dirty AT THAT VIEW — check_store's pinned-audit
        path)."""
        out: set[int] = set()
        for op in self.committed_delete_ops() if ops is None else ops:
            d = self.deletes_dir(op)
            if not os.path.isdir(d):
                continue
            for f in os.listdir(d):
                if f.endswith(".bin"):
                    out.add(int(f[:-4]))
        return out

    def commit_delete_op(self, op_id: str, bitmaps: dict[int, bytes]) -> bool:
        """Write one delete op's per-partition bitmaps, then its marker
        (the atomic commit point). Returns False when the op was already
        committed (idempotent replay — op ids are content-derived)."""
        marker = os.path.join(self.deletes_dir(), f"_committed_{op_id}")
        if os.path.exists(marker):
            return False
        op_dir = self.deletes_dir(op_id)
        os.makedirs(op_dir, exist_ok=True)
        tag = uuid.uuid4().hex[:8]
        for pid, blob in bitmaps.items():
            final = os.path.join(op_dir, f"{pid}.bin")
            tmp = final + f".tmp-{tag}"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, final)
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return True
        except FileExistsError:
            return False

    def delete_bitmap_paths(self, pid: int, op_ids: list[str] | None = None) -> list[str]:
        """Bitmap files affecting ``pid`` across the given (default: all
        committed) delete ops — decode ORs them together."""
        if op_ids is None:
            op_ids = self.committed_delete_ops()
        out = []
        for op in op_ids:
            p = os.path.join(self.deletes_dir(op), f"{pid}.bin")
            if os.path.exists(p):
                out.append(p)
        return out

    # -- readers ------------------------------------------------------------
    def blob_path(self, pid: int, column: str) -> str:
        return os.path.join(self.blob_dir, str(pid), f"{column}.bin")

    def read_blob(self, pid: int, column: str) -> bytes:
        with open(self.blob_path(pid, column), "rb") as f:
            return f.read()

    def read_blob_ranges(
        self, pid: int, column: str, ranges: list[tuple[int, int]]
    ) -> list[bytes]:
        """Selected (offset, length) byte ranges of one blob — the paged
        layout's OffsetIndex read path: bytes touched = sum of the ranges,
        never the file size."""
        out = []
        with open(self.blob_path(pid, column), "rb") as f:
            for off, ln in ranges:
                f.seek(off)
                out.append(f.read(ln))
        return out

    def _read_manifest_files(self) -> pa.Table:
        tables = []
        for pid in sorted(self.committed_pids()):
            path = os.path.join(self.manifest_dir, f"part-{pid}.parquet")
            tables.append(pq.read_table(path))
        if not tables:
            return MANIFEST_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    def read_one_manifest(self) -> pa.Table | None:
        """Any single committed partition's manifest (schema discovery) —
        O(1) driver I/O: first marker found, one parquet file read."""
        try:
            with os.scandir(self.marker_dir) as it:
                for entry in it:
                    if entry.name.startswith("_committed_"):
                        pid = int(entry.name.rsplit("_", 1)[1])
                        return pq.read_table(
                            os.path.join(self.manifest_dir, f"part-{pid}.parquet")
                        )
        except FileNotFoundError:
            pass
        return None

    def fresh_snapshot(self) -> str:
        """Path of a snapshot covering every committed partition; compacts
        one if the latest is stale or absent. Production flow: the encode
        job driver calls write_snapshot() once post-commit, so readers hit
        the O(1) fast path."""
        snap = self.latest_snapshot()
        if snap is not None:
            # Exact-set check, not superset: a strict-superset snapshot means
            # partitions were RETIRED since it was written (rollback_store
            # crashed between marker removal and its sealing snapshot) —
            # serving it would resurrect rolled-back rows. Recompacting from
            # the markers self-heals either direction of staleness.
            if set(pq.read_table(snap, columns=["pid"]).column("pid").to_pylist()) == self.committed_pids():
                return snap
        return self.write_snapshot()

    def read_manifests(self) -> pa.Table:
        """All committed manifest rows (uncommitted partitions invisible).

        Reads the latest snapshot when one covers every committed partition;
        falls back to per-partition manifests otherwise (snapshot stale or
        absent)."""
        snap = self.latest_snapshot()
        if snap is not None:
            table = pq.read_table(snap)
            # exact-set check — see fresh_snapshot for the rollback rationale
            if set(table.column("pid").to_pylist()) == self.committed_pids():
                return table
        return self._read_manifest_files()

    def manifest_glob(self) -> list[str]:
        return [
            os.path.join(self.manifest_dir, f"part-{pid}.parquet")
            for pid in sorted(self.committed_pids())
        ]

    def column_meta(self, pid: int, column: str) -> dict:
        t = pq.read_table(
            os.path.join(self.manifest_dir, f"part-{pid}.parquet"),
            filters=[("column", "=", column)],
        )
        return json.loads(t.column("meta_json")[0].as_py())


def claim_namespace(store_root: str, namespace: int, digest_hex: str) -> None:
    """Loud cross-batch aliasing guard: even a (47-bit) namespace collision
    can never silently drop rows — the namespace is claimed with the FULL
    256-bit batch fingerprint via an O_EXCL marker; a different batch landing
    on a claimed namespace fails here instead of being anti-joined away,
    while an identical replayed batch (crash recovery) matches and proceeds
    to its normal resume skip."""
    d = os.path.join(store_root, "namespaces")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"ns_{namespace}")
    # Write-then-hardlink: the marker appears atomically WITH its digest.
    # (An O_EXCL create followed by a write can crash in between, leaving an
    # empty marker that would permanently reject replays of the same batch.)
    existing = None
    for _ in range(4):
        tmp = os.path.join(d, f".tmp-{namespace}-{os.getpid()}-{digest_hex[:8]}")
        with open(tmp, "w") as f:
            f.write(digest_hex)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic claim: fails iff the marker exists
            return
        except FileExistsError:
            pass
        finally:
            os.unlink(tmp)
        try:
            with open(path) as f:
                existing = f.read()
        except FileNotFoundError:
            continue  # a racing adopter unlinked it — retry the atomic claim
        if existing != "":
            break
        # Partial marker from a pre-fix crash window: no batch ever owned it
        # (the digest never landed). Unlink it and RETRY the atomic link —
        # an unconditional rewrite here would let two concurrent batches
        # both adopt the namespace; with unlink+link exactly one wins and
        # the loser falls through to the digest comparison below.
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
    else:
        raise RuntimeError(
            f"claim_namespace: could not claim namespace {namespace} in "
            f"{store_root} after repeated empty-marker races"
        )
    if existing != digest_hex:
        raise RuntimeError(
            f"pid namespace collision in {store_root}: namespace {namespace} "
            f"was claimed by a different batch (fingerprint {existing[:16]}… "
            f"!= {digest_hex[:16]}…) — refusing to encode; rows would be "
            "silently dropped by the resume anti-join"
        )
