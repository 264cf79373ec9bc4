"""Row-level changelog between two snapshots — the Iceberg CDC /
``create_changelog_view`` analog.

``changes_table(spark, root, from_snapshot, to_snapshot)`` returns every
row whose VISIBILITY differs between the two views, tagged
``_change_type`` = ``insert`` (visible at ``to`` only) or ``delete``
(visible at ``from`` only). All change sources compose through one
mechanism, because ``(_pid, _pos)`` is a stable physical row address
(decode.py include_pid_pos):

- appended partitions → inserts;
- merge-on-read delete ops committed in the window → deletes;
- rollbacks that retire partitions or ops → deletes / re-appearing
  inserts (the diff is symmetric — swapping the versions swaps the tags);
- compaction rewrites surface as delete+insert pairs of identical rows
  (physical addresses change; Iceberg changelogs have the same property —
  diff across a pure rewrite boundary only if that noise is acceptable).

Scale: the decode is restricted to AFFECTED partitions only — the
symmetric difference of the two snapshots' pid sets plus the partitions
touched by delete ops present in exactly one sidecar. Partitions outside
that set have identical visibility in both views and are never opened, so
a day's CDC over a 100-TB store costs O(changed data), not O(table). The
anti-joins run on (_pid, _pos) longs — shuffle bounded by the affected
rows.

The reference decodes one immutable file version
(/root/reference/src/parquet/File.zig:58-91); the changelog is what its
users would build the moment versions exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.manifest import ManifestStore
from .decode import decode_table


def changes_table(
    spark: SparkSession,
    store_root: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Rows whose visibility changed between two snapshot versions, with
    ``_change_type`` ∈ {insert, delete} appended after the (optionally
    projected) data columns. ``to_snapshot`` defaults to the latest
    snapshot (compacting a fresh one if stale)."""
    store = ManifestStore(store_root)
    store.check_format()
    if to_snapshot is None:
        import os

        snap = store.fresh_snapshot()
        to_snapshot = int(os.path.basename(snap)[len("snap-"):-len(".parquet")])

    pids_from = store.snapshot_pids(from_snapshot)
    pids_to = store.snapshot_pids(to_snapshot)
    ops_from = set(store.snapshot_delete_ops(from_snapshot))
    ops_to = set(store.snapshot_delete_ops(to_snapshot))

    affected = (pids_from ^ pids_to) | store.delete_touched_pids(
        sorted(ops_from ^ ops_to)
    )
    affected_list = sorted(affected)

    def view(version):
        return decode_table(
            spark, store_root, columns=columns, snapshot=version,
            pids=affected_list, include_pid_pos=True,
        )

    a, b = view(from_snapshot), view(to_snapshot)
    data_cols = [c for c in a.columns if c not in ("_pid", "_pos")]

    def tagged(df, other, tag):
        return (
            df.join(other.select("_pid", "_pos"), ["_pid", "_pos"], "left_anti")
            .select(*data_cols, F.lit(tag).alias("_change_type"))
        )

    return tagged(b, a, "insert").unionByName(tagged(a, b, "delete"))
