"""Incremental change reader: the CDC *read* side of the snapshot table.

``read_changes(spark, table, from_snapshot, to_snapshot)`` returns the
row-level delta between two retained snapshots as a change feed
(_change_type ∈ insert | update | delete) — what a downstream consumer
would subscribe to for incremental materialization (the Iceberg
"incremental read" / changelog-scan concept).

Scale design: the manifest diff prunes to buckets whose FILE LISTS
changed between the snapshots (unchanged buckets are carried forward by
reference, so their file lists are identical strings); only those
buckets are scanned on both sides, then a full-outer join on the key
compares per-row lsn. Tombstones participate so deletes surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .table import TOMBSTONE_COL, SnapshotTable


def changed_buckets(table: SnapshotTable, from_snapshot: int, to_snapshot: int) -> list[int]:
    out = set()
    for key in ("files", "delta_files"):  # merge-on-read deltas count too
        old = table.snapshot(from_snapshot).get(key, {})
        new = table.snapshot(to_snapshot).get(key, {})
        for b in set(old) | set(new):
            if old.get(b) != new.get(b):
                out.add(int(b))
    return sorted(out)


def read_changes(
    spark: SparkSession, table: SnapshotTable, from_snapshot: int, to_snapshot: int
) -> DataFrame:
    """Row-level delta feed between two snapshots (manifest-pruned)."""
    buckets = changed_buckets(table, from_snapshot, to_snapshot)
    key_cols = table.key_cols
    order_col = table.order_col
    schema = table.schema()
    cols = [f.name for f in schema.fields]
    if not buckets:
        empty = table.read(
            spark, snapshot_id=to_snapshot, schema_id=table.meta["current_schema_id"]
        ).limit(0)
        return empty.withColumn("_change_type", F.lit("insert")).limit(0)

    # Both sides read under the CURRENT registry schema id (not each
    # snapshot's own pinned schema): across a rename/drop evolution the two
    # snapshots would otherwise surface different column names and the diff
    # below would misalign — the field-id projection maps each side's files
    # onto today's names, so the change feed is always in the current schema
    # (round-5; pinned by test_read_changes_across_rename).
    cur_sid = table.meta["current_schema_id"]
    live = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False))
    old = (
        table.read(
            spark,
            snapshot_id=from_snapshot,
            buckets=buckets,
            schema_id=cur_sid,
            include_tombstones=True,
        )
        .filter(live)
        .select(*[F.col(c).alias(f"_old_{c}") for c in cols])
    )
    new = table.read(
        spark,
        snapshot_id=to_snapshot,
        buckets=buckets,
        schema_id=cur_sid,
        include_tombstones=True,
    )

    cond = None
    for k in key_cols:
        e = F.col(k).eqNullSafe(F.col(f"_old_{k}"))
        cond = e if cond is None else cond & e
    j = new.join(old, cond, "full_outer")

    new_live = ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)) & F.col(key_cols[0]).isNotNull()
    old_live = F.col(f"_old_{key_cols[0]}").isNotNull()
    change = (
        F.when(new_live & ~old_live, "insert")
        .when(~new_live & old_live, "delete")
        .when(new_live & old_live & (F.col(order_col) != F.col(f"_old_{order_col}")), "update")
    )
    out_cols = [
        F.coalesce(F.col(c), F.col(f"_old_{c}")).alias(c) if c in key_cols else F.col(c)
        for c in cols
        if c != TOMBSTONE_COL
    ]
    return j.withColumn("_change_type", change).filter(F.col("_change_type").isNotNull()).select(
        *out_cols, "_change_type"
    )
