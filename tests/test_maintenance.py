"""Tombstone purge + GC: purged state must stay oracle-identical for the
VISIBLE rows while reclaiming tombstones and old files."""

from __future__ import annotations

from etlframwork_spark.events import (
    CDC_BASE_SCHEMA,
    EventLogSpec,
    TARGET_BASE_SCHEMA,
    _make_events_frame,
    apply_oracle,
    oracle_digests,
)
from etlframwork_spark.maintenance import full_maintenance, purge_tombstones
from etlframwork_spark.merge import merge_batch
from etlframwork_spark.table import TOMBSTONE_COL, SnapshotTable


def test_purge_tombstones_preserves_visible_state(spark, tmp_path):
    spec = EventLogSpec(seed=8, n_events=2000, n_repos=15, paths_per_repo=8, p_delete=0.25)
    pdf = _make_events_frame(spec).drop(columns=["lang"])
    table = SnapshotTable.create(
        str(tmp_path / "t"), TARGET_BASE_SCHEMA, key_cols=["repo", "path"], order_col="lsn", num_buckets=4
    )
    merge_batch(spark, table, spark.createDataFrame(pdf, schema=CDC_BASE_SCHEMA), epoch_id=0)
    want = oracle_digests(apply_oracle(pdf.assign(lang=None)))

    full = table.read(spark, include_tombstones=True)
    n_tomb = full.filter(TOMBSTONE_COL).count()
    assert n_tomb > 0

    # watermark covers the whole replay -> every tombstone is purgeable
    res = purge_tombstones(spark, table, watermark_lsn=spec.n_events + 1)
    assert res["tombstones_purged"] == n_tomb
    got = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in table.read(spark).collect()
    }
    assert got == want
    assert table.read(spark, include_tombstones=True).filter(TOMBSTONE_COL).count() == 0

    # partial watermark purges nothing below it twice (idempotent-ish)
    res2 = purge_tombstones(spark, table, watermark_lsn=spec.n_events + 1)
    assert res2["tombstones_purged"] == 0


def test_full_maintenance_reclaims_files(spark, tmp_path):
    spec = EventLogSpec(seed=14, n_events=1500, n_repos=10, paths_per_repo=6, p_delete=0.2)
    pdf = _make_events_frame(spec).drop(columns=["lang"])
    table = SnapshotTable.create(
        str(tmp_path / "t"), TARGET_BASE_SCHEMA, key_cols=["repo", "path"], order_col="lsn", num_buckets=4
    )
    for e, lo in enumerate(range(0, len(pdf), 500)):
        merge_batch(
            spark, table, spark.createDataFrame(pdf.iloc[lo : lo + 500], schema=CDC_BASE_SCHEMA), epoch_id=e
        )
    want = oracle_digests(apply_oracle(pdf.assign(lang=None)))
    out = full_maintenance(spark, table, watermark_lsn=spec.n_events + 1, keep_snapshots=1)
    assert out["files_vacuumed"] > 0
    got = {(r["repo"], r["path"]): r["content_sha256"] for r in table.read(spark).collect()}
    assert got == want
