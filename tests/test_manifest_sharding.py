"""Round-6 manifest sharding (Iceberg manifest-list shape): the root
metadata document stores per-snapshot {bucket -> shard} pointers; the
per-file lists + per-file stats/schema ids live in immutable
metadata/manifests/m-*.json shards.

Invariants pinned here:
- commit metadata bytes are O(changed buckets): a commit touching one
  bucket writes exactly ONE new shard containing only that bucket;
- the on-disk root carries NO per-file lists and no top-level stats map;
- load() hydrates back to the exact same in-memory state;
- pre-sharding (round-5) metadata still loads, and the first commit
  migrates it;
- vacuum() collects shards referenced by no retained snapshot.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etlframwork_spark.merge import merge_batch
from etlframwork_spark.table import SnapshotTable

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("v", LongType()),
        StructField("lsn", LongType()),
    ]
)
EV = StructType(SCHEMA.fields + [StructField("op", StringType())])


def _mk(tmp_path, nb=8):
    return SnapshotTable.create(
        str(tmp_path / "t"), SCHEMA, key_cols=["k"], order_col="lsn", num_buckets=nb
    )


def _merge(spark, t, rows, epoch, **kw):
    return merge_batch(
        spark, t, spark.createDataFrame(rows, EV), job_id="sh", epoch_id=epoch, **kw
    )


def _disk_root(t):
    with open(os.path.join(t.root, "metadata", f"v{t.version}.json")) as f:
        return json.load(f)


def _shards(t):
    d = os.path.join(t.root, "metadata", "manifests")
    return sorted(os.listdir(d)) if os.path.isdir(d) else []


def test_root_has_pointers_not_file_lists(spark, tmp_path):
    t = _mk(tmp_path)
    _merge(spark, t, [(f"k{i}", i, i, "insert") for i in range(40)], 0)
    disk = _disk_root(t)
    assert "file_stats" not in disk and "file_schemas" not in disk
    for snap in disk["snapshots"]:
        assert "files" not in snap and "delta_files" not in snap
        assert "manifests" in snap
    # hydrated view unchanged
    t2 = SnapshotTable.load(t.root)
    assert t2.snapshot()["files"] == t.snapshot()["files"]
    assert t2.meta["file_stats"] == t.meta["file_stats"]
    assert t2.meta["file_schemas"] == t.meta["file_schemas"]
    assert {tuple(r) for r in t2.read(spark).collect()} == {
        (f"k{i}", i, i) for i in range(40)
    }


def test_commit_writes_one_shard_for_changed_buckets_only(spark, tmp_path):
    t = _mk(tmp_path)
    _merge(spark, t, [(f"k{i}", i, i, "insert") for i in range(40)], 0)
    before = set(_shards(t))
    # single-key epoch: exactly one bucket changes
    out = _merge(spark, t, [("k3", 999, 100, "update")], 1)
    assert out["affected_buckets"] == 1
    new = [s for s in _shards(t) if s not in before]
    assert len(new) == 1, f"expected ONE new shard, got {new}"
    with open(os.path.join(t.root, "metadata", "manifests", new[0])) as f:
        man = json.load(f)
    assert len(man["buckets"]) == 1  # only the changed bucket
    # unchanged buckets still point at the epoch-0 shard(s)
    ptrs = t.snapshot()["manifests"]
    prev_ptrs = t.snapshot(t.snapshot()["parent_id"])["manifests"]
    changed = [b for b, r in ptrs.items() if prev_ptrs.get(b) != r]
    assert len(changed) == 1
    unchanged_reused = [b for b in ptrs if b != changed[0]]
    assert all(ptrs[b] == prev_ptrs[b] for b in unchanged_reused)


def test_root_bytes_do_not_scale_with_total_files(spark, tmp_path):
    """The scale claim itself: per-commit root bytes are O(snapshots x
    buckets), flat in the number of data files accumulated via MOR
    deltas (each epoch adds files; retention keeps snapshot count flat)."""
    t = _mk(tmp_path, nb=4)
    sizes = []
    for e in range(12):
        _merge(
            spark, t,
            [(f"k{i}", e, e * 100 + i, "insert") for i in range(20)],
            e, write_mode="mor",
        )
        t.expire_snapshots(keep_last=3)
        t.refresh()
        sizes.append(os.path.getsize(os.path.join(t.root, "metadata", f"v{t.version}.json")))
    # steady state: the last root is not meaningfully larger than the
    # first steady one even though 12 epochs of delta files accumulated
    assert sizes[-1] < sizes[2] * 1.5, sizes


def test_pre_sharding_metadata_still_loads_and_migrates(spark, tmp_path):
    t = _mk(tmp_path)
    _merge(spark, t, [(f"k{i}", i, i, "insert") for i in range(20)], 0)
    # simulate a round-5 root: hydrated lists inline, no pointer maps
    legacy = json.loads(json.dumps(t.meta))  # deep copy of hydrated meta
    for snap in legacy["snapshots"]:
        snap.pop("manifests", None)
    path = os.path.join(t.root, "metadata", f"v{t.version + 1}.json")
    with open(path, "w") as f:
        json.dump(legacy, f)
    t2 = SnapshotTable.load(t.root)
    assert t2.snapshot()["files"] == t.snapshot()["files"]
    assert {tuple(r) for r in t2.read(spark).collect()} == {
        (f"k{i}", i, i) for i in range(20)
    }
    # first commit after migration dehydrates everything again
    merge_batch(
        spark, t2, spark.createDataFrame([("k1", 7, 500, "update")], EV),
        job_id="mig", epoch_id=0,
    )
    disk = _disk_root(t2)
    for snap in disk["snapshots"]:
        assert "files" not in snap and "manifests" in snap


def test_vacuum_collects_orphan_shards(spark, tmp_path):
    t = _mk(tmp_path, nb=4)
    for e in range(8):
        _merge(spark, t, [(f"k{e}", e, e, "insert")], e)
    n_all = len(_shards(t))
    t.expire_snapshots(keep_last=2)
    # round 7: shards younger than the grace window are NEVER collected,
    # even when unreferenced — the write->CAS window of a concurrent
    # commit must not be collectable (a lost shard bricks the table).
    # Everything in this test was written seconds ago, so a first vacuum
    # is a shard no-op...
    t.vacuum()
    assert len(_shards(t)) == n_all
    # ...and once the shards are older than the grace window (backdated
    # mtimes), the unreferenced ones are collected as before.
    import time as _time

    from etlframwork_spark.table import VACUUM_SHARD_GRACE_SECS

    old = _time.time() - VACUUM_SHARD_GRACE_SECS - 1
    mandir = os.path.join(t.root, "metadata", "manifests")
    for fn in os.listdir(mandir):
        os.utime(os.path.join(mandir, fn), (old, old))
    t.vacuum()
    t.refresh()
    live = {
        os.path.basename(r)
        for s in t.meta["snapshots"]
        for r in s.get("manifests", {}).values()
    }
    on_disk = set(_shards(t))
    assert on_disk == live
    assert len(on_disk) < n_all
    # table still fully readable after GC
    assert t.read(spark).count() == 8


def test_crash_between_shard_write_and_root_cas_is_safe(spark, tmp_path):
    """A kill after the manifest shard is written but BEFORE the root
    os.link publishes leaves only orphan shards: the table still loads at
    the old version with the old state, a later commit succeeds, and
    vacuum() collects the orphans."""
    import pytest as _pytest

    t = _mk(tmp_path, nb=4)
    _merge(spark, t, [(f"k{i}", i, i, "insert") for i in range(12)], 0)
    v_before = t.version
    shards_before = set(_shards(t))

    class Boom(RuntimeError):
        pass

    real_link = os.link

    def exploding_link(src, dst):
        if "/metadata/v" in dst:
            raise Boom("simulated crash at the commit point")
        return real_link(src, dst)

    import etlframwork_spark.table as table_mod

    os_mod = table_mod.os
    os_mod.link = exploding_link
    try:
        with _pytest.raises(Boom):
            _merge(spark, t, [("k0", 999, 100, "update")], 1)
    finally:
        os_mod.link = real_link
    # reload: the failed commit is invisible; state is the old snapshot
    t2 = SnapshotTable.load(t.root)
    assert t2.version == v_before
    assert {r["v"] for r in t2.read(spark).filter("k = 'k0'").collect()} == {0}
    orphans = set(_shards(t2)) - shards_before
    assert orphans, "the crashed commit should have left orphan shard(s)"
    # a fresh commit on the recovered table works and the orphans are GC'd
    merge_batch(
        spark, t2, spark.createDataFrame([("k0", 999, 100, "update")], EV),
        job_id="sh", epoch_id=1,
    )
    t2.expire_snapshots(keep_last=10)
    # age the shards past the round-7 grace window (a crashed commit's
    # orphan is still a "young unreferenced shard" right after the crash
    # — vacuum deliberately spares it until the window passes)
    import time as _time

    from etlframwork_spark.table import VACUUM_SHARD_GRACE_SECS

    _old = _time.time() - VACUUM_SHARD_GRACE_SECS - 1
    _mandir = os.path.join(t2.root, "metadata", "manifests")
    for _fn in os.listdir(_mandir):
        os.utime(os.path.join(_mandir, _fn), (_old, _old))
    t2.vacuum()
    t2.refresh()
    live = {
        os.path.basename(r)
        for s in t2.meta["snapshots"]
        for r in s.get("manifests", {}).values()
    }
    assert set(_shards(t2)) == live
    assert {r["v"] for r in t2.read(spark).filter("k = 'k0'").collect()} == {999}


def test_pointer_inheritance_survives_cas_retry(spark, tmp_path):
    """Two writers to DIFFERENT buckets race the metadata CAS: the loser
    retries against the winner's state and must inherit the winner's
    shard pointers — both commits' buckets resolve from disk afterwards."""
    t = _mk(tmp_path, nb=4)
    _merge(spark, t, [(f"k{i}", i, i, "insert") for i in range(16)], 0)
    # a second handle simulating the concurrent writer
    t2 = SnapshotTable.load(t.root)
    merge_batch(
        spark, t2, spark.createDataFrame([("k1", 101, 100, "update")], EV),
        job_id="w2", epoch_id=0, write_mode="mor",
    )
    # t's in-memory meta is now STALE; its commit loses the CAS once and
    # retries against t2's published state
    merge_batch(
        spark, t, spark.createDataFrame([("k2", 202, 101, "update")], EV),
        job_id="w1", epoch_id=0, write_mode="mor",
    )
    fresh = SnapshotTable.load(t.root)
    got = {r["k"]: r["v"] for r in fresh.read(spark).collect()}
    assert got["k1"] == 101 and got["k2"] == 202  # neither commit lost
    # every present bucket of the head snapshot has a resolvable pointer
    snap = fresh.snapshot()
    present = set(snap["files"]) | set(snap.get("delta_files", {}))
    assert present <= set(snap["manifests"])


def test_shard_cache_avoids_rereads_on_refresh(spark, tmp_path):
    """Shards are immutable, so refresh() must re-read only shards it has
    never seen — a long-running ingest refreshes every epoch and would
    otherwise re-parse every retained shard each time."""
    from unittest import mock

    import etlframwork_spark.table as tm

    t = _mk(tmp_path, nb=4)
    for e in range(4):
        _merge(spark, t, [(f"k{e}", e, e, "insert")], e)

    opened: list[str] = []
    real_open = open

    def counting_open(path, *a, **kw):
        mode = a[0] if a else kw.get("mode", "r")
        if isinstance(path, str) and "/manifests/" in path and "w" not in mode:
            opened.append(path)
        return real_open(path, *a, **kw)

    with mock.patch("builtins.open", side_effect=counting_open):
        t.refresh()
        first = len(opened)
        t.refresh()  # all shards already cached -> no new reads
        assert len(opened) == first
        _merge(spark, t, [("k9", 9, 9, "insert")], 9)
        t.refresh()  # exactly the ONE new shard is read
        assert len(opened) == first + 1
    # cache is correct, not just fast: a cold process sees identical state
    tm._SHARD_CACHE.clear()
    cold = SnapshotTable.load(t.root)
    assert cold.snapshot()["files"] == t.snapshot()["files"]
