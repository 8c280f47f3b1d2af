"""Job/step-config pipeline + spark-submit --py-files launch
(BASELINE.json:6 launch contract)."""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from etlframwork_spark.events import EventLogSpec, generate_event_log
from etlframwork_spark.plans import JobSpec, run_job

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spec(tmp_path) -> dict:
    return {
        "job_id": "jobtest",
        "steps": [
            {
                "type": "cdc_ingest",
                "name": "ingest",
                "events_dir": str(tmp_path / "events"),
                "table_root": str(tmp_path / "table"),
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "metrics_dir": str(tmp_path / "metrics"),
                "num_buckets": 4,
                "max_files_per_trigger": 2,
            },
            {"type": "read_table", "name": "repos", "table_root": str(tmp_path / "table")},
            {
                "type": "transform",
                "name": "by_repo",
                "input": "repos",
                "with_columns": {"content_len": "length(content)"},
                "select": ["repo", "content_len"],
            },
            {
                "type": "sql",
                "name": "rollup",
                "query": "SELECT repo, COUNT(*) AS n, SUM(content_len) AS bytes FROM by_repo GROUP BY repo",
            },
            {"type": "write_parquet", "name": "out", "input": "rollup", "path": str(tmp_path / "out")},
        ],
    }


def test_job_pipeline_end_to_end(spark, tmp_path):
    generate_event_log(
        str(tmp_path / "events"), EventLogSpec(seed=6, n_events=1000, n_repos=10, paths_per_repo=6, n_files=3)
    )
    results = run_job(spark, JobSpec(job_id="jobtest", steps=_spec(tmp_path)["steps"]))
    assert results["ingest"]["snapshot_id"] >= 1
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 10
    assert set(out.columns) == {"repo", "n", "bytes"}


def test_read_table_step_filters_prune_and_match(spark, tmp_path):
    """The read_table step's "filters" field drives manifest file
    skipping and must yield exactly read-then-filter rows."""
    from pyspark.sql import functions as F

    from etlframwork_spark.table import SnapshotTable

    generate_event_log(
        str(tmp_path / "events"), EventLogSpec(seed=6, n_events=1000, n_repos=10, paths_per_repo=6, n_files=3)
    )
    spec = _spec(tmp_path)
    spec["steps"] = spec["steps"][:2]  # ingest + read_table only
    spec["steps"][1]["filters"] = [["lsn", ">", 500]]
    run_job(spark, JobSpec(job_id="jobtest_f", steps=spec["steps"]))
    got = sorted(tuple(r) for r in spark.table("repos").collect())
    t = SnapshotTable.load(str(tmp_path / "table"))
    want = sorted(tuple(r) for r in t.read(spark).filter(F.col("lsn") > 500).collect())
    assert got == want and got  # non-empty and exact


@pytest.mark.slow
def test_spark_submit_pyfiles_launch(tmp_path):
    """The BJ:6 launch path: spark-submit --py-files engine.zip main.py."""
    generate_event_log(
        str(tmp_path / "events"), EventLogSpec(seed=6, n_events=500, n_repos=5, paths_per_repo=4, n_files=2)
    )
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")], check=True, capture_output=True)
    job_path = tmp_path / "job.json"
    job_path.write_text(json.dumps(_spec(tmp_path)))
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    r = subprocess.run(
        [
            "/opt/spark/bin/spark-submit",
            "--master",
            "local[4]",
            "--py-files",
            os.path.join(REPO, "dist", "engine.zip"),
            os.path.join(REPO, "main.py"),
            str(job_path),
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # make sure the engine comes from the zip, not cwd
    )
    assert r.returncode == 0, r.stderr[-4000:]
    line = [l for l in r.stdout.splitlines() if l.startswith('{"job_id"')][-1]
    out = json.loads(line)
    assert out["steps"]["ingest"]["snapshot_id"] >= 1


def test_tag_snapshot_step_and_read_by_tag(spark, tmp_path):
    from etlframwork_spark.table import SnapshotTable

    generate_event_log(
        str(tmp_path / "events"), EventLogSpec(seed=6, n_events=1000, n_repos=10, paths_per_repo=6, n_files=3)
    )
    spec = _spec(tmp_path)
    steps = spec["steps"][:2] + [
        {"type": "tag_snapshot", "name": "pin", "table_root": str(tmp_path / "table"), "tag": "release"},
        {"type": "read_table", "name": "released", "table_root": str(tmp_path / "table"), "tag": "release"},
    ]
    results = run_job(spark, JobSpec(job_id="jobtest_tag", steps=steps))
    t = SnapshotTable.load(str(tmp_path / "table"))
    assert results["pin"]["snapshot_id"] == t.tags()["release"]
    got = sorted(tuple(r) for r in spark.table("released").collect())
    want = sorted(tuple(r) for r in t.read(spark, tag="release").collect())
    assert got == want and got


def test_transform_validation_names_step_and_field(spark):
    """Round-3 verdict #4: a malformed transform config fails at the step
    boundary with the step name and offending field in the message —
    never deep inside Catalyst."""
    import pytest

    from etlframwork_spark.plans.job import JobConfigError, JobSpec, run_job

    spark.createDataFrame([(1, "a")], ["id", "val"]).createOrReplaceTempView("vin")

    def run(step):
        run_job(spark, JobSpec(job_id="j", steps=[{"type": "transform", "input": "vin", **step}]))

    with pytest.raises(JobConfigError, match=r"step 'bad_filter'.*'filter'"):
        run({"name": "bad_filter", "filter": "no_such_col > 1"})
    with pytest.raises(JobConfigError, match=r"step 'bad_expr'.*'with_columns\.x'"):
        run({"name": "bad_expr", "with_columns": {"x": "CASE WHEN"}})
    with pytest.raises(JobConfigError, match=r"step 'collide'.*'with_columns\.val'.*already exists"):
        run({"name": "collide", "with_columns": {"val": "id + 1"}})
    with pytest.raises(JobConfigError, match=r"step 'bad_select'.*'select'"):
        run({"name": "bad_select", "select": ["id", "ghost_col"]})
    # a valid transform still works end-to-end
    run({"name": "ok", "with_columns": {"twice": "id * 2"}, "select": ["id", "twice"]})
    assert spark.table("ok").collect()[0]["twice"] == 2


def test_job_sync_incremental_and_maintenance_steps(spark, tmp_path):
    """Round-6 job-surface additions: declarative downstream sync (the
    cursor is a dst fence, so re-running the JOB is a no-op) and a
    maintenance step running compact/purge/expire/vacuum in safe order."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etlframwork_spark.merge import merge_batch
    from etlframwork_spark.table import SnapshotTable

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("v", LongType()),
            StructField("lsn", LongType()),
        ]
    )
    ev = StructType(schema.fields + [StructField("op", StringType())])
    src = SnapshotTable.create(
        str(tmp_path / "src"), schema, key_cols=["k"], order_col="lsn", num_buckets=4
    )
    SnapshotTable.create(
        str(tmp_path / "dst"), schema, key_cols=["k"], order_col="lsn", num_buckets=4
    )
    merge_batch(
        spark, src,
        spark.createDataFrame(
            [(f"k{i}", i, i, "insert") for i in range(10)]
            + [("k3", None, 100, "delete")],
            ev,
        ),
        job_id="seed", epoch_id=0, write_mode="mor",
    )
    steps = [
        {
            "type": "sync_incremental", "name": "sync",
            "src_root": str(tmp_path / "src"), "dst_root": str(tmp_path / "dst"),
        },
        {
            "type": "maintenance", "name": "maint",
            "table_root": str(tmp_path / "src"),
            "compact_min_deltas": 1, "purge_watermark_lsn": 1000,
            # keep_last must retain the sync cursor's snapshot: expiring
            # it makes the next sync fail LOUDLY by design (delete history
            # between cursor and head becomes unrecoverable)
            "expire_keep_last": 4, "vacuum": True,
        },
    ]
    r = run_job(spark, JobSpec(job_id="medallion", steps=steps))
    assert r["sync"]["mode"] == "bootstrap" and not r["sync"]["skipped"]
    assert r["maint"]["compact"]["buckets_compacted"] >= 1
    assert r["maint"]["purge"]["tombstones_purged"] == 1
    assert "snapshots_expired" in r["maint"] and "files_vacuumed" in r["maint"]
    dst = SnapshotTable.load(str(tmp_path / "dst"))
    got = {row["k"]: row["v"] for row in dst.read(spark).collect()}
    assert got == {f"k{i}": i for i in range(10) if i != 3}
    # re-running the sync after maintenance: the src HEAD advanced
    # (compact/purge commits) but the logical state did not — the
    # incremental feed is empty and dst is untouched
    r2 = run_job(spark, JobSpec(job_id="medallion", steps=steps[:1]))
    assert r2["sync"]["mode"] == "incremental" and r2["sync"]["rows"] == 0
    dst.refresh()
    got2 = {row["k"]: row["v"] for row in dst.read(spark).collect()}
    assert got2 == got
    # and a third run with no src change at all is a fenced up_to_date no-op
    r3 = run_job(spark, JobSpec(job_id="medallion", steps=steps[:1]))
    assert r3["sync"]["skipped"] and r3["sync"]["reason"] == "up_to_date"
    # a NON-existent dst is auto-created mirroring the source spec, then
    # bootstrapped (first run of a medallion job needs no manual create)
    r4 = run_job(spark, JobSpec(job_id="medallion", steps=[{
        "type": "sync_incremental", "name": "sync2",
        "src_root": str(tmp_path / "src"), "dst_root": str(tmp_path / "dst_auto"),
    }]))
    assert r4["sync2"]["mode"] == "bootstrap"
    auto = SnapshotTable.load(str(tmp_path / "dst_auto"))
    assert auto.key_cols == ["k"] and auto.order_col == "lsn"
    got_auto = {row["k"]: row["v"] for row in auto.read(spark).collect()}
    assert got_auto == got


def test_job_sync_and_maintenance_step_validation(spark, tmp_path):
    from etlframwork_spark.plans.job import JobConfigError

    import pytest as _pytest

    with _pytest.raises(JobConfigError, match="src_root"):
        run_job(spark, JobSpec(job_id="j", steps=[
            {"type": "sync_incremental", "name": "s", "dst_root": "/x"}
        ]))
    with _pytest.raises(JobConfigError, match="write_mode"):
        run_job(spark, JobSpec(job_id="j", steps=[
            {"type": "sync_incremental", "name": "s", "src_root": "/a",
             "dst_root": "/b", "write_mode": "bogus"}
        ]))
    with _pytest.raises(JobConfigError, match="table_root"):
        run_job(spark, JobSpec(job_id="j", steps=[
            {"type": "maintenance", "name": "m"}
        ]))


def test_job_merge_into_step(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etlframwork_spark.merge import merge_batch
    from etlframwork_spark.table import SnapshotTable

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("v", LongType()),
            StructField("lsn", LongType()),
        ]
    )
    ev = StructType(schema.fields + [StructField("op", StringType())])
    t = SnapshotTable.create(
        str(tmp_path / "t"), schema, key_cols=["k"], order_col="lsn", num_buckets=4
    )
    merge_batch(
        spark, t,
        spark.createDataFrame([(f"k{i}", i, i, "insert") for i in range(5)], ev),
        job_id="seed", epoch_id=0,
    )
    spark.createDataFrame([("k2", 222), ("k9", 9)], ["k", "v"]).createOrReplaceTempView("corr")
    steps = [{
        "type": "merge_into", "name": "fix", "input": "corr",
        "table_root": str(tmp_path / "t"), "new_order": 1000, "epoch": 1,
    }]
    r = run_job(spark, JobSpec(job_id="dml", steps=steps))
    assert r["fix"]["events"] == 2 and not r["fix"].get("skipped")
    t.refresh()
    got = {row["k"]: row["v"] for row in t.read(spark).collect()}
    assert got["k2"] == 222 and got["k9"] == 9 and len(got) == 6
    # re-run: fenced no-op
    r2 = run_job(spark, JobSpec(job_id="dml", steps=steps))
    assert r2["fix"]["skipped"]
    # validation
    import pytest as _pytest

    from etlframwork_spark.plans.job import JobConfigError
    with _pytest.raises(JobConfigError, match="new_order"):
        run_job(spark, JobSpec(job_id="dml", steps=[{
            "type": "merge_into", "name": "bad", "input": "corr",
            "table_root": str(tmp_path / "t"),
        }]))
