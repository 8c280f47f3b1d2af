"""Stream-source seam (SURVEY §2.1 S2 + round-2 VERDICT 'missing #6'):
the file tail and a future Kafka tail plug into run_ingest identically."""

from __future__ import annotations

import pytest

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etlframwork_spark.events import EventLogSpec, generate_event_log
from etlframwork_spark.streaming import IngestJob, run_ingest
from etlframwork_spark.streaming.sources import FileStreamSource, KafkaStreamSource

ENVELOPE = StructType(
    [
        StructField("op", StringType()),
        StructField("lsn", LongType()),
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("content", StringType()),
    ]
)


def test_explicit_file_source_equals_default(spark, tmp_path):
    spec = EventLogSpec(seed=11, n_events=800, n_repos=10, paths_per_repo=5, n_files=2)
    events = str(tmp_path / "events")
    generate_event_log(events, spec)

    def mk(name, source):
        job = IngestJob(
            job_id=name,
            events_dir=events,
            table_root=str(tmp_path / name / "t"),
            checkpoint_dir=str(tmp_path / name / "c"),
            num_buckets=4,
        )
        return run_ingest(spark, job, source=source)

    t_default = mk("default", None)
    t_explicit = mk("explicit", FileStreamSource(events, max_files_per_trigger=1))
    a = {tuple(r) for r in t_default.read(spark).collect()}
    b = {tuple(r) for r in t_explicit.read(spark).collect()}
    assert a == b and len(a) > 0


def test_kafka_source_schema_and_actionable_failure(spark):
    src = KafkaStreamSource(
        bootstrap_servers="broker:9092", topic="repo-cdc", event_schema=ENVELOPE
    )
    assert src.discover_schema() == ENVELOPE
    # no kafka jar in this sandbox (SURVEY §7.4.1): the seam must fail
    # with the exact remediation, not an opaque ClassNotFound at start()
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        src.read_stream(spark, ENVELOPE)


def test_jdbc_source_plan_construction_and_actionable_failure(spark):
    """The JDBC per-step extract seam (round-2 'What's missing' #2):
    partitioned-read invariants enforced at construction, the incremental
    watermark pushed down as a DB-side subquery, and — with no driver jar
    in this sandbox — a loud, actionable failure naming the remediation."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etlframwork_spark.sources import JdbcSource

    schema = StructType(
        [StructField("id", LongType()), StructField("payload", StringType())]
    )
    # bounds required with a partition column (else: one-connection read)
    with pytest.raises(ValueError, match="lower_bound"):
        JdbcSource(url="jdbc:postgresql://h/db", table="t", expected_schema=schema,
                   partition_column="id")
    # parallelism without a partition column is silently ignored by Spark
    with pytest.raises(ValueError, match="partition_column"):
        JdbcSource(url="jdbc:postgresql://h/db", table="t", expected_schema=schema,
                   num_partitions=8)
    src = JdbcSource(
        url="jdbc:postgresql://h/db", table="events", expected_schema=schema,
        driver="org.postgresql.Driver", partition_column="id",
        lower_bound=0, upper_bound=1_000_000, num_partitions=8,
        watermark_column="id",
    )
    assert src.discover_schema() == schema
    assert src.effective_table() == "events"
    assert src.effective_table(watermark_after=42) == (
        "(SELECT * FROM events WHERE id > 42) _incr"
    )
    sub = JdbcSource(url="jdbc:h", table="(SELECT * FROM a JOIN b USING (id)) s",
                     expected_schema=schema, watermark_column="ts")
    assert sub.effective_table("2026-01-01").startswith(
        "(SELECT * FROM ((SELECT * FROM a JOIN b USING (id)) s) _t WHERE ts > '2026-01-01')"
    )
    # no DB / driver jar here: must fail with the exact remediation
    with pytest.raises(RuntimeError, match="spark-submit --packages"):
        src.read(spark)


def test_avro_seam_actionable_failure(spark):
    """No spark-avro jar in this sandbox: the seam must name the
    remediation (same contract as the Kafka and JDBC seams)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from etlframwork_spark.sources import avro_reader

    with pytest.raises(RuntimeError, match="spark-avro"):
        avro_reader(spark, "/tmp/never-read", StructType([StructField("x", LongType())]))


def test_stream_auto_expires_metadata(spark, tmp_path):
    """expire_every inside the stream keeps snapshot metadata bounded
    without any manual maintenance call."""
    spec = EventLogSpec(seed=13, n_events=1200, n_repos=10, paths_per_repo=5, n_files=8)
    events = str(tmp_path / "events")
    generate_event_log(events, spec)
    job = IngestJob(
        job_id="autoexpire",
        events_dir=events,
        table_root=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "c"),
        num_buckets=4,
        max_files_per_trigger=1,  # 8 epochs
        expire_every=3,
        keep_snapshots=2,
    )
    table = run_ingest(spark, job)
    # 8 commits happened, but expiry at epochs 3 and 6 trimmed history
    assert len(table.meta["snapshots"]) <= 2 + 2  # kept + commits since last expiry
    assert table.read(spark).count() > 0


def test_sql_literal_quoting_and_rejection():
    """Round-3 ADVICE: watermark literals must be portable SQL, escaped."""
    import pytest

    from etlframwork_spark.sources.jdbc import sql_literal

    assert sql_literal(42) == "42"
    assert sql_literal(3.5) == "3.5"
    assert sql_literal("2026-01-01 00:00:00") == "'2026-01-01 00:00:00'"
    assert sql_literal("O'Brien") == "'O''Brien'"
    assert sql_literal("a'; DROP TABLE t; --") == "'a''; DROP TABLE t; --'"
    for bad in (True, None, [1], {"a": 1}):
        with pytest.raises(TypeError):
            sql_literal(bad)


def test_watermark_subquery_uses_escaped_literal(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from etlframwork_spark.sources.jdbc import JdbcSource

    src = JdbcSource(
        url="jdbc:postgresql://db:5432/wh",
        table="events",
        expected_schema=StructType([StructField("id", LongType())]),
        watermark_column="updated_at",
    )
    assert (
        src.effective_table("2026-01-01T00:00:00")
        == "(SELECT * FROM events WHERE updated_at > '2026-01-01T00:00:00') _incr"
    )
    assert "''" in src.effective_table("it's")


def test_jdbc_warehouse_sink_plan_and_actionable_failure(spark):
    """Round-3 verdict #6: warehouse writer seam — staged write + atomic
    swap plan construction, identifier safety, loud no-driver failure."""
    import pytest

    from etlframwork_spark.sources.jdbc import JdbcWarehouseSink

    sink = JdbcWarehouseSink(
        url="jdbc:postgresql://db:5432/wh", table="analytics.daily_rollup",
        driver="org.postgresql.Driver", num_partitions=8,
    )
    assert sink.staging_table == "analytics.daily_rollup__stg"
    swap = sink.swap_statements()
    assert swap[0] == "BEGIN" and "COMMIT" in swap
    assert f"ALTER TABLE {sink.staging_table} RENAME TO daily_rollup" in swap
    assert swap[1] == "DROP TABLE IF EXISTS analytics.daily_rollup__old"

    # unsafe identifiers are rejected at construction (DDL interpolation)
    with pytest.raises(ValueError, match="unsafe"):
        JdbcWarehouseSink(url="jdbc:x", table="t; DROP TABLE users")
    with pytest.raises(ValueError, match="unsafe"):
        JdbcWarehouseSink(url="jdbc:x", table="ok", staging_table='bad"name')

    # no driver jar in the sandbox: the failure names the fix
    df = spark.range(3)
    with pytest.raises(Exception, match="spark-submit --packages|driver"):
        sink.write(df)


def test_write_jdbc_job_step_fails_actionably(spark):
    import pytest

    from etlframwork_spark.plans.job import JobSpec, run_job

    spark.range(2).createOrReplaceTempView("to_load")
    spec = JobSpec(
        job_id="wh",
        steps=[{
            "type": "write_jdbc", "name": "load", "input": "to_load",
            "url": "jdbc:postgresql://db:5432/wh", "table": "t_out",
            "driver": "org.postgresql.Driver",
        }],
    )
    with pytest.raises(Exception, match="spark-submit --packages|driver"):
        run_job(spark, spec)
