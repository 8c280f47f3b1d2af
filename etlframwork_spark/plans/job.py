"""Declarative job/step-config pipeline spec — the [genre] surface.

The reference is a job/step-config ETL framework (BASELINE.json:6): a job
is an ordered list of typed steps (readers -> transforms -> writers). Here
each step lowers directly to DataFrame operations — Catalyst is the
executor; there is no custom scheduler (SURVEY.md §1.1 "Job/step config").

Supported step types:

    cdc_ingest      run the streaming CDC ingest (streaming/ingest.py)
    read_parquet    {"path", "name"}                -> temp view `name`
    read_table      {"table_root", "name", "snapshot_id"?, "tag"?,
                    "filters"?} -> snapshot table view; "filters"
                    ([[col,op,value]…]) drive manifest file skipping
                    (stats.py); "tag" is name-based time travel
    tag_snapshot    {"table_root", "tag", "snapshot_id"?} -> pin a
                    snapshot by name (exempt from retention until dropped)
    sql             {"query", "name"}               -> temp view from SQL
    transform       {"input", "name", "select"/"filter"/"with_columns"}
    write_parquet   {"input", "path", "mode", "partition_by"}
    write_jdbc      {"input", "url", "table", "staging_table"?, "driver"?,
                    "batch_size"?, "num_partitions"?} -> staged warehouse
                    load; result carries the atomic swap statements
                    (sources/jdbc.JdbcWarehouseSink)
    sync_incremental {"src_root", "dst_root", "sync_id"?, "write_mode"?,
                    "num_buckets"?} -> exactly-once downstream
                    propagation src -> dst (changes.sync_incremental;
                    the cursor is a dst epoch fence, so re-running the
                    job is a fenced no-op). A missing dst table is
                    created mirroring the source's key/order/schema,
                    then bootstrapped
    merge_into      {"input", "table_root", "new_order",
                    "when_matched"?, "matched_condition"?,
                    "when_not_matched"?, "epoch"?} -> conditional
                    MERGE INTO the snapshot table from a named view
                    (merge.merge_into; epoch makes it exactly-once)
    maintenance     {"table_root", "compact_min_deltas"?,
                    "purge_watermark_lsn"?, "expire_keep_last"?,
                    "vacuum"?} -> run the named maintenance ops in the
                    safe order (compact -> purge -> expire -> vacuum);
                    only the configured ones run

A job JSON document is what ``main.py`` consumes under
``spark-submit --py-files engine.zip main.py job.json``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..streaming.ingest import IngestJob, run_ingest
from ..table import SnapshotTable


@dataclass
class JobSpec:
    job_id: str
    steps: list[dict[str, Any]] = field(default_factory=list)

    @classmethod
    def from_json(cls, path_or_str: str) -> "JobSpec":
        if path_or_str.strip().startswith("{"):
            d = json.loads(path_or_str)
        else:
            with open(path_or_str) as f:
                d = json.load(f)
        return cls(job_id=d["job_id"], steps=d.get("steps", []))


class JobConfigError(ValueError):
    """A job step's config failed plan-time validation. Carries the step
    name and the exact offending field so a malformed config fails at the
    step boundary with an actionable message — the same loud-failure
    contract as JdbcSource / FileStreamSource — instead of deep inside
    Catalyst (round-3 verdict #4 on _apply_transform)."""


def _step_fail(step_name: str, field_name: str, detail: str) -> JobConfigError:
    return JobConfigError(
        f"step {step_name!r}, field {field_name!r}: {detail}"
    )


def _apply_transform(df: DataFrame, step: dict[str, Any], step_name: str) -> DataFrame:
    """Lower a transform step, validating each config field at the step
    boundary. DataFrame ops analyze eagerly, so a bad expression raises
    HERE — we catch and rewrap with the step/field that caused it."""
    from pyspark.errors import AnalysisException, ParseException

    if "filter" in step:
        if not isinstance(step["filter"], str):
            raise _step_fail(step_name, "filter", "must be a SQL boolean expression string")
        try:
            df = df.filter(step["filter"])
        except (AnalysisException, ParseException) as e:
            raise _step_fail(step_name, "filter", str(e).split("\n")[0]) from e
    if "with_columns" in step:
        wc = step["with_columns"]
        if not isinstance(wc, dict):
            raise _step_fail(step_name, "with_columns", "must be a {name: expression} mapping")
        for name in wc:
            # reject collisions up front: selectExpr("*", "... AS x") on a
            # frame that already has x would emit a DUPLICATE column and
            # poison every downstream step referencing it
            if name in df.columns:
                raise _step_fail(
                    step_name,
                    f"with_columns.{name}",
                    f"column {name!r} already exists on the input "
                    f"(existing: {sorted(df.columns)}); rename the new column "
                    "or project the old one away first",
                )
        for name, expr in wc.items():
            try:
                df = df.selectExpr("*", f"({expr}) AS {name}")
            except (AnalysisException, ParseException) as e:
                raise _step_fail(step_name, f"with_columns.{name}", str(e).split("\n")[0]) from e
    if "select" in step:
        if not isinstance(step["select"], list):
            raise _step_fail(step_name, "select", "must be a list of SQL expressions")
        try:
            df = df.selectExpr(*step["select"])
        except (AnalysisException, ParseException) as e:
            raise _step_fail(step_name, "select", str(e).split("\n")[0]) from e
    return df


def run_job(spark: SparkSession, spec: JobSpec) -> dict[str, Any]:
    """Execute the job's steps in order; returns a per-step result summary."""
    results: dict[str, Any] = {}
    for i, step in enumerate(spec.steps):
        kind = step["type"]
        name = step.get("name", f"step{i}")
        if kind == "cdc_ingest":
            job = IngestJob.from_dict({"job_id": spec.job_id, **step})
            table = run_ingest(spark, job)
            results[name] = {
                "type": kind,
                "snapshot_id": table.snapshot()["snapshot_id"],
                "schema_id": table.meta["current_schema_id"],
            }
        elif kind == "read_parquet":
            spark.read.parquet(step["path"]).createOrReplaceTempView(name)
            results[name] = {"type": kind}
        elif kind == "read_table":
            t = SnapshotTable.load(step["table_root"])
            # "filters": [[col, op, value], ...] — conjunction, ops in
            # stats.OPS. Drives manifest file skipping + bucket pinning
            # (table.scan_files); the predicate is re-applied in the plan
            # so the step's rows are exactly read-then-filter.
            filters = [tuple(f) for f in step.get("filters", [])] or None
            t.read(
                spark,
                snapshot_id=step.get("snapshot_id"),
                tag=step.get("tag"),
                filters=filters,
            ).createOrReplaceTempView(name)
            results[name] = {"type": kind, "snapshot_id": t.snapshot()["snapshot_id"]}
        elif kind == "tag_snapshot":
            t = SnapshotTable.load(step["table_root"])
            sid = t.set_tag(step["tag"], step.get("snapshot_id"))
            results[name] = {"type": kind, "tag": step["tag"], "snapshot_id": sid}
        elif kind == "sql":
            spark.sql(step["query"]).createOrReplaceTempView(name)
            results[name] = {"type": kind}
        elif kind == "transform":
            df = _apply_transform(spark.table(step["input"]), step, name)
            df.createOrReplaceTempView(name)
            results[name] = {"type": kind}
        elif kind == "write_parquet":
            df = spark.table(step["input"])
            w = df.write.mode(step.get("mode", "overwrite")).option("compression", "zstd")
            if step.get("partition_by"):
                w = w.partitionBy(*step["partition_by"])
            w.parquet(step["path"])
            results[name] = {"type": kind, "path": step["path"]}
        elif kind == "write_jdbc":
            from ..sources.jdbc import JdbcWarehouseSink

            sink = JdbcWarehouseSink(
                url=step["url"],
                table=step["table"],
                staging_table=step.get("staging_table"),
                driver=step.get("driver"),
                batch_size=int(step.get("batch_size", 10_000)),
                num_partitions=step.get("num_partitions"),
                options=step.get("options", {}),
            )
            swap = sink.write(spark.table(step["input"]))
            results[name] = {"type": kind, "table": step["table"], "swap_statements": swap}
        elif kind == "sync_incremental":
            from ..changes import sync_incremental

            for req in ("src_root", "dst_root"):
                if not isinstance(step.get(req), str) or not step[req]:
                    raise _step_fail(name, req, "must be a non-empty table-root path")
            wm = step.get("write_mode", "cow")
            if wm not in ("cow", "mor"):
                raise _step_fail(name, "write_mode", f"must be 'cow' or 'mor', got {wm!r}")
            src_t = SnapshotTable.load(step["src_root"])
            if not SnapshotTable.exists(step["dst_root"]):
                # first run of a medallion job: create the downstream table
                # mirroring the source's spec — the sync then bootstraps
                # into it (an EMPTY table is exactly what bootstrap demands)
                SnapshotTable.create(
                    step["dst_root"],
                    src_t.schema(),
                    key_cols=src_t.key_cols,
                    order_col=src_t.order_col,
                    num_buckets=int(step.get("num_buckets", src_t.num_buckets)),
                    name=f"{spec.job_id}:{name}:dst",
                )
            out = sync_incremental(
                spark,
                src_t,
                SnapshotTable.load(step["dst_root"]),
                job_id=step.get("sync_id", f"{spec.job_id}:{name}"),
                write_mode=wm,
            )
            results[name] = {"type": kind, **out}
        elif kind == "merge_into":
            from ..merge import merge_into

            for req in ("input", "table_root"):
                if not isinstance(step.get(req), str) or not step[req]:
                    raise _step_fail(name, req, "must be a non-empty string")
            if not isinstance(step.get("new_order"), int):
                raise _step_fail(
                    name, "new_order",
                    "required integer above the source's delivered watermark",
                )
            out = merge_into(
                spark,
                SnapshotTable.load(step["table_root"]),
                spark.table(step["input"]),
                new_order=step["new_order"],
                when_matched=step.get("when_matched", "update"),
                matched_condition=step.get("matched_condition"),
                when_not_matched=step.get("when_not_matched", "insert"),
                job_id=step.get("merge_id", f"{spec.job_id}:{name}"),
                epoch_id=step.get("epoch"),
            )
            results[name] = {"type": kind, **{k: out.get(k) for k in
                ("events", "deletes", "affected_buckets", "snapshot_id", "skipped")}}
        elif kind == "maintenance":
            from ..maintenance import compact_buckets, purge_tombstones

            if not isinstance(step.get("table_root"), str) or not step["table_root"]:
                raise _step_fail(name, "table_root", "must be a non-empty table-root path")
            t = SnapshotTable.load(step["table_root"])
            out = {"type": kind}
            # safe order: fold deltas first (purge rewrites read resolved
            # state), reclaim tombstones, THEN retire snapshots and GC
            # files — vacuum before expire would collect nothing new
            if step.get("compact_min_deltas") is not None:
                out["compact"] = compact_buckets(
                    spark, t, min_deltas=int(step["compact_min_deltas"])
                )
            if step.get("purge_watermark_lsn") is not None:
                out["purge"] = purge_tombstones(
                    spark, t, watermark_lsn=int(step["purge_watermark_lsn"])
                )
            if step.get("expire_keep_last") is not None:
                out["snapshots_expired"] = t.expire_snapshots(
                    keep_last=int(step["expire_keep_last"])
                )
            if step.get("vacuum"):
                out["files_vacuumed"] = t.vacuum()
            results[name] = out
        else:
            raise ValueError(f"unknown step type {kind!r}")
    return results
