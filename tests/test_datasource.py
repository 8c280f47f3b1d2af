"""DataSource V2 exposure of SnapshotTable (Python Data Source API):

- the pure-Python xxhash64 must be BIT-equal to Spark's JVM xxhash64
  (it is what makes key-equality bucket pruning correct);
- reads through spark.read.format("snapshot_table") must be row-identical
  to SnapshotTable.read for cow tables, merge-on-read tables (deltas),
  tombstones and time travel;
- key-equality filters must prune the scan to ONE bucket partition.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etlframwork_spark.events import (
    CDC_BASE_SCHEMA,
    EventLogSpec,
    TARGET_BASE_SCHEMA,
    _make_events_frame,
)
from etlframwork_spark.merge import merge_batch
from etlframwork_spark.sources.snapshot_datasource import (
    SnapshotTableDataSource,
    SnapshotTableReader,
    bucket_of,
    spark_xxhash64_strings,
)
from etlframwork_spark.table import SnapshotTable, bucket_expr


def _mk_table(spark, tmp_path, write_mode="cow", n_events=1200, nb=8):
    table = SnapshotTable.create(
        str(tmp_path / "t"), TARGET_BASE_SCHEMA, key_cols=["repo", "path"],
        order_col="lsn", num_buckets=nb,
    )
    spec = EventLogSpec(seed=5, n_events=n_events, n_repos=12, paths_per_repo=6, p_delete=0.12)
    pdf = _make_events_frame(spec)
    half = len(pdf) // 2
    for i, chunk in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        merge_batch(
            spark, table, spark.createDataFrame(chunk.drop(columns=["lang"]), schema=CDC_BASE_SCHEMA),
            job_id="ds", epoch_id=i, write_mode=write_mode,
        )
    return table


def _register(spark):
    spark.dataSource.register(SnapshotTableDataSource)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_python_xxhash64_bit_equals_spark(spark):
    cases = [
        ["org1/repo17"],
        ["org1/repo17", "src/mod0/f3.js"],
        [""],
        ["", ""],
        ["a" * 7], ["b" * 8], ["c" * 31], ["d" * 32], ["e" * 33], ["f" * 100],
        ["Übergrößenträger", "emoji 🎉 path/with spaces"],
    ]
    df = spark.createDataFrame([(c[0], c[1] if len(c) > 1 else None) for c in cases], ["a", "b"])
    got1 = [r[0] for r in df.select(F.xxhash64("a")).collect()]
    for c, g in zip(cases, got1):
        assert spark_xxhash64_strings([c[0]]) == g, c
    two = [(c[0], c[1]) for c in cases if len(c) > 1]
    df2 = spark.createDataFrame(two, ["a", "b"])
    got2 = [r[0] for r in df2.select(F.xxhash64("a", "b")).collect()]
    for c, g in zip(two, got2):
        assert spark_xxhash64_strings(list(c)) == g, c


def test_python_bucket_matches_bucket_expr(spark):
    rows = [(f"org{i}/repo{i}", f"src/f{i}.py") for i in range(50)]
    df = spark.createDataFrame(rows, ["repo", "path"])
    got = {
        (r["repo"], r["path"]): r["b"]
        for r in df.select("repo", "path", bucket_expr(["repo", "path"], 16).alias("b")).collect()
    }
    for (repo, path), b in got.items():
        assert bucket_of([repo, path], 16) == b, (repo, path)


@pytest.mark.parametrize("write_mode", ["cow", "mor"])
def test_datasource_read_equals_table_read(spark, tmp_path, write_mode):
    table = _mk_table(spark, tmp_path, write_mode=write_mode)
    if write_mode == "mor":
        assert table.has_deltas(), "mor table should carry deltas for this test"
    _register(spark)
    via_ds = spark.read.format("snapshot_table").option("root", table.root).load()
    assert _rows(via_ds) == _rows(table.read(spark))


def test_datasource_time_travel(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    first = table.meta["snapshots"][1]["snapshot_id"]  # after epoch 0
    _register(spark)
    via_ds = spark.read.format("snapshot_table").option("root", table.root).option(
        "snapshot_id", str(first)
    ).load()
    assert _rows(via_ds) == _rows(table.read(spark, snapshot_id=first))


def test_key_equality_filters_prune_to_one_bucket(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    _register(spark)
    any_row = table.read(spark).orderBy("repo", "path").first()
    repo, path = any_row["repo"], any_row["path"]

    # planning-level check: pushFilters pins the bucket, partitions() = 1
    from pyspark.sql.datasource import EqualTo

    reader = SnapshotTableReader({"root": table.root}, table.meta)
    leftover = reader.pushFilters([EqualTo(("repo",), repo), EqualTo(("path",), path)])
    assert len(list(leftover)) == 2  # everything handed back to Spark
    parts = reader.partitions()
    assert len(parts) == 1
    assert parts[0].bucket == bucket_of([repo, path], table.num_buckets)

    # end-to-end: the pruned read returns exactly the filtered rows
    via_ds = (
        spark.read.format("snapshot_table").option("root", table.root).load()
        .filter((F.col("repo") == repo) & (F.col("path") == path))
    )
    expect = table.read(spark).filter((F.col("repo") == repo) & (F.col("path") == path))
    assert _rows(via_ds) == _rows(expect)
    assert via_ds.count() == 1


def test_tag_read_uses_tagged_snapshot_schema(spark, tmp_path):
    """Round-3 ADVICE: schema() must resolve a tag to the TAGGED snapshot's
    schema — a tag set before an additive evolution reads back in the old
    schema (no phantom new column), identical to table.read(tag=...)."""
    from etlframwork_spark.events import CDC_EVOLVED_SCHEMA

    table = _mk_table(spark, tmp_path, n_events=400)
    table.set_tag("pre-evolution")
    # evolve: merge a batch that carries the additive `lang` column
    spec = EventLogSpec(seed=9, n_events=200, n_repos=12, paths_per_repo=6, p_delete=0.1)
    pdf = _make_events_frame(spec)
    merge_batch(
        spark, table, spark.createDataFrame(pdf, schema=CDC_EVOLVED_SCHEMA),
        job_id="ds", epoch_id=99,
    )
    assert "lang" in table.schema().fieldNames()
    _register(spark)
    via_ds = (
        spark.read.format("snapshot_table").option("root", table.root)
        .option("tag", "pre-evolution").load()
    )
    assert "lang" not in via_ds.columns  # planned with the tagged schema
    assert _rows(via_ds) == _rows(table.read(spark, tag="pre-evolution"))
