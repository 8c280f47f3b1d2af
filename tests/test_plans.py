"""Physical-plan shape assertions (SURVEY.md §4): pushdown, pruning,
broadcast, map-side partial aggregation, whole-stage codegen. A correct
answer with the wrong plan does not survive 100 TB — these tests pin the
plans we engineered for."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from etlframwork_spark.operators import QUERIES


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_and_projection_reach_parquet_scan(spark, sf_dir):
    p = _plan(QUERIES["filter_project_pushdown"](spark, sf_dir))
    assert "PushedFilters:" in p
    assert "l_quantity" in p.split("PushedFilters:")[1].split("\n")[0]
    # column pruning: untouched wide columns never leave the scan
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    for col in ("l_shipdate", "l_tax", "l_partkey", "l_suppkey"):
        assert col not in read_schema, f"{col} not pruned: {read_schema}"


def test_small_dims_are_broadcast(spark, sf_dir):
    p = _plan(QUERIES["q5_region_revenue"](spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "BroadcastExchange" in p


def test_aggregates_have_mapside_partial_phase(spark, sf_dir):
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    p = _plan(df, mode="simple")
    # map-side partial aggregation must run BELOW the shuffle Exchange
    assert "partial_sum" in p
    assert p.index("Exchange") < p.index("partial_sum"), "partial agg above the shuffle?"


def test_lww_maxby_has_partial_aggregation(spark):
    """The MERGE's dedup kernel must pre-reduce map-side: a hot key's
    events collapse to one row per input partition before the shuffle —
    this IS the first line of skew defense at 10^10 events."""
    from etlframwork_spark.merge import _resolve_maxby

    df = spark.createDataFrame(
        [("r", "p", 1, "c", "x")], ["repo", "path", "lsn", "commit", "content"]
    )
    resolved = _resolve_maxby(df, ["repo", "path"], ["repo", "path", "lsn", "commit", "content"], ["lsn", "commit"])
    p = _plan(resolved)
    assert "partial_max_by" in p


def test_topk_plans_take_ordered_no_global_sort(spark, sf_dir):
    p = _plan(QUERIES["topk_hot_users"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_broadcast_in_cosine_topk(spark, sf_dir):
    p = _plan(QUERIES["emb_cosine_topk"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_range_join_never_plans_nested_loop(spark, sf_dir):
    """J8's bucketed range join must ride an equi shuffle/broadcast —
    a BroadcastNestedLoopJoin or CartesianProduct here means the theta
    term leaked into the join strategy (quadratic at scale)."""
    p = _plan(QUERIES["range_join_error_context"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_dedup_pipeline_no_cartesian_and_capped(spark, sf_dir):
    p = _plan(QUERIES["docs_dedup_pipeline"](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_sessionize_single_sort_per_user_partitioning(spark, sf_dir):
    """Sessionization's lag + running-sum windows share one
    (user_id)-ordered sort — the plan must not re-sort per window."""
    p = _plan(QUERIES["events_sessionize"](spark, sf_dir), mode="simple")
    # both window functions evaluate inside a shared Window operator chain
    # over a single hashpartitioning(user_id) exchange
    assert p.count("Exchange hashpartitioning(user_id") == 1, p
