"""Headline benchmark: prints ONE JSON line for the driver.

Runs the representative query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the flagship CDC
replay throughput bench (synthetic 200k-event binlog -> streaming MERGE).

Output: {"metric": ..., "value": <total suite seconds>, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "cdc_events_per_sec": ..., "cdc_events": ...}

Query timing uses the noop sink (full compute, no driver materialization).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "filter_project_pushdown",
    "lww_dedup_events",
    "window_rank_orders",
    "rollup_order_metrics",
    "topk_hot_users",
    "json_extract_events",
    "docs_token_stats",
    "docs_exact_dedup",
    "docs_dedup_keepers",
    "docs_dedup_pipeline",
    "docs_quality_fingerprint",
    "emb_cosine_topk",
    "emb_ann_lsh",
    "multimodal_feature_extract",
]

CDC_EVENTS = int(os.environ.get("BENCH_CDC_EVENTS", "1000000"))

# ---------------------------------------------------------- host controls
# This host is a burstable VM whose CPU grant swings several-fold with
# co-tenant load (BENCH/BASELINE.md); a bad phase once read as a 2.7x
# "regression" of code that measured 1.2-1.8x in three same-day runs
# (round-5 verdict #1). Two fixed controls are therefore timed and
# emitted with every capture so a reader can separate host phase from
# engine cost:
#   * a single-thread sha256 burn (pure CPU, zero engine code), and
#   * q1_pricing_summary (code-frozen since round 2 — a fixed Spark plan).
# Each query is reported raw AND normalized by the q1 control ratio; a
# capture whose controls run >1.5x their recorded floors is flagged
# host_phase_degraded (compare normalized numbers, or re-capture).
CONTROL_SHA_MB = 192
CONTROL_SHA_FLOOR = 0.132  # best-of-5 on an idle host, 2026-08-17
CONTROL_Q1_FLOOR = 1.04  # best recorded q1 across rounds 2-5 (same code)
HOST_DEGRADED_RATIO = 1.5


def _sha_control() -> float:
    """Single-thread sha256 over a fixed buffer — pure-CPU host probe,
    best of 3 (runs ~0.13s each at floor)."""
    import hashlib

    buf = b"\xa5" * (1 << 20)
    best = None
    for _ in range(3):
        t0 = time.monotonic()
        h = hashlib.sha256()
        for _ in range(CONTROL_SHA_MB):
            h.update(buf)
        h.digest()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def _resolve_query(name):
    """Headline legs may include functions demoted from the 50-slot driver
    registry (round 6: emb_ann_lsh) — fall back to their home modules."""
    from etlframwork_spark.functions import dedup, similarity
    from etlframwork_spark.operators import QUERIES

    if name in QUERIES:
        return QUERIES[name]
    for mod in (similarity, dedup):
        if hasattr(mod, name):
            return getattr(mod, name)
    raise KeyError(name)


def _time_query(fn, spark, sf_dir) -> float:
    """Min of two runs: this host's speed oscillates 2-3x over minutes and
    the first execution of a query also pays JIT/codegen compilation, so a
    single sample conflates engine cost with host phase. The minimum is
    the steady-state estimator (matches BENCH/BASELINE.md methodology)."""
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def _bench_tmp() -> str:
    """tmpfs when available: benching the merge on one shared disk
    measures the disk, not the engine (see scripts/bench_scaling.py)."""
    shm = "/dev/shm/cdc-bench"
    try:
        os.makedirs(shm, exist_ok=True)
        return shm
    except OSError:
        return tempfile.gettempdir()


def _cdc_bench(spark, n_events: int, write_mode: str = "cow") -> dict:
    """Best of two replays (same steady-state rationale as _time_query;
    the second run also reuses the page-cached event log)."""
    a = _cdc_bench_once(spark, n_events, write_mode)
    b = _cdc_bench_once(spark, n_events, write_mode)
    return a if a["cdc_seconds"] <= b["cdc_seconds"] else b


def _cdc_bench_once(spark, n_events: int, write_mode: str = "cow") -> dict:
    from etlframwork_spark.events import EventLogSpec, generate_event_log
    from etlframwork_spark.streaming import IngestJob, run_ingest

    spec = EventLogSpec(
        seed=42, n_events=n_events, n_repos=max(200, n_events // 500),
        paths_per_repo=40, hot_ratio=0.2, p_delete=0.05, n_files=8, content_repeat=2,
    )
    # cache the generated log across runs (generation is not what we measure)
    base = _bench_tmp()
    cache = os.path.join(base, f"cdc_bench_log_{spec.seed}_{n_events}")
    if not os.path.isdir(cache) or not os.listdir(cache):
        generate_event_log(cache, spec)
    work = tempfile.mkdtemp(prefix="cdc_bench_", dir=base)
    try:
        job = IngestJob(
            job_id=f"bench-{write_mode}",
            events_dir=cache,
            table_root=os.path.join(work, "table"),
            checkpoint_dir=os.path.join(work, "ckpt"),
            metrics_dir=os.path.join(work, "metrics"),
            num_buckets=32,
            max_files_per_trigger=4,
            write_mode=write_mode,
            compact_min_deltas=4 if write_mode == "mor" else None,
        )
        t0 = time.monotonic()
        table = run_ingest(spark, job)
        secs = time.monotonic() - t0
        rows = table.read(spark).count()
        return {
            "cdc_events": n_events,
            "cdc_seconds": round(secs, 3),
            "cdc_events_per_sec": round(n_events / secs, 1),
            "cdc_final_rows": rows,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from etlframwork_spark.operators import QUERIES
    from etlframwork_spark.session import build_session

    extra = {}
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    # control #1 BEFORE the JVM exists: pure-CPU single-thread host probe
    sha_secs = round(_sha_control(), 4)
    spark = build_session(master=f"local[{cpus}]", app_name="etlframwork-bench", extra_conf=extra)
    try:
        # JVM/codegen warmup on a trivial action
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        # Per-leg isolation (round-4 lesson: one leg's exception killed the
        # whole bench and round 4 shipped ZERO numbers). Any leg that dies
        # lands in `errors`; everything that succeeded is still reported.
        # q1 (control #2, code-frozen plan) is first in HEADLINE.
        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in HEADLINE:
            try:
                timings[name] = round(_time_query(_resolve_query(name), spark, sf_dir), 3)
            except Exception as e:  # noqa: BLE001 — bench must emit partial JSON
                errors[name] = f"{type(e).__name__}: {e}"[:300]
        cdc = mor = None
        try:
            cdc = _cdc_bench(spark, CDC_EVENTS, "cow")
        except Exception as e:  # noqa: BLE001
            errors["cdc_replay"] = f"{type(e).__name__}: {e}"[:300]
        try:
            mor = _cdc_bench(spark, CDC_EVENTS, "mor")
        except Exception as e:  # noqa: BLE001
            errors["cdc_replay_mor"] = f"{type(e).__name__}: {e}"[:300]
        queries = dict(timings)
        if cdc:
            queries["cdc_replay"] = cdc["cdc_seconds"]
        if mor:
            queries["cdc_replay_mor"] = mor["cdc_seconds"]
        total = round(sum(queries.values()), 3)
        # host-phase controls: ratios vs recorded floors; normalize by the
        # q1 ratio (the control that shares the suite's execution shape)
        sha_ratio = round(sha_secs / CONTROL_SHA_FLOOR, 3)
        q1_secs = timings.get("q1_pricing_summary")
        q1_ratio = round(q1_secs / CONTROL_Q1_FLOOR, 3) if q1_secs else None
        norm_by = q1_ratio if q1_ratio and q1_ratio > 1.0 else 1.0
        queries_normalized = {k: round(v / norm_by, 3) for k, v in queries.items()}
        degraded = sha_ratio > HOST_DEGRADED_RATIO or (
            q1_ratio is not None and q1_ratio > HOST_DEGRADED_RATIO
        )
        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        out = {
            "metric": "headline suite wall time (generic ops + CDC replay)",
            "value": total,
            "unit": "sec",
            "queries": queries,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "cpus": int(cpus),
            "host_control": {
                "sha_secs": sha_secs,
                "sha_floor": CONTROL_SHA_FLOOR,
                "sha_ratio": sha_ratio,
                "q1_secs": q1_secs,
                "q1_floor": CONTROL_Q1_FLOOR,
                "q1_ratio": q1_ratio,
            },
            "host_phase_degraded": degraded,
            "value_normalized": round(total / norm_by, 3),
            "queries_normalized": queries_normalized,
        }
        if cdc:
            out.update(cdc)
            out["cdc_events_per_sec_normalized"] = round(
                cdc["cdc_events_per_sec"] * norm_by, 1
            )
        if mor:
            out["cdc_mor_events_per_sec"] = mor["cdc_events_per_sec"]
            out["cdc_mor_events_per_sec_normalized"] = round(
                mor["cdc_events_per_sec"] * norm_by, 1
            )
        if errors:
            out["errors"] = errors
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
