"""Pre-runs the driver's Spark-vs-DuckDB comparison for every registered
query (SURVEY.md §5 layer 2), strictly and driver-faithfully:

- identical row counts and column names,
- **Arrow-level type compatibility** — the driver's value hash is type-aware,
  so a DuckDB HUGEINT (int128 / decimal128(38,0)) where Spark emits BIGINT is
  a failure even when every value is numerically equal (this exact bug
  shipped in round 1: CORRECTNESS_r01 json_extract_events /
  array_ops_embeddings / docs_token_stats),
- identical sorted-row multisets (exact values — the decimal/quantization
  determinism rules must hold bit-for-bit),
- rows-only sanity + determinism for queries without oracles.

Oracle queries run at BOTH sf0.001 and sf0.01 (the driver's compare scale).
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pytest

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etlframwork_spark.operators import ORACLES, QUERIES  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def _canon_type(t: pa.DataType):
    """Canonical Arrow type tag. Integer WIDTH is significant (int64 vs
    int128/HUGEINT must differ — that is the round-1 driver failure mode);
    string/large_string and list/large_list are unified; timestamp unit/tz
    are unified (both engines emit micro-second local values here)."""
    if pa.types.is_integer(t):
        return ("int", t.bit_width)
    if pa.types.is_decimal(t):
        # DuckDB surfaces HUGEINT as decimal128(38,0); any decimal where
        # Spark produced a plain int is a widening bug we must catch.
        return ("decimal", t.precision, t.scale)
    if pa.types.is_floating(t):
        return ("float", t.bit_width)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("string",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("binary",)
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_timestamp(t):
        return ("timestamp",)
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return ("list", _canon_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((f.name, _canon_type(f.type)) for f in t))
    if pa.types.is_null(t):
        return ("null",)
    return ("other", str(t))


def _arrow_types(tbl: pa.Table):
    return {f.name: _canon_type(f.type) for f in tbl.schema}


ORACLE_QUERIES = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))
SCALE_FACTORS = ["sf0.001", "sf0.01"]


@pytest.mark.parametrize("sf", SCALE_FACTORS)
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb(spark, name, sf):
    sf_dir = os.path.join(TESTDATA, sf)
    sdf = QUERIES[name](spark, sf_dir)
    stbl = sdf.toArrow()
    scols = stbl.column_names
    con = _duck(sf_dir)
    dtbl = con.sql(ORACLES[name]).fetch_arrow_table()
    dcols = dtbl.column_names
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    # Driver-faithful: the value hash is type-aware, so Arrow types must
    # agree per column (HUGEINT vs BIGINT is a FAIL even with equal values).
    st, dt = _arrow_types(stbl), _arrow_types(dtbl)
    type_diffs = {c: (st[c], dt[c]) for c in st if st[c] != dt[c]}
    assert not type_diffs, f"{name}: arrow type mismatch (spark, duckdb): {type_diffs}"
    srows = [tuple(r[c] for c in scols) for r in stbl.to_pylist()]
    drows = [tuple(r[c] for c in dcols) for r in dtbl.to_pylist()]
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    sset, dset = _rowset(scols, srows), _rowset(dcols, drows)
    mismatches = [(a, b) for a, b in zip(sset, dset) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_are_deterministic(spark, sf_dir, name):
    df1 = QUERIES[name](spark, sf_dir)
    r1 = df1.collect()
    assert df1.schema is not None
    r2 = QUERIES[name](spark, sf_dir).collect()
    assert len(r1) == len(r2)
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2)), f"{name}: nondeterministic"


def test_registry_fits_driver_window():
    """Round-2 finding: the driver ran only the FIRST 50 registered
    queries, so 4 (incl. an oracle-paired one) never got a CORRECTNESS
    row. Pin the cap and pin that the once-missed multimodal/similarity
    queries register well inside any 50-query window."""
    names = list(QUERIES)
    assert len(names) <= 50, f"registry has {len(names)} queries; driver window is 50"
    # emb_ann_lsh / docs_simhash_pairs were demoted in round 6 (slots went
    # to the new oracle-paired CDC gates) — assert they stay OUT
    for q in ("emb_ann_lsh", "docs_simhash_pairs"):
        assert q not in names, f"{q} was demoted from the driver window in round 6"
    for q in ("multimodal_blob_metadata", "multimodal_feature_extract", "emb_ivf_topk",
              "cdc_update_where_state", "cdc_sync_incremental_state"):
        assert names.index(q) < 45, f"{q} registers at {names.index(q)} — too close to the window edge"


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(se.oracle_sql()) <= set(se.queries())


def test_sketches_within_error_bounds(spark, sf_dir):
    """approx_count_distinct (HLL, rsd=0.02) and approx_percentile
    (t-digest, accuracy 10000) pinned against their exact twins with
    explicit error bounds — stronger evidence than the rows-only driver
    row this query occupied through round 4 (demoted: the driver window
    is 50 and the oracle-paired rename-evolution gate took the slot)."""
    from etlframwork_spark.operators.advanced import (
        approx_sketches_events,
        percentiles_event_value,
    )

    import pyspark.sql.functions as F

    approx = {r["event_type"]: r for r in approx_sketches_events(spark, sf_dir).collect()}
    exact_p = {r["event_type"]: r for r in percentiles_event_value(spark, sf_dir).collect()}
    exact_d = {
        r["event_type"]: r
        for r in QUERIES["distinct_counts"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact_p) == set(exact_d) and approx
    # approx_percentile returns an actual data point, the exact twin
    # interpolates — a value-distance bound is unsound on a sparse heavy
    # tail (one rank of slack can be a large value jump). The sound bound
    # is a RANK window: the sketch's answer for quantile q must lie
    # between the exact percentiles at q∓0.005 (sketch rank error at
    # accuracy=10000 is 1e-4, so ±0.5% rank slack is generous).
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("event_type", "CAST(round(value * 100, 0) AS BIGINT) AS vq")
    )
    qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    aggs = []
    for name, q in qs.items():
        aggs.append(F.expr(f"percentile(vq, {max(0.0, q - 0.005)})").alias(f"{name}_lo"))
        aggs.append(F.expr(f"percentile(vq, {min(1.0, q + 0.005)})").alias(f"{name}_hi"))
    bounds = {r["event_type"]: r for r in ev.groupBy("event_type").agg(*aggs).collect()}
    for et, a in approx.items():
        n = exact_d[et]["n_users"]
        # HLL with rsd=0.02: allow 5 sigma (plus slack for tiny groups)
        assert abs(a["approx_users"] - n) <= max(3, 0.10 * n), (et, a["approx_users"], n)
        for name in qs:
            lo, hi = bounds[et][f"{name}_lo"], bounds[et][f"{name}_hi"]
            assert lo - 1 <= a[name] <= hi + 1, (et, name, a[name], lo, hi)


def test_salted_key_distribution_properties(spark, sf_dir):
    """The demoted-from-driver salting query's promised evidence:
    deterministic across runs, shards confined to [0, 32), and the shard
    counts partition the input exactly (no row lost or duplicated)."""
    from etlframwork_spark.operators.relational import salted_key_distribution

    rows1 = {r["shard"]: r["n"] for r in salted_key_distribution(spark, sf_dir).collect()}
    rows2 = {r["shard"]: r["n"] for r in salted_key_distribution(spark, sf_dir).collect()}
    assert rows1 == rows2
    assert set(rows1) <= set(range(32))
    total = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(rows1.values()) == total


def test_source_format_roundtrip_lossless(spark, sf_dir):
    """Demoted-from-driver format round-trip, now with the equality the
    rows-only driver row never checked: CSV/JSON/ORC read back with the
    explicit schema must produce IDENTICAL checksums to the parquet
    original on every column class (long, double, string, timestamp)."""
    from etlframwork_spark.operators.advanced import source_format_roundtrip

    rows = source_format_roundtrip(spark, sf_dir).collect()
    assert {r["format"] for r in rows} == {"parquet", "csv", "json", "orc"}
    ref = next(r for r in rows if r["format"] == "parquet")
    for r in rows:
        for col in ("n_rows", "sum_value_q", "type_crc", "ts_sum", "n_props"):
            assert r[col] == ref[col], (r["format"], col, r[col], ref[col])
