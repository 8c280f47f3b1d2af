"""Advanced relational operators that round 1 scoped out (SURVEY.md §2
J8 range/theta join, D4 grouped-agg UDAF, D5 UDTF) plus gap-based
sessionization — each as a driver-contract query with a DuckDB oracle.

Scale notes are per-operator; the common theme is that nothing here is
quadratic: the range join is bucketed to an equi-join, sessionization is
one shuffle on user_id, the UDAF runs on pre-shrunk Arrow groups, and
the UDTF is explicitly bounded (per-row Python is the demo of the
surface, not the hot path — SURVEY §2.10 keeps JVM functions for bulk
token work; see functions/text.py)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.io import load_table
from .cdc import _mark_built, _workdir
from .registry import query

# ------------------------------------------------------------------------ J8
# Range/theta join done the 100 TB way: equi-join on (user_id, coarse time
# bucket) with the exact range predicate applied AFTER co-location. The
# probe side explodes to the two buckets its window can overlap, so every
# qualifying pair meets in exactly one task and the join never degrades to
# a broadcast-nested-loop over the full table.
_WINDOW_MIN = 10


@query(
    "range_join_error_context",
    oracle=f"""
    SELECT e.event_id AS error_id,
           COUNT(c.event_id) AS n_clicks_before,
           COALESCE(CAST(SUM(CAST(round(c.value * 100, 0) AS BIGINT)) AS BIGINT), 0) AS click_value_q
    FROM events e LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL {_WINDOW_MIN} MINUTE
     AND c.ts < e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def range_join_error_context(spark, sf_dir):
    """J8: for every error event, the same user's click count/value in the
    preceding {10} minutes. DuckDB verifies with a plain theta join; the
    Spark plan buckets time so the theta term rides an equi shuffle."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / (60 * _WINDOW_MIN)).cast("long")
    errors = (
        ev.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            F.col("ts").alias("e_ts"),
            F.explode(F.array(bucket, bucket - 1)).alias("tb"),
        )
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("c_ts"),
        F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("value_q"),
        bucket.alias("tb"),
    )
    # The range predicate must live IN the left-join condition (matching
    # the oracle's ON clause), not as a post-join filter: a filter would
    # silently DROP an error whose bucket-joined clicks all fall outside
    # the window (e.g. one click after the error in its bucket, one before
    # the window in the previous bucket), where the correct result is a
    # row with count 0. Catalyst still extracts the two equality terms as
    # the join keys; the range term evaluates after co-location.
    cond = (
        (errors["user_id"] == clicks["user_id"])
        & (errors["tb"] == clicks["tb"])
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(f"INTERVAL {_WINDOW_MIN} MINUTES"))
        & (F.col("c_ts") < F.col("e_ts"))
    )
    pairs = errors.join(clicks, cond, "left")
    # the 2-bucket explode can match the same click twice only if the two
    # buckets coincide (never: b != b-1); a click pairs via exactly one
    # bucket value, so no dedup is needed. Each error contributes 2
    # exploded rows (possibly both unmatched -> nulls); the aggregate
    # collapses them and counts only real matches.
    return pairs.groupBy("error_id").agg(
        F.count("c_ts").alias("n_clicks_before"),
        F.coalesce(F.sum("value_q"), F.lit(0)).cast("long").alias("click_value_q"),
    )


# ------------------------------------------------------------ sessionization
_GAP_MIN = 30


@query(
    "events_sessionize",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, ts,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, event_id, ts,
               SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
        FROM o
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS span_sec
    FROM s GROUP BY user_id, session_no
    """,
)
def events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity splits): lag -> start
    flag -> running sum = session number -> per-session rollup. One
    shuffle on user_id; every window reuses the same partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # microsecond-exact timestamp comparison (matches the oracle's
    # `ts - LAG(ts) > INTERVAL 30 MINUTE`); unix_timestamp() would
    # floor to seconds and disagree on gaps in the (1800s, 1801s) band
    is_new = F.col("ts") > prev + F.expr(f"INTERVAL {_GAP_MIN} MINUTES")
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(prev.isNull() | is_new, 1).otherwise(0).alias("is_start"),
    )
    sess = flagged.withColumn(
        "session_no", F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).cast("long").alias("span_sec"),
    )


# ------------------------------------------------------------------------ D4
@query(
    "grouped_udaf_value_stats",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vq FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(median(vq) AS DOUBLE) AS median_q,
           CAST(SUM(vq) AS BIGINT) AS sum_q
    FROM q GROUP BY event_type
    """,
)
def grouped_udaf_value_stats(spark, sf_dir):
    """D4 grouped-agg UDAF surface: per-group MEDIAN via applyInPandas
    (median is not decomposable, i.e. a genuine custom aggregate). Values
    are integer-quantized first so the even-count midpoint average is the
    same exact double in pandas and DuckDB. Arrow-batched; groups arrive
    pre-shuffled once."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("vq")
    )
    out_schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("n", LongType()),
            StructField("median_q", DoubleType()),
            StructField("sum_q", LongType()),
        ]
    )

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["vq"].sort_values().reset_index(drop=True)
        n = len(v)
        mid = n // 2
        median = float(v[mid]) if n % 2 else (float(v[mid - 1]) + float(v[mid])) / 2.0
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n": [n],
                "median_q": [median],
                "sum_q": [int(v.sum())],
            }
        )

    return ev.groupBy("event_type").applyInPandas(stats, schema=out_schema)


# ------------------------------------------------------------------------ A6
@query(
    "percentiles_event_value",
    oracle="""
    WITH q AS (
        SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS vq FROM events
    )
    SELECT event_type,
           quantile_cont(vq, 0.5) AS p50,
           quantile_cont(vq, 0.9) AS p90,
           quantile_cont(vq, 0.99) AS p99,
           CAST(MAX(vq) AS BIGINT) AS vmax
    FROM q GROUP BY event_type
    """,
)
def percentiles_event_value(spark, sf_dir):
    """Exact percentiles per group (A-class agg widening): Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the standard
    (n-1)*p linear interpolation, and on integer-quantized inputs the
    interpolation arithmetic is bit-identical in double (verified at
    sf0.01 before shipping). The exact sort-based percentile is the
    correctness baseline; approx_percentile (t-digest, rows-only) is the
    scale path for wide-key cardinalities."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("vq")
    )
    return ev.groupBy("event_type").agg(
        F.expr("percentile(vq, 0.5)").alias("p50"),
        F.expr("percentile(vq, 0.9)").alias("p90"),
        F.expr("percentile(vq, 0.99)").alias("p99"),
        F.max("vq").alias("vmax"),
    )


def approx_sketches_events(spark, sf_dir):
    """The constant-memory sketch aggregates — the scale path for
    monitoring at 10^10 rows where exact variants sort or hash the world:
    approx_count_distinct (HLL, A3) and approx_percentile (A6) in one
    pass. Sketch estimates are engine-specific, so no SQL oracle exists;
    accuracy is PINNED against the exact twins (distinct_counts,
    percentiles_event_value) with explicit error bounds in
    tests/test_queries.py::test_sketches_within_error_bounds — stronger
    evidence than the rows-only driver row this occupied through round 4
    (demoted in round 5: the driver window is 50 queries and the
    oracle-paired rename-evolution gate takes the slot)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.expr("CAST(round(value * 100, 0) AS BIGINT)").alias("vq")
    )
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.expr("approx_percentile(vq, 0.5, 10000)").cast("double").alias("p50"),
        F.expr("approx_percentile(vq, 0.9, 10000)").cast("double").alias("p90"),
        F.expr("approx_percentile(vq, 0.99, 10000)").cast("double").alias("p99"),
    )


# ------------------------------------------------------------------------ D5
@query(
    "udtf_token_explode",
    oracle="""
    SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.token
    FROM (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM documents WHERE doc_id < 20
    ), LATERAL (
        SELECT UNNEST(generate_series(1, len(toks))) - 1 AS pos,
               UNNEST(toks) AS token
    ) u
    """,
)
def udtf_token_explode(spark, sf_dir):
    """D5 UDTF surface: a Python user-defined TABLE function exploding a
    document into (pos, token) rows via a lateral join. Deliberately
    bounded to 20 docs — the UDTF is the API demonstration; bulk token
    work stays JVM-side (posexplode/split, functions/text.py)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, token: string")
    class TokenExplode:
        def eval(self, text: str):
            for i, tok in enumerate(text.strip().split()):
                yield i, tok

    spark.udtf.register("token_explode", TokenExplode)
    load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT doc_id, t.pos, t.token FROM docs_for_udtf, LATERAL token_explode(text) t"
    )


# ------------------------------------------------------------ source formats
def source_format_roundtrip(spark, sf_dir):
    """S-class format coverage beyond parquet: the events table is written
    once to CSV, JSON and ORC (session workdir), read back with the
    EXPLICIT envelope schema (never inference — SURVEY §1.3), and every
    round-trip is checksummed against the parquet original. Equal
    rows/checksums in all four rows of the output prove the readers are
    lossless on every column class the testdata exercises (long, double,
    string, timestamp). Avro needs the spark-avro jar (absent here); its
    seam fails actionably — see sources.avro_reader.

    Demoted from the driver's 50-query window in round 5 (the
    oracle-paired cdc_delete_where_state takes the slot). The pytest
    replacement is STRONGER than the rows-only driver row ever was: the
    driver only tracked row-count stability, while
    tests/test_queries.py::test_source_format_roundtrip_lossless asserts
    the four format checksums are byte-identical."""
    import os

    ev = load_table(spark, sf_dir, "events")
    schema = ev.schema
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"fmt_roundtrip_{sf_tag}"
    work, built = _workdir(name)
    csv_dir, json_dir = os.path.join(work, "csv"), os.path.join(work, "json")
    orc_dir = os.path.join(work, "orc")
    if not built:
        ev.write.option("header", True).mode("overwrite").csv(csv_dir)
        ev.write.mode("overwrite").json(json_dir)
        ev.write.mode("overwrite").orc(orc_dir)
        _mark_built(name, work)
    readers = {
        "parquet": ev,
        "csv": spark.read.schema(schema).option("header", True).csv(csv_dir),
        "json": spark.read.schema(schema).json(json_dir),
        "orc": spark.read.schema(schema).orc(orc_dir),
    }
    outs = []
    for fmt, df in readers.items():
        outs.append(
            df.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.expr("CAST(round(value * 100, 0) AS BIGINT)")).alias("sum_value_q"),
                F.sum(F.crc32(F.col("event_type"))).alias("type_crc"),
                F.sum(F.unix_timestamp("ts")).alias("ts_sum"),
                F.count("props").alias("n_props"),
            ).select(F.lit(fmt).alias("format"), "*")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("format")
