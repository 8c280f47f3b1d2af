"""T5: streaming tumbling-window metrics with watermark — emitted windows
must match pandas ground truth; watermark finalizes old windows across
micro-batches."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from etlframwork_spark.sources.io import TABLE_SCHEMAS
from etlframwork_spark.streaming.metrics_stream import run_metrics_stream


def test_windowed_counts_match_pandas(spark, sf_dir, tmp_path):
    src = pq.read_table(os.path.join(sf_dir, "events.parquet")).to_pandas()
    src = src.sort_values("ts").reset_index(drop=True)
    events_dir = tmp_path / "events"
    events_dir.mkdir()
    # 4 time-ordered segments -> 4 micro-batches -> watermark advances
    chunk = len(src) // 4
    for i in range(4):
        seg = src.iloc[i * chunk : (i + 1) * chunk if i < 3 else len(src)]
        pq.write_table(pa.Table.from_pandas(seg, preserve_index=False), str(events_dir / f"seg-{i:03d}.parquet"))
        time.sleep(0.05)  # distinct mtimes -> stable discovery order

    out = tmp_path / "win_out"
    run_metrics_stream(
        spark,
        str(events_dir),
        TABLE_SCHEMAS["events"],
        ts_col="ts",
        out_dir=str(out),
        checkpoint_dir=str(tmp_path / "ckpt"),
        window_duration="1 day",
        watermark="1 day",
        extra_keys=["event_type"],
    )
    got = spark.read.parquet(str(out)).toPandas()
    assert len(got) > 0, "no windows finalized"
    # ground truth: per-day, per-type counts
    truth = (
        src.assign(day=src["ts"].dt.floor("D"))
        .groupby(["day", "event_type"])
        .size()
        .to_dict()
    )
    for r in got.itertuples(index=False):
        day = pd.Timestamp(r.window_start)
        assert truth[(day, r.event_type)] == r.n_events, (day, r.event_type)
    # watermark must have finalized a decent share of the month
    days_emitted = got["window_start"].nunique()
    assert days_emitted >= 10
