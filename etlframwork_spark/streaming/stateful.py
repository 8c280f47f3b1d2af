"""Custom stateful streaming operator: per-key LSN continuity monitor.

Demonstrates the engine's ``applyInPandasWithState`` surface (the tool
for stateful operators Spark lacks built-in) on a CDC-native concern:
per repo, track across micro-batches the running event count, the max
LSN seen, and how many LSNs in the observed range never arrived
("gaps" — a binlog-tail health signal; a persistent gap means the WAL
reader skipped offsets).

State is Arrow-serialized per key and persisted in the streaming state
store (survives restarts via the checkpoint); the per-group fold is a
vectorized pandas reduction — no per-row Python.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

MONITOR_OUTPUT = StructType(
    [
        StructField("repo", StringType()),
        StructField("events_total", LongType()),
        StructField("min_lsn", LongType()),
        StructField("max_lsn", LongType()),
        StructField("missing_in_range", LongType()),  # (max-min+1) - distinct seen
    ]
)

# state: distinct-LSN count + bounds (exact distinct via per-batch nunique is
# an approximation across batches if the same lsn recurs in later batches;
# CDC LSNs are delivered at-least-once, so we track a conservative count)
MONITOR_STATE = StructType(
    [
        StructField("events_total", LongType()),
        StructField("distinct_seen", LongType()),
        StructField("min_lsn", LongType()),
        StructField("max_lsn", LongType()),
        StructField("last_batch_max", LongType()),
    ]
)


def _monitor(
    key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, distinct, lo, hi, last_max = (
        state.get if state.exists else (0, 0, None, None, None)
    )
    for pdf in pdfs:
        lsns = pdf["lsn"]
        total += len(lsns)
        # new distinct LSNs strictly above everything previously seen are
        # exactly countable; re-deliveries at/below last_batch_max are not
        # double-counted (conservative for gap estimation)
        fresh = lsns if last_max is None else lsns[lsns > last_max]
        distinct += int(fresh.nunique())
        bmin, bmax = int(lsns.min()), int(lsns.max())
        lo = bmin if lo is None else min(lo, bmin)
        hi = bmax if hi is None else max(hi, bmax)
        last_max = hi
    state.update((total, distinct, lo, hi, last_max))
    missing = (hi - lo + 1) - distinct if lo is not None else 0
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "events_total": [total],
            "min_lsn": [lo],
            "max_lsn": [hi],
            "missing_in_range": [max(0, missing)],
        }
    )


def lsn_gap_monitor(stream: DataFrame, key_col: str = "repo", output_mode: str = "append") -> DataFrame:
    """Attach the stateful monitor to a CDC event stream.

    ``append`` emits one health row per key per micro-batch (latest =
    max events_total) and works with file sinks + checkpoint recovery;
    ``update`` suits in-memory dashboards."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _monitor,
        outputStructType=MONITOR_OUTPUT,
        stateStructType=MONITOR_STATE,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
