"""Fast pre-commit / pre-snapshot smoke gate (<30s).

Round-4 postmortem: the end-of-round snapshot captured a half-finished
table.py hunk whose missing method broke every read of the flagship
table — 66 pytest failures, 5 driver-query errors, a crashed bench —
and nothing caught it because the final state was never re-executed.
This script is the guard: import the package, run one 2-epoch MERGE
round-trip (cow + a mor delta), one time-travel read, and the driver
entry. Exit 0 = the flagship path runs; anything else = DO NOT SNAPSHOT.

Usage: python scripts/smoke.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    t0 = time.monotonic()
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from etlframwork_spark.merge import merge_batch
    from etlframwork_spark.session import build_session
    from etlframwork_spark.table import SnapshotTable

    spark = build_session(master="local[4]", app_name="smoke")
    work = tempfile.mkdtemp(prefix="smoke_")
    try:
        schema = StructType(
            [
                StructField("k", StringType()),
                StructField("v", LongType()),
                StructField("lsn", LongType()),
            ]
        )
        table = SnapshotTable.create(
            os.path.join(work, "t"), schema, key_cols=["k"], order_col="lsn", num_buckets=4
        )
        ev_schema = StructType(schema.fields + [StructField("op", StringType())])
        batch1 = spark.createDataFrame(
            [(f"k{i}", i, i, "insert") for i in range(100)], ev_schema
        )
        merge_batch(spark, table, batch1, job_id="smoke", epoch_id=0)
        batch2 = spark.createDataFrame(
            [(f"k{i}", i * 10, 1000 + i, "update") for i in range(50)], ev_schema
        )
        merge_batch(spark, table, batch2, job_id="smoke", epoch_id=1, write_mode="mor")
        table.refresh()
        got = table.read(spark).agg(F.count("*"), F.sum("v")).collect()[0]
        want_sum = sum(i * 10 for i in range(50)) + sum(range(50, 100))
        assert got[0] == 100 and got[1] == want_sum, f"merge round-trip wrong: {got}"
        tt = table.read(spark, snapshot_id=1).count()
        assert tt == 100, f"time travel wrong: {tt}"

        # driver entry contract
        import __spark_entry__ as entry

        n = entry.entry(spark).count()
        assert n >= 0
        qs, oracles = entry.queries(), entry.oracle_sql()
        missing = [k for k in oracles if k not in qs]
        assert not missing, f"oracle_sql keys without queries(): {missing}"
        print(
            f"SMOKE OK in {time.monotonic() - t0:.1f}s — merge+mor+time-travel green, "
            f"entry()={n} rows, {len(qs)} queries / {len(oracles)} oracles registered"
        )
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
