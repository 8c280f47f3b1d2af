"""Entry point for ``spark-submit --py-files engine.zip main.py job.json``.

BASELINE.json:6 requires launch via spark-submit --py-files; package the
engine with ``scripts/package.sh`` (writes dist/engine.zip) and run e.g.:

    /opt/spark/bin/spark-submit --master local[32] \
        --py-files dist/engine.zip main.py examples/cdc_job.json
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="etlframwork_spark job runner")
    ap.add_argument("job", help="path to a job JSON spec (plans/job.py)")
    ap.add_argument("--master", default=None, help="override Spark master")
    args = ap.parse_args(argv)

    from etlframwork_spark.plans import JobSpec, run_job
    from etlframwork_spark.session import build_session

    spec = JobSpec.from_json(args.job)
    spark = build_session(master=args.master, app_name=f"etlframwork-{spec.job_id}")
    try:
        results = run_job(spark, spec)
        print(json.dumps({"job_id": spec.job_id, "steps": results}, default=str))
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
