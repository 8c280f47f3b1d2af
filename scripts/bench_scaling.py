"""Two-cluster-size scaling evidence (BASELINE.json north rule: >=0.8
throughput scaling efficiency between N and 4N executors).

No real multi-node cluster exists in this sandbox, so — per the driver's
instruction — the same job runs at two parallelism levels (local[8] vs
local[32], i.e. N=8 cores vs 4N=32 cores) on the SAME input, each in a
fresh JVM subprocess. Efficiency = throughput(4N) / (4 * throughput(N)).

Writes/updates BENCH/BASELINE.md with the measured table.

    python scripts/bench_scaling.py [--events 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, events: int, resolve: str) -> dict:
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "bench_cdc.py"),
            "--cpus",
            str(cpus),
            "--events",
            str(events),
            "--resolve",
            resolve,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-4000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--resolve", default="maxby")
    args = ap.parse_args()

    lo = run_level(args.n, args.events, args.resolve)
    hi = run_level(4 * args.n, args.events, args.resolve)
    assert lo["state_digest"] == hi["state_digest"], "final states differ across parallelism!"
    assert lo["final_rows"] == hi["final_rows"]
    eff = hi["events_per_sec"] / (4 * lo["events_per_sec"])
    out = {
        "events": args.events,
        "resolve": args.resolve,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        "throughput_n": lo["events_per_sec"],
        "throughput_4n": hi["events_per_sec"],
        "seconds_n": lo["seconds"],
        "seconds_4n": hi["seconds"],
        "scaling_efficiency": round(eff, 3),
        "state_identical": True,
        "final_rows": lo["final_rows"],
        "measured_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured CDC replay throughput + scaling

Measured {out['measured_at']} on this sandbox (32-core host, single-JVM
local mode standing in for a multi-executor cluster per the driver's
instruction; fresh JVM per level, same seed-42 input log, identical
final state verified by row count + content-digest checksum).

| quantity | value |
|---|---|
| replay size | {args.events:,} change events (seed=42, 20% hot-repo skew, 5% deletes) |
| resolve strategy | {args.resolve} |
| throughput @ N = {args.n} cores (`local[{args.n}]`) | **{lo['events_per_sec']:,.0f} events/s** ({lo['seconds']:.1f}s) |
| throughput @ 4N = {4*args.n} cores (`local[{4*args.n}]`) | **{hi['events_per_sec']:,.0f} events/s** ({hi['seconds']:.1f}s) |
| scaling efficiency 4N vs N | **{eff:.2f}** (required >= 0.80) |
| final table rows | {lo['final_rows']:,} (identical at both levels) |
| state digest | {lo['state_digest']} (identical at both levels) |

Efficiency = throughput(4N) / (4 x throughput(N)).

Caveats (SURVEY.md §6): the north rule's nominal scale is 10^10 events on
a real N vs 4N-executor cluster; this sandbox evidences the criterion at
{args.events:,} events via two parallelism levels of the identical job, as
instructed. No extrapolation is claimed. Regenerate with
`python scripts/bench_scaling.py`.
"""
        )
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
