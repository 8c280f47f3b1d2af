"""Two-cluster-size scaling evidence (BASELINE.json north rule: >=0.8
throughput scaling efficiency between N and 4N executors).

No real multi-node cluster exists in this sandbox, so — per the driver's
instruction — the same job runs at two parallelism levels (N and 4N
cores) on the SAME input. Methodology that makes the comparison honest:

- fresh JVM subprocess per level (no heap/JIT carry-over);
- CPU pinning via taskset: ``local[N]`` alone only caps concurrent TASKS
  — JVM GC/shuffle/netty threads would still spill onto the other 24
  cores and inflate the small level's throughput, understating true
  scaling. Pinning N cores makes "N cores" literal, like an N-core
  executor host;
- shuffle + table dirs on tmpfs: on one shared disk, 4N concurrent
  writers contend on the device and the measurement becomes a disk
  benchmark (a real cluster scales disks with executors);
- per-pipeline JIT warmup inside each level (bench_cdc.py);
- identical final state asserted via row count + content-digest checksum;
- a long replay (default 32M events) so per-epoch serial driver work
  (offset planning, manifest commits) amortizes — on short runs Amdahl's
  serial fraction dominates and no configuration can show scaling.

Writes/updates BENCH/BASELINE.md with the measured table.

    python scripts/bench_scaling.py [--events 32000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, events: int, resolve: str, files: int, trigger: int, pin: bool) -> dict:
    env = dict(os.environ)
    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    os.makedirs("/dev/shm/cdc-bench", exist_ok=True)
    env.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/spark-local")
    env.setdefault("TMPDIR", "/dev/shm/cdc-bench")
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "bench_cdc.py"),
        "--cpus", str(cpus),
        "--events", str(events),
        "--resolve", resolve,
        "--files", str(files),
        "--files-per-trigger", str(trigger),
    ]
    if pin:
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, cwd=REPO, env=env)
    if r.returncode != 0:
        raise RuntimeError(r.stderr[-4000:])
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=32_000_000)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--resolve", default="maxby")
    ap.add_argument("--files", type=int, default=128)
    ap.add_argument("--trigger", type=int, default=64)
    ap.add_argument("--no-pin", action="store_true")
    args = ap.parse_args()

    pin = not args.no_pin
    lo = run_level(args.n, args.events, args.resolve, args.files, args.trigger, pin)
    hi = run_level(4 * args.n, args.events, args.resolve, args.files, args.trigger, pin)
    assert lo["state_digest"] == hi["state_digest"], "final states differ across parallelism!"
    assert lo["final_rows"] == hi["final_rows"]
    tp_lo = lo.get("steady_events_per_sec") or lo["events_per_sec"]
    tp_hi = hi.get("steady_events_per_sec") or hi["events_per_sec"]
    eff = tp_hi / (4 * tp_lo)
    out = {
        "events": args.events,
        "resolve": args.resolve,
        "n_cores": args.n,
        "4n_cores": 4 * args.n,
        "throughput_n": tp_lo,
        "throughput_4n": tp_hi,
        "overall_throughput_n": lo["events_per_sec"],
        "overall_throughput_4n": hi["events_per_sec"],
        "seconds_n": lo["seconds"],
        "seconds_4n": hi["seconds"],
        "scaling_efficiency": round(eff, 3),
        "state_identical": True,
        "final_rows": lo["final_rows"],
        "pinned": pin,
        "measured_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
    }
    print(json.dumps(out))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(
            f"""# BENCH/BASELINE.md — measured CDC replay throughput + scaling

Measured {out['measured_at']} on this sandbox (32-core host; fresh JVM
per level; taskset-pinned to exactly N / 4N cores; shuffle+table dirs on
tmpfs; same seed-42 input log; identical final state verified by row
count + content-digest checksum). See scripts/bench_scaling.py for the
full methodology and why each control exists.

| quantity | value |
|---|---|
| replay size | {args.events:,} change events (seed=42, 20% hot-repo skew, 5% deletes, ~800B contents) |
| resolve strategy | {args.resolve} |
| steady-state throughput @ N = {args.n} cores | **{tp_lo:,.0f} events/s** (overall {lo['events_per_sec']:,.0f}, wall {lo['seconds']:.1f}s) |
| steady-state throughput @ 4N = {4*args.n} cores | **{tp_hi:,.0f} events/s** (overall {hi['events_per_sec']:,.0f}, wall {hi['seconds']:.1f}s) |
| scaling efficiency 4N vs N | **{eff:.2f}** (target >= 0.80) |
| final table rows | {lo['final_rows']:,} (identical at both levels) |
| state digest | {lo['state_digest']} (identical at both levels) |

Efficiency = steady throughput(4N) / (4 x steady throughput(N)); steady
excludes the first micro-batch (JVM JIT + page-cache warm-up) — the
regime that matters for a 10^10-event replay, where warm-up is a
rounding error. Per-epoch seconds: N={lo['epoch_seconds']},
4N={hi['epoch_seconds']}.

Caveats (SURVEY.md §6): the north rule's nominal scale is 10^10 events on
a real N-vs-4N-executor cluster; this sandbox evidences the criterion at
{args.events:,} events via two pinned parallelism levels of the identical
job, per the driver's instruction. No extrapolation is claimed.
Regenerate with `python scripts/bench_scaling.py`.
"""
        )
    print(f"wrote {md}", file=sys.stderr)


if __name__ == "__main__":
    main()
