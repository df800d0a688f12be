#!/usr/bin/env python
"""Same-session interleaved A/B: standard scan+ship parse vs the
direct-pyarrow fused read+parse source (sources/direct.py).

The in-worker timer showed the JVM feed (row->Arrow conversion of the
list<int32> column) is the parse stage's non-scaling cost; the direct
source eliminates it by letting each worker read its parquet split with
pyarrow. This tool measures what that buys, A/B/A/B in one session per
core count (the only comparison shape era noise permits here).

Usage:  python tools/bench_direct_ab.py [--cores 32] [--passes 3]
Child:  python tools/bench_direct_ab.py _child <cores> <passes>
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOKENS = os.path.join(REPO, ".bench", "tokens_8000000")
SHM = "/dev/shm/dab" if os.path.isdir("/dev/shm") else "/tmp/dab"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _child(cores: int, passes: int):
    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.session import build_session
    from syslog_spark.sources.direct import parse_tokens_direct

    shutil.rmtree(SHM, ignore_errors=True)
    spark = build_session(
        app_name=f"dab{cores}",
        master=f"local[{cores},2]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            "spark.local.dir": f"{SHM}/local",
        },
    )
    tok = spark.read.parquet(TOKENS).select(
        "doc_id", "tokens", "n_tok", "source"
    )

    def std():
        enrich(parse_tokens(tok)).write.format("noop").mode(
            "overwrite").save()

    def direct():
        enrich(parse_tokens_direct(spark, TOKENS)).write.format(
            "noop").mode("overwrite").save()

    variants = [("std", std), ("direct", direct)]
    for name, f in variants:  # warm both lanes
        t0 = time.monotonic()
        f()
        log(f"  [{cores}] warm {name}: {time.monotonic() - t0:.2f}s")
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for p in range(passes):
        order = variants if p % 2 == 0 else variants[::-1]
        for name, f in order:
            t0 = time.monotonic()
            f()
            dt = time.monotonic() - t0
            times[name].append(dt)
            log(f"  [{cores}] pass{p} {name}: {dt:.2f}s")
    spark.stop()
    shutil.rmtree(SHM, ignore_errors=True)
    print("DAB " + json.dumps({"cores": cores, "times": times}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
        return
    import argparse
    import statistics

    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    cmd = [sys.executable, os.path.abspath(__file__), "_child",
           str(args.cores), str(args.passes)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{args.cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True)
    res = None
    for line in proc.stderr.splitlines():
        if line.startswith("  ["):
            log(line)
    for line in proc.stdout.splitlines():
        if line.startswith("DAB "):
            res = json.loads(line[4:])
    if res is None:
        log(proc.stderr[-3000:])
        raise SystemExit("child failed")
    t = res["times"]
    ratios = [round(d / s, 3) for d, s in zip(t["direct"], t["std"])]
    print(json.dumps({
        "cores": res["cores"],
        "std": {"best": round(min(t["std"]), 2),
                "median": round(statistics.median(t["std"]), 2)},
        "direct": {"best": round(min(t["direct"]), 2),
                   "median": round(statistics.median(t["direct"]), 2)},
        "direct_over_std_per_pass": ratios,
        "median_ratio": round(statistics.median(ratios), 3),
    }))


if __name__ == "__main__":
    main()
