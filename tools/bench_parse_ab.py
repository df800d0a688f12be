#!/usr/bin/env python
"""Parse-stage A/B at 32 pinned CPUs: worker-thread count x Arrow batch.

parse+enrich -> noop (no shuffle, no write): the kernel-bound stage whose
Spark-side efficiency (0.55-0.61) sits below the measured process-kernel
ceiling (0.71+). Mirror-ordered double pass (A..Z then Z..A) cancels
linear era drift; per-config score is the mean of its two passes' bests.

Usage: python tools/bench_parse_ab.py
Child: python tools/bench_parse_ab.py _child <threads> <batch>
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
SHM = "/dev/shm/ab_parse" if os.path.isdir("/dev/shm") else "/tmp/ab_parse"

CONFIGS = [(28, 32768), (24, 32768), (32, 32768), (28, 65536), (28, 16384)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _child(threads: int, batch: int):
    from syslog_spark.session import build_session
    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens

    shutil.rmtree(SHM, ignore_errors=True)
    spark = build_session(
        app_name=f"pab{threads}_{batch}",
        master=f"local[{threads},2]",
        shuffle_partitions=32,
        arrow_batch_rows=batch,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            "spark.local.dir": f"{SHM}/local",
        },
    )
    tok = spark.read.parquet(TOKENS)
    times = []
    for rep in range(3):  # rep0 warm
        t0 = time.monotonic()
        enrich(parse_tokens(tok)).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if rep:
            times.append(dt)
        log(f"  [{threads}t/{batch}] rep{rep}: {dt:.2f}s")
    spark.stop()
    shutil.rmtree(SHM, ignore_errors=True)
    print("PAB " + json.dumps(
        {"threads": threads, "batch": batch, "best": round(min(times), 2)}),
        flush=True)


def run(threads: int, batch: int) -> float:
    cmd = [sys.executable, os.path.abspath(__file__),
           "_child", str(threads), str(batch)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", "0-31"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in proc.stderr.splitlines():
        if line.startswith("  ["):
            log(line)
    for line in proc.stdout.splitlines():
        if line.startswith("PAB "):
            return json.loads(line[4:])["best"]
    log(proc.stderr[-2000:])
    raise RuntimeError(f"child failed {threads}/{batch}")


def main():
    results: dict[tuple, list] = {c: [] for c in CONFIGS}
    for order in (CONFIGS, list(reversed(CONFIGS))):
        for c in order:
            results[c].append(run(*c))
            log(f"== {c}: {results[c][-1]}s")
    out = [
        {"threads": t, "batch": b,
         "mean_best": round(sum(v) / len(v), 2), "passes": v}
        for (t, b), v in results.items()
    ]
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
