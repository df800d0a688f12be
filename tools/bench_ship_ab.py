#!/usr/bin/env python
"""Same-session interleaved A/B: token ship width through mapInArrow.

Hypothesis (round-4): the in-Spark parse stage moves ~4x the bytes the
bare kernel does — parquet-decoded list<int32> tokens cross the
JVM->Python Arrow socket at 4 bytes/token although every token is a
byte. On a bandwidth-saturated 32-core config that extra DRAM/socket
traffic is a prime suspect for the 0.55-vs-0.80 efficiency gap.

Variants (single Spark session, strict A/B/A/B interleave, mirror-order
second pass — the only comparison shape that survives this box's 2-11x
era noise):

  base : parse_tokens as-is (list<int32> shipped).
  i16  : tokens cast to array<smallint> in the JVM (pure codegen Cast,
         exact for byte values, raises on >32767 garbage) before
         mapInArrow — halves the shipped token bytes.

Usage:  python tools/bench_ship_ab.py [--cores 32] [--passes 2]
Child:  python tools/bench_ship_ab.py _child <cores> <passes>
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
SHM = "/dev/shm/sab" if os.path.isdir("/dev/shm") else "/tmp/sab"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _child(cores: int, passes: int):
    from pyspark.sql import functions as F

    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.session import build_session

    shutil.rmtree(SHM, ignore_errors=True)
    spark = build_session(
        app_name=f"sab{cores}",
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
    tok16 = tok.withColumn("tokens", F.col("tokens").cast("array<smallint>"))

    def run(df):
        enrich(parse_tokens(df)).write.format("noop").mode(
            "overwrite").save()

    variants = [("base", tok), ("i16", tok16)]
    # warm both lanes (page cache + worker fork + codegen)
    for name, df in variants:
        t0 = time.monotonic()
        run(df)
        log(f"  [{cores}] warm {name}: {time.monotonic() - t0:.2f}s")
    times: dict[str, list[float]] = {n: [] for n, _ in variants}
    for p in range(passes):
        order = variants if p % 2 == 0 else variants[::-1]
        for name, df in order:
            t0 = time.monotonic()
            run(df)
            dt = time.monotonic() - t0
            times[name].append(dt)
            log(f"  [{cores}] pass{p} {name}: {dt:.2f}s")
    spark.stop()
    shutil.rmtree(SHM, ignore_errors=True)
    print("SAB " + json.dumps({"cores": cores, "times": times}), flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
        return
    import argparse
    import statistics

    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--passes", type=int, default=2)
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
        if line.startswith("SAB "):
            res = json.loads(line[4:])
    if res is None:
        log(proc.stderr[-3000:])
        raise SystemExit("child failed")
    t = res["times"]
    summary = {
        n: {"best": round(min(v), 2), "median": round(statistics.median(v), 2)}
        for n, v in t.items()
    }
    # per-pass ratio (same-era pairing): i16 / base
    ratios = [round(a / b, 3) for a, b in zip(t["i16"], t["base"])]
    print(json.dumps({"cores": res["cores"], "summary": summary,
                      "i16_over_base_per_pass": ratios,
                      "median_ratio": round(statistics.median(ratios), 3)}))


if __name__ == "__main__":
    main()
