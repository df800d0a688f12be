#!/usr/bin/env python
"""Same-session interleaved A/B: inline minhash signature (shingle-hash
subtree repeated inside all 64 array_min folds) vs the hoisted form
(shingle_hashes materialized in its own projection, folds reference the
column).

HOFs are CodegenFallback and interpreted Catalyst does not CSE the
repeated nested subtree (round-1 serializer lesson, 2x measured there);
this tool measures what the hoist buys on the minhash corpus scan and
asserts both forms produce identical signatures (xor checksum).

Usage:  python tools/bench_minhash_ab.py [--cores 32] [--passes 3]
Child:  python tools/bench_minhash_ab.py _child <cores> <passes>
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _child(cores: int, passes: int):
    from pyspark.sql import functions as F

    from syslog_spark.operators.dedup import (
        _signature_from_hashes, minhash_signature, shingle_hashes,
    )
    from syslog_spark.session import build_session

    spark = build_session(
        app_name=f"mhab{cores}",
        master=f"local[{cores},2]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
        },
    )
    docs = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).select("doc_id", "text")

    def consume(sig_df):
        row = sig_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("sig")).alias("cs"),
        ).first()
        return (row["n"], row["cs"])

    def inline():
        return consume(
            docs.select(minhash_signature("text").alias("sig"))
        )

    def hoisted():
        return consume(
            docs.select(shingle_hashes("text").alias("_sh"))
            .select(_signature_from_hashes(F.col("_sh")).alias("sig"))
        )

    # warm both (code paths + file cache), checksum equality gate
    a_cs, b_cs = inline(), hoisted()
    assert a_cs == b_cs, f"signature mismatch: {a_cs} vs {b_cs}"
    results = {"inline": [], "hoisted": []}
    for p in range(passes):
        order = (
            [("inline", inline), ("hoisted", hoisted)]
            if p % 2 == 0
            else [("hoisted", hoisted), ("inline", inline)]
        )
        for name, fn in order:
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            results[name].append(dt)
            log(f"  [{cores}] pass{p} {name}: {dt:.2f}s")
    ratios = [h / i for h, i in zip(results["hoisted"], results["inline"])]
    print(json.dumps({
        "cores": cores,
        "rows": a_cs[0],
        "inline": {"best": round(min(results["inline"]), 2),
                   "median": round(statistics.median(results["inline"]), 2)},
        "hoisted": {"best": round(min(results["hoisted"]), 2),
                    "median": round(statistics.median(results["hoisted"]), 2)},
        "hoisted_over_inline_per_pass": [round(r, 3) for r in ratios],
        "median_ratio": round(statistics.median(ratios), 3),
    }))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
        return
    cores, passes = 32, 3
    args = sys.argv[1:]
    if "--cores" in args:
        cores = int(args[args.index("--cores") + 1])
    if "--passes" in args:
        passes = int(args[args.index("--passes") + 1])
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable,
           os.path.abspath(__file__), "_child", str(cores), str(passes)]
    r = subprocess.run(cmd, text=True, capture_output=True, timeout=1800)
    sys.stderr.write(r.stderr[-4000:])
    if r.returncode != 0:
        sys.exit(r.returncode)
    print(r.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
