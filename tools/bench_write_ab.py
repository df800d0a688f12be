#!/usr/bin/env python
"""Write-stage isolation A/B bench (round-3: attack parse_route_write).

Stages the PARSED table once (parse+enrich+sink-key+row_cs -> parquet on
tmpfs), then times ONLY the routed write (repartition -> partitionBy
parquet) under variant configs at 8 and 32 pinned CPUs. Same-era pairing:
each variant runs its two configs back-to-back, so the per-variant
efficiency is meaningful despite the box's cross-era 2x drift.

Pseudo-variants `scan` and `shuffle` split the write into sub-stages:
  scan    = read staged parquet -> noop
  shuffle = read -> repartition(n, sev, source, salt) -> noop
  base    = read -> repartition -> partitionBy parquet write (current prod)

Usage: python tools/bench_write_ab.py [variant ...]
Child: python tools/bench_write_ab.py _child <variant> <cores>
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
SHM = "/dev/shm/ab_write" if os.path.isdir("/dev/shm") else "/tmp/ab_write"
STAGED = f"{SHM}/staged"
REPS = int(os.environ.get("AB_REPS", "2"))

# variant -> (session extra conf, write options)
VARIANTS: dict[str, dict] = {
    "scan": {},
    "shuffle": {},
    "base": {},
    "v2commit": {
        "conf": {
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2"
        }
    },
    "files2": {"files_per_sink": 2},
    "files2_v2": {
        "files_per_sink": 2,
        "conf": {
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2"
        },
    },
    "uncomp": {
        "conf": {"spark.sql.parquet.compression.codec": "uncompressed"}
    },
    "zstd": {"conf": {"spark.sql.parquet.compression.codec": "zstd"}},
    "concwriters": {
        "conf": {"spark.sql.maxConcurrentOutputFileWriters": "128"}
    },
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _session(cores: int, extra: dict):
    from syslog_spark.session import build_session

    threads = cores - 4 if cores >= 16 else cores
    conf = {
        "spark.ui.showConsoleProgress": "false",
        "spark.driver.memory": "24g",
        "spark.shuffle.compress": "false",
        "spark.shuffle.spill.compress": "false",
        "spark.local.dir": f"{SHM}/local_{cores}",
        # staged table is one compact parquet dir; split it fine enough
        # that the scan feeding the exchange isn't the bottleneck (in the
        # real pipeline the map side is the 28-task parse stage)
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    }
    conf.update(extra)
    return build_session(
        app_name=f"ab{cores}",
        master=f"local[{threads},2]",
        shuffle_partitions=max(cores, 8),
        extra_conf=conf,
    )


def stage():
    if os.path.exists(os.path.join(STAGED, "_SUCCESS")):
        log(f"reusing staged parsed table {STAGED}")
        return
    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.operators.route import row_checksum, with_sink_key

    os.makedirs(SHM, exist_ok=True)
    spark = _session(32, {})
    t0 = time.monotonic()
    df = with_sink_key(
        enrich(parse_tokens(spark.read.parquet(TOKENS)))
    ).withColumn("row_cs", row_checksum())
    df.write.mode("overwrite").parquet(STAGED)
    log(f"staged parsed table in {time.monotonic() - t0:.1f}s")
    spark.stop()


def _child(variant: str, cores: int):
    from pyspark.sql import functions as F

    v = VARIANTS[variant]
    spark = _session(cores, v.get("conf", {}))
    par = spark.sparkContext.defaultParallelism
    files_per_sink = v.get("files_per_sink", max(2, par // 4))
    n = par * 2
    out = f"{SHM}/out_{variant}_{cores}"
    times = []
    for rep in range(REPS + 1):
        shutil.rmtree(out, ignore_errors=True)
        df = spark.read.parquet(STAGED)
        salt = F.pmod(F.xxhash64("doc_id"), F.lit(files_per_sink))
        t0 = time.monotonic()
        if variant == "scan":
            df.write.format("noop").mode("overwrite").save()
        elif variant == "shuffle":
            df.repartition(
                n, F.col("sink_severity"), F.col("source"), salt
            ).write.format("noop").mode("overwrite").save()
        else:
            (
                df.repartition(
                    n, F.col("sink_severity"), F.col("source"), salt
                )
                .write.mode("overwrite")
                .partitionBy("sink_severity", "source")
                .parquet(out)
            )
        dt = time.monotonic() - t0
        if rep > 0:
            times.append(dt)
        log(f"  [{variant}/{cores}cpu] rep{rep}: {dt:.2f}s")
    nfiles = 0
    for _root, _dirs, fs in os.walk(out):
        nfiles += sum(1 for f in fs if f.endswith(".parquet"))
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    print(
        "AB_RESULT "
        + json.dumps(
            {
                "variant": variant,
                "cores": cores,
                "best": round(min(times), 2),
                "times": [round(t, 2) for t in times],
                "files": nfiles,
            }
        ),
        flush=True,
    )


def run_child(variant: str, cores: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "_child", variant, str(cores)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in proc.stderr.splitlines():
        if line.startswith("  ["):
            log(line)
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    log(proc.stdout[-1500:])
    log(proc.stderr[-3000:])
    raise RuntimeError(f"child failed: {variant} cores={cores}")


def main():
    names = sys.argv[1:] or list(VARIANTS)
    stage()
    results = []
    for i, name in enumerate(names):
        order = (8, 32) if i % 2 == 0 else (32, 8)
        got = {}
        for c in order:
            got[c] = run_child(name, c)
        eff = (got[8]["best"] / got[32]["best"]) / 4.0
        row = {
            "variant": name,
            "t8": got[8]["best"],
            "t32": got[32]["best"],
            "eff": round(eff, 3),
            "files32": got[32]["files"],
        }
        results.append(row)
        log(f"== {name}: t8={row['t8']}s t32={row['t32']}s "
            f"eff={row['eff']} files32={row['files32']}")
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "_child":
        _child(sys.argv[2], int(sys.argv[3]))
    else:
        main()
