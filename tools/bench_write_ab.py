#!/usr/bin/env python
"""Write-stage isolation A/B bench (round-3: attack parse_route_write).

Stages the PARSED table once (parse+enrich+sink-key+row_cs -> parquet on
tmpfs), then times ONLY the routed write (repartition -> partitionBy
parquet) under variant configs.

Noise discipline (this VM drifts 2-5x across eras): ALL variants run
inside ONE Spark session per core count, interleaved over R rounds
(v1 v2 v3 / v1 v2 v3 / ...), and each variant scores its MEDIAN across
rounds — so every cross-variant comparison is same-era. Every knob is
togglable per-write: committer algorithm via sc.hadoopConfiguration,
codec via DataFrameWriter.option, concurrent writers via runtime SQL
conf, salt count via our own argument.

Sub-stage pseudo-variants: `scan` (read->noop) and `shuffle`
(read->repartition->noop) split the write stage per era.

Usage: python tools/bench_write_ab.py [rounds]   (runs 8 then 32 CPUs)
Child: python tools/bench_write_ab.py _child <cores> <rounds>
"""
from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOKENS = os.path.join(REPO, ".bench", "tokens_8000000")
SHM = "/dev/shm/ab_write" if os.path.isdir("/dev/shm") else "/tmp/ab_write"
STAGED = f"{SHM}/staged"

VARIANTS = [
    "scan", "shuffle", "base", "v2commit", "files2", "uncomp", "concw",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _session(cores: int):
    from syslog_spark.session import build_session

    threads = cores - 4 if cores >= 16 else cores
    return build_session(
        app_name=f"ab{cores}",
        master=f"local[{threads},2]",
        shuffle_partitions=max(cores, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.local.dir": f"{SHM}/local_{cores}",
            # split the compact staged table fine enough that the scan
            # feeding the exchange isn't the bottleneck (in the real
            # pipeline the map side is the wide parse stage)
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
        },
    )


def stage():
    if os.path.exists(os.path.join(STAGED, "_SUCCESS")):
        log(f"reusing staged parsed table {STAGED}")
        return
    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.operators.route import row_checksum, with_sink_key

    os.makedirs(SHM, exist_ok=True)
    spark = _session(32)
    t0 = time.monotonic()
    df = with_sink_key(
        enrich(parse_tokens(spark.read.parquet(TOKENS)))
    ).withColumn("row_cs", row_checksum())
    df.write.mode("overwrite").parquet(STAGED)
    log(f"staged parsed table in {time.monotonic() - t0:.1f}s")
    spark.stop()


def _one_write(spark, variant: str, out: str, par: int):
    from pyspark.sql import functions as F

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set(
        "mapreduce.fileoutputcommitter.algorithm.version",
        "2" if variant == "v2commit" else "1",
    )
    spark.conf.set(
        "spark.sql.maxConcurrentOutputFileWriters",
        "128" if variant == "concw" else "0",
    )
    files_per_sink = 2 if variant == "files2" else max(2, par // 4)
    n = par * 2
    df = spark.read.parquet(STAGED)
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(files_per_sink))
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    if variant == "scan":
        df.write.format("noop").mode("overwrite").save()
    elif variant == "shuffle":
        df.repartition(
            n, F.col("sink_severity"), F.col("source"), salt
        ).write.format("noop").mode("overwrite").save()
    else:
        w = df.repartition(
            n, F.col("sink_severity"), F.col("source"), salt
        ).write.mode("overwrite").partitionBy("sink_severity", "source")
        if variant == "uncomp":
            w = w.option("compression", "uncompressed")
        w.parquet(out)
    return time.monotonic() - t0


def _child(cores: int, rounds: int):
    spark = _session(cores)
    par = spark.sparkContext.defaultParallelism
    out = f"{SHM}/out_{cores}"
    # warm-up: python-worker-free job, but JIT/codegen/committer paths
    _one_write(spark, "base", out, par)
    times: dict[str, list[float]] = {v: [] for v in VARIANTS}
    for rnd in range(rounds):
        for v in VARIANTS:
            dt = _one_write(spark, v, out, par)
            times[v].append(dt)
            log(f"  [{cores}cpu rnd{rnd}] {v:10s} {dt:6.2f}s")
    shutil.rmtree(out, ignore_errors=True)
    spark.stop()
    med = {v: round(statistics.median(ts), 2) for v, ts in times.items()}
    print(
        "AB_RESULT " + json.dumps({"cores": cores, "median": med, "all": {
            v: [round(t, 2) for t in ts] for v, ts in times.items()}}),
        flush=True,
    )


def run_child(cores: int, rounds: int) -> dict:
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "_child", str(cores), str(rounds),
    ]
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
    raise RuntimeError(f"child failed: cores={cores}")


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    stage()
    r8 = run_child(8, rounds)
    r32 = run_child(32, rounds)
    rows = []
    for v in VARIANTS:
        t8, t32 = r8["median"][v], r32["median"][v]
        rows.append({
            "variant": v, "t8": t8, "t32": t32,
            "eff": round((t8 / t32) / 4.0, 3) if t32 else None,
        })
        log(f"== {v:10s} t8={t8:6.2f} t32={t32:6.2f} eff={rows[-1]['eff']}")
    print(json.dumps({"rows": rows, "raw8": r8["all"], "raw32": r32["all"]},
                     indent=1), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        main()
