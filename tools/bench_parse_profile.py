#!/usr/bin/env python
"""Decompose the in-Spark parse stage to find the non-scaling term.

The round-3 puzzle: the mapInArrow parse stage pairs at ~0.55 efficiency
(8 -> 32 pinned CPUs) while the SAME Arrow kernel in bare pinned
processes reaches ~0.80 in the same era. This tool splits the Spark
stage into additive layers, each run over the same 8M-row token parquet
to a noop sink, per core count, in ONE child session (so the layers are
same-era by construction):

  scan   : parquet scan of the 4 input columns, pure JVM — no Python.
  ship   : scan + Arrow IPC JVM->Python crossing (passthrough python fn
           that only counts rows) + empty result return.
  touch  : ship + one full read pass over the token values buffer in
           numpy (memory-bandwidth floor of actually LOOKING at data).
  detok  : touch-equivalent plus detokenize_array (list<int32> -> str).
  parse  : the full parse stage (detok + fastpath kernel + merge).
  direct : the fused pyarrow read+parse source (sources/direct.py) —
           same kernel, no JVM feed; its in-worker kernel seconds land
           in the same timing files as `parse`.

Efficiency of layer X = (t8[X] / t32[X]) / 4. The layer where efficiency
collapses is the culprit; kernel-era probes (bench_kernel) bracket the
whole run so era drift is visible.

Usage: python tools/bench_parse_profile.py [--cores 8,32] [--reps 2]
Child: python tools/bench_parse_profile.py _child <cores> <reps>
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
SHM = "/dev/shm/ppf" if os.path.isdir("/dev/shm") else "/tmp/ppf"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _mk_ship_fn(touch: bool, detok: bool):
    import numpy as np
    import pyarrow as pa

    from syslog_spark.operators.parse import detokenize_array

    def fn(batches):
        total = 0
        acc = 0
        for b in batches:
            total += b.num_rows
            if detok:
                lines = detokenize_array(b.column("tokens"))
                acc += len(lines)
            elif touch:
                tok = b.column("tokens")
                if isinstance(tok, pa.ChunkedArray):
                    tok = tok.combine_chunks()
                flat = tok.flatten()
                # one full linear pass over the values buffer: the
                # memory-bandwidth floor of actually reading the data
                acc += int(
                    np.frombuffer(flat.buffers()[1], np.int32, len(flat))
                    .sum(dtype=np.int64)
                )
        yield pa.RecordBatch.from_arrays(
            [pa.array([total + (acc % 2)], pa.int64())], ["rows"]
        )

    return fn


def _child(cores: int, reps: int):
    import glob

    import pyarrow as pa  # noqa: F401
    from pyspark.sql import types as T

    shutil.rmtree(SHM, ignore_errors=True)
    tdir = f"{SHM}/timing"
    os.makedirs(tdir, exist_ok=True)
    # must be set BEFORE the JVM starts: python workers inherit the
    # executor JVM's env, which inherits ours at launch
    os.environ["SYSLOG_SPARK_PARSE_TIMING"] = tdir

    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.session import build_session

    def _timing_totals():
        tot = {"kernel_s": 0.0, "rows": 0, "batches": 0}
        for f in glob.glob(f"{tdir}/w*.json"):
            try:
                d = json.load(open(f))
                for k in tot:
                    tot[k] += d[k]
            except Exception:
                pass
        return tot
    spark = build_session(
        app_name=f"ppf{cores}",
        master=f"local[{cores},2]",
        shuffle_partitions=cores,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "24g",
            "spark.local.dir": f"{SHM}/local",
        },
    )
    tok_all = spark.read.parquet(TOKENS)
    tok = tok_all.select("doc_id", "tokens", "n_tok", "source")
    out_schema = T.StructType([T.StructField("rows", T.LongType())])

    def scan():
        tok.write.format("noop").mode("overwrite").save()

    def ship():
        tok.mapInArrow(_mk_ship_fn(False, False), out_schema).write.format(
            "noop").mode("overwrite").save()

    def touch():
        tok.mapInArrow(_mk_ship_fn(True, False), out_schema).write.format(
            "noop").mode("overwrite").save()

    def detok():
        tok.mapInArrow(_mk_ship_fn(False, True), out_schema).write.format(
            "noop").mode("overwrite").save()

    def parse():
        enrich(parse_tokens(tok)).write.format("noop").mode(
            "overwrite").save()

    def direct():
        from syslog_spark.sources.direct import parse_tokens_direct

        enrich(parse_tokens_direct(spark, TOKENS)).write.format(
            "noop").mode("overwrite").save()

    layers = [("scan", scan), ("ship", ship), ("touch", touch),
              ("detok", detok), ("parse", parse), ("direct", direct)]
    best: dict[str, float] = {}
    stall_reps = []
    for rep in range(reps + 1):  # rep0 warms every layer
        for name, f in layers:
            pre = _timing_totals() if name in ("parse", "direct") else None
            t0 = time.monotonic()
            f()
            dt = time.monotonic() - t0
            log(f"  [{cores}cpu] rep{rep} {name}: {dt:.2f}s")
            if rep and (name not in best or dt < best[name]):
                best[name] = round(dt, 2)
            if name in ("parse", "direct") and rep:
                post = _timing_totals()
                ks = post["kernel_s"] - pre["kernel_s"]
                rw = post["rows"] - pre["rows"]
                stall_reps.append({
                    "layer": name,
                    "wall_s": round(dt, 2),
                    "kernel_core_s": round(ks, 2),
                    "kernel_rows": rw,
                    "kernel_us_per_row": round(ks / max(rw, 1) * 1e6, 3),
                    # what the wall WOULD be if workers never stalled
                    "kernel_wall_equiv_s": round(ks / cores, 2),
                    "stall_fraction": round(1 - (ks / cores) / dt, 3),
                })
                log(f"  [{cores}cpu] rep{rep} parse timing: {stall_reps[-1]}")
    spark.stop()
    shutil.rmtree(SHM, ignore_errors=True)
    print("PPF " + json.dumps(
        {"cores": cores, "best": best, "parse_timing": stall_reps}),
        flush=True)


def _run_child(cores: int, reps: int) -> dict:
    cmd = [sys.executable, os.path.abspath(__file__), "_child",
           str(cores), str(reps)]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True)
    for line in proc.stderr.splitlines():
        if line.startswith("  ["):
            log(line)
    for line in proc.stdout.splitlines():
        if line.startswith("PPF "):
            return json.loads(line[4:])
    log(proc.stderr[-3000:])
    raise RuntimeError(f"profile child (cores={cores}) failed")


def _membw_worker(cpu: int, mb: int, secs: float, q):
    os.sched_setaffinity(0, {cpu})
    import numpy as np

    a = np.arange(mb * 1024 * 1024 // 4, dtype=np.int32)  # private array
    a.sum(dtype=np.int64)  # fault pages in
    t0 = time.monotonic()
    passes = 0
    while time.monotonic() - t0 < secs:
        a.sum(dtype=np.int64)
        passes += 1
    dt = time.monotonic() - t0
    q.put(passes * mb / dt)  # MB/s read by this proc


def _membw_probe(mb: int = 256, secs: float = 3.0) -> dict:
    """Pure DRAM-read scaling at 8 vs 32 pinned bare processes (no Spark,
    no python-object work: one numpy int32 sum over a private array far
    larger than cache). This is the machine's ceiling for any
    memory-movement-bound layer — the parquet scan and the Arrow IPC
    crossing can never scale better than this."""
    import multiprocessing as mp

    out = {}
    for procs in (8, 32):
        q = mp.Queue()
        ps = [
            mp.Process(target=_membw_worker, args=(i, mb, secs, q))
            for i in range(procs)
        ]
        for p in ps:
            p.start()
        rates = [q.get() for _ in ps]
        for p in ps:
            p.join()
        out[procs] = round(sum(rates) / 1024, 2)  # aggregate GB/s
        log(f"  membw procs={procs}: {out[procs]:.1f} GB/s aggregate")
    out["efficiency_8_to_32"] = round((out[32] / out[8]) / 4.0, 3)
    return out


def _kernel_probe() -> dict | None:
    """Era-health bracket: the bare-process kernel efficiency right now."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench_kernel.py"), "120000"],
            capture_output=True, text=True, timeout=600,
        )
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        log(f"kernel probe no-json; stderr: {proc.stderr[-500:]}")
    except Exception as e:
        log(f"kernel probe failed: {e}")
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
        return
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-kernel", action="store_true")
    args = ap.parse_args()
    cores = [int(c) for c in args.cores.split(",")]

    if not os.path.isdir(TOKENS):
        raise SystemExit(f"missing token corpus {TOKENS}; run bench.py once")

    k0 = None if args.skip_kernel else _kernel_probe()
    log(f"kernel probe pre: {k0}")
    bw = _membw_probe()
    log(f"membw probe: {bw}")
    results = {c: _run_child(c, args.reps) for c in cores}
    k1 = None if args.skip_kernel else _kernel_probe()
    log(f"kernel probe post: {k1}")

    out = {"kernel_pre": k0, "kernel_post": k1, "membw": bw,
           "layers": {c: results[c]["best"] for c in cores},
           "parse_timing": {c: results[c].get("parse_timing") for c in cores}}
    if len(cores) == 2:
        lo, hi = min(cores), max(cores)
        ratio = hi / lo
        eff = {}
        for name in results[lo]["best"]:
            t_lo = results[lo]["best"][name]
            t_hi = results[hi]["best"].get(name)
            if t_hi:
                eff[name] = round((t_lo / t_hi) / ratio, 3)
        out["layer_efficiency"] = eff
        # incremental (layer minus previous layer) timings per core count
        order = ["scan", "ship", "touch", "detok", "parse"]  # direct is
        # not an increment of parse — reported standalone
        incr = {}
        for c in cores:
            b = results[c]["best"]
            incr[c] = {
                order[i]: round(b[order[i]] - (b[order[i - 1]] if i else 0), 2)
                for i in range(len(order)) if order[i] in b
            }
        out["incremental_seconds"] = incr
    print(json.dumps(out))


if __name__ == "__main__":
    main()
