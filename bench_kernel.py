"""Spark-free scaling microbench: the actual Arrow fastpath parse kernel
(parse_rfc5424_fast) in P taskset-pinned worker PROCESSES over identical
private data. Isolates the machine's memory-bandwidth/SMT ceiling from
anything Spark adds (shuffle, JVM, driver). If THIS shows efficiency E at
8->32 procs, no Spark job built on the same kernel can beat E.

Usage: python .bench/mp_parse_bench.py [rows_per_proc]
Prints one JSON line: {"procs": {8: rows_per_sec, 32: ...}, "efficiency": x}
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _rows_arg() -> int:
    # importable from other tools (bench.py's in-child same-era probe):
    # argv may belong to the importer, so ignore non-numeric values
    try:
        return int(sys.argv[1])
    except (IndexError, ValueError):
        return 250_000


ROWS = _rows_arg()
BATCH = 32_768


def make_lines(n: int, salt: int):
    import pyarrow as pa

    lines = [
        f'<{(i * 7 + salt) % 192}>1 2024-01-01T00:00:0{i % 10}+00:00 '
        f'host{i % 50} app-{i % 9} p{i % 97} m{i % 13} '
        f'[meta k="v{i}" other="x{i % 31}"] message body ev{i} tail tail'
        for i in range(n)
    ]
    return pa.array(lines, pa.string())


def worker(proc_id: int, n_rows: int, cpu: int, q):
    os.sched_setaffinity(0, {cpu})
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ[var] = "1"
    from syslog_spark.operators.fastpath import parse_rfc5424_fast

    arr = make_lines(n_rows, proc_id)
    # warm (JIT-free python, but warms allocator/caches)
    parse_rfc5424_fast(arr.slice(0, BATCH), 2024, 0)
    t0 = time.monotonic()
    done = 0
    while done < n_rows:
        sub = arr.slice(done, BATCH)
        out = parse_rfc5424_fast(sub, 2024, 0)
        assert not out["slow"].any()
        done += len(sub)
    q.put((proc_id, n_rows / (time.monotonic() - t0)))


def run(procs: int, rows_per_proc: int) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=worker, args=(i, rows_per_proc, i, q))
        for i in range(procs)
    ]
    t0 = time.monotonic()
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.monotonic() - t0
    total = procs * rows_per_proc / wall
    per = sorted(r for _, r in rates)
    print(
        f"  procs={procs}: aggregate {total:,.0f} rows/s "
        f"(per-proc min {per[0]:,.0f} max {per[-1]:,.0f})",
        file=sys.stderr, flush=True,
    )
    return total


def main():
    mp.set_start_method("spawn")
    # optional second arg: a single proc count — used by bench.py's
    # same-era probe (run as a subprocess with a timeout so a wedged
    # forked worker can't hang the multi-hour bench run)
    only = None
    if len(sys.argv) > 2:
        try:
            only = int(sys.argv[2])
        except ValueError:
            only = None
    if only is not None:
        best = max(run(only, ROWS) for _ in range(2))
        print(json.dumps({"procs": {str(only): round(best, 0)},
                          "rows_per_proc": ROWS}))
        return
    out = {}
    for procs in (8, 32):
        best = 0.0
        for _ in range(2):
            best = max(best, run(procs, ROWS))
        out[procs] = round(best, 0)
    eff = (out[32] / out[8]) / 4.0
    print(json.dumps({"procs": out, "efficiency_8_to_32": round(eff, 3),
                      "rows_per_proc": ROWS}))


if __name__ == "__main__":
    main()
