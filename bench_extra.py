#!/usr/bin/env python
"""Per-query isolation bench (round 6 optimization work).

bench.py is FROZEN for measurement; this harness exists for guide-§1
work: time ONE query (or an internal stage probe) with the noop sink,
labelled jobs, and optional .explain("formatted") dumps, without paying
for the full suite. Usage:

    python bench_extra.py q minhash_neardup dedup_pipeline
    python bench_extra.py probe sig_scan banding
    python bench_extra.py explain route_counts      # plan -> plans/r06/

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line per item to stdout; everything else to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "1"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _session():
    from syslog_spark.session import build_session

    return build_session(
        app_name="bench_extra",
        master=f"local[{CPUS},2]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "48g"),
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
        },
    )


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- internal stage probes ------------------------------------------------------


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def probe_sig_scan(spark):
    """The minhash signature corpus scan alone (dominant dedup cost)."""
    from syslog_spark.operators.dedup import _minhash_sigs

    return _minhash_sigs(_docs(spark), "text", "doc_id", 64, 5, 42)


def probe_shingle_hashes(spark):
    """Just the JVM shingle->hash array (no signature folds)."""
    from syslog_spark.operators.dedup import shingle_hashes
    from pyspark.sql import functions as F

    return _docs(spark).select(
        "doc_id", shingle_hashes("text", 5).alias("_sh")
    )


def probe_banding(spark):
    from syslog_spark.operators.dedup import _minhash_banded

    return _minhash_banded(_docs(spark), "text", "doc_id", 64, 32, 5, 42)


def probe_cands(spark):
    from syslog_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(spark), bands=32, n_hashes=64)


def probe_verify_scan(spark):
    """The exact-verify shingle (string array) corpus scan alone."""
    from syslog_spark.operators.dedup import shingles
    from pyspark.sql import functions as F

    return _docs(spark).select(
        F.col("doc_id").alias("id"), shingles("text", 5).alias("sh")
    )


def _simhash_docs(spark):
    import __spark_entry__ as E

    return E._pair_docs(spark, SF_DIR, E._TEXT_PERM)


def probe_simhash_only(spark):
    from syslog_spark.operators.dedup import simhash

    return simhash(_simhash_docs(spark))


def probe_simhash_corpus(spark):
    """Corpus construction alone (md5 text synthesis from events)."""
    return _simhash_docs(spark)


PROBES = {
    "sig_scan": probe_sig_scan,
    "shingle_hashes": probe_shingle_hashes,
    "banding": probe_banding,
    "cands": probe_cands,
    "verify_scan": probe_verify_scan,
    "simhash_only": probe_simhash_only,
    "simhash_corpus": probe_simhash_corpus,
}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "q"
    names = sys.argv[2:]
    import __spark_entry__ as E

    spark = _session()
    qs = E.queries()
    # steady-state warm-up (same rationale as bench.py)
    try:
        _noop(qs["parse_rfc5424_fields"](spark, SF_DIR))
    except Exception:
        pass
    out = {}
    for name in names:
        if mode == "explain":
            df = qs[name](spark, SF_DIR)
            os.makedirs("plans/r06", exist_ok=True)
            p = f"plans/r06/{name}.txt"
            with open(p, "w") as f:
                f.write(spark._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
            log(f"wrote {p}")
            continue
        fn = (lambda s: qs[name](s, SF_DIR)) if mode == "q" else (
            lambda s, _f=PROBES[name]: _f(s)
        )
        samples = []
        for rep in range(REPS):
            spark.sparkContext.setJobDescription(f"extra:{name}:rep{rep}")
            t0 = time.monotonic()
            try:
                _noop(fn(spark))
                dt = round(time.monotonic() - t0, 3)
            except Exception as e:
                log(f"{name} FAILED: {str(e)[:300]}")
                dt = -1.0
            samples.append(dt)
            log(f"  {name:24s} rep{rep} {dt:8.2f}s")
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "mode": mode,
                      "times": out}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
