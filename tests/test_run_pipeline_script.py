"""End-to-end test of the spark-submit entry point as a real subprocess:
`python scripts/run_pipeline.py --input <tokens> --out <dir> --master
local[4]` must build its own session, run parse->enrich->route->aggregate,
and print one JSON summary line (the deployment surface ADVICE round 4
touched — master inheritance must not break the standalone path)."""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_pipeline_script_standalone(spark, tmp_path):
    # write a small token table with the session we already have, then
    # run the script in a FRESH process (its own JVM)
    from syslog_spark.sources.datagen import write_token_table

    tokens = str(tmp_path / "tokens")
    out = str(tmp_path / "out")
    write_token_table(spark, tokens, 20_000, partitions=4)

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", tokens, "--out", out, "--master", "local[4]"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_DRIVER_MEM": "6g"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    res = json.loads(lines[-1])
    assert res["routed_rows"] > 0
    assert res["routed_rows"] + res["error_rows"] == 20_000
    assert os.path.isdir(os.path.join(out, "routed"))
    assert os.path.isdir(os.path.join(out, "manifest"))
    assert os.path.isdir(os.path.join(out, "metrics"))
    # resume over a completed table is a no-op that reports cumulative
    proc2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", tokens, "--out", out, "--master", "local[4]",
         "--resume"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_DRIVER_MEM": "6g"},
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    res2 = json.loads(
        [ln for ln in proc2.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res2["routed_rows"] == res["routed_rows"]
    assert res2["skipped_sinks"] > 0


def test_run_pipeline_script_source_prefix(spark, tmp_path):
    """--source-prefix (repeatable) prunes the pipeline input; routed
    rows must cover exactly the matching sources."""
    from syslog_spark.sources.datagen import write_token_table

    tokens = str(tmp_path / "tokens")
    out = str(tmp_path / "out")
    write_token_table(spark, tokens, 10_000, partitions=4)
    all_sources = {
        r["source"]
        for r in spark.read.parquet(tokens).select("source")
        .distinct().collect()
    }
    assert any(s.startswith("rfc5424") for s in all_sources)
    assert any(not s.startswith("rfc5424") for s in all_sources)
    want = (
        spark.read.parquet(tokens)
        .filter("source LIKE 'rfc5424%'").count()
    )

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "run_pipeline.py"),
         "--input", tokens, "--out", out, "--master", "local[4]",
         "--source-prefix", "rfc5424"],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "SPARK_DRIVER_MEM": "6g"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res["routed_rows"] + res["error_rows"] == want > 0
