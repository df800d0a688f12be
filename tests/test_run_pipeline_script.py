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
