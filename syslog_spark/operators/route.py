"""Routing stage: per-severity x per-source fan-out sinks + error sink.

Replaces the reference's single (nil, err) return (syslog.go:148-157) with
the north rule's fan-out, designed as a SINGLE PASS over the parsed rows:

  * every row gets a sink key ``sink_severity`` = severity, or -1 for rows
    that failed to parse — the error sink (the distributed version of the
    reference's stdout print at syslog.go:155) is just another partition,
  * ONE shuffle (repartition on the sink key, optionally salted so hot
    sinks split across writer tasks), ONE write partitioned by
    (sink_severity, source),
  * manifest / per-sink aggregates / per-partition lineage metrics are
    computed from the *written* table (cheap columnar re-reads), never by
    re-running the Python parse stage and never via caching — measured on
    1M rows, caching the nested rows cost 4x the parse itself.

Manifest checksums are pure JVM (xxhash64 over the canonical column tuple
with ``to_json`` for nested data) xor-folded with bit_xor — associative +
commutative, so equal row multisets give equal checksums under any
partitioning: the routed-row-set equality contract. Resume anti-joins the
manifest's completed sinks (checkpoint/resume contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUTED = "routed"
MANIFEST = "manifest"
METRICS = "metrics"
ERROR_SINK = -1  # sink_severity value of the dead-letter partition

_CHECKSUM_COLS = (
    "doc_id", "priority", "version", "ts_micros", "ts_nanos",
    "tz_offset_seconds", "hostname", "appname", "proc_id", "msg_id",
    "message", "error_msg", "error_column",
)


def row_checksum() -> F.Column:
    """Per-row 64-bit hash over the canonical field tuple. xxhash64 hashes
    the nested data column directly (recursive over array/struct — well
    defined because the stored form is canonically sorted, SURVEY.md §1.3);
    hashing via to_json costs ~3x more."""
    return F.xxhash64(*[F.col(c) for c in _CHECKSUM_COLS], F.col("data"))


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    ok = parsed.filter(F.col("error_msg").isNull())
    err = parsed.filter(F.col("error_msg").isNotNull()).select(
        "doc_id", "source", "n_tok", "error_column", "error_msg",
        "failed_stage",
    )
    return ok, err


def with_sink_key(parsed: DataFrame) -> DataFrame:
    return parsed.withColumn(
        "sink_severity",
        F.coalesce(F.col("severity").cast("int"), F.lit(ERROR_SINK)),
    ).withColumn("input_partition", F.spark_partition_id())


def sink_manifest(routed: DataFrame) -> DataFrame:
    """(sink_severity, source) -> row count + xor row-set checksum."""
    return routed.groupBy("sink_severity", "source").agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(row_checksum()).alias("row_set_checksum"),
    )


def partition_metrics(routed: DataFrame) -> DataFrame:
    """Per-INPUT-partition lineage rows (SURVEY.md §2.8). input_partition
    is stamped before the routing shuffle, so lineage survives it."""
    return routed.groupBy("input_partition").agg(
        F.count(F.lit(1)).alias("input_rows"),
        F.count(F.when(F.col("error_msg").isNull(), 1)).alias("ok_rows"),
        F.count(F.when(F.col("error_msg").isNotNull(), 1)).alias("error_rows"),
        F.sum("n_tok").alias("token_bytes"),
    )


def completed_sinks(spark, out_dir: str):
    """Manifest of already-routed sinks, or None on a fresh run."""
    try:
        return spark.read.parquet(f"{out_dir}/{MANIFEST}")
    except Exception:
        return None


def read_routed(spark, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/{ROUTED}")


def read_errors(spark, out_dir: str) -> DataFrame:
    """The dead-letter sink: rows the reference would have rejected."""
    return (
        read_routed(spark, out_dir)
        .filter(F.col("sink_severity") == ERROR_SINK)
        .select(
            "doc_id", "source", "n_tok", "error_column", "error_msg",
            "failed_stage",
        )
    )


def _manifest_metrics_schemas():
    from pyspark.sql import types as T

    manifest = T.StructType([  # == aggregate.sink_stats output types
        T.StructField("sink_severity", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("rows", T.LongType()),
        T.StructField("row_set_checksum", T.LongType()),
        T.StructField("distinct_hostnames", T.LongType()),
        T.StructField("approx_docs", T.LongType()),
        T.StructField("min_n_tok", T.IntegerType()),
        T.StructField("max_n_tok", T.IntegerType()),
        T.StructField("sum_n_tok", T.LongType()),
        T.StructField("n_tok_pcts", T.ArrayType(T.DoubleType())),
    ])
    metrics = T.StructType([
        T.StructField("input_partition", T.IntegerType()),
        T.StructField("input_rows", T.LongType()),
        T.StructField("ok_rows", T.LongType()),
        T.StructField("error_rows", T.LongType()),
        T.StructField("token_bytes", T.LongType()),
    ])
    return manifest, metrics


MANIFEST_SCHEMA, METRICS_SCHEMA = _manifest_metrics_schemas()


def _pa_schema(spark_schema):
    import pyarrow as pa
    from pyspark.sql import types as T

    def conv(dt):
        if isinstance(dt, T.IntegerType):
            return pa.int32()
        if isinstance(dt, T.LongType):
            return pa.int64()
        if isinstance(dt, T.DoubleType):
            return pa.float64()
        if isinstance(dt, T.StringType):
            return pa.string()
        if isinstance(dt, T.ArrayType):
            return pa.list_(conv(dt.elementType))
        raise TypeError(f"unsupported {dt}")

    return pa.schema([(f.name, conv(f.dataType)) for f in spark_schema])


def write_local_table(path: str, rows: list, spark_schema, append: bool = False):
    """Write a driver-local (tiny) table as a parquet directory WITHOUT a
    Spark job: a createDataFrame(local rows).write would be backed by a
    python RDD, and its single write task forks a python worker (~4-7s of
    pure latency per call on this box). The manifest/metrics/aggregates
    tables are at most a few hundred rows — pyarrow writes them in
    milliseconds and Spark reads the directory exactly the same."""
    import os
    import shutil
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    if not append:
        shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    table = pa.Table.from_pylist(
        [dict(r) for r in rows], schema=_pa_schema(spark_schema)
    )
    pq.write_table(table, os.path.join(path, f"part-{uuid.uuid4().hex}.parquet"))


def read_local_table(path: str) -> list[dict]:
    """Driver-side read of a tiny parquet dir (manifest/metrics) — the
    pyarrow twin of write_local_table; no Spark job."""
    import pyarrow.parquet as pq

    return pq.read_table(path).to_pylist()


def table_exists(spark, path: str) -> bool:
    """Existence check that works for hdfs:///s3a:// out_dirs too: a
    driver-local os.path.isdir is always False for remote URIs, which
    would silently pick static overwrite and truncate a remote table the
    docstring promises to preserve. Resolved through the Hadoop
    FileSystem API of the path's own scheme."""
    try:
        jvm = spark.sparkContext._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))
    except Exception:
        if "://" in path:
            # remote URI and the FS probe failed (transient store error,
            # auth, missing connector jar): do NOT guess "absent" — a
            # wrong False picks static overwrite and truncates the very
            # table this function exists to protect
            raise
        import os as _os

        return _os.path.isdir(path)


def _clear_stale_temporary(spark, table_path: str) -> bool:
    """Delete a leftover ``_temporary`` dir under a table path.

    A crashed append/resume attempt leaves its committed task dirs under
    ``<table>/_temporary/0``; FileOutputCommitter v1's job commit merges
    EVERY task dir found there, so the next resume run would silently
    absorb the crashed attempt's rows on top of its own — double-writing
    those sinks (executed, not theorized: test_chaos_resume.py reproduces
    it). The resume protocol is single-writer per out_dir (the manifest
    anti-join already requires that), so any pre-existing _temporary is
    garbage by definition. Resolved through the Hadoop FS of the path's
    own scheme, like :func:`table_exists`.

    Fail-closed EVERYWHERE (round-6, advice fix): a failed delete of a
    directory we just confirmed exists precedes a v1-committer append
    that would silently absorb the crashed attempt's rows — the local
    branch used to swallow the error and proceed, reintroducing exactly
    the double-write this function prevents. Hadoop's ``delete`` also
    reports failure by RETURN VALUE, not exception; check it."""
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{table_path}/_temporary")
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(jpath):
        deleted = fs.delete(jpath, True)
        if not deleted and fs.exists(jpath):
            raise RuntimeError(
                f"could not delete stale {table_path}/_temporary; "
                "resuming over it would double-write the crashed "
                "attempt's task dirs (v1 job commit merges every task "
                "dir it finds) — clear it manually and re-run"
            )
        return True
    return False


def route_write(
    parsed: DataFrame,
    out_dir: str,
    spark=None,
    resume: bool = False,
    write_metrics: bool = True,
    files_per_sink: int | None = None,
    n_write_tasks: int | None = None,
) -> dict:
    """Single-pass fan-out write + manifests.

    files_per_sink salts the shuffle key so a hot sink (skewed
    severity/source — e.g. one facility dominating) is written by several
    tasks instead of one. The DEFAULT derives from the cluster's
    parallelism (P/4, min 2) so the skewed plan never happens without
    caller tuning; at scale set it explicitly to
    ceil(hot_sink_rows / rows_per_file_target). files_per_sink=1 restores
    the exactly-one-file-per-sink layout.
    With resume=True, sinks already in the manifest are skipped via a
    broadcast left_anti join and the returned ``sink_stats`` /
    ``routed_rows`` are CUMULATIVE (full manifest: prior runs + this one).
    Overwrite semantics: a fresh out_dir (or resume) uses the cheap static
    commit; overwriting an EXISTING routed table without resume uses
    dynamic partition overwrite so sinks absent from the current batch are
    preserved (the static truncate-all would silently drop them)."""
    import time as _time

    spark = spark or parsed.sparkSession
    if files_per_sink is None:
        files_per_sink = max(2, spark.sparkContext.defaultParallelism // 4)
    # static overwrite truncates the whole table in one step but is only
    # safe when nothing pre-exists; dynamic preserves untouched partitions
    # at the cost of a driver-side rename per partition dir (~10s/650 dirs
    # measured) — pay it only when layering onto an existing table.
    # Both the overwrite mode and the committer version are passed as
    # PER-WRITE writer options (newHadoopConfWithOptions copies them into
    # this job's hadoop conf) — mutating spark.conf / the shared
    # sparkContext hadoopConfiguration would leak the setting into every
    # later write in the session.
    routed_exists = table_exists(spark, f"{out_dir}/{ROUTED}")
    overwrite_mode = "dynamic" if (resume or routed_exists) else "static"
    # commit protocol: v2 moves task output into place at TASK commit
    # (parallel, no serial driver-side job-commit rename over every
    # sink dir — measured ~0.9s of a ~8s write at 32 cores, and the
    # serial cost grows with sinks x files_per_sink, i.e. with cluster
    # size: a direct Amdahl penalty on the 4N config). Safe only for
    # fresh overwrites, where a crashed job is rerun from scratch and
    # the static truncate clears any partials. Resume/append runs keep
    # v1: v2's task-visible partial files would double-write a sink
    # that crashed mid-job on the next resume (manifest rows are only
    # written after job success, so v1's invisible-until-job-commit is
    # what makes the resume anti-join sound).
    committer_version = "1" if (resume or routed_exists) else "2"
    stage_t: dict[str, float] = {}
    _t0 = _time.monotonic()
    # row_cs is materialized BEFORE the shuffle (pipelined with the parse
    # stage) so the manifest scan afterwards reads 8 flat bytes per row
    # instead of re-decoding + re-hashing the nested data column
    df = with_sink_key(parsed).withColumn("row_cs", row_checksum())

    skipped = 0
    if resume:
        _clear_stale_temporary(spark, f"{out_dir}/{ROUTED}")
        done = completed_sinks(spark, out_dir)
        if done is None and routed_exists:
            # routed data with NO manifest = a FRESH (committer v2)
            # write crashed mid-job: its task-visible partials are in
            # the final sink dirs and nothing is recorded as complete.
            # resume would append the full dataset ON TOP of the
            # partials and then compute a manifest over the duplicated
            # table, legitimizing the inflated counts (round-5 review).
            # The correct recovery for a crashed fresh write is a fresh
            # rerun (static overwrite clears the partials).
            raise RuntimeError(
                f"resume=True but {out_dir}/{MANIFEST} is missing while "
                f"{out_dir}/{ROUTED} exists — this looks like a crashed "
                "FRESH write (partials present, nothing committed). "
                "Rerun with resume=False to overwrite from scratch."
            )
        if done is not None:
            keys = done.select("sink_severity", "source")
            skipped = keys.count()
            df = df.join(
                F.broadcast(keys), ["sink_severity", "source"], "left_anti"
            )

    n = n_write_tasks or spark.sparkContext.defaultParallelism * 2
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(max(files_per_sink, 1)))
    mode = "overwrite" if not resume else "append"
    (
        df.repartition(n, F.col("sink_severity"), F.col("source"), salt)
        .write.mode(mode)
        .option("partitionOverwriteMode", overwrite_mode)
        .option(
            "mapreduce.fileoutputcommitter.algorithm.version",
            committer_version,
        )
        .partitionBy("sink_severity", "source")
        .parquet(f"{out_dir}/{ROUTED}")
    )
    stage_t["parse_route_write"] = _time.monotonic() - _t0
    _t0 = _time.monotonic()

    routed = read_routed(spark, out_dir)
    if resume and skipped:
        # resume path: only the sinks written THIS run get fresh manifest
        # rows (appended), but callers see the CUMULATIVE manifest so
        # aggregates/summaries keep the prior runs' sinks — two scans
        # (rare path)
        from .aggregate import sink_stats

        done = completed_sinks(spark, out_dir)
        routed_new = routed.join(
            F.broadcast(done.select("sink_severity", "source")),
            ["sink_severity", "source"],
            "left_anti",
        )
        new_rows = [r.asDict() for r in sink_stats(routed_new).collect()]
        write_local_table(
            f"{out_dir}/{MANIFEST}", new_rows, MANIFEST_SCHEMA,
            append=(mode == "append"),
        )
        stats_rows = read_local_table(f"{out_dir}/{MANIFEST}")
        if write_metrics:
            metrics_rows = [
                r.asDict() for r in partition_metrics(routed).collect()
            ]
            write_local_table(
                f"{out_dir}/{METRICS}", metrics_rows, METRICS_SCHEMA
            )
    else:
        # hot path: ONE column-pruned scan computes manifest + per-sink
        # aggregates (sink_stats: sketch distincts, approx percentiles);
        # the tiny result is collected once and every derived output —
        # manifest file, routed-row count, callers' aggregates — comes
        # from the collected rows. Metrics is its own cheap flat-column
        # scan. (A grouping-sets fold of the two was tried and REVERTED:
        # the expand duplicates every row through the sketch updates and
        # measured 5-33s where the two scans take ~1-2s total.)
        from .aggregate import sink_stats

        stats_rows = [r.asDict() for r in sink_stats(routed).collect()]
        write_local_table(f"{out_dir}/{MANIFEST}", stats_rows, MANIFEST_SCHEMA)
        if write_metrics:
            metrics_rows = [
                r.asDict() for r in partition_metrics(routed).collect()
            ]
            write_local_table(
                f"{out_dir}/{METRICS}", metrics_rows, METRICS_SCHEMA
            )
    stage_t["manifest_metrics"] = _time.monotonic() - _t0
    n_ok = sum(
        r["rows"] for r in stats_rows if r["sink_severity"] != ERROR_SINK
    )
    return {
        "routed_rows": int(n_ok),
        "skipped_sinks": skipped,
        "sink_stats": stats_rows,
        "stage_seconds": {k: round(v, 2) for k, v in stage_t.items()},
    }
