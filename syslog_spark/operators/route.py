"""Routing stage: per-severity x per-source fan-out sinks + error sink.

Replaces the reference's single (nil, err) return (syslog.go:148-157) with
the north rule's fan-out:

  * valid rows  -> ``<out>/routed``  partitioned by (severity, source)
  * error rows  -> ``<out>/errors``  dead-letter table (doc_id,
    error_column, error_msg, failed_stage) — the distributed version of
    the reference's stdout print at syslog.go:155
  * manifest    -> ``<out>/manifest`` one row per sink: row count +
    order-insensitive row-set checksum, enabling routed-row-set equality
    checks and checkpoint/resume (left_anti against completed sinks).

Checksums are pure JVM (xxhash64 over the canonical column tuple with
``to_json`` for the nested data) xor-folded with bit_xor — associative +
commutative, so they distribute over any partitioning. No Python in this
stage.

Scale notes: the partitionBy write shuffles by (severity, source) — the
natural key for downstream partition pruning; AQE splits skewed partitions
(hot facility Local7 ~> severities of one facility dominate). Dynamic
partition overwrite keeps re-runs idempotent per sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROUTED = "routed"
ERRORS = "errors"
MANIFEST = "manifest"
METRICS = "metrics"

_CHECKSUM_COLS = (
    "doc_id", "priority", "version", "ts_micros", "ts_nanos",
    "tz_offset_seconds", "hostname", "appname", "proc_id", "msg_id",
    "message",
)


def row_checksum() -> F.Column:
    """Per-row 64-bit hash over the canonical field tuple (data via
    deterministic to_json of the sorted assoc-list form, SURVEY.md §1.3)."""
    return F.xxhash64(
        *[F.col(c) for c in _CHECKSUM_COLS], F.to_json(F.col("data"))
    )


def split_valid(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    ok = parsed.filter(F.col("error_msg").isNull())
    err = parsed.filter(F.col("error_msg").isNotNull()).select(
        "doc_id", "source", "n_tok", "error_column", "error_msg",
        "failed_stage",
    )
    return ok, err


def sink_manifest(ok: DataFrame) -> DataFrame:
    """(severity, source) -> row count + xor-folded row-set checksum.

    bit_xor(xxhash64(...)) is order- and partitioning-insensitive: equal
    multisets of rows per sink give equal checksums — the routed-row-set
    equality contract."""
    return ok.groupBy("severity", "source").agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(row_checksum()).alias("row_set_checksum"),
    )


def partition_metrics(parsed: DataFrame) -> DataFrame:
    """Per-input-partition lineage rows (SURVEY.md §2.8): partition id,
    input rows, parsed ok, errored, token volume."""
    return parsed.groupBy(F.spark_partition_id().alias("partition_id")).agg(
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


def route_write(
    parsed: DataFrame,
    out_dir: str,
    spark=None,
    resume: bool = False,
    write_metrics: bool = True,
) -> dict:
    """Fan-out write + manifests. With resume=True, sinks already present
    in the manifest are skipped via a broadcast left_anti join (the
    checkpoint/resume contract)."""
    spark = spark or parsed.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ok, err = split_valid(parsed)

    skipped = 0
    if resume:
        done = completed_sinks(spark, out_dir)
        if done is not None:
            keys = done.select("severity", "source")
            skipped = keys.count()
            ok = ok.join(F.broadcast(keys), ["severity", "source"], "left_anti")

    ok = ok.cache()
    (
        ok.write.mode("overwrite" if not resume else "append")
        .partitionBy("severity", "source")
        .parquet(f"{out_dir}/{ROUTED}")
    )
    manifest = sink_manifest(ok)
    manifest.write.mode("overwrite" if not resume else "append").parquet(
        f"{out_dir}/{MANIFEST}"
    )
    err.write.mode("overwrite" if not resume else "append").parquet(
        f"{out_dir}/{ERRORS}"
    )
    if write_metrics:
        partition_metrics(parsed).write.mode(
            "overwrite" if not resume else "append"
        ).parquet(f"{out_dir}/{METRICS}")
    n_ok = ok.count()
    ok.unpersist()
    return {"routed_rows": n_ok, "skipped_sinks": skipped}
