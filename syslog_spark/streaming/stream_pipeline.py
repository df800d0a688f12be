"""Structured Streaming version of the parse -> enrich -> route path.

The batch operators compose unchanged: mapInArrow / pandas UDFs and the
enrichment expressions are streaming-safe. What streaming adds:

  * file-source ingestion of token parquet (maxFilesPerTrigger paces it),
  * watermarked event-time windowed aggregates (late rows beyond the
    watermark dropped deterministically),
  * checkpointed sinks (exactly-once file sink; restart = resume),
  * a custom stateful operator (per-hostname running counters) via
    applyInPandasWithState.

Tests drive it with trigger(availableNow=True) so a static directory runs
to completion synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.enrich import enrich
from ..operators.parse import make_parse_fn, parsed_spark_schema
from ..operators.schema import TOKENS_SPARK_SCHEMA
from .. import constants as C


def read_token_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(TOKENS_SPARK_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def parse_stream(
    tokens: DataFrame,
    ref_year: int = C.DEFAULT_REFERENCE_YEAR,
    ref_tz: int = C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
) -> DataFrame:
    out = tokens.select("doc_id", "tokens", "n_tok", "source").mapInArrow(
        make_parse_fn(ref_year, ref_tz, keep_raw=False),
        parsed_spark_schema(False),
    )
    return enrich(out.withColumn("ts", F.timestamp_micros("ts_micros")))


def windowed_severity_counts(
    parsed: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked event-time rollup per severity (late data dropped)."""
    return (
        parsed.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "severity")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.approx_count_distinct("hostname").alias("approx_hosts"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "severity", "rows", "approx_hosts",
        )
    )


_HOST_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_HOST_OUT_SCHEMA = T.StructType(
    [
        T.StructField("hostname", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("running_total", T.LongType()),
    ]
)


def host_running_totals(parsed: DataFrame) -> DataFrame:
    """Custom stateful operator: per-hostname running row counts
    (applyInPandasWithState, GroupStateTimeout.NoTimeout)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        n = 0
        for pdf in pdf_iter:
            n += len(pdf)
        (total,) = state.get if state.exists else (0,)
        total += n
        state.update((total,))
        yield pd.DataFrame(
            {"hostname": [key[0]], "batch_rows": [n], "running_total": [total]}
        )

    return (
        parsed.filter(F.col("error_msg").isNull())
        .groupBy("hostname")
        .applyInPandasWithState(
            fn,
            outputStructType=_HOST_OUT_SCHEMA,
            stateStructType=_HOST_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def run_stream_once(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> int:
    """Drain all available input into a checkpointed routed sink with the
    SAME fan-out layout as the batch router (operators/route.py): every
    row lands in its (sink_severity, source) partition, error rows in the
    sink_severity=-1 dead-letter partition. Returns valid rows written.
    Restart-safe: the checkpoint makes a second invocation a no-op for
    already-committed files (exactly-once file sink)."""
    from ..operators.route import ERROR_SINK, with_sink_key

    parsed = with_sink_key(parse_stream(read_token_stream(spark, input_dir)))
    q = (
        parsed.writeStream.format("parquet")
        .option("path", f"{out_dir}/routed")
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("sink_severity", "source")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        return (
            spark.read.parquet(f"{out_dir}/routed")
            .filter(F.col("sink_severity") != ERROR_SINK)
            .count()
        )
    except Exception:
        return 0
