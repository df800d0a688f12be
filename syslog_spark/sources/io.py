"""Token-table source: Iceberg when available, Parquet fallback.

The north rule's nominal input is an Iceberg table PARTITIONED BY (source)
(FIXTURES.md §1). This container has no Iceberg runtime jar, so the
Iceberg path is config-gated and degrades to directory Parquet with the
identical schema + partition column — Catalyst's partition pruning on
``source`` works the same way for both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_tokens(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the (doc_id, tokens, n_tok, source) table."""
    if path_or_table.startswith("iceberg:"):
        name = path_or_table[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on classpath; use a parquet path or "
                "add org.apache.iceberg:iceberg-spark-runtime to spark.jars"
            )
        return spark.read.format("iceberg").load(name)
    return spark.read.parquet(path_or_table)


def write_tokens(df: DataFrame, path_or_table: str, mode: str = "overwrite"):
    if path_or_table.startswith("iceberg:"):
        from pyspark.sql import functions as F

        name = path_or_table[len("iceberg:"):]
        (
            df.writeTo(name)
            .partitionedBy(F.col("source"))  # V2 writer takes Columns
            .createOrReplace()
        )
        return
    df.write.mode(mode).partitionBy("source").parquet(path_or_table)
