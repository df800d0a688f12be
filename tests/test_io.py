"""sources/io.py coverage: both the parquet path and the Iceberg branch
(mocked — no runtime jar in this container, so the Iceberg assertions pin
the CALLS we would make, not a live catalog)."""

from __future__ import annotations

from unittest import mock

import pytest
from pyspark.sql import functions as F

from syslog_spark.sources.io import iceberg_available, read_tokens, write_tokens


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    from syslog_spark.sources.datagen import generate_tokens_df

    path = str(tmp_path / "tok")
    df = generate_tokens_df(spark, 500, partitions=2)
    write_tokens(df, path)
    back = read_tokens(spark, path)
    assert back.count() == 500
    assert set(back.columns) == {"doc_id", "tokens", "n_tok", "source"}
    # partitioned by source: a source filter must prune at the scan
    plan = (
        back.filter(F.col("source") == "rfc5424/h00")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan


def test_iceberg_unavailable_raises(spark):
    assert not iceberg_available(spark)  # no runtime jar in the sandbox
    with pytest.raises(RuntimeError, match="Iceberg runtime not on classpath"):
        read_tokens(spark, "iceberg:catalog.db.tokens")


def test_iceberg_read_branch(spark):
    """When the classpath check passes, read_tokens must go through
    spark.read.format('iceberg').load(<table>)."""
    fake_reader = mock.Mock()
    fake_reader.format.return_value = fake_reader
    fake_reader.load.return_value = "SENTINEL"
    fake_spark = mock.Mock()
    fake_spark.read = fake_reader
    with mock.patch(
        "syslog_spark.sources.io.iceberg_available", return_value=True
    ):
        out = read_tokens(fake_spark, "iceberg:cat.db.tokens")
    assert out == "SENTINEL"
    fake_reader.format.assert_called_once_with("iceberg")
    fake_reader.load.assert_called_once_with("cat.db.tokens")


def test_iceberg_write_branch(spark):
    """write_tokens must use the DataFrameWriterV2 path with
    partitionedBy('source') — the explicit-partitioning contract."""
    fake_writer = mock.Mock()
    fake_writer.partitionedBy.return_value = fake_writer
    fake_df = mock.Mock()
    fake_df.writeTo.return_value = fake_writer
    write_tokens(fake_df, "iceberg:cat.db.tokens")
    fake_df.writeTo.assert_called_once_with("cat.db.tokens")
    assert fake_writer.partitionedBy.call_count == 1
    # Column equality can't be compared with ==; pin the expression string
    (arg,), _ = fake_writer.partitionedBy.call_args
    assert "source" in str(arg)
    fake_writer.createOrReplace.assert_called_once_with()
