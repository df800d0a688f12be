"""End-to-end Spark tests for the parse operator (mapInArrow)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from syslog_spark import oracle as O
from syslog_spark.operators.parse import parse_tokens
from syslog_spark.operators.schema import TOKENS_SPARK_SCHEMA
from syslog_spark.sources import datagen as D

Y, TZ = 2024, 0


@pytest.fixture(scope="module")
def corpus_df(spark):
    batch = D.corpus_token_batch()
    pdf = pa.Table.from_batches([batch]).to_pandas()
    return spark.createDataFrame(pdf, schema=TOKENS_SPARK_SCHEMA)


def test_parse_corpus_end_to_end(spark, corpus_df):
    parsed = parse_tokens(corpus_df, Y, TZ, keep_raw=True)
    rows = {r["doc_id"]: r.asDict(recursive=True) for r in parsed.collect()}
    assert len(rows) == len(D.corpus())
    for name, fmt, line in D.corpus():
        got = rows[name]
        exp = O.to_row(O.parse_message(line, fmt, Y, TZ))
        assert got["raw"] == line, name
        for k in (
            "priority", "facility", "severity", "version", "ts_micros",
            "ts_nanos", "tz_offset_seconds", "hostname", "appname",
            "proc_id", "msg_id", "message", "error_msg", "error_column",
        ):
            if k in ("facility", "severity"):
                exp_v = (
                    None if exp["priority"] is None
                    else (exp["priority"] // 8 if k == "facility" else exp["priority"] % 8)
                )
            else:
                exp_v = exp[k]
            assert got[k] == exp_v, (name, k, got[k], exp_v)
        assert got["data"] == exp["data"], (name, got["data"], exp["data"])


def test_ts_column_matches_micros(spark, corpus_df):
    from pyspark.sql import functions as F

    parsed = parse_tokens(corpus_df, Y, TZ)
    bad = parsed.filter(
        F.col("ts_micros").isNotNull()
        & (F.unix_micros(F.col("ts")) != F.col("ts_micros"))
    ).count()
    assert bad == 0


def test_parse_synth_generator(spark):
    from syslog_spark.sources.datagen import generate_tokens_df

    df = generate_tokens_df(spark, 2000, partitions=4)
    parsed = parse_tokens(df, Y, TZ).cache()
    n = parsed.count()
    assert n == 2000
    ok = parsed.filter("error_msg is null").count()
    # ~1.5% synthetic malformed rows
    assert 0 < n - ok < 100
    # deterministic: regeneration with different partitioning is identical
    df2 = generate_tokens_df(spark, 2000, partitions=7)
    assert (
        parsed.select("doc_id", "priority", "error_msg")
        .exceptAll(
            parse_tokens(df2, Y, TZ).select("doc_id", "priority", "error_msg")
        )
        .count()
        == 0
    )
    parsed.unpersist()


def test_new_parser_fixed_format(spark):
    """NewParser analogue (syslog.go:172-176): format bound once."""
    import pytest as _pytest

    from syslog_spark.operators.parse import new_parser
    from syslog_spark.sources import datagen as D

    parse = new_parser("rfc5424", Y, TZ)
    df = spark.createDataFrame(
        [("r1", D.REGULAR_RFC5424)], "doc_id string, line string"
    )
    row = parse(df).collect()[0]
    assert row["priority"] == 191 and row["hostname"] == "hostname"
    with _pytest.raises(ValueError):
        new_parser("rfc3164")
