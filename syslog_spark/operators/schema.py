"""Schemas shared by the parse operator, sinks, and tests.

The parsed-row schema is the reference ``Message`` struct (syslog.go:22-34)
re-expressed columnar (SURVEY.md §1), plus the error channel that replaces
the reference's stdout print (syslog.go:155) and pipeline metadata
(doc_id/source/n_tok passthrough).

Structured data is stored as the *canonical sorted association list*
(SURVEY.md §1.3) — the reference's own serializer sorts both key levels
(syslog.go:124-140), so this is its canonical form and makes distributed
equality exact (MapType is not comparable in Spark).

Timestamps: ``ts_micros`` is the UTC instant (microseconds since epoch,
usable far outside pandas' datetime64[ns] range — the reference test corpus
includes year 3000, syslog_test.go:33); ``ts_nanos`` keeps the full
nanosecond fraction for byte-exact round-trip serialization; and
``tz_offset_seconds`` preserves the original zone offset (Go time.Time
keeps it; Spark TimestampType does not). A JVM-side ``ts`` TimestampType
column is derived via ``F.timestamp_micros`` after the UDF stage.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import types as T

# array<struct<sd_id, params array<struct<key,value>>>>
PARAM_T_PA = pa.struct([("key", pa.string()), ("value", pa.string())])
DATA_T_PA = pa.list_(
    pa.struct([("sd_id", pa.string()), ("params", pa.list_(PARAM_T_PA))])
)

PARAM_T = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("value", T.StringType()),
    ]
)
DATA_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("sd_id", T.StringType()),
            T.StructField("params", T.ArrayType(PARAM_T)),
        ]
    )
)

# (name, pyarrow type, pyspark type) in emission order
_PARSED_COLS = [
    ("doc_id", pa.string(), T.StringType()),
    ("source", pa.string(), T.StringType()),
    ("n_tok", pa.int32(), T.IntegerType()),
    ("raw", pa.string(), T.StringType()),  # only when keep_raw
    ("priority", pa.int16(), T.ShortType()),
    ("facility", pa.int16(), T.ShortType()),
    ("severity", pa.int16(), T.ShortType()),
    ("version", pa.int32(), T.IntegerType()),
    ("ts_micros", pa.int64(), T.LongType()),
    ("ts_nanos", pa.int32(), T.IntegerType()),
    ("tz_offset_seconds", pa.int32(), T.IntegerType()),
    ("hostname", pa.string(), T.StringType()),
    ("appname", pa.string(), T.StringType()),
    ("proc_id", pa.string(), T.StringType()),
    ("msg_id", pa.string(), T.StringType()),
    ("data", DATA_T_PA, DATA_T),
    ("message", pa.string(), T.StringType()),
    ("error_msg", pa.string(), T.StringType()),
    ("error_column", pa.int32(), T.IntegerType()),
    ("failed_stage", pa.int32(), T.IntegerType()),
]


def parsed_cols(keep_raw: bool) -> list:
    return [c for c in _PARSED_COLS if keep_raw or c[0] != "raw"]


def parsed_arrow_schema(keep_raw: bool = False) -> pa.Schema:
    return pa.schema([(n, t) for n, t, _ in parsed_cols(keep_raw)])


def parsed_spark_schema(keep_raw: bool = False) -> T.StructType:
    return T.StructType(
        [T.StructField(n, st, True) for n, _, st in parsed_cols(keep_raw)]
    )


# input token-table schema (BASELINE.json input_hint)
TOKENS_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)
