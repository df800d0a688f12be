"""Property-based differential testing (hypothesis): for ANY input line,
the vectorized engine's output equals the byte-exact oracle's."""

from __future__ import annotations

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_spark import oracle as O
from syslog_spark.operators import parse as P

Y, TZ = 2024, 0
NULL = P._NULL_INT

_ALPHABET = ' <>[]"=:,-\\abcxyz0123456789\tJanOct+.T\x00é﻿\n'


def _engine_row(line: str, fmt: str) -> dict:
    full, cols = P._parse_lines_batch(
        pa.array([line], pa.string()), pa.array([fmt], pa.string()), Y, TZ
    )
    row = {
        k: (None if full[k][0] == NULL else int(full[k][0]))
        for k in ("priority", "version", "ts_micros", "ts_nanos",
                  "tz_offset_seconds", "error_column", "failed_stage")
    }
    for k in ("hostname", "appname", "proc_id", "msg_id", "message"):
        row[k] = cols[k][0].as_py()
    row["data"] = cols["data"][0].as_py()
    row["error_msg"] = full["error_msg"][0]
    return row


def _oracle_row(line: str, fmt: str) -> dict:
    r = O.to_row(O.parse_message(line, fmt, Y, TZ))
    return {k: r[k] for k in (
        "priority", "version", "ts_micros", "ts_nanos", "tz_offset_seconds",
        "error_column", "failed_stage", "hostname", "appname", "proc_id",
        "msg_id", "message", "data", "error_msg",
    )}


@settings(max_examples=300, deadline=None)
@given(
    line=st.text(alphabet=_ALPHABET, max_size=120),
    fmt=st.sampled_from(["rfc5424", "nginx_access", "nginx_error"]),
)
def test_engine_equals_oracle_on_arbitrary_text(line, fmt):
    assert _engine_row(line, fmt) == _oracle_row(line, fmt)


@settings(max_examples=200, deadline=None)
@given(
    pri=st.integers(0, 999),
    ver=st.integers(0, 99),
    host=st.text(alphabet="ab-", min_size=1, max_size=12),
    params=st.lists(
        st.tuples(st.text("kxy", min_size=1, max_size=4),
                  st.text("v -=", max_size=6)),
        max_size=4,
    ),
    msg=st.text(alphabet="m \t", max_size=10),
)
def test_engine_equals_oracle_on_structured_lines(pri, ver, host, params, msg):
    sd = (
        "-" if not params
        else "[id" + "".join(f' {k}="{v}"' for k, v in params) + "]"
    )
    line = f"<{pri}>{ver} 2024-06-01T10:20:30+02:00 {host} app p1 m1 {sd} {msg}"
    assert _engine_row(line, "rfc5424") == _oracle_row(line, "rfc5424")
