"""Serialization: parsed rows -> canonical RFC 5424 lines (reverse operator).

Mirror of Message.Bytes/String (syslog.go:37-122): '<pri>' always, version
omitted when 0, '-' for absent timestamp / empty strings, values
space-trimmed, structured data with both key levels sorted (already sorted
in our canonical storage form), ' message' only when non-empty, RFC3339Nano
timestamps with trailing-zero-trimmed fractions and 'Z' for UTC.

Implemented as a vectorized pandas UDF: scalar fields via pandas/numpy
batch ops; the nested structured-data string is the only per-row join
(bounded by params-per-row). Used for the token round-trip invariant
(SURVEY.md §1.2) and as the user-facing re-emit operator. Row-set
checksums for routing parity do NOT use this (they use JVM-side
to_json+xxhash64 in operators/route.py — zero Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .fastpath import _DIM_BASE  # noqa: F401  (shared civil-date tables)


def _civil_from_days_np(z):
    z = z + 719468
    era = np.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + np.where(mp < 10, 3, -9)
    return y + (m <= 2), m, d


def _z2(a):
    return pd.Series(a).astype(str).str.zfill(2)


def _format_ts(ts_micros, ts_nanos, tz_off) -> pd.Series:
    """Vectorized Go time.RFC3339Nano (see oracle.format_timestamp_rfc3339nano)."""
    micros = ts_micros.to_numpy(np.int64)
    nanos = ts_nanos.fillna(0).to_numpy(np.int64)
    off = tz_off.fillna(0).to_numpy(np.int64)
    secs = (micros - nanos // 1000) // 1_000_000
    wall = secs + off
    days = np.floor_divide(wall, 86400)
    tod = wall - days * 86400
    y, mo, d = _civil_from_days_np(days)
    base = (
        pd.Series(y).astype(str).str.zfill(4)
        + "-" + _z2(mo) + "-" + _z2(d)
        + "T" + _z2(tod // 3600) + ":" + _z2((tod % 3600) // 60)
        + ":" + _z2(tod % 60)
    )
    has_frac = nanos > 0
    if has_frac.any():
        frac = "." + pd.Series(nanos).astype(str).str.zfill(9).str.rstrip("0")
        base = base + frac.where(pd.Series(has_frac), "")
    sign = np.where(off >= 0, "+", "-")
    aoff = np.abs(off)
    offstr = pd.Series(sign) + _z2(aoff // 3600) + ":" + _z2((aoff % 3600) // 60)
    offstr = offstr.mask(pd.Series(off == 0), "Z")
    return (base + offstr).set_axis(ts_micros.index)


def _go_quote_simple(s: str) -> str:
    # subset of strconv.AppendQuote for log-safe strings (oracle._go_quote)
    from ..oracle import _go_quote

    return _go_quote(s)


def _data_str(data_objs: pd.Series) -> pd.Series:
    """Canonical sorted '[id k="v" ...]...' or '-' (syslog.go:97-122).

    Stored form is already sorted at both levels (schema.py), so this is a
    pure join; re-sorting defensively costs little and keeps the operator
    total for hand-built rows."""
    out = []
    for d in data_objs:
        if d is None or (hasattr(d, "__len__") and len(d) == 0):
            out.append("-")
            continue
        parts = []
        for block in sorted(d, key=lambda b: b["sd_id"]):
            seg = ["[", block["sd_id"]]
            params = block["params"]
            if params is None:
                params = []
            for p in sorted(params, key=lambda p: p["key"]):
                seg.append(f' {p["key"]}={_go_quote_simple(p["value"])}')
            seg.append("]")
            parts.append("".join(seg))
        out.append("".join(parts))
    return pd.Series(out, index=data_objs.index)


def serialize_batch(
    priority, version, ts_micros, ts_nanos, tz_offset_seconds,
    hostname, appname, proc_id, msg_id, data, message,
) -> pd.Series:
    """Vectorized Message.Bytes over pandas columns. Null priority (error
    rows) -> null output."""
    n = len(priority)
    pri = priority.astype("float").fillna(0).astype(np.int64)
    head = "<" + pri.astype(str) + ">"
    ver = version.astype("float").fillna(0).astype(np.int64)
    head = head + pd.Series(np.where(ver != 0, ver.astype(str), ""), index=head.index)

    ts_str = pd.Series(np.full(n, "-", object), index=head.index)
    has_ts = ts_micros.notna()
    if has_ts.any():
        ts_str[has_ts] = _format_ts(
            ts_micros[has_ts], ts_nanos[has_ts], tz_offset_seconds[has_ts]
        )

    def val(col):
        s = col.fillna("").str.strip()
        return s.mask(s == "", "-")

    body = (
        head + " " + ts_str + " " + val(hostname) + " " + val(appname)
        + " " + val(proc_id) + " " + val(msg_id) + " " + _data_str(data)
    )
    msg = message.fillna("")
    body = body + (" " + msg).where(msg != "", "")
    return body.mask(priority.isna(), None)


def with_canonical(df, out_col: str = "canonical"):
    """Append the canonical serialized line (null for error rows)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _ser(
        priority, version, ts_micros, ts_nanos, tz_offset_seconds,
        hostname, appname, proc_id, msg_id, data, message,
    ):
        return serialize_batch(
            priority, version, ts_micros, ts_nanos, tz_offset_seconds,
            hostname, appname, proc_id, msg_id, data, message,
        )

    return df.withColumn(
        out_col,
        _ser(
            "priority", "version", "ts_micros", "ts_nanos",
            "tz_offset_seconds", "hostname", "appname", "proc_id",
            "msg_id", "data", "message",
        ),
    )
