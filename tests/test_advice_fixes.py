r"""Round-2 correctness pins (ADVICE.md findings).

Each test pins a behavior where the oracle/engines previously diverged from
the Go reference:
  1. Go time.Parse union semantics for the fixed-width RFC3339 peeks
     (implicit fractional second, comma separators, the strict-parser
     ignored-error >9-digit-fraction quirk).
  2. Go unicode.IsSpace trims (Python's default strip also takes
     \x1c-\x1f; Go does not).
  3. addValue's pre-trim emptiness check (whitespace-only field -> empty
     token, not '-').
  4. Full strconv.AppendQuote escapes in go_quote (\a \b \v \f, \uNNNN,
     invalid-byte \xNN).
  5. Null input lines -> error rows instead of worker crashes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from syslog_spark import constants as C
from syslog_spark import oracle as O
from syslog_spark.operators import parse as P
from syslog_spark.operators import serialize as S


def _ts(inp: str):
    cur = O.Cursor(inp.encode())
    m = O.Msg()
    stage = O.make_parse_timestamp(
        (25, O.parse_rfc3339_fixed), (35, O.parse_rfc3339_fixed)
    )
    stage(cur, m)
    return m.timestamp, cur.read_all()


# --- 1. RFC3339 fixed-width union semantics (parsers.go:133-148 + Go
#        time.ParseInLocation = parseRFC3339 strict path OR general parse) ---


@pytest.mark.parametrize(
    "inp,want,leftover",
    [
        # implicit fractional second in the 25-byte window: the RFC3339
        # layout has no fraction, Go's general parser still consumes
        # '.dddd' (and ','), then 'Z07:00' matches a bare 'Z'
        (
            "2015-09-30T23:10:11.1234Z",
            O.TimeVal(2015, 9, 30, 23, 10, 11, 123400000, 0),
            b"",
        ),
        (
            "2015-09-30T23:10:11,1234Z",
            O.TimeVal(2015, 9, 30, 23, 10, 11, 123400000, 0),
            b"",
        ),
        # comma as the fraction separator in the 35-byte RFC3339Nano window
        (
            "2015-10-18T17:05:55,956934919+02:00",
            O.TimeVal(2015, 10, 18, 17, 5, 55, 956934919, 7200),
            b"",
        ),
        # >9 fraction digits: Go >=1.17 parseNanoseconds clamps the
        # fraction to value[:10] before atoi -> first 9 digits kept
        (
            "2015-10-18T17:05:55.12345678901234Z",
            O.TimeVal(2015, 10, 18, 17, 5, 55, 123456789, 0),
            b"",
        ),
        # comma variant goes through the general parser's implicit-
        # fraction path, same first-9-digit clamp
        (
            "2015-10-18T17:05:55,12345678901234Z",
            O.TimeVal(2015, 10, 18, 17, 5, 55, 123456789, 0),
            b"",
        ),
    ],
)
def test_rfc3339_union_accepts(inp, want, leftover):
    got, rest = _ts(inp)
    assert got == want
    assert rest == leftover


@pytest.mark.parametrize(
    "inp",
    [
        # bare Z with no fraction: 25-byte peek has 5 extra bytes -> Go
        # 'extra text' error on both widths
        "2015-09-30T23:10:11Z extra pad",
        # 3-digit fraction + Z is 24 bytes; the 25-byte peek drags in the
        # following space -> extra text
        "2015-09-30T23:10:11.123Z x pad pad",
        # non-digit inside the 14-char fraction window -> neither parser
        "2015-10-18T17:05:55.12345x78901234Z",
    ],
)
def test_rfc3339_union_rejects(inp):
    with pytest.raises(O.FormatError):
        _ts(inp)


def test_rfc5424_line_with_implicit_fraction_ts():
    r = O.parse_message(
        "<13>1 2015-09-30T23:10:11.1234Z host app - - - hi", "rfc5424"
    )
    assert r.error_msg is None
    assert r.msg.timestamp == O.TimeVal(2015, 9, 30, 23, 10, 11, 123400000, 0)
    assert r.msg.hostname == "host" and r.msg.message == "hi"


# --- 2. Go unicode.IsSpace trims (no \x1c-\x1f) -----------------------------


def test_msg_trim_keeps_fs_gs_rs_us():
    r = O.parse_message("<13>1 - - - - - - hi\x1c", "rfc5424")
    assert r.msg.message == "hi\x1c"
    r = O.parse_message("<13>1 - - - - - - \x1fhi \t", "rfc5424")
    assert r.msg.message == "\x1fhi"


def test_nginx_value_rtrim_keeps_fs():
    r = O.parse_message(
        "<190>Oct 18 17:05:55 h nginx: 2019/10/18 17:05:55 [error] m, "
        "key: val\x1c, k2: v2 \t",
        "nginx_error",
    )
    assert r.msg.data == {"data": {"key": "val\x1c", "k2": "v2"}}


def test_fastpath_matches_oracle_on_fs_trim():
    # \x1c is ASCII so these lines are fast-path eligible; the fast path
    # must agree with the oracle byte-for-byte
    lines = [
        "<13>1 - - - - - - hi\x1c",
        "<190>Oct 18 17:05:55 h nginx: 2019/10/18 17:05:55 [error] "
        "m\x1c , key: val\x1c",
    ]
    sources = ["rfc5424", "nginx_error"]
    full, arrow_cols = P._parse_lines_batch(
        pa.array(lines, pa.string()), pa.array(sources, pa.string()),
        C.DEFAULT_REFERENCE_YEAR, C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    )
    msgs = arrow_cols["message"].to_pylist()
    want = [
        O.parse_message(ln, fmt).msg.message
        for ln, fmt in zip(lines, sources)
    ]
    assert msgs == want == ["hi\x1c", "m\x1c"]
    data = arrow_cols["data"].to_pylist()
    assert data[1][0]["params"] == [{"key": "key", "value": "val\x1c"}]


# --- 3. addValue pre-trim emptiness (syslog.go:85-93) ------------------------


def test_serialize_whitespace_only_field_empty_token():
    m = O.Msg(priority=13, version=1, hostname=" ", appname="app")
    line = O.serialize(m)
    # hostname ' ' -> TrimSpace -> empty token (double space), NOT '-'
    assert line == "<13>1 -  app - - -"


def test_serialize_batch_matches_oracle_pretrim():
    import pandas as pd

    out = S.serialize_batch(
        priority=pd.Series([13]), version=pd.Series([1]),
        ts_micros=pd.Series([None]), ts_nanos=pd.Series([None]),
        tz_offset_seconds=pd.Series([None]),
        hostname=pd.Series([" "]), appname=pd.Series(["app"]),
        proc_id=pd.Series([""]), msg_id=pd.Series([None]),
        data=pd.Series([None]), message=pd.Series([""]),
    )
    assert out.iloc[0] == "<13>1 -  app - - -"


def test_serialize_trim_keeps_fs():
    m = O.Msg(priority=13, version=1, hostname="\x1ch\x1c", appname="a")
    assert O.serialize(m) == "<13>1 - \x1ch\x1c a - - -"


# --- 4. go_quote = strconv.AppendQuote --------------------------------------


@pytest.mark.parametrize(
    "inp,want",
    [
        ("\a\b\v\f", r'"\a\b\v\f"'),
        ("\n\r\t", r'"\n\r\t"'),
        ("\x00\x1b\x7f", r'"\x00\x1b\x7f"'),
        ("\x85", '"' + "\\u0085" + '"'),  # C1 control: \\u escape
        ("\xa0", '"' + "\\u00a0" + '"'),  # NBSP: IsSpace, not IsPrint
        ("\u0378", '"' + "\\u0378" + '"'),  # unassigned BMP rune
        ("\U000e0001", r'"\U000e0001"'),  # non-printable astral rune (Cf)
        ("é中", '"é中"'),               # printable non-ASCII verbatim
        ('a"b\\c', r'"a\"b\\c"'),
        (b"\xff".decode("utf-8", "surrogateescape"), r'"\xff"'),
    ],
)
def test_go_quote_full(inp, want):
    assert O._go_quote(inp) == want


# --- 5. null lines -----------------------------------------------------------


def test_null_line_yields_error_row():
    full, arrow_cols = P._parse_lines_batch(
        pa.array([None, "<13>1 - - - - - - ok"], pa.string()),
        pa.array(["rfc5424", "rfc5424"], pa.string()),
        C.DEFAULT_REFERENCE_YEAR, C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    )
    assert full["error_msg"][0] == "null line"
    assert full["error_msg"][1] is None
    assert arrow_cols["message"].to_pylist() == [None, "ok"]


def test_detokenize_preserves_null_rows():
    arr = pa.array([[104, 105], None, []], pa.list_(pa.int32()))
    out = P.detokenize_array(arr)
    assert out.to_pylist() == ["hi", None, ""]
