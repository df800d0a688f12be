"""Vectorized (pandas/numpy) fast-path parsers for the three formats.

Design: one anchored full-line regex per format accepts the well-formed
grammar subset; every accepted row is guaranteed to produce the same parse
as the per-row oracle (``syslog_spark.oracle``). Rows the fast path cannot
guarantee (malformed rows that need reference-exact error strings/columns,
and rare grammar corners like fields starting with '-', fields ending in
']', unescaped-quote nginx values) are flagged ``slow`` and re-parsed by
the oracle in ``operators/parse.py``.

The grammar is the reference's (Arthurgyh/syslog): formats.go:49-106,
parsers.go throughout. Conservative rule: when in doubt the fast path
REJECTS (stricter-or-equal than the reference), never accepts something
the reference would reject — so fast-path acceptance + oracle fallback is
semantics-exact by construction.

All hot operations are pandas ``.str`` / numpy batch calls; the only
Python-level loops are over regex *matches* when assembling the nested
structured-data objects (bounded by blocks-per-row, not string length).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .. import constants as C

# ---------------------------------------------------------------------------
# regexes
# ---------------------------------------------------------------------------

_PRI = r"<(\d{1,3})>"
# version: 1-2 digits + space, or a bare space (absent) — parsers.go:80-107
_VER = r"(?:(\d{1,2}) | )"
# fixed-width RFC3339 / RFC3339Nano (see oracle.parse_rfc3339_fixed)
_TS5424 = r"(-|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{9})?[+-]\d{2}:\d{2})"
_TS_NGINX = r"([A-Za-z]{3}) ([ \d]\d) (\d\d):(\d\d):(\d\d)"
_VAL = r"([^ ]+)"  # space-delimited token (parseSingleValue)
# structured-data blocks: non-empty block (>=1 param), empty block
_BLOCK_NE = r"\[[^ \]]{1,32}(?: [^= \]\"]{1,32}=\"[^\"]*\")+\]"
_BLOCK_E = r"\[[^ \]]{1,32}\]"

RX_RFC5424 = re.compile(
    rf"^{_PRI}{_VER}{_TS5424} {_VAL} {_VAL} {_VAL} {_VAL} "
    rf"(-|(?:{_BLOCK_NE})+)(?: (.*))?$",
    re.S,
)
# empty final block only valid at absolute end-of-line (parseData's
# trailing-']' unread quirk, parsers.go:347-350)
RX_RFC5424_EMPTY_SD = re.compile(
    rf"^{_PRI}{_VER}{_TS5424} {_VAL} {_VAL} {_VAL} {_VAL} "
    rf"((?:{_BLOCK_NE})*{_BLOCK_E})$",
    re.S,
)
RX_NGINX_ACCESS = re.compile(
    rf"^{_PRI}{_TS_NGINX} {_VAL} {_VAL} (-|(?:{_BLOCK_NE})+)( .*)?$",
    re.S,
)
RX_NGINX_ACCESS_EMPTY_SD = re.compile(
    rf"^{_PRI}{_TS_NGINX} {_VAL} {_VAL} ((?:{_BLOCK_NE})*{_BLOCK_E})$",
    re.S,
)
RX_NGINX_ERROR = re.compile(
    rf"^{_PRI}{_TS_NGINX} {_VAL} {_VAL} .{{19}} \[[^\]]*\] ([^,]*), (.+)$",
    re.S,
)

# block / param extraction (5424-style structured data)
RX_SD_BLOCK = re.compile(r"\[([^ \]]{1,32})((?: [^= \]\"]{1,32}=\"[^\"]*\")*)\]")
RX_SD_PARAM = re.compile(r" ([^= \]\"]{1,32})=\"([^\"]*)\"")

# nginx-error data pairs ('key: value, ...', getValue parsers.go:433-496).
# Fast path excludes '"' and '\' inside unquoted parts and ',' in keys.
# Quoted content must be non-empty (Go slice-panics on `""`, parsers.go:476).
# An EMPTY unquoted value is only valid at end-of-string: mid-string the
# following ',' would be *appended* by Go's not-started branch
# (parsers.go:449-462), not treated as the delimiter.
_SP = r"[ \t\n\r]"
_QCONTENT = r"(?:[^\"\\]|\\\")+"  # non-empty: Go panics on `""`
_KU_BODY = r"[^:\",\\\t\n\r ][^:\"\\,]*"
_VU_BODY = r"[^\",\\\t\n\r ][^,\"\\]*"
# key part: quoted or unquoted, through the ':' and following spaces
_KEYPART_NC = rf"{_SP}*(?:\"{_QCONTENT}\"{_SP}*|{_KU_BODY}):{_SP}*"
# non-capturing pair with a NON-empty value (general position)
_PAIR_NC = rf"{_KEYPART_NC}(?:\"{_QCONTENT}\"{_SP}*|{_VU_BODY})"
# full tail: pairs with non-empty values, optionally a final empty-value key
RX_NGINX_PAIRS_FULL = re.compile(
    rf"^(?:{_PAIR_NC}(?:,{_PAIR_NC})*(?:,{_KEYPART_NC})?|{_KEYPART_NC})$",
    re.S,
)
# capturing pair for extraction (VU may be empty — only reached on strings
# already validated by RX_NGINX_PAIRS_FULL, where empty values are last)
RX_NGINX_PAIR = re.compile(
    rf"{_SP}*(?:\"({_QCONTENT})\"{_SP}*|({_KU_BODY})):"
    rf"{_SP}*(?:\"({_QCONTENT})\"{_SP}*|((?:{_VU_BODY})?))",
    re.S,
)

_MONTH_INDEX = {name: i + 1 for i, name in enumerate(C.MONTH_NAMES)}

_DIM_BASE = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


# ---------------------------------------------------------------------------
# numpy civil-date math (mirrors oracle.days_from_civil, vectorized)
# ---------------------------------------------------------------------------


def days_from_civil_np(y, m, d):
    y = y.astype(np.int64) - (m <= 2)
    era = np.floor_divide(y, 400)
    yoe = y - era * 400
    mp = m + np.where(m > 2, -3, 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _days_in_month_np(y, m):
    dim = _DIM_BASE[np.clip(m, 1, 12) - 1]
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    return np.where((m == 2) & leap, 29, dim)


def _epoch_micros_np(y, mo, d, h, mi, s, nanos, offset):
    """Vectorized epoch micros with Go AddDate-style day-overflow
    normalization (Feb 29 + non-leap target year -> Mar 1)."""
    dim = _days_in_month_np(y, mo)
    overflow = np.maximum(d - dim, 0)
    days = days_from_civil_np(y, mo, np.minimum(d, dim)) + overflow
    secs = days * 86400 + h * 3600 + mi * 60 + s - offset
    return secs * 1_000_000 + nanos // 1000


# ---------------------------------------------------------------------------
# field helpers
# ---------------------------------------------------------------------------


def _nil_to_empty(ser: pd.Series) -> pd.Series:
    return ser.mask(ser == C.NIL_VALUE, "")


def _bad_single_value(ser: pd.Series, max_len: int) -> pd.Series:
    """Rows where the reference would NOT produce this plain token:
    too long (error), trailing ']' (unread quirk), or a '-' prefix with
    more bytes (nil-value consumes only the dash -> downstream error)."""
    return (
        (ser.str.len() > max_len)
        | ser.str.endswith("]")
        | (ser.str.startswith("-") & (ser.str.len() > 1))
    )


def _strip_message(ser: pd.Series) -> pd.Series:
    """parseMsg (parsers.go:281-288): trim, strip BOM, trim."""
    out = ser.fillna("").str.strip()
    bom = out.str.startswith("\ufeff")
    if bom.any():
        out = out.mask(bom, out.str.slice(1).str.strip())
    return out


def _assemble_sd(data_ser: pd.Series) -> pd.Series:
    """'[id k="v"]...' strings -> canonical sorted assoc-lists.

    Map semantics preserved (SURVEY.md §1.3): duplicate sd-id resets the
    block (parsers.go:205), duplicate param key last-wins (parsers.go:221),
    param value '-' dropped (parsers.go:220-222). Returns an object Series
    (None for '-'). Expects a positional (0..n-1) index; returns a numpy
    object array aligned to it (pandas .at scatter is ~60us/row — numpy
    assignment is the hot-path-safe form)."""
    n = len(data_ser)
    out = np.full(n, None, dtype=object)
    todo = data_ser[data_ser != C.NIL_VALUE]
    if todo.empty:
        return out
    blocks = todo.str.extractall(RX_SD_BLOCK)
    if blocks.empty:
        return out
    rows = blocks.index.get_level_values(0).to_numpy()
    sd_ids = blocks[0].to_numpy()
    raw_params = blocks[1].fillna("").to_numpy()  # empty captures -> NaN
    # per-block param split (loop over blocks, ~1-2 per row)
    findall = RX_SD_PARAM.findall
    per_row: dict = {}
    for ridx, sd_id, raw in zip(rows, sd_ids, raw_params):
        params: dict = {}
        for k, v in findall(raw):
            if v != C.NIL_VALUE:
                params[k] = v
        d = per_row.get(ridx)
        if d is None:
            d = {}
            per_row[ridx] = d
        d[sd_id] = params  # duplicate sd-id: last assignment wins
    for ridx, d in per_row.items():
        out[ridx] = [
            {
                "sd_id": sd_id,
                "params": [
                    {"key": k, "value": d[sd_id][k]} for k in sorted(d[sd_id])
                ],
            }
            for sd_id in sorted(d)
        ]
    return out


def _parse_ts5424(ts_ser: pd.Series):
    """Validated RFC3339[Nano] -> (micros, nanos, offset, is_null, bad)."""
    isnil = (ts_ser == C.NIL_VALUE).to_numpy()
    g = ts_ser.str.extract(
        r"^(\d{4})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})"
        r"(?:\.(\d{9}))?([+-])(\d{2}):(\d{2})$"
    )
    has = g[0].notna().to_numpy()

    def col(i, default=0):
        return (
            pd.to_numeric(g[i], errors="coerce").fillna(default).to_numpy(np.int64)
        )

    y, mo, d = col(0), col(1), col(2)
    h, mi, s = col(3), col(4), col(5)
    nanos = pd.to_numeric(g[6], errors="coerce").fillna(0).to_numpy(np.int64)
    sign = np.where(g[7].to_numpy() == "-", -1, 1)
    offset = sign * (col(8) * 3600 + col(9) * 60)
    valid = (
        has
        & (mo >= 1)
        & (mo <= 12)
        & (h <= 23)
        & (mi <= 59)
        & (s <= 59)
        & (offset >= -23 * 3600 - 59 * 60)
        & (offset <= 23 * 3600 + 59 * 60)
    )
    dim = _days_in_month_np(y, np.clip(mo, 1, 12))
    valid &= (d >= 1) & (d <= dim)
    micros = _epoch_micros_np(y, mo, d, h, mi, s, nanos, offset)
    bad = ~isnil & ~valid
    return micros, nanos, offset, isnil, bad


def _parse_ts_nginx(mon: pd.Series, day: pd.Series, h, mi, s, ref_year, ref_tz):
    """'Jan _2 15:04:05' groups -> (micros, offset, bad). Year-less parse
    validated against year 0 (leap), then +reference_year with Go AddDate
    normalization (helpers.go:46-49)."""
    mo = mon.str.capitalize().map(_MONTH_INDEX)
    bad = mo.isna().to_numpy()
    mo = mo.fillna(1).to_numpy(np.int64)
    d = pd.to_numeric(day.str.strip(), errors="coerce")
    bad |= d.isna().to_numpy()
    d = d.fillna(1).to_numpy(np.int64)
    hv = pd.to_numeric(h, errors="coerce").fillna(0).to_numpy(np.int64)
    miv = pd.to_numeric(mi, errors="coerce").fillna(0).to_numpy(np.int64)
    sv = pd.to_numeric(s, errors="coerce").fillna(0).to_numpy(np.int64)
    dim0 = _days_in_month_np(np.zeros_like(mo), mo)  # year 0 is leap
    bad |= (d < 1) | (d > dim0) | (hv > 23) | (miv > 59) | (sv > 59)
    y = np.full_like(mo, ref_year)
    micros = _epoch_micros_np(
        y, mo, d, hv, miv, sv, np.zeros_like(mo), np.int64(ref_tz)
    )
    return micros, bad


def _assemble_nginx_pairs(data_ser: pd.Series) -> tuple[pd.Series, np.ndarray]:
    """nginx-error 'key: value, ...' -> canonical assoc-list under sd-id
    'data'. Returns (numpy objects, slow_mask), positional index assumed."""
    ok = data_ser.str.fullmatch(RX_NGINX_PAIRS_FULL).fillna(False)
    slow = ~ok.to_numpy()
    out = np.full(len(data_ser), None, dtype=object)
    todo = data_ser[ok]
    if todo.empty:
        return out, slow
    pairs = todo.str.extractall(RX_NGINX_PAIR)
    # quoted parts: unescape \" ; unquoted: right-trim (unicode space)
    kq = pairs[0].str.replace('\\"', '"', regex=False)
    ku = pairs[1].str.rstrip()
    vq = pairs[2].str.replace('\\"', '"', regex=False)
    vu = pairs[3].str.rstrip()
    keys = kq.fillna(ku).to_numpy()
    vals = vq.fillna(vu).fillna("").to_numpy()
    rows = pairs.index.get_level_values(0).to_numpy()
    per_row: dict = {}
    for ridx, k, v in zip(rows, keys, vals):
        per_row.setdefault(ridx, {})[k] = v  # duplicate key last-wins
    for ridx, d in per_row.items():
        out[ridx] = [
            {
                "sd_id": "data",
                "params": [{"key": k, "value": d[k]} for k in sorted(d)],
            }
        ]
    return out, slow


# ---------------------------------------------------------------------------
# per-format batch parsers
# ---------------------------------------------------------------------------

_NULL_INT = np.iinfo(np.int64).min  # sentinel replaced by None at assembly


def _empty_result(n: int) -> dict:
    return {
        "priority": np.full(n, _NULL_INT, np.int64),
        "version": np.full(n, _NULL_INT, np.int64),
        "ts_micros": np.full(n, _NULL_INT, np.int64),
        "ts_nanos": np.full(n, _NULL_INT, np.int64),
        "tz_offset_seconds": np.full(n, _NULL_INT, np.int64),
        "hostname": np.full(n, None, object),
        "appname": np.full(n, None, object),
        "proc_id": np.full(n, None, object),
        "msg_id": np.full(n, None, object),
        "data": np.full(n, None, object),
        "message": np.full(n, None, object),
        "slow": np.ones(n, bool),
    }


def parse_rfc5424_fast(lines: pd.Series, ref_year: int, ref_tz: int) -> dict:
    """RFC 5424 fast path (formats.go:49-67). Returns column dict + slow mask."""
    n = len(lines)
    out = _empty_result(n)
    g = lines.str.extract(RX_RFC5424)
    miss = g[0].isna()
    if miss.any():
        g2 = lines[miss].str.extract(RX_RFC5424_EMPTY_SD)
        hit2 = g2[0].notna()
        if hit2.any():
            sub = g2[hit2]
            for c in range(8):  # pri, ver, ts, 4 values, data
                g.loc[sub.index, c] = sub[c]
            # column 8 (message) stays NaN: no message in the empty-SD form
    ok = g[0].notna()
    if not ok.any():
        return out
    gi = g[ok]
    pri = pd.to_numeric(gi[0]).to_numpy(np.int64) & 0xFF
    ver = pd.to_numeric(gi[1], errors="coerce").fillna(0).to_numpy(np.int64)
    micros, nanos, offset, ts_null, ts_bad = _parse_ts5424(gi[2])
    host, app = _nil_to_empty(gi[3]), _nil_to_empty(gi[4])
    proc, msgid = _nil_to_empty(gi[5]), _nil_to_empty(gi[6])
    bad = (
        ts_bad
        | _bad_single_value(gi[3], C.MAX_HOSTNAME_LEN).to_numpy()
        | _bad_single_value(gi[4], C.MAX_APPNAME_LEN).to_numpy()
        | _bad_single_value(gi[5], C.MAX_PROCID_LEN).to_numpy()
        | _bad_single_value(gi[6], C.MAX_MSGID_LEN).to_numpy()
    )
    data = _assemble_sd(gi[7].reset_index(drop=True))
    message = _strip_message(gi[8])

    idx = np.flatnonzero(ok.to_numpy())
    good = idx[~bad]
    keep = ~bad
    out["slow"][good] = False
    out["priority"][good] = pri[keep]
    out["version"][good] = ver[keep]
    out["ts_micros"][good] = np.where(ts_null[keep], _NULL_INT, micros[keep])
    out["ts_nanos"][good] = np.where(ts_null[keep], _NULL_INT, nanos[keep])
    out["tz_offset_seconds"][good] = np.where(
        ts_null[keep], _NULL_INT, offset[keep]
    )
    out["hostname"][good] = host.to_numpy()[keep]
    out["appname"][good] = app.to_numpy()[keep]
    out["proc_id"][good] = proc.to_numpy()[keep]
    out["msg_id"][good] = msgid.to_numpy()[keep]
    out["data"][good] = data[keep]
    out["message"][good] = message.to_numpy()[keep]
    return out


def _parse_nginx_common(lines, rx_main, rx_empty_sd, ref_year, ref_tz):
    g = lines.str.extract(rx_main)
    if rx_empty_sd is not None:
        miss = g[0].isna()
        if miss.any():
            g2 = lines[miss].str.extract(rx_empty_sd)
            hit2 = g2[0].notna()
            if hit2.any():
                sub = g2[hit2]
                for c in sub.columns:
                    g.loc[sub.index, c] = sub[c]
    return g


def parse_nginx_access_fast(lines: pd.Series, ref_year: int, ref_tz: int) -> dict:
    """Nginx access fast path (formats.go:70-83)."""
    n = len(lines)
    out = _empty_result(n)
    g = _parse_nginx_common(
        lines, RX_NGINX_ACCESS, RX_NGINX_ACCESS_EMPTY_SD, ref_year, ref_tz
    )
    ok = g[0].notna()
    if not ok.any():
        return out
    gi = g[ok]
    pri = pd.to_numeric(gi[0]).to_numpy(np.int64) & 0xFF
    micros, ts_bad = _parse_ts_nginx(
        gi[1], gi[2], gi[3], gi[4], gi[5], ref_year, ref_tz
    )
    host = _nil_to_empty(gi[6])
    app_raw = gi[7]
    app = _nil_to_empty(app_raw).str.replace(r":$", "", regex=True)
    bad = (
        ts_bad
        | _bad_single_value(gi[6], C.MAX_HOSTNAME_LEN).to_numpy()
        | _bad_single_value(app_raw, C.MAX_APPNAME_LEN).to_numpy()
    )
    data = _assemble_sd(gi[8].reset_index(drop=True))

    idx = np.flatnonzero(ok.to_numpy())
    good = idx[~bad]
    keep = ~bad
    out["slow"][good] = False
    out["priority"][good] = pri[keep]
    out["version"][good] = 0
    out["ts_micros"][good] = micros[keep]
    out["ts_nanos"][good] = 0
    out["tz_offset_seconds"][good] = ref_tz
    out["hostname"][good] = host.to_numpy()[keep]
    out["appname"][good] = app.to_numpy()[keep]
    out["proc_id"][good] = ""
    out["msg_id"][good] = ""
    out["data"][good] = data[keep]
    out["message"][good] = ""
    return out


def parse_nginx_error_fast(lines: pd.Series, ref_year: int, ref_tz: int) -> dict:
    """Nginx error fast path (formats.go:86-106). Only the complete
    'msg, key: value, ...' tail is handled here; tail-optional EOF cases
    (stage>=16 tolerance, syslog.go:150-153) go to the oracle."""
    n = len(lines)
    out = _empty_result(n)
    g = lines.str.extract(RX_NGINX_ERROR)
    ok = g[0].notna()
    if not ok.any():
        return out
    gi = g[ok]
    pri = pd.to_numeric(gi[0]).to_numpy(np.int64) & 0xFF
    micros, ts_bad = _parse_ts_nginx(
        gi[1], gi[2], gi[3], gi[4], gi[5], ref_year, ref_tz
    )
    host = _nil_to_empty(gi[6])
    app_raw = gi[7]
    app = _nil_to_empty(app_raw).str.replace(r":$", "", regex=True)
    message = gi[8].str.strip()
    data, pairs_slow = _assemble_nginx_pairs(gi[9].reset_index(drop=True))
    bad = (
        ts_bad
        | pairs_slow
        | _bad_single_value(gi[6], C.MAX_HOSTNAME_LEN).to_numpy()
        | _bad_single_value(app_raw, C.MAX_APPNAME_LEN).to_numpy()
    )

    idx = np.flatnonzero(ok.to_numpy())
    good = idx[~bad]
    keep = ~bad
    out["slow"][good] = False
    out["priority"][good] = pri[keep]
    out["version"][good] = 0
    out["ts_micros"][good] = micros[keep]
    out["ts_nanos"][good] = 0
    out["tz_offset_seconds"][good] = ref_tz
    out["hostname"][good] = host.to_numpy()[keep]
    out["appname"][good] = app.to_numpy()[keep]
    out["proc_id"][good] = ""
    out["msg_id"][good] = ""
    out["data"][good] = data[keep]
    out["message"][good] = message.to_numpy()[keep]
    return out


FAST_PARSERS = {
    C.FORMAT_RFC5424: parse_rfc5424_fast,
    C.FORMAT_NGINX_ACCESS: parse_nginx_access_fast,
    C.FORMAT_NGINX_ERROR: parse_nginx_error_fast,
}
