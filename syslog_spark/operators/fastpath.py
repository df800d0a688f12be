"""Vectorized Arrow-native fast-path parsers for the three formats.

Design: one anchored full-line regex per format (RE2 via
``pyarrow.compute.extract_regex`` — C++-side, zero Python string boxing)
accepts the well-formed grammar subset; every accepted row is guaranteed
to produce the same parse as the per-row oracle (``syslog_spark.oracle``).
Rows the fast path cannot guarantee (malformed rows that need
reference-exact error strings/columns, and rare grammar corners like
fields starting with '-', fields ending in ']', unescaped-quote nginx
values, non-ASCII bytes) are flagged ``slow`` and re-parsed by the oracle
in ``operators/parse.py``.

The grammar is the reference's (Arthurgyh/syslog): formats.go:49-106,
parsers.go throughout. Conservative rule: when in doubt the fast path
REJECTS (stricter-or-equal than the reference), never accepts something
the reference would reject — so fast-path acceptance + oracle fallback is
semantics-exact by construction.

Performance shape (the reason this module is Arrow-first): pandas
object-dtype string ops allocate a PyObject per row per op; at 32
concurrent workers that memory churn inflated per-worker runtime 1.4x.
Arrow compute kernels showed ~1.0 inflation at 32 procs and ~4x the
single-core throughput. The only Python-level loop left is the regex
*match* loop for multi-match structured-data extraction (bounded by
blocks-per-row), which runs over one NUL-joined blob per batch.

Timestamps never touch datetime types: fixed-offset byte math over the
raw Arrow string buffers (the corpus includes year 3000 — outside
datetime64[ns]) feeding int64 epoch-micros, exactly mirroring
oracle.parse_rfc3339_fixed / parse_jan2_fixed.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import constants as C
from .schema import DATA_T_PA

# ---------------------------------------------------------------------------
# regexes (RE2 syntax; named groups for extract_regex)
# ---------------------------------------------------------------------------

_PRI = r"<(?P<pri>\d{1,3})>"
# version: 1-2 digits + space, or a bare space (absent) — parsers.go:80-107
_VER = r"(?:(?P<ver>\d{1,2}) | )"
# fixed-width RFC3339 / RFC3339Nano (see oracle.parse_rfc3339_fixed)
_TS5424 = (
    r"(?P<ts>-|\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d{9})?[+-]\d{2}:\d{2})"
)
_TS_NGINX = r"(?P<ts>[A-Za-z]{3} [ \d]\d \d\d:\d\d:\d\d)"
# structured-data blocks: non-empty block (>=1 param), empty block
_BLOCK_NE = r"\[[^ \]]{1,32}(?: [^= \]\"]{1,32}=\"[^\"]*\")+\]"
_BLOCK_E = r"\[[^ \]]{1,32}\]"


def _v(name):  # space-delimited token (parseSingleValue)
    return rf"(?P<{name}>[^ ]+)"


RX_RFC5424 = (
    rf"^{_PRI}{_VER}{_TS5424} {_v('host')} {_v('app')} {_v('proc')} "
    rf"{_v('msgid')} (?P<data>-|(?:{_BLOCK_NE})+)(?: (?P<msg>(?s:.*)))?$"
)
# empty final block only valid at absolute end-of-line (parseData's
# trailing-']' unread quirk, parsers.go:347-350)
RX_RFC5424_EMPTY_SD = (
    rf"^{_PRI}{_VER}{_TS5424} {_v('host')} {_v('app')} {_v('proc')} "
    rf"{_v('msgid')} (?P<data>(?:{_BLOCK_NE})*{_BLOCK_E})$"
)
RX_NGINX_ACCESS = (
    rf"^{_PRI}{_TS_NGINX} {_v('host')} {_v('app')} "
    rf"(?P<data>-|(?:{_BLOCK_NE})+)(?: (?s:.*))?$"
)
RX_NGINX_ACCESS_EMPTY_SD = (
    rf"^{_PRI}{_TS_NGINX} {_v('host')} {_v('app')} "
    rf"(?P<data>(?:{_BLOCK_NE})*{_BLOCK_E})$"
)
RX_NGINX_ERROR = (
    rf"^{_PRI}{_TS_NGINX} {_v('host')} {_v('app')} (?s:.{{19}}) "
    rf"\[[^\]]*\] (?P<msg>[^,]*), (?P<data>(?s:.+))$"
)
# tail-optional forms (stage>=16 EOF tolerance, syslog.go:150-153): message
# with no comma, bare trailing comma, or comma+space — data stays unset
RX_NGINX_ERROR_NODATA = (
    rf"^{_PRI}{_TS_NGINX} {_v('host')} {_v('app')} (?s:.{{19}}) "
    rf"\[[^\]]*\] (?P<msg>[^,]*)(?:, ?)?$"
)

# block / param extraction (5424-style structured data). These run over a
# NUL-joined blob of many rows (one C-level scan instead of per-row calls),
# so every negated class also excludes \x00 — rows containing NUL are gated
# to the oracle path upstream, making \x00 a safe separator.
RX_SD_BLOCK = re.compile(
    r"\[([^ \]\x00]{1,32})((?: [^= \]\"\x00]{1,32}=\"[^\"\x00]*\")*)\]"
)
RX_SD_PARAM = re.compile(r" ([^= \]\"\x00]{1,32})=\"([^\"\x00]*)\"")

# nginx-error data pairs ('key: value, ...', getValue parsers.go:433-496).
# Fast path excludes '"' and '\' inside unquoted parts and ',' in keys.
# Quoted content must be non-empty (Go slice-panics on `""`, parsers.go:476).
# An EMPTY unquoted value is only valid at end-of-string: mid-string the
# following ',' would be *appended* by Go's not-started branch
# (parsers.go:449-462), not treated as the delimiter.
_SP = r"[ \t\n\r]"
_QCONTENT = r"(?:[^\"\\\x00]|\\\")+"  # non-empty: Go panics on `""`
_KU_BODY = r"[^:\",\\\t\n\r \x00][^:\"\\,\x00]*"
_VU_BODY = r"[^\",\\\t\n\r \x00][^,\"\\\x00]*"
# key part: quoted or unquoted, through the ':' and following spaces
_KEYPART_NC = rf"{_SP}*(?:\"{_QCONTENT}\"{_SP}*|{_KU_BODY}):{_SP}*"
# non-capturing pair with a NON-empty value (general position)
_PAIR_NC = rf"{_KEYPART_NC}(?:\"{_QCONTENT}\"{_SP}*|{_VU_BODY})"
# full tail: pairs with non-empty values, optionally a final empty-value key
RX_NGINX_PAIRS_FULL = (
    rf"^(?:{_PAIR_NC}(?:,{_PAIR_NC})*(?:,{_KEYPART_NC})?|{_KEYPART_NC})$"
)
# capturing pair for extraction (VU may be empty — only reached on strings
# already validated by RX_NGINX_PAIRS_FULL, where empty values are last)
RX_NGINX_PAIR = re.compile(
    rf"{_SP}*(?:\"({_QCONTENT})\"{_SP}*|({_KU_BODY})):"
    rf"{_SP}*(?:\"({_QCONTENT})\"{_SP}*|((?:{_VU_BODY})?))",
    re.S,
)
# python-re copy of the full-tail validator (blob scan alternative n/a:
# fullmatch runs via arrow match_substring_regex with ^$ anchors)

_DIM_BASE = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])

_NULL_INT = np.iinfo(np.int64).min  # sentinel replaced by None at assembly


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
# arrow <-> numpy bridges
# ---------------------------------------------------------------------------


def _np_fixed_bytes(arr: pa.Array, width: int):
    """String array -> (n, width) uint8 matrix + per-row byte lengths,
    straight from the Arrow buffers (no Python string boxing). Positions
    beyond a row's length are zero. Null rows come out all-zero."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], np.int32, n + 1, offset=arr.offset * 4)
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    starts = offsets[:-1].astype(np.int64)
    lens = (offsets[1:] - offsets[:-1]).astype(np.int64)
    if arr.null_count:
        valid = ~np.asarray(arr.is_null())
        lens = np.where(valid, lens, 0)
    if len(data) == 0:
        return np.zeros((n, width), np.int64), lens
    idx = starts[:, None] + np.arange(width)
    np.clip(idx, 0, len(data) - 1, out=idx)
    out = data[idx].astype(np.int64)
    out[np.arange(width)[None, :] >= lens[:, None]] = 0
    return out, lens


def _str(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _cast_int(arr: pa.Array, fill: int | None = None) -> np.ndarray:
    """Digit-string array -> int64 numpy; null/empty -> `fill` (or 0)."""
    empty_as_null = pc.if_else(pc.equal(arr, ""), pa.nulls(len(arr), pa.string()), arr)
    ints = pc.cast(empty_as_null, pa.int64())
    out = ints.to_numpy(zero_copy_only=False)
    mask = np.isnan(out) if out.dtype == np.float64 else np.asarray(ints.is_null())
    return np.where(mask, 0 if fill is None else fill, np.nan_to_num(out)).astype(np.int64)


def _nil_to_empty(arr: pa.Array) -> pa.Array:
    return pc.if_else(pc.equal(arr, C.NIL_VALUE), "", arr)


def _bad_single_value(arr: pa.Array, max_len: int):
    """Rows where the reference would NOT produce this plain token:
    too long (error), trailing ']' (unread quirk), or a '-' prefix with
    more bytes (nil-value consumes only the dash -> downstream error).
    Input is ASCII-gated, so codeunits == bytes."""
    ln = pc.binary_length(arr)
    bad = pc.or_kleene(
        pc.greater(ln, max_len),
        pc.or_kleene(
            pc.ends_with(arr, "]"),
            pc.and_kleene(pc.starts_with(arr, "-"), pc.greater(ln, 1)),
        ),
    )
    return pc.fill_null(bad, False).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# structured-data assembly (blob finditer + numpy lexsort -> Arrow lists)
# ---------------------------------------------------------------------------


def _blob_finditer(rx, strings):
    """One regex scan over a NUL-joined blob of row strings; returns
    (row_index_per_match, occurrence_within_row, list_of_group_tuples).
    Rows must be NUL-free (gated upstream). `strings` is a list of str."""
    n = len(strings)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), []
    lens = np.fromiter((len(s) for s in strings), np.int64, n)
    starts = np.zeros(n, np.int64)
    np.cumsum(lens[:-1] + 1, out=starts[1:])
    blob = "\x00".join(strings)
    mstarts = []
    groups = []
    for m in rx.finditer(blob):
        mstarts.append(m.start())
        groups.append(m.groups())
    if not mstarts:
        return np.zeros(0, np.int64), np.zeros(0, np.int64), []
    pos = np.array(mstarts, np.int64)
    rows = np.searchsorted(starts, pos, side="right") - 1
    # occurrence index within row (matches come out in document order)
    new_row = np.concatenate([[True], rows[1:] != rows[:-1]])
    idx = np.arange(len(rows))
    first_idx = idx[new_row]
    occ = idx - first_idx[np.cumsum(new_row) - 1]
    return rows, occ, groups


def _dedup_sort_groups(gid, key, occ):
    """Vectorized 'sort by key within group, duplicate key last-wins':
    returns (lexsort order, keep mask over that order). Mirrors Go map
    semantics + the canonical sorted emission (parsers.go:221,
    syslog.go:124-140). ASCII-only input => codepoint order == byte order."""
    order = np.lexsort((occ, key, gid))  # primary gid, then key, then occ
    g, k = gid[order], key[order]
    if len(g) == 0:
        return order, np.zeros(0, bool)
    same_next = (g[:-1] == g[1:]) & (k[:-1] == k[1:])
    keep = np.concatenate([~same_next, np.ones(1, bool)])
    return order, keep


def _params_list_array(pgid, pkeys, pvals, pocc, n_groups) -> pa.ListArray:
    """params child: list<struct<key,value>> per group id, key-sorted,
    last-wins, '-' values dropped (parsers.go:220-222)."""
    drop = pvals == C.NIL_VALUE
    if drop.any():
        keepm = ~drop
        pgid, pkeys, pvals, pocc = (
            pgid[keepm], pkeys[keepm], pvals[keepm], pocc[keepm]
        )
    order, keep = _dedup_sort_groups(pgid, pkeys, pocc)
    pg = pgid[order][keep]
    pk = pkeys[order][keep]
    pv = pvals[order][keep]
    counts = np.bincount(pg, minlength=n_groups)
    offsets = np.zeros(n_groups + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    struct = pa.StructArray.from_arrays(
        [pa.array(pk, pa.string()), pa.array(pv, pa.string())],
        ["key", "value"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)


def _take_with_nulls(arr: pa.Array, positions: np.ndarray, n: int) -> pa.Array:
    """Expand arr (dense) to length n: row i = arr[j] where positions[j]==i,
    null elsewhere."""
    idx = np.full(n, -1, np.int64)
    idx[positions] = np.arange(len(positions))
    return arr.take(pa.array(idx, pa.int64(), mask=idx < 0))


def _assemble_sd_arrow(data_arr: pa.Array) -> pa.Array:
    """'[id k="v"]...' strings -> canonical sorted assoc-lists as an Arrow
    array (type DATA_T_PA): one blob regex scan, then numpy lexsort/bincount
    for the map semantics (SURVEY.md §1.3 — dup sd-id resets the block, dup
    param key last-wins, '-' values dropped, both levels sorted bytewise).
    Null / '-' rows come back null."""
    n = len(data_arr)
    isnil = pc.fill_null(pc.equal(data_arr, C.NIL_VALUE), True)
    isnil = isnil.to_numpy(zero_copy_only=False)
    empty = pa.nulls(n, DATA_T_PA)
    todo_pos = np.flatnonzero(~isnil)
    if todo_pos.size == 0:
        return empty
    todo_vals = data_arr.take(pa.array(todo_pos)).to_pylist()
    brel, bmatch, bgroups = _blob_finditer(RX_SD_BLOCK, todo_vals)
    if not bgroups:
        return empty
    borig = todo_pos[brel]
    sd_ids = np.array([g[0] for g in bgroups], dtype=object)
    raw_params = [g[1] for g in bgroups]
    G = len(bgroups)

    pgid, pocc, pgroups = _blob_finditer(RX_SD_PARAM, raw_params)
    pkeys = np.array([g[0] for g in pgroups], dtype=object)
    pvals = np.array([g[1] for g in pgroups], dtype=object)
    params_list = _params_list_array(pgid, pkeys, pvals, pocc, G)

    # blocks: duplicate sd-id within a row -> LAST block wins
    # (plain map assignment, parsers.go:205); then sorted by sd-id.
    border, bkeep = _dedup_sort_groups(borig, sd_ids, bmatch)
    kept_gid = border[bkeep]
    bo = borig[border][bkeep]
    bs = sd_ids[border][bkeep]
    plist = params_list.take(pa.array(kept_gid, pa.int64()))
    struct = pa.StructArray.from_arrays(
        [pa.array(bs, pa.string()), plist], ["sd_id", "params"]
    )
    rcounts = np.bincount(bo, minlength=n)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(rcounts, out=offs[1:])
    omask = np.concatenate([isnil, np.zeros(1, bool)])
    offsets_pa = pa.array(offs.astype(np.int32), mask=omask)
    return pa.ListArray.from_arrays(offsets_pa, struct)


def _assemble_nginx_pairs_arrow(data_arr: pa.Array):
    """nginx-error 'key: value, ...' -> single-block assoc-list under sd-id
    'data' as an Arrow array. Returns (pa.Array len n, slow_mask)."""
    n = len(data_arr)
    has_data = pc.is_valid(data_arr).to_numpy(zero_copy_only=False)
    ok = pc.fill_null(
        pc.match_substring_regex(data_arr, RX_NGINX_PAIRS_FULL), False
    ).to_numpy(zero_copy_only=False)
    # null data = legitimately absent (tail-optional row): not slow, stays
    # null; only PRESENT-but-unvalidatable tails go to the oracle
    slow = has_data & ~ok
    tpos = np.flatnonzero(ok)
    if tpos.size == 0:
        return pa.nulls(n, DATA_T_PA), slow
    todo_vals = data_arr.take(pa.array(tpos)).to_pylist()
    pgid, occ, groups = _blob_finditer(RX_NGINX_PAIR, todo_vals)
    # quoted parts: unescape \" ; unquoted: right-trim with the Go space
    # set (bare rstrip() would also strip \x1c-\x1f — Go TrimRightFunc
    # with unicode.IsSpace does not; input is ASCII-gated)
    _ws = C.GO_WHITE_SPACE_ASCII
    keys = np.empty(len(groups), dtype=object)
    vals = np.empty(len(groups), dtype=object)
    for i, (kq, ku, vq, vu) in enumerate(groups):
        keys[i] = kq.replace('\\"', '"') if kq is not None else ku.rstrip(_ws)
        vals[i] = vq.replace('\\"', '"') if vq is not None else (vu or "").rstrip(_ws)
    t = len(tpos)
    params_list = _params_list_array(pgid, keys, vals, occ, t)
    struct = pa.StructArray.from_arrays(
        [pa.array(np.full(t, "data", object), pa.string()), params_list],
        ["sd_id", "params"],
    )
    dense = pa.ListArray.from_arrays(
        pa.array(np.arange(t + 1, dtype=np.int32)), struct
    )
    return _take_with_nulls(dense, tpos, n), slow


# ---------------------------------------------------------------------------
# timestamps (fixed-offset byte math over arrow buffers)
# ---------------------------------------------------------------------------

_POW10_9 = (10 ** np.arange(8, -1, -1)).astype(np.int64)


def _pack_month(nm: str) -> int:
    a, b, c = (ord(ch) | 0x20 for ch in nm)  # case-fold all three chars
    return (a << 16) | (b << 8) | c


_MONTH_PACKED = np.sort(
    np.array([_pack_month(nm) for nm in C.MONTH_NAMES], dtype=np.int64)
)
_MONTH_PACKED_IDX = {
    _pack_month(nm): i + 1 for i, nm in enumerate(C.MONTH_NAMES)
}
_MONTH_PACKED_TO_NUM = np.array(
    [_MONTH_PACKED_IDX[k] for k in _MONTH_PACKED], dtype=np.int64
)


def _parse_ts5424_arrow(ts_arr: pa.Array):
    """Main-regex-validated RFC3339[Nano] strings (widths 25/35 or '-') ->
    (micros, nanos, offset, isnil, bad). Mirrors Go's two fixed-width
    ParseInLocation attempts (parsers.go:133-148)."""
    m, lens = _np_fixed_bytes(ts_arr, 35)
    n = len(lens)
    isnil = lens == 1
    d = m - 48
    is35 = lens == 35
    y = d[:, 0] * 1000 + d[:, 1] * 100 + d[:, 2] * 10 + d[:, 3]
    mo = d[:, 5] * 10 + d[:, 6]
    dd = d[:, 8] * 10 + d[:, 9]
    h = d[:, 11] * 10 + d[:, 12]
    mi = d[:, 14] * 10 + d[:, 15]
    s = d[:, 17] * 10 + d[:, 18]
    rows = np.arange(n)
    off0 = np.where(is35, 29, 19)
    sign = np.where(m[rows, off0] == ord("+"), 1, -1)
    oh = d[rows, off0 + 1] * 10 + d[rows, off0 + 2]
    om = d[rows, off0 + 4] * 10 + d[rows, off0 + 5]
    offset = sign * (oh * 3600 + om * 60)
    # elementwise, NOT `@`: a matmul here pulls in BLAS thread pools, and
    # ncpu BLAS threads x ncpu workers thrashes the box
    nanos = np.where(is35, (d[:, 20:29] * _POW10_9).sum(axis=1), 0)
    valid = (
        (mo >= 1) & (mo <= 12) & (h <= 23) & (mi <= 59) & (s <= 59)
        & (oh <= 23) & (om <= 59)
    )
    dim = _days_in_month_np(y, np.clip(mo, 1, 12))
    valid &= (dd >= 1) & (dd <= dim)
    micros = _epoch_micros_np(y, mo, dd, h, mi, s, nanos, offset)
    bad = ~isnil & ~valid
    return micros, nanos, offset, isnil, bad


def _parse_ts_nginx_arrow(ts_arr: pa.Array, ref_year: int, ref_tz: int):
    """'Jan _2 15:04:05' (15 fixed bytes) -> (micros, bad); month names
    case-folded (Go's lookup is case-insensitive), year-0 validation then
    +reference_year with AddDate normalization (helpers.go:46-49)."""
    m, lens = _np_fixed_bytes(ts_arr, 15)
    d = m - 48
    packed = ((m[:, 0] | 0x20) << 16) | ((m[:, 1] | 0x20) << 8) | (m[:, 2] | 0x20)
    pos = np.searchsorted(_MONTH_PACKED, packed)
    pos = np.clip(pos, 0, len(_MONTH_PACKED) - 1)
    bad = _MONTH_PACKED[pos] != packed
    mo = _MONTH_PACKED_TO_NUM[pos]
    d0 = np.where(m[:, 4] == ord(" "), 0, d[:, 4])
    dd = d0 * 10 + d[:, 5]
    h = d[:, 7] * 10 + d[:, 8]
    mi = d[:, 10] * 10 + d[:, 11]
    s = d[:, 13] * 10 + d[:, 14]
    dim0 = _days_in_month_np(np.zeros_like(mo), mo)  # year 0 is leap
    bad |= (dd < 1) | (dd > dim0) | (h > 23) | (mi > 59) | (s > 59)
    yy = np.full(len(mo), ref_year, np.int64)
    micros = _epoch_micros_np(
        yy, mo, dd, h, mi, s, np.zeros_like(mo), np.int64(ref_tz)
    )
    return micros, bad


# ---------------------------------------------------------------------------
# per-format batch parsers: pa.StringArray -> dict of arrow/numpy columns
# ---------------------------------------------------------------------------


def _extract_with_fallback(lines: pa.Array, rx_main: str, rx_alt: str | None):
    """extract_regex with a secondary pattern for rows the first missed
    (the empty-final-SD-block form). Returns a StructArray-like dict of
    field name -> pa.Array aligned to lines."""
    st = pc.extract_regex(lines, rx_main)
    valid = pc.is_valid(st)
    # struct-level nulls do NOT propagate into .field() children (missed
    # rows read as '' there) — mask explicitly
    fields = {
        f.name: pc.if_else(valid, st.field(i), pa.scalar(None, pa.string()))
        for i, f in enumerate(st.type)
    }
    matched = valid.to_numpy(zero_copy_only=False)
    if rx_alt is not None and not matched.all():
        miss = np.flatnonzero(~matched)
        st2 = pc.extract_regex(lines.take(pa.array(miss)), rx_alt)
        valid2 = pc.is_valid(st2)
        m2 = valid2.to_numpy(zero_copy_only=False)
        if m2.any():
            alt = {
                f.name: pc.if_else(
                    valid2, st2.field(i), pa.scalar(None, pa.string())
                )
                for i, f in enumerate(st2.type)
            }
            n = len(lines)
            hit_pos = miss[m2]
            matched[hit_pos] = True
            for name, arr in fields.items():
                if name in alt:
                    # merge: keep main values, fill alt rows
                    idx = np.full(n, -1, np.int64)
                    idx[hit_pos] = len(lines) + np.arange(len(miss))[m2]
                    keep = np.arange(n)
                    merged_src = pa.concat_arrays(
                        [arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr,
                         alt[name].combine_chunks() if isinstance(alt[name], pa.ChunkedArray) else alt[name]]
                    )
                    sel = np.where(idx >= 0, idx, keep)
                    fields[name] = merged_src.take(pa.array(sel))
    return fields, matched


def _scatter(arr_or_np, idx, n, kind):
    """Scatter a dense per-match column back to full batch length."""
    if kind == "pa":
        return _take_with_nulls(arr_or_np, idx, n)
    out = np.full(n, _NULL_INT, np.int64)
    out[idx] = arr_or_np
    return out


def parse_rfc5424_fast(lines: pa.Array, ref_year: int, ref_tz: int) -> dict:
    """RFC 5424 fast path (formats.go:49-67)."""
    n = len(lines)
    f, matched = _extract_with_fallback(lines, RX_RFC5424, RX_RFC5424_EMPTY_SD)
    out = {"slow": ~matched}
    idx = np.flatnonzero(matched)
    if idx.size == 0:
        return _null_result(out, n)
    take = pa.array(idx)
    g = {k: _str(v).take(take) for k, v in f.items()}
    pri = _cast_int(g["pri"]) & 0xFF
    ver = _cast_int(g["ver"])
    micros, nanos, offset, ts_null, ts_bad = _parse_ts5424_arrow(g["ts"])
    bad = (
        ts_bad
        | _bad_single_value(g["host"], C.MAX_HOSTNAME_LEN)
        | _bad_single_value(g["app"], C.MAX_APPNAME_LEN)
        | _bad_single_value(g["proc"], C.MAX_PROCID_LEN)
        | _bad_single_value(g["msgid"], C.MAX_MSGID_LEN)
    )
    out["slow"][idx[bad]] = True
    data = _assemble_sd_arrow(g["data"])
    # msg group: null when absent -> "" (Go: message stays zero-valued);
    # trim with the Go space set — utf8_trim_whitespace would also strip
    # \x1c-\x1f, which Go's bytes.TrimSpace does not (input is ASCII-gated
    # so the ASCII projection of unicode.IsSpace is exact here)
    msg = pc.utf8_trim(pc.fill_null(g["msg"], ""), C.GO_WHITE_SPACE_ASCII)

    out["priority"] = _scatter(pri, idx, n, "np")
    out["version"] = _scatter(ver, idx, n, "np")
    out["ts_micros"] = _scatter(
        np.where(ts_null, _NULL_INT, micros), idx, n, "np"
    )
    out["ts_nanos"] = _scatter(np.where(ts_null, _NULL_INT, nanos), idx, n, "np")
    out["tz_offset_seconds"] = _scatter(
        np.where(ts_null, _NULL_INT, offset), idx, n, "np"
    )
    out["hostname"] = _scatter(_nil_to_empty(g["host"]), idx, n, "pa")
    out["appname"] = _scatter(_nil_to_empty(g["app"]), idx, n, "pa")
    out["proc_id"] = _scatter(_nil_to_empty(g["proc"]), idx, n, "pa")
    out["msg_id"] = _scatter(_nil_to_empty(g["msgid"]), idx, n, "pa")
    out["message"] = _scatter(msg, idx, n, "pa")
    out["data_pa"] = _scatter(data, idx, n, "pa")
    return out


def _null_result(out, n):
    for k in ("priority", "version", "ts_micros", "ts_nanos",
              "tz_offset_seconds"):
        out[k] = np.full(n, _NULL_INT, np.int64)
    for k in ("hostname", "appname", "proc_id", "msg_id", "message"):
        out[k] = pa.nulls(n, pa.string())
    out["data_pa"] = pa.nulls(n, DATA_T_PA)
    return out


def _parse_nginx_common(lines, rx_main, rx_alt, ref_year, ref_tz, with_msg):
    n = len(lines)
    f, matched = _extract_with_fallback(lines, rx_main, rx_alt)
    out = {"slow": ~matched}
    idx = np.flatnonzero(matched)
    if idx.size == 0:
        return _null_result(out, n), None, None
    take = pa.array(idx)
    g = {k: _str(v).take(take) for k, v in f.items()}
    pri = _cast_int(g["pri"]) & 0xFF
    micros, ts_bad = _parse_ts_nginx_arrow(g["ts"], ref_year, ref_tz)
    app = pc.replace_substring_regex(_nil_to_empty(g["app"]), ":$", "")
    bad = (
        ts_bad
        | _bad_single_value(g["host"], C.MAX_HOSTNAME_LEN)
        | _bad_single_value(g["app"], C.MAX_APPNAME_LEN)
    )
    out["priority"] = _scatter(pri, idx, n, "np")
    out["version"] = _scatter(np.zeros(len(idx), np.int64), idx, n, "np")
    out["ts_micros"] = _scatter(micros, idx, n, "np")
    out["ts_nanos"] = _scatter(np.zeros(len(idx), np.int64), idx, n, "np")
    out["tz_offset_seconds"] = _scatter(
        np.full(len(idx), ref_tz, np.int64), idx, n, "np"
    )
    out["hostname"] = _scatter(_nil_to_empty(g["host"]), idx, n, "pa")
    out["appname"] = _scatter(app, idx, n, "pa")
    empty = pa.array(np.full(len(idx), "", object), pa.string())
    out["proc_id"] = _scatter(empty, idx, n, "pa")
    out["msg_id"] = _scatter(empty, idx, n, "pa")
    if with_msg:
        msg = pc.utf8_trim(pc.fill_null(g["msg"], ""), C.GO_WHITE_SPACE_ASCII)
        out["message"] = _scatter(msg, idx, n, "pa")
    else:
        out["message"] = _scatter(empty, idx, n, "pa")
    return out, g, (idx, bad)


def parse_nginx_access_fast(lines: pa.Array, ref_year: int, ref_tz: int) -> dict:
    """Nginx access fast path (formats.go:70-83)."""
    out, g, ib = _parse_nginx_common(
        lines, RX_NGINX_ACCESS, RX_NGINX_ACCESS_EMPTY_SD, ref_year, ref_tz,
        with_msg=False,
    )
    if g is None:
        return out
    idx, bad = ib
    data = _assemble_sd_arrow(g["data"])
    out["data_pa"] = _scatter(data, idx, len(lines), "pa")
    out["slow"][idx[bad]] = True
    return out


def parse_nginx_error_fast(lines: pa.Array, ref_year: int, ref_tz: int) -> dict:
    """Nginx error fast path (formats.go:86-106). Only the complete
    'msg, key: value, ...' tail is handled here; tail-optional EOF cases
    (stage>=16 tolerance, syslog.go:150-153) go to the oracle."""
    out, g, ib = _parse_nginx_common(
        lines, RX_NGINX_ERROR, RX_NGINX_ERROR_NODATA, ref_year, ref_tz,
        with_msg=True,
    )
    if g is None:
        return out
    idx, bad = ib
    data, pairs_slow = _assemble_nginx_pairs_arrow(g["data"])
    out["data_pa"] = _scatter(data, idx, len(lines), "pa")
    out["slow"][idx[bad | pairs_slow]] = True
    return out


FAST_PARSERS = {
    C.FORMAT_RFC5424: parse_rfc5424_fast,
    C.FORMAT_NGINX_ACCESS: parse_nginx_access_fast,
    C.FORMAT_NGINX_ERROR: parse_nginx_error_fast,
}
