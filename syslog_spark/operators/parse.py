"""The parse operator: token sequences -> parsed syslog rows.

One ``mapInArrow`` stage does detokenize + parse in a single JVM<->Python
Arrow crossing per batch:

  1. detokenize: list<int32> token arrays -> UTF-8 strings via Arrow buffer
     arithmetic (token id i == byte value i; no per-row Python),
  2. per-format vectorized fast path (operators/fastpath.py),
  3. per-row oracle fallback (syslog_spark/oracle.py) for rows the fast
     path declines — guaranteeing reference-exact error strings/columns
     (syslog.go:163-166) and full grammar-corner coverage.

Scale notes: the operator is embarrassingly parallel (no shuffle); at
cluster scale the cost is one Arrow round trip per batch. Batch size is
controlled by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in
session.py). Column pruning through a Python map stage is manual: callers
should select only the four input columns before calling (``parse_tokens``
does this).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from .. import constants as C
from .. import oracle
from . import fastpath
from .schema import parsed_arrow_schema, parsed_spark_schema

_NULL_INT = fastpath._NULL_INT


# ---------------------------------------------------------------------------
# detokenize
# ---------------------------------------------------------------------------


def detokenize_array(tokens: pa.Array) -> pa.Array:
    """list<int32> -> string, via offset/value buffer arithmetic.

    Token vocabulary: id i == byte value i (0..255), per FIXTURES.md §1.
    Zero Python-per-row: one uint8 cast of the flattened values plus an
    offsets rebuild.
    """
    if isinstance(tokens, pa.ChunkedArray):
        tokens = tokens.combine_chunks()
    n = len(tokens)
    try:
        flat = tokens.flatten()
        u8 = flat.cast(pa.uint8())  # safe cast: raises if a token > 255
        data = u8.to_numpy(zero_copy_only=False)  # contiguous uint8
        lengths = tokens.value_lengths().to_numpy(zero_copy_only=False)
        lengths = np.nan_to_num(lengths.astype(np.int64, copy=False))
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        assert offsets[-1] == len(data) and offsets[-1] < 2**31
        binary = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(offsets.astype(np.int32)), pa.py_buffer(data)],
        )
        return binary.cast(pa.string())
    except (pa.ArrowInvalid, AssertionError):
        # slow fallback for pathological inputs (invalid UTF-8 / huge batch)
        return pa.array(
            [
                None
                if row is None
                else bytes(bytearray(b & 0xFF for b in row)).decode(
                    "utf-8", "surrogateescape"
                )
                for row in tokens.to_pylist()
            ],
            type=pa.string(),
        )


# ---------------------------------------------------------------------------
# batch parse
# ---------------------------------------------------------------------------

_STR_COLS = ("hostname", "appname", "proc_id", "msg_id", "message")
_ROW_INT_COLS = (
    "priority",
    "version",
    "ts_micros",
    "ts_nanos",
    "tz_offset_seconds",
)


def _oracle_into(full: dict, i: int, line, fmt: str, ref_year: int, ref_tz: int):
    """Parse one row with the byte-exact oracle and scatter into `full`."""
    pr = oracle.parse_message(line, fmt, ref_year, ref_tz)
    row = oracle.to_row(pr)
    for k in _ROW_INT_COLS:
        full[k][i] = _NULL_INT if row[k] is None else row[k]
    for k in _STR_COLS:
        full[k][i] = row[k]
    full["data"][i] = row["data"]
    full["error_msg"][i] = row["error_msg"]
    full["error_column"][i] = (
        _NULL_INT if row["error_column"] is None else row["error_column"]
    )
    full["failed_stage"][i] = (
        _NULL_INT if row["failed_stage"] is None else row["failed_stage"]
    )
    full["slow"][i] = False


def _parse_lines_batch(lines_pd, fmts_pd, ref_year: int, ref_tz: int) -> dict:
    """pandas Series of lines + format names -> dict of full-length arrays."""
    n = len(lines_pd)
    full = fastpath._empty_result(n)
    full["error_msg"] = np.full(n, None, object)
    full["error_column"] = np.full(n, _NULL_INT, np.int64)
    full["failed_stage"] = np.full(n, _NULL_INT, np.int64)

    fmt_np = fmts_pd.to_numpy()
    # The reference operates on BYTES (buffer.go): length limits, discard
    # widths and error columns are byte counts. The fast path works on str,
    # so only pure-ASCII lines (byte==char) are eligible; others take the
    # byte-exact oracle path (this includes BOM-carrying messages).
    is_ascii = np.fromiter(
        (s.isascii() for s in lines_pd), dtype=bool, count=n
    )
    for fmt, parser in fastpath.FAST_PARSERS.items():
        idx = np.flatnonzero((fmt_np == fmt) & ~is_ascii)
        for i in idx:
            _oracle_into(full, i, lines_pd.iloc[i], fmt, ref_year, ref_tz)
        idx = np.flatnonzero((fmt_np == fmt) & is_ascii)
        if idx.size == 0:
            continue
        sub = lines_pd.iloc[idx].reset_index(drop=True)
        res = parser(sub, ref_year, ref_tz)
        for key, arr in res.items():
            if key == "slow":
                continue
            full[key][idx] = arr
        full["slow"][idx] = res["slow"]

        # oracle fallback for declined rows (rare on well-formed corpora)
        for i in idx[res["slow"]]:
            _oracle_into(full, i, lines_pd.iloc[i], fmt, ref_year, ref_tz)

    # unknown formats -> error rows
    left = np.flatnonzero(full["slow"])
    for i in left:
        full["error_msg"][i] = f"unknown format: {fmt_np[i]}"
    return full


def _int_array(vals: np.ndarray, patype) -> pa.Array:
    mask = vals == _NULL_INT
    safe = np.where(mask, 0, vals)
    return pa.array(safe, type=pa.int64(), mask=mask).cast(patype)


def parse_record_batch(
    batch: pa.RecordBatch, ref_year: int, ref_tz: int, keep_raw: bool
) -> pa.RecordBatch:
    if "tokens" in batch.schema.names:
        lines_arr = detokenize_array(batch.column("tokens"))
        n_tok = batch.column("n_tok")
    else:  # raw-line input (parse_lines)
        lines_arr = batch.column("line")
        n_tok = pa.compute.binary_length(
            pa.compute.cast(lines_arr, pa.binary())
        ).cast(pa.int32())
    lines_pd = lines_arr.to_pandas()
    source_pd = batch.column("source").to_pandas()
    # format = source prefix before '/' (FIXTURES.md §1)
    fmts = source_pd.str.split("/").str[0]
    full = _parse_lines_batch(lines_pd, fmts, ref_year, ref_tz)

    pri = full["priority"]
    pri_null = pri == _NULL_INT
    fac = np.where(pri_null, _NULL_INT, np.where(pri_null, 0, pri) // 8)
    sev = np.where(pri_null, _NULL_INT, np.where(pri_null, 0, pri) % 8)

    cols: dict[str, pa.Array] = {
        "doc_id": batch.column("doc_id"),
        "source": batch.column("source"),
        "n_tok": n_tok,
        "priority": _int_array(pri, pa.int16()),
        "facility": _int_array(fac, pa.int16()),
        "severity": _int_array(sev, pa.int16()),
        "version": _int_array(full["version"], pa.int32()),
        "ts_micros": _int_array(full["ts_micros"], pa.int64()),
        "ts_nanos": _int_array(full["ts_nanos"], pa.int32()),
        "tz_offset_seconds": _int_array(full["tz_offset_seconds"], pa.int32()),
        "hostname": pa.array(full["hostname"], type=pa.string()),
        "appname": pa.array(full["appname"], type=pa.string()),
        "proc_id": pa.array(full["proc_id"], type=pa.string()),
        "msg_id": pa.array(full["msg_id"], type=pa.string()),
        "data": pa.array(full["data"].tolist(), type=parsed_arrow_schema().field("data").type),
        "message": pa.array(full["message"], type=pa.string()),
        "error_msg": pa.array(full["error_msg"], type=pa.string()),
        "error_column": _int_array(full["error_column"], pa.int32()),
        "failed_stage": _int_array(full["failed_stage"], pa.int32()),
    }
    if keep_raw:
        cols["raw"] = lines_arr
    schema = parsed_arrow_schema(keep_raw)
    return pa.RecordBatch.from_arrays(
        [cols[f.name] for f in schema], schema=schema
    )


def make_parse_fn(ref_year: int, ref_tz: int, keep_raw: bool):
    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            yield parse_record_batch(batch, ref_year, ref_tz, keep_raw)

    return fn


def parse_tokens(
    df,
    ref_year: int = C.DEFAULT_REFERENCE_YEAR,
    ref_tz: int = C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    keep_raw: bool = False,
):
    """DataFrame(doc_id, tokens, n_tok, source) -> parsed DataFrame.

    Equivalent of ParseMessage over every row (syslog.go:143-161), with the
    error sink columns replacing the reference's (nil, err) return."""
    from pyspark.sql import functions as F

    df = df.select("doc_id", "tokens", "n_tok", "source")
    out = df.mapInArrow(
        make_parse_fn(ref_year, ref_tz, keep_raw),
        parsed_spark_schema(keep_raw),
    )
    # JVM-side analytic timestamp column (UTC instant)
    return out.withColumn("ts", F.timestamp_micros(F.col("ts_micros")))


def parse_lines(
    df,
    ref_year: int = C.DEFAULT_REFERENCE_YEAR,
    ref_tz: int = C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    keep_raw: bool = False,
):
    """DataFrame(doc_id, line, source) -> parsed DataFrame.

    Raw-string variant of :func:`parse_tokens` for callers that already
    hold text lines (e.g. the DuckDB cross-check queries); `source` selects
    the format as usual."""
    from pyspark.sql import functions as F

    df = df.select("doc_id", "line", "source")
    out = df.mapInArrow(
        make_parse_fn(ref_year, ref_tz, keep_raw),
        parsed_spark_schema(keep_raw),
    )
    return out.withColumn("ts", F.timestamp_micros(F.col("ts_micros")))
