"""Direct-parquet parse source: pyarrow reads the splits INSIDE the
parse workers.

The standard path (spark.read.parquet -> mapInArrow) pays a JVM feed
tax: the vectorized parquet reader's columnar batches are converted to
InternalRows, then re-serialized row-by-row into Arrow IPC for the
python worker — for a list<int32> tokens column that conversion is the
dominant JVM cost, and the in-worker timer (BENCH/PARSE_PROFILE_r4.json)
shows it is exactly the part whose core-seconds double from 8 to 32
local cores. Here the JVM only distributes FILE PATHS (spark.range over
a broadcast file list); each task opens its parquet file with pyarrow
and streams record batches straight into the parse kernel — parquet
bytes decode directly to Arrow in the same process that parses them,
zero row conversion, zero IPC of token data.

Trade-offs (this is an OPT-IN fast path, not the default):
  * plain parquet directories only — an Iceberg table with delete files
    / schema evolution must go through the catalog reader (sources/io);
  * no Catalyst pushdown into the scan — irrelevant for the
    parse-everything pipeline, wrong for selective queries;
  * split granularity is one file (round-robin over tasks); hugely
    skewed file sizes would straggle — write_token_table emits even
    files, and real ingest jobs size-bucket their output anyway.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from .. import constants as C
from ..operators.parse import make_kernel_runner
from ..operators.schema import parsed_spark_schema


def layout_supported(path: str) -> bool:
    """True iff the directory is a layout the direct source understands:
    top-level *.parquet files and/or one level of `source=` hive
    partitioning, and NOTHING ELSE holding parquet data (a `date=` or
    nested layout must take the standard reader — silently reading only
    the recognized subset would drop rows)."""
    if not os.path.isdir(path):
        return False
    has_any = bool(glob.glob(os.path.join(path, "*.parquet"))) or bool(
        glob.glob(os.path.join(path, "source=*", "*.parquet"))
    )
    if not has_any:
        return False
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if os.path.isdir(full) and not entry.startswith("source="):
            # any OTHER directory that contains parquet anywhere means
            # an unrecognized partition layout
            for _root, _dirs, fs in os.walk(full):
                if any(f.endswith(".parquet") for f in fs):
                    return False
    return True


def list_parquet_files(path: str) -> list[tuple[str, str | None]]:
    """(file, hive-partition source value or None) pairs. One level of
    `source=<escaped>` hive partitioning is understood (the token table's
    layout); the escaped value is URL-decoded the way Spark encodes it
    (e.g. %2F -> '/'). Raises on layouts layout_supported() rejects."""
    from urllib.parse import unquote

    if not layout_supported(path):
        raise FileNotFoundError(
            f"{path} is not a flat or source=-partitioned parquet dir "
            "(use the standard reader for other layouts)"
        )
    out = [
        (f, None)
        for f in sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.getsize(f) > 0
    ]
    for d in sorted(glob.glob(os.path.join(path, "source=*"))):
        val = unquote(os.path.basename(d).split("=", 1)[1])
        out.extend(
            (f, val)
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
            if os.path.getsize(f) > 0
        )
    if not out:
        raise FileNotFoundError(f"no parquet files under {path}")
    return out


def parse_tokens_direct(
    spark: SparkSession,
    path: str,
    ref_year: int = C.DEFAULT_REFERENCE_YEAR,
    ref_tz: int = C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    keep_raw: bool = False,
    batch_rows: int = 32768,
    source_prefixes: list[str] | None = None,
) -> DataFrame:
    """Parquet token dir -> parsed DataFrame, one fused read+parse stage.

    Same output schema/semantics as operators.parse.parse_tokens over
    spark.read.parquet(path) (asserted equal in tests); only the feed
    path differs. `ts` is added JVM-side exactly like parse_tokens.

    ``source_prefixes`` is the direct path's partition pruning: on a
    hive `source=` layout, files whose partition value does not start
    with one of the prefixes are never opened (the file-list analogue of
    Catalyst pruning `WHERE source LIKE 'rfc5424%'` down to directory
    listings)."""
    from pyspark.sql import functions as F

    files = list_parquet_files(path)
    if source_prefixes is not None:
        files = [
            (f, src)
            for f, src in files
            if src is None  # flat files: value unknown pre-read, keep
            or any(src == p or src.startswith(p + "/")
                   for p in source_prefixes)
        ]
        if not files:
            raise FileNotFoundError(
                f"no partitions under {path} match {source_prefixes}"
            )
    bc = spark.sparkContext.broadcast(files)

    def fn(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        run = make_kernel_runner(ref_year, ref_tz, keep_raw)
        cols = ["doc_id", "tokens", "n_tok", "source"]

        def file_tables(b):
            # small files load whole (they get buffered into full
            # batches below); big files STREAM in batch_rows chunks so a
            # 512MB split never materializes entirely in worker RAM
            for idx in b.column("id").to_pylist():
                fpath, src = bc.value[idx]
                file_cols = [
                    c for c in cols if c != "source" or src is None
                ]
                pf = pq.ParquetFile(fpath)
                try:
                    if pf.metadata.num_rows <= 4 * batch_rows:
                        chunks = [pf.read(columns=file_cols)]
                    else:
                        chunks = (
                            pa.Table.from_batches([rb])
                            for rb in pf.iter_batches(
                                batch_size=batch_rows, columns=file_cols
                            )
                        )
                    for t in chunks:
                        if t.num_rows == 0:
                            continue
                        if src is not None:
                            t = t.append_column(
                                "source",
                                pa.array([src] * t.num_rows, pa.string()),
                            )
                        elif source_prefixes is not None:
                            # flat file: the partition value was unknown
                            # at list time, so prune at ROW level here —
                            # otherwise "pruned" output would silently
                            # include excluded sources
                            import pyarrow.compute as pc

                            col = t.column("source")
                            mask = None
                            for p in source_prefixes:
                                m = pc.or_(
                                    pc.equal(col, p),
                                    pc.starts_with(col, p + "/"),
                                )
                                mask = m if mask is None else pc.or_(mask, m)
                            t = t.filter(pc.fill_null(mask, False))
                            if t.num_rows == 0:
                                continue
                        yield t.select(cols)
                finally:
                    pf.close()

        # token files are often much smaller than one Arrow batch (the
        # salted fan-out writes many ~10k-row files): BUFFER across files
        # up to batch_rows so the parse kernel keeps its per-batch
        # amortization — a 10k-row batch pays the same regex machinery
        # as a 32k one
        def emit(table):
            for rb in table.combine_chunks().to_batches(batch_rows):
                if rb.num_rows:
                    yield run(rb)

        for b in batches:
            buf, buffered = [], 0
            for t in file_tables(b):
                buf.append(t)
                buffered += t.num_rows
                if buffered >= batch_rows:
                    yield from emit(pa.concat_tables(buf))
                    buf, buffered = [], 0
            if buf:
                yield from emit(pa.concat_tables(buf))

    # a few tasks per core (not one per file): workers buffer several
    # small files into full batches, and scheduling overhead stays flat
    n_parts = max(
        1, min(len(files), spark.sparkContext.defaultParallelism * 3)
    )
    seed = spark.range(len(files), numPartitions=n_parts).select(
        F.col("id").cast("long").alias("id")
    )
    out = seed.mapInArrow(fn, parsed_spark_schema(keep_raw))
    return out.withColumn("ts", F.timestamp_micros(F.col("ts_micros")))
