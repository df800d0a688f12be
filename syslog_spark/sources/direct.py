"""Direct-parquet parse source: pyarrow reads the splits INSIDE the
parse workers.

The standard path (spark.read.parquet -> mapInArrow) pays a JVM feed
tax: the vectorized parquet reader's columnar batches are converted to
InternalRows, then re-serialized row-by-row into Arrow IPC for the
python worker — for a list<int32> tokens column that conversion is the
dominant JVM cost, and the in-worker timer (BENCH/PARSE_PROFILE_r4.json)
shows it is exactly the part whose core-seconds double from 8 to 32
local cores. Here the JVM only distributes FILE PATHS (spark.range over
a broadcast file list); each task opens its parquet file through a
``pyarrow.fs`` FileSystem and streams record batches straight into the
parse kernel — parquet bytes decode directly to Arrow in the same
process that parses them, zero row conversion, zero IPC of token data.

Filesystems: plain local paths, ``file://``, ``s3://``/``s3a://`` and
``hdfs://`` URIs all resolve through ``pyarrow.fs.FileSystem.from_uri``
— the driver lists once (one recursive listing call, object-store
friendly) and the workers open files through the same (pickled)
FileSystem handle, so the fused path reaches the remote deployments the
JVM feed tax actually lives on. An unreachable or unauthenticated store
makes :func:`layout_supported` return False and the pipeline falls back
to the standard (always-correct) reader.

Trade-offs (this is an OPT-IN fast path, not the default):
  * plain parquet directories only — an Iceberg table with delete files
    / schema evolution must go through the catalog reader (sources/io);
  * no Catalyst pushdown into the scan — irrelevant for the
    parse-everything pipeline, wrong for selective queries;
  * split granularity is one file, dealt into task-aligned buckets
    round-robin by DESCENDING size (each contiguous task range gets a
    balanced large/medium/small mix — name-ordered assignment would let
    size-correlated naming straggle a few tasks); a single enormous
    file still bounds the critical path, and real ingest jobs
    size-bucket their output anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .. import constants as C
from ..operators.parse import make_kernel_runner
from ..operators.schema import parsed_spark_schema


def _from_uri(uri: str):
    """pyarrow FileSystem.from_uri, module-level so tests can stub the
    network-touching schemes."""
    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(uri)


def _resolve_fs(path: str):
    """(FileSystem, inner path) for a local path or pyarrow URI.

    ``s3a://`` (the Hadoop connector's scheme for the same stores) is
    aliased to ``s3://`` so a Spark-conf path works unchanged."""
    from pyarrow import fs as pafs

    if path.startswith("s3a://"):
        path = "s3://" + path[len("s3a://"):]
    if "://" in path:
        fs, inner = _from_uri(path)
    else:
        fs, inner = pafs.LocalFileSystem(), os.path.abspath(path)
    return fs, inner.rstrip("/")


def _scan(path: str):
    """One recursive listing -> (FileSystem, [(file, size, src)]).

    Understands exactly two shapes, mixed freely: top-level ``*.parquet``
    and one level of ``source=`` hive partitioning (the token table's
    layout); the escaped partition value is URL-decoded the way Spark
    encodes it (%2F -> '/'). Parquet ANYWHERE else — a ``date=`` dir, or
    nested dirs *inside* a source= dir — raises ValueError: silently
    reading only the recognized subset would drop rows (round-4 ADVICE:
    the old os.walk check missed nesting under source= dirs). Non-parquet
    files (_SUCCESS, .crc) are ignored wherever they sit. Raises
    FileNotFoundError when the path is not a directory or holds no
    non-empty parquet."""
    from urllib.parse import unquote

    from pyarrow import fs as pafs

    fs, base = _resolve_fs(path)
    info = fs.get_file_info(base)
    if info.type != pafs.FileType.Directory:
        raise FileNotFoundError(f"{path} is not a directory")
    out = []
    for fi in fs.get_file_info(pafs.FileSelector(base, recursive=True)):
        if fi.type != pafs.FileType.File or not fi.path.endswith(".parquet"):
            continue
        parts = fi.path[len(base):].lstrip("/").split("/")
        if len(parts) == 1:
            src = None
        elif len(parts) == 2 and parts[0].startswith("source="):
            src = unquote(parts[0].split("=", 1)[1])
        else:
            raise ValueError(
                f"{path} is not a flat or source=-partitioned parquet dir "
                f"(parquet found at {'/'.join(parts)!r}; use the standard "
                "reader for other layouts)"
            )
        if fi.size:
            out.append((fi.path, fi.size, src))
    if not out:
        raise FileNotFoundError(f"no parquet files under {path}")
    out.sort(key=lambda t: t[0])
    return fs, out


def layout_supported(path: str) -> bool:
    """True iff the directory is a layout the direct source understands
    AND is actually listable: top-level *.parquet files and/or one level
    of `source=` hive partitioning, nothing else holding parquet data.
    Any listing failure (missing path, unknown scheme, unreachable or
    unauthenticated object store) returns False — the caller's fallback
    is the standard reader, which is always correct."""
    try:
        _scan(path)
        return True
    except Exception:
        return False


def list_parquet_files(path: str) -> list[tuple[str, str | None]]:
    """(file, hive-partition source value or None) pairs, sorted by path.
    Raises FileNotFoundError on layouts :func:`_scan` rejects."""
    try:
        _, files = _scan(path)
    except ValueError as e:
        raise FileNotFoundError(str(e)) from None
    return [(f, src) for f, _sz, src in files]


def _stripe_by_size(files: list[tuple], n_parts: int) -> list[tuple]:
    """Reorder (file, size, src) entries so the n_parts CONTIGUOUS index
    ranges spark.range hands to tasks each get a balanced size mix:
    rank files by descending size and deal them round-robin into
    n_parts buckets, then concatenate the buckets. Deterministic."""
    order = sorted(
        range(len(files)), key=lambda i: (-files[i][1], files[i][0])
    )
    return [files[i] for b in range(n_parts) for i in order[b::n_parts]]


def parse_tokens_direct(
    spark: SparkSession,
    path: str,
    ref_year: int = C.DEFAULT_REFERENCE_YEAR,
    ref_tz: int = C.DEFAULT_REFERENCE_TZ_OFFSET_SECONDS,
    keep_raw: bool = False,
    batch_rows: int = 32768,
    source_prefixes: list[str] | None = None,
    _scanned=None,
) -> DataFrame:
    """Parquet token dir -> parsed DataFrame, one fused read+parse stage.

    Same output schema/semantics as operators.parse.parse_tokens over
    spark.read.parquet(path) (asserted equal in tests); only the feed
    path differs. `ts` is added JVM-side exactly like parse_tokens.

    ``source_prefixes`` is the direct path's partition pruning: on a
    hive `source=` layout, files whose partition value does not start
    with one of the prefixes are never opened (the file-list analogue of
    Catalyst pruning `WHERE source LIKE 'rfc5424%'` down to directory
    listings). Plain string-prefix match, like LIKE 'p%'. An EMPTY
    prefix list is rejected — it would mean "no sources", which is
    never what a caller wants (use None for all sources).

    ``_scanned`` is the private single-listing handoff: plans/pipeline
    passes its own _scan result so auto mode lists the store once, not
    twice."""
    from pyspark.sql import functions as F

    if source_prefixes is not None and not source_prefixes:
        raise ValueError(
            "source_prefixes=[] selects nothing; pass None for all sources"
        )
    fs, files = _scanned if _scanned is not None else _scan(path)
    if source_prefixes is not None:
        files = [
            (f, sz, src)
            for f, sz, src in files
            if src is None  # flat files: value unknown pre-read, keep
            or any(src.startswith(p) for p in source_prefixes)
        ]
        if not files:
            raise FileNotFoundError(
                f"no partitions under {path} match {source_prefixes}"
            )
    n_parts = max(
        1, min(len(files), spark.sparkContext.defaultParallelism * 3)
    )
    striped = [
        (f, src) for f, _sz, src in _stripe_by_size(files, n_parts)
    ]
    # pyarrow FileSystems pickle (LocalFileSystem trivially; S3/Hdfs
    # carry their connection config) — workers reuse the driver's handle
    bc = spark.sparkContext.broadcast((fs, striped))

    def fn(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        wfs, flist = bc.value
        run = make_kernel_runner(ref_year, ref_tz, keep_raw)
        cols = ["doc_id", "tokens", "n_tok", "source"]

        def file_tables(b):
            # small files load whole (they get buffered into full
            # batches below); big files STREAM in batch_rows chunks so a
            # 512MB split never materializes entirely in worker RAM
            for idx in b.column("id").to_pylist():
                fpath, src = flist[idx]
                file_cols = [
                    c for c in cols if c != "source" or src is None
                ]
                pf = pq.ParquetFile(wfs.open_input_file(fpath))
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
                                m = pc.starts_with(col, p)
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
    seed = spark.range(len(striped), numPartitions=n_parts).select(
        F.col("id").cast("long").alias("id")
    )
    out = seed.mapInArrow(fn, parsed_spark_schema(keep_raw))
    return out.withColumn("ts", F.timestamp_micros(F.col("ts_micros")))
