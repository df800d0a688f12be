"""Deduplication operators for training-data pipelines.

Four families, all DataFrame-first:

  * exact           — hash-groupBy on md5(text) (shuffle on the digest,
                      uniform by construction — no skew handling needed)
  * minhash + LSH   — shingle -> 64 minhashes -> banded bucket join; the
                      scale path for near-dup detection: candidate pairs
                      only ever meet inside a bucket (no quadratic join),
                      then exact-Jaccard verification on the candidates.
  * simhash         — 64-bit rotation-tolerant fingerprint via a
                      vectorized pandas UDF over JVM-hashed token arrays.
  * n-gram Jaccard  — exact pairwise similarity for candidate pairs.

Everything upstream of the pandas UDFs is Catalyst expressions
(xxhash64 / transform / aggregate) — token hashing never leaves the JVM.
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# 31-bit Mersenne prime: products a*h stay below 2^62 (no long overflow
# under ANSI mode; Spark 4 is ANSI-on by default)
MERSENNE_31 = (1 << 31) - 1


def text_digest(col: Column | str) -> Column:
    """Exact-dup key: md5 of the raw text (mirrorable in any SQL engine)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def exact_duplicate_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(digest, n_docs, keep_doc_id) for every text occurring more than once.

    keep_doc_id is the min id (the survivor ``dedupe_exact`` would keep).
    Deliberately NO ``collect_list`` of member ids: a degenerate corpus
    (billions of copies of one document) would materialize the whole group
    in a single aggregation buffer. min/count aggregate in constant space;
    members of a group are recoverable by joining back on the digest."""
    return (
        df.groupBy(text_digest(text_col).alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def dedupe_exact(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical text. One shuffle on the digest."""
    w = Window.partitionBy(text_digest(text_col)).orderBy(F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --- shingling + minhash --------------------------------------------------------


def shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-shingles as a deduplicated array (JVM expression)."""
    c = F.col(col) if isinstance(col, str) else col
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: c.substr(i, F.lit(k))))


def shingle_hashes(col: Column | str, k: int = 5) -> Column:
    """Non-negative 31-bit hashes of the shingle set."""
    return F.transform(
        shingles(col, k), lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_31))
    )


def _coeffs(n_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_31, size=n_hashes, dtype=np.int64)
    b = rng.randint(0, MERSENNE_31, size=n_hashes, dtype=np.int64)
    return a, b


def _spread_if_narrow(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the cluster's parallelism before per-row
    heavy compute (signature folds, simhash votes, shingle hashing).

    The driver's sf tables are SINGLE parquet files with one row group,
    so every scan-side projection otherwise runs in ONE task — the
    round-6 measurement found the whole minhash signature scan of a
    50k-doc corpus on one core of 32 (57s; ~3s spread). Scale-adaptive:
    when the input already has at least defaultParallelism/2 partitions
    (any real multi-file corpus), this is the identity — no extra
    shuffle is ever added to a 100-TB input."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive (streaming frames)
        return df
    if n * 2 <= p:
        return df.repartition(p)
    return df


def _signature_from_hashes(hashes: Column, n_hashes: int = 64,
                           seed: int = 42) -> Column:
    """The 64 min-permutation folds over an ALREADY-MATERIALIZED hash
    array column. Callers that fan the signature out over a corpus scan
    should project :func:`shingle_hashes` into its own column first and
    pass that here — the n_hashes array_min(transform(...)) expressions
    all reference the hash subtree, HOFs are CodegenFallback, and
    interpreted-mode Catalyst does not CSE the repeated subtree (the
    repo's round-1 serializer lesson; measured again for minhash in
    tools/bench_minhash_ab.py)."""
    a, b = _coeffs(n_hashes, seed)

    def perm(ai: int, bi: int):
        # single-arg lambda (pyspark derives HOF arity from the signature)
        return lambda h: F.pmod(ai * h + bi, F.lit(MERSENNE_31))

    sigs = [
        F.array_min(F.transform(hashes, perm(int(a[i]), int(b[i]))))
        for i in range(n_hashes)
    ]
    return F.array(*sigs)


def _signature_batch_udf(n_hashes: int = 64, seed: int = 42,
                         n_extra: int = 0):
    """Vectorized twin of :func:`_signature_from_hashes`: one pandas UDF
    computing all n_hashes min-permutation folds with numpy instead of
    n_hashes interpreted Catalyst ``array_min(transform(...))`` folds
    (HOFs are CodegenFallback — the fold family alone cost ~35s of the
    50k-doc corpus scan at sf1.0; the numpy form is ~1s).

    BIT-IDENTICAL to the Catalyst form: same coefficients, and
    ``(a*h + b) % M31`` over int64 (a, b, h all < 2^31, so the product
    stays below 2^62 — no overflow, same values as Spark's pmod), then a
    per-row segment min. A NULL hash array maps to the Catalyst result
    for a NULL input (an array of n_hashes NULLs).

    With ``n_extra > 0`` the UDF ALSO folds n_extra additional
    independent permutations (coefficients from seed+1000) and returns a
    struct ``(sig, p)`` where ``p`` is a packed (n_hashes + n_extra)-byte
    binary: the LOW byte of every min value (the n_hashes exact-signature
    mins first, then the extras). ``p`` feeds the estimate prefilter:
    byte equality is NECESSARY for component equality, so a byte-match
    fraction is >= the true component-match fraction — a keep-superset
    compression that can only weaken pruning, never drop a true pair."""
    a, b = _coeffs(n_hashes, seed)
    if n_extra:
        ae, be = _coeffs(n_extra, seed + 1000)
        a = np.concatenate([a, ae])
        b = np.concatenate([b, be])
    n_total = n_hashes + n_extra

    def _fold(hashes: pd.Series):
        """-> (list indices with data, (rows, n_total) int64 mins).

        EMPTY arrays are excluded like NULLs: Catalyst's
        array_min(transform([], ...)) is NULL per component, and
        reduceat on an empty segment would silently return the NEXT
        row's first element (or raise for a trailing empty segment) —
        unreachable via shingles() today, but this UDF is documented as
        a general vectorized twin, so match the Catalyst semantics."""
        vals = hashes.to_numpy()
        idx = [i for i, v in enumerate(vals) if v is not None and len(v)]
        if not idx:
            return idx, None
        arrs = [np.asarray(vals[i], dtype=np.int64) for i in idx]
        lens = np.fromiter(
            (x.size for x in arrs), dtype=np.int64, count=len(arrs)
        )
        flat = np.concatenate(arrs)
        starts = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        sigs = np.empty((len(arrs), n_total), dtype=np.int64)
        for j in range(n_total):
            t = (a[j] * flat + b[j]) % MERSENNE_31
            sigs[:, j] = np.minimum.reduceat(t, starts)
        return idx, sigs

    if not n_extra:

        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _sig(hashes: pd.Series) -> pd.Series:
            out = [[None] * n_hashes] * len(hashes)
            idx, sigs = _fold(hashes)
            for row, i in enumerate(idx):
                out[i] = sigs[row]
            return pd.Series(out)

        return _sig

    @F.pandas_udf(
        T.StructType([
            T.StructField("sig", T.ArrayType(T.LongType())),
            T.StructField("p", T.BinaryType()),
        ])
    )
    def _sig_packed(hashes: pd.Series) -> pd.DataFrame:
        n = len(hashes)
        sig_col: list = [[None] * n_hashes] * n
        p_col: list = [None] * n
        idx, sigs = _fold(hashes)
        if idx:
            packed = (sigs & 0xFF).astype(np.uint8)
            for row, i in enumerate(idx):
                sig_col[i] = sigs[row, :n_hashes]
                p_col[i] = packed[row].tobytes()
        return pd.DataFrame({"sig": sig_col, "p": p_col})

    return _sig_packed


def minhash_signature(col: Column | str, n_hashes: int = 64, k: int = 5,
                      seed: int = 42) -> Column:
    """array<bigint> of n_hashes min-permutation values (pure Catalyst).

    sig_i = min over shingles s of (a_i * h(s) + b_i) mod M31.

    NOTE: as a single inline expression this repeats the shingle-hash
    subtree n_hashes times; fine for one-off use, but scan-heavy callers
    (see :func:`_minhash_banded`) hoist the hashes into a projection and
    use :func:`_signature_from_hashes`."""
    return _signature_from_hashes(shingle_hashes(col, k), n_hashes, seed)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    max_bucket: int = 200,
    _sigs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH.

    Scale shape: explode to (band_id, band_hash, id); capping + pairing
    happen WITHOUT materializing any bucket as an array — a window
    ``row_number() <= max_bucket`` per (band, bucket) truncates hot
    buckets in constant memory per row, then a self-equi-join on the
    bucket key produces the pairs (AQE splits a skewed bucket join at
    runtime). A degenerate corpus (billions of near-identical docs in one
    bucket) therefore never OOMs a reducer; truncated buckets are
    observable via :func:`lsh_bucket_stats`.
    """
    banded = _minhash_banded(
        df, text_col, id_col, n_hashes, bands, k, seed, _sigs=_sigs
    )
    return _raw_bucket_pairs(banded, max_bucket).distinct()


def _raw_bucket_pairs(
    banded: DataFrame, max_bucket: int, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(a, b) in-bucket pairs, WITHOUT the cross-band distinct — callers
    that run a cheap per-pair prefilter next (the packed-estimate join)
    apply it BEFORE deduplicating, so the distinct's hash aggregate sees
    the (small) survivor set instead of the raw near-quadratic candidate
    stream (44M-row distinct was 44s at sf1.0; post-filter it is ~2s).

    ``carry`` columns ride through the self-join and come out twice as
    ``<c>_a`` / ``<c>_b`` — shipping a per-doc payload through the
    blocking join (one exchange of n_docs * bands rows) instead of
    joining it onto the near-quadratic pair stream afterwards (two
    shuffles + sorts of the pair stream keyed by a then b — guide §2.3:
    shuffle the small side once, not the big stream twice)."""
    w = Window.partitionBy("band", "bucket").orderBy("id")
    capped = (
        banded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
    )
    left = capped.select(
        "band", "bucket", F.col("id").alias("a"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    right = capped.select(
        "band", "bucket", F.col("id").alias("b"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            *[f"{c}_a" for c in carry], *[f"{c}_b" for c in carry],
        )
    )


def _minhash_sigs(df, text_col, id_col, n_hashes, k, seed) -> DataFrame:
    """(id, sig) minhash signatures. The shingle hashes are hoisted
    through their own projection so the fold stage consumes ONE
    materialized array instead of re-evaluating the shingle->hash
    subtree per fold (HOFs are CodegenFallback; CollapseProject keeps
    the boundary because the subtree is non-cheap and multiply
    referenced) — measured 16x on the sf0.1 corpus scan (120.7s ->
    7.9s), tools/bench_minhash_ab.py. Round 6: the folds themselves
    moved from n_hashes interpreted Catalyst array_min(transform(...))
    expressions to one numpy pandas UDF (:func:`_signature_batch_udf`,
    bit-identical values), and the scan is spread across cores first
    (:func:`_spread_if_narrow` — the sf tables are single-file scans)."""
    sig = _signature_batch_udf(n_hashes, seed)
    return _spread_if_narrow(df).select(
        F.col(id_col).alias("id"), shingle_hashes(text_col, k).alias("_sh")
    ).select(
        "id",
        sig(F.col("_sh")).alias("sig"),
    )


def _minhash_sigs_packed(df, text_col, id_col, n_hashes, k, seed,
                         n_extra) -> DataFrame:
    """(id, sig, p): the exact banding signature PLUS the packed
    (n_hashes + n_extra)-byte estimate sketch, from ONE corpus scan."""
    sig = _signature_batch_udf(n_hashes, seed, n_extra=n_extra)
    return _spread_if_narrow(df).select(
        F.col(id_col).alias("id"), shingle_hashes(text_col, k).alias("_sh")
    ).select(
        "id", sig(F.col("_sh")).alias("_s")
    ).select("id", "_s.sig", "_s.p")


def _byte_match_udf(n_bytes: int):
    """count of equal bytes between two fixed-width binary sketches
    (NULL when either side is NULL — matching the Catalyst est's NULL
    comparison semantics, which drops the pair at the filter)."""

    @F.pandas_udf(T.LongType())
    def _matches(pa: pd.Series, pb: pd.Series) -> pd.Series:
        va, vb = pa.to_numpy(), pb.to_numpy()
        n = len(va)
        out = np.zeros(n, dtype=np.int64)
        ok = np.fromiter(
            (x is not None and y is not None for x, y in zip(va, vb)),
            dtype=bool, count=n,
        )
        idx = np.flatnonzero(ok)
        if idx.size:
            aa = np.frombuffer(
                b"".join(va[i] for i in idx), dtype=np.uint8
            ).reshape(-1, n_bytes)
            bb = np.frombuffer(
                b"".join(vb[i] for i in idx), dtype=np.uint8
            ).reshape(-1, n_bytes)
            out[idx] = (aa == bb).sum(axis=1)
        res = pd.Series(out, dtype="Int64")
        res[~ok] = pd.NA
        return res

    return _matches


def _minhash_banded(df, text_col, id_col, n_hashes, bands, k, seed,
                    _sigs: DataFrame | None = None,
                    carry: tuple[str, ...] = ()):
    """(id, band, bucket[, carry...]) exploded banding rows (shared by
    candidates + stats). ``_sigs`` reuses an already-built (id, sig)
    frame so a caller that ALSO needs the signatures (the estimate
    prefilter) does not pay the corpus signature scan twice. ``carry``
    names extra ``_sigs`` columns to keep on the exploded rows (the
    prefilter rides its packed sketch through the blocking join instead
    of joining it onto the pair stream)."""
    rows_per_band = n_hashes // bands
    sigs = (
        _sigs if _sigs is not None
        else _minhash_sigs(df, text_col, id_col, n_hashes, k, seed)
    )
    return sigs.select(
        "id",
        *carry,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", *carry, "bb.band", "bb.bucket")


def lsh_bucket_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 42,
    min_size: int = 2,
) -> DataFrame:
    """(band, bucket, bucket_size) for buckets >= min_size — the
    monitoring side-output for cap tuning: any bucket_size above the
    candidate cap means ``minhash_lsh_candidates`` truncated it (pairs
    beyond the first max_bucket ids per bucket were not generated)."""
    return (
        _minhash_banded(df, text_col, id_col, n_hashes, bands, k, seed)
        .groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") >= min_size)
    )


def jaccard_similarity(df_pairs: DataFrame, docs: DataFrame,
                       text_col: str = "text", id_col: str = "doc_id",
                       k: int = 5) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (verification step)."""
    sh = _spread_if_narrow(docs).select(
        F.col(id_col).alias("id"), shingles(text_col, k).alias("sh")
    )
    a = sh.withColumnRenamed("id", "a").withColumnRenamed("sh", "sh_a")
    b = sh.withColumnRenamed("id", "b").withColumnRenamed("sh", "sh_b")
    return (
        df_pairs.join(a, "a").join(b, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("a", "b", "jaccard")
    )


def near_duplicates_minhash(
    df: DataFrame, threshold: float = 0.8,
    estimate_margin: float | None = 0.4, **kw
) -> DataFrame:
    """LSH candidates -> minhash-estimate prefilter -> exact-Jaccard
    verified pairs above threshold.

    The prefilter is the round-5 fix for candidate explosion: recall-
    oriented banding (e.g. 32 bands x 2 rows for oracle-exact recall at
    J>=0.7) happily emits a near-quadratic candidate set on a corpus
    whose baseline similarity exceeds the banding threshold
    ((1/b)^(1/r) ~ 0.18), and the exact verify then shuffles the big
    shingle STRING arrays for every candidate (measured 3.3M pairs /
    27s for 5k docs at sf0.1). The round-6 prefilter keeps only pairs
    whose packed-sketch component agreement over 4*n_hashes independent
    min-permutations is >= threshold - estimate_margin/2; a TRUE pair
    (J >= threshold) is dropped with probability
    <= exp(-2*(4*n_hashes)*(margin/2)^2) == exp(-2*n_hashes*margin^2)
    (Hoeffding) — 1.3e-9 at (64, 0.4), the same order as the banding
    miss probability callers already accept (the byte packing of the
    sketch only ever INFLATES the estimate, so it cannot add drops).
    The exact string-shingle verify then runs on the survivors' docs
    only (semi-joined corpus). estimate_margin=None (or a margin >=
    threshold) disables the prefilter."""
    import math

    _known = {"text_col", "id_col", "k", "n_hashes", "seed", "bands",
              "max_bucket"}
    _unknown = set(kw) - _known
    if _unknown:
        # the prefilter branch reads kw via .get() and would otherwise
        # drop a typoed tuning knob on the floor, while the
        # estimate_margin=None branch forwards **kw and raises — behave
        # alike on both branches
        raise TypeError(
            f"near_duplicates_minhash: unknown keyword(s) {sorted(_unknown)}"
        )
    text_col = kw.get("text_col", "text")
    id_col = kw.get("id_col", "doc_id")
    k = kw.get("k", 5)
    n_hashes = kw.get("n_hashes", 64)
    seed = kw.get("seed", 42)
    cutoff = (
        max(threshold - estimate_margin, 0.0)
        if estimate_margin is not None else 0.0
    )
    if cutoff > 0.0 and (
        math.exp(-2.0 * n_hashes * estimate_margin ** 2) > 1e-6
    ):
        # the Hoeffding drop bound depends on n_hashes: at the default
        # margin it is 1.3e-9 for 64 hashes but ~0.6% for 16 — too weak
        # to call negligible. Silently fall back to verifying every
        # candidate rather than silently losing true pairs.
        cutoff = 0.0
    if cutoff > 0.0:
        # Round-6 shape of the prefilter (same Hoeffding drop bound,
        # far cheaper join): the estimate uses 4*n_hashes independent
        # min-permutation components at HALF the margin — Hoeffding
        # exp(-2*(4n)*(m/2)^2) == exp(-2*n*m^2), the exact bound the
        # disable check above enforces — so the cutoff moves from
        # threshold-m to threshold-m/2 and the exact-verify set shrinks
        # by orders of magnitude on high-baseline-similarity corpora
        # (5.4M -> ~10k pairs at sf1.0). Components ship as a packed
        # low-byte-per-component binary sketch (keep-superset
        # compression: byte equality is necessary for component
        # equality, so the byte estimate >= the true estimate and can
        # only keep MORE pairs — the exact verify still decides).
        # The distinct runs AFTER this filter (see _raw_bucket_pairs).
        n_est = 4 * n_hashes
        bands = kw.get("bands", 16)
        max_bucket = kw.get("max_bucket", 200)
        sp = _minhash_sigs_packed(
            df, text_col, id_col, n_hashes, k, seed, n_extra=3 * n_hashes
        ).localCheckpoint(eager=False)
        # the packed sketch RIDES the banding explode and the bucket
        # self-join (one exchange of n_docs*bands ~300-byte rows) instead
        # of being joined onto the near-quadratic raw-pair stream (which
        # cost two full shuffles + sorts of the ~47M-row stream at
        # sf1.0, keyed by a then by b — guide §2.3/§3.2)
        banded = _minhash_banded(
            df, text_col, id_col, n_hashes, bands, k, seed,
            _sigs=sp.select("id", "sig", "p"), carry=("p",),
        )
        matches = _byte_match_udf(n_est)
        byte_cutoff = max(threshold - estimate_margin / 2.0, 0.0)
        cands = (
            _raw_bucket_pairs(banded, max_bucket, carry=("p",))
            .filter(
                (matches(F.col("p_a"), F.col("p_b"))
                 / F.lit(float(n_est))) >= byte_cutoff
            )
            .select("a", "b")
            .distinct()
        )
    else:
        cands = minhash_lsh_candidates(df, **kw)
    # verify CANDIDATES only: materialize the (small) surviving pair set
    # once, then cut the corpus down to the ids it mentions before the
    # exact-Jaccard shingle computation. Without this the verify stage
    # shingles the WHOLE corpus twice (once per join side) — guide §3.2's
    # semi-join shape, round-6 measurement: the corpus-wide verify scans
    # were ~42s of minhash_neardup at sf1.0 for a few hundred surviving
    # candidates. localCheckpoint keeps the big candidate plan from
    # executing once per downstream use (ids + the verify join itself).
    cands = cands.localCheckpoint(eager=False)
    cand_ids = cands.select(
        F.explode(F.array("a", "b")).alias(id_col)
    ).distinct()
    docs_needed = df.join(cand_ids, id_col, "leftsemi")
    sims = jaccard_similarity(cands, docs_needed, text_col, id_col, k)
    return sims.filter(F.col("jaccard") >= threshold)


# --- simhash --------------------------------------------------------------------


def _simhash_fold_batch(hashes: pd.Series) -> pd.Series:
    """Whole-batch simhash bit-vote fold: per row, bit b of the signature
    is 1 iff more than half the row's token hashes have bit b set.

    Vectorized over the ENTIRE Arrow batch (the old form looped rows in
    Python, expanding a 64 x n_tokens bit matrix per row): rows are
    sorted by token count and processed in fixed-size row chunks, each
    chunk zero-padded to its own max length (sorting keeps padding waste
    ~0). The bit expansion is np.unpackbits over the little-endian byte
    view (54x faster than a broadcast uint64 shift, measured) and the
    per-row bit counts are one uint8 sum over the padded middle axis —
    SIMD over the contiguous 64-bit-wide lanes. Zero padding adds zero
    to every bit count, and the majority threshold uses the TRUE row
    length, so results are bitwise-identical to the per-row form
    (np.add.reduceat segment sums were tried first: 0.55us/token scalar
    inner loop, 5-10x slower than this shape). Empty/None rows keep
    signature 0."""
    n = len(hashes)
    out = np.zeros(n, dtype=np.uint64)
    vals = hashes.to_numpy()
    lens = np.fromiter(
        (0 if h is None else len(h) for h in vals), dtype=np.int64, count=n
    )
    nonempty = np.flatnonzero(lens)
    if nonempty.size:
        weights = np.left_shift(
            np.uint64(1), np.arange(64, dtype=np.uint64)
        )
        order = nonempty[np.argsort(lens[nonempty], kind="stable")]
        flat = np.concatenate(
            [np.asarray(vals[i], dtype=np.int64) for i in order]
        )
        if sys.byteorder != "little":  # byte view assumes LE layout
            flat = flat.byteswap()
        s_lens = lens[order]
        ends = np.cumsum(s_lens)
        sigs = np.empty(order.size, dtype=np.uint64)
        # chunk bound is an ELEMENT budget, not a fixed row count: rows
        # are sorted by length so a chunk's max is its last row, and the
        # padded tensor stays <= ~2^22 cells (~270 MB of unpacked bits)
        # even when one document has millions of tokens. A fixed 2048
        # rows would pad the WHOLE chunk to the outlier's length —
        # multi-GB for a single 100k-token doc (round-4 review finding).
        chunk_elems = 1 << 22
        max_chunk_rows = 2048
        c0 = 0
        while c0 < order.size:
            c1 = c0 + 1  # always progress, even on one giant row
            while (
                c1 < order.size
                and c1 - c0 < max_chunk_rows
                and (c1 - c0 + 1) * int(s_lens[c1]) <= chunk_elems
            ):
                c1 += 1
            ls = s_lens[c0:c1]
            lmax = int(ls[-1])  # sorted: last is the chunk max
            pad = np.zeros(((c1 - c0), lmax), dtype=np.int64)
            mask = np.arange(lmax) < ls[:, None]
            lo = ends[c0] - s_lens[c0]
            pad[mask] = flat[lo:ends[c1 - 1]]
            # bit k of token t == bits[t, k]: LE byte view + bitorder=
            # "little" puts bit index = 8*byte + bit_in_byte; unpack on
            # the 2-D (tokens, 8) view (the 3-D axis=2 form is 10x
            # slower), then reshape back — same memory layout
            bits = np.unpackbits(
                pad.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            ).reshape(c1 - c0, lmax, 64)
            ones = bits.sum(axis=1, dtype=np.int32)
            votes_pos = (2 * ones) > ls[:, None]
            sigs[c0:c1] = (votes_pos.astype(np.uint64) * weights).sum(
                axis=1, dtype=np.uint64
            )
            c0 = c1
        out[order] = sigs
    return pd.Series(out.view(np.int64))


def simhash(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash: JVM tokenization+hashing, numpy bit-vote fold.

    The fold UDF is marked non-deterministic as an OPTIMIZER FENCE (it
    is in fact deterministic): downstream join-key null filters
    otherwise get pushed below the projection and the current optimizer
    duplicates the UDF around the pushed filter — the guide-§4.4
    two-BatchEvalPython shape. Round-6 measurement: the blocked join's
    isnotnull(key) pushdown made every simhash_near_dups branch fold
    the whole corpus TWICE (eight ArrowEvalPython nodes in the plan,
    two per union-branch per join side; one each after the fence)."""

    @F.pandas_udf(T.LongType())
    def _fold(hashes: pd.Series) -> pd.Series:
        return _simhash_fold_batch(hashes)

    _fold_fenced = _fold.asNondeterministic()

    token_hashes = F.transform(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda t: F.xxhash64(t)
    )
    return df.select(
        F.col(id_col), _fold_fenced(token_hashes).alias("simhash")
    )


def simhash_near_dups(df: DataFrame, max_hamming: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_blocks: int = 4) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance, blocked so no
    quadratic comparison ever happens.

    When ``max_hamming < n_blocks`` (the guaranteed-recall regime) the
    blocking is MULTI-INDEX: the 64 bits split into m = max_hamming + 2
    blocks, and candidates must agree on an exact PAIR of blocks (all
    C(m, 2) pairs are probed). Pigeonhole: d <= max_hamming bit flips
    damage at most max_hamming blocks, leaving >= 2 intact, so every
    true pair shares at least one probed block pair — recall identical
    to the single-block scheme, but the join key is ~2*64/m bits instead
    of 64/n_blocks. At 2M docs the 16-bit single-block keys generated
    n^2/2^17-per-block random collisions (~122M candidate rows, 180s at
    sf1.0); the ~26-bit pair keys cut that ~4000x (round-6 measurement).
    The Hamming filter runs BEFORE the distinct so the distinct sees
    only true pairs, not the collision stream.

    When ``max_hamming >= n_blocks`` the original single-block probe is
    kept (same partial-recall contract as before: only pairs sharing
    one exact 64/n_blocks-bit block are found)."""
    # materialize (id, simhash) once: the blocked self-join references
    # the frame on BOTH sides, and without the cut each side would
    # re-run the corpus scan + fold (the same shape the minhash path
    # checkpoints its signature frame for)
    sh = simhash(
        _spread_if_narrow(df), text_col, id_col
    ).withColumnRenamed(id_col, "id").localCheckpoint(eager=False)
    if max_hamming < n_blocks:
        m = max_hamming + 2
        widths = [64 // m + (1 if i < 64 % m else 0) for i in range(m)]
        offs = [sum(widths[:i]) for i in range(m)]

        def blk(i: int) -> Column:
            return (
                F.shiftrightunsigned("simhash", offs[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
            )

        combos = [(i, j) for i in range(m) for j in range(i + 1, m)]
        blocked = sh.select(
            "id", "simhash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("blk"),
                        blk(i).alias("key"),
                        blk(j).alias("key2"),
                    )
                    for c, (i, j) in enumerate(combos)
                ])
            ).alias("b"),
        ).select("id", "simhash", "b.blk", "b.key", "b.key2")
        keys = ["blk", "key", "key2"]

        def _minimal_probe(xor_col: Column) -> Column:
            # Dedup-at-source (round 6): a pair whose agreeing-block set
            # is S matches EVERY probed combo (i, j) with i, j in S, so
            # each true pair came out of the join |S| choose 2 times and
            # only the .distinct() collapsed them (10M -> 1M rows at
            # sf1.0, 3-7s of hash aggregate). Keep a row only when its
            # combo is the MINIMAL agreeing pair (min S, second-min S):
            # every block below i and every block strictly between i
            # and j must DISAGREE. Exactly one combo per pair survives
            # (blocks i/j agree by join-key construction), so the
            # distinct input is already pair-unique — pure int64
            # bitwise ops, no extra shuffle.
            def disagree(b: int) -> Column:
                return (
                    F.shiftrightunsigned(xor_col, offs[b])
                    .bitwiseAND(F.lit((1 << widths[b]) - 1))
                    != 0
                )

            expr = F.lit(False)
            for c, (i, j) in enumerate(combos):
                cond = F.lit(True)
                for b in list(range(i)) + list(range(i + 1, j)):
                    cond = cond & disagree(b)
                expr = F.when(F.col("blk") == c, cond).otherwise(expr)
            return expr
    else:
        width = 64 // n_blocks
        blocked = sh.select(
            "id", "simhash",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("simhash", i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ])
            ).alias("b"),
        ).select("id", "simhash", "b.blk", "b.key")
        keys = ["blk", "key"]

        def _minimal_probe(xor_col: Column) -> Column:
            # same dedup-at-source as the multi-index branch: keep only
            # the row probed on the LOWEST agreeing block (all blocks
            # below it must disagree)
            def disagree(b: int) -> Column:
                return (
                    F.shiftrightunsigned(xor_col, b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    != 0
                )

            expr = F.lit(False)
            for i in range(n_blocks):
                cond = F.lit(True)
                for b in range(i):
                    cond = cond & disagree(b)
                expr = F.when(F.col("blk") == i, cond).otherwise(expr)
            return expr
    left = blocked.select(
        *keys, F.col("id").alias("a"), F.col("simhash").alias("sh_a")
    )
    right = blocked.select(
        *keys, F.col("id").alias("b"), F.col("simhash").alias("sh_b")
    )
    xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
    pairs = (
        left.join(right, keys)
        .filter(F.col("a") < F.col("b"))
        .filter(_minimal_probe(xor))
        .withColumn("hamming", F.bit_count(xor))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )
    return pairs


class _IterCheckpointer:
    """Lineage control for iterative algorithms.

    Default mode (no ``checkpoint_dir``): every cut is a lazy
    ``localCheckpoint`` — blocks live in executor storage memory, so a
    lost executor forces recompute of everything since the source.

    Durable mode (``checkpoint_dir`` set): every ``every``-th cut
    SPILLS the frame to parquet and reads it back; the cuts in between
    return the frame UNCHANGED, so their lineage chains back to the
    last spill and stays recomputable after executor loss (a
    localCheckpoint in between would truncate lineage into
    executor-memory blocks — unrecoverable, which silently defeated the
    durability this mode exists for; round-5 review finding). The cost
    of an in-between round's action is re-deriving at most ``every``
    rounds from the last spill.

    ``pin=True`` marks a LONG-LIVED frame (e.g. the algorithm's input
    edge set, read by every round): in durable mode it always spills
    and is excluded from garbage collection — the rolling GC deleting
    the input spill crashed every later round (executed repro, round-5
    review). Rolling spills older than the last THREE are deleted
    best-effort: star contraction's prev_edges can reference a spill
    from one full alternation back."""

    def __init__(self, spark, checkpoint_dir: str | None, every: int = 5,
                 tag: str = ""):
        self.spark = spark
        self.dir = checkpoint_dir
        self.every = max(1, every)
        self.tag = tag  # namespaces spills when two algorithms share a
        # dir (label propagation falling back to star contraction)
        self.calls = 0
        self.spills: list[str] = []
        self.pinned: list[str] = []

    def cut(self, df: DataFrame, pin: bool = False) -> DataFrame:
        self.calls += 1
        if self.dir is None:
            return df.localCheckpoint(eager=False)
        if not pin and self.calls % self.every:
            # durable mode, in-between round: chain to the last spill
            return df
        suffix = "pin" if pin else "iter"
        path = (
            f"{self.dir.rstrip('/')}/{self.tag}{suffix}_{self.calls:04d}"
        )
        df.write.mode("overwrite").parquet(path)
        out = self.spark.read.parquet(path)
        if pin:
            self.pinned.append(path)  # never garbage-collected
            return out
        self.spills.append(path)
        for old in self.spills[:-3]:
            try:
                # pyarrow.fs handles local paths AND remote schemes —
                # a shutil-only GC would leak every spill on the hdfs/
                # s3 checkpoint_dirs this feature exists for
                from ..sources.direct import _resolve_fs

                fs, inner = _resolve_fs(old)
                fs.delete_dir(inner)
            except Exception:
                pass  # best-effort GC; a leaked spill is not an error
        self.spills = self.spills[-3:]
        return out


def _edge_signature(e: DataFrame):
    """(exact count, xor-of-xxhash64) multiset signature of an edge
    frame — the cheap stability probe for star contraction (module-level
    so tests can force collisions)."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("a", "b")).alias("x"),
    ).first()
    return (row["n"], row["x"])


def star_contraction_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 60,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Connected components by alternating large-star / small-star edge
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond"): converges in O(log n) alternations regardless of graph
    diameter — the deep-chain regime where min-label propagation's
    O(diameter) rounds would not terminate in a sane bound.

    Per node u with closed-neighbourhood min m = min({u} U N(u)):
      * large-star rewires every LARGER neighbour v > u to m,
      * small-star rewires every SMALLER neighbour v < u to m.
    Both also keep (u, m), which preserves connectivity of every original
    edge within a single pass (each endpoint stays linked to the shared
    min) at the cost of a few extra edges that the per-round distinct
    absorbs. At the fixed point every component is a star centred on its
    min node.

    Scale shape: each half-round is one symmetrize + one groupBy-min +
    one equi-join on node id — no driver graph state, no cartesian
    products; lineage is cut per half-round (localCheckpoint, or with
    ``checkpoint_dir`` a durable parquet spill every
    ``checkpoint_every`` cuts, in-between rounds chaining to the last
    spill — see _IterCheckpointer for the recovery semantics).
    Convergence is detected by a (count, xor-of-xxhash64) set signature
    going stable across a full large+small alternation, then CONFIRMED
    exactly: the candidate fixed point is accepted only when the edge
    set is literally unchanged (exceptAll empty) — a 2^-64 signature
    collision therefore degrades to one extra alternation instead of a
    silently wrong component map."""
    spark = pairs.sparkSession
    ckpt = _IterCheckpointer(spark, checkpoint_dir, checkpoint_every,
                             tag="star_")
    # cut the INPUT plan's lineage immediately: `pairs` is typically the
    # whole LSH candidate+verify pipeline, and without this cut the
    # first alternation (and all_nodes) would re-execute it several
    # times (round-5 finding: uncut edges made the end-to-end dedup
    # re-run the minhash plan once per CC round — 149s -> ~50s at sf0.1)
    edges = ckpt.cut(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct(),
        pin=True,  # read by every alternation AND by all_nodes
    )
    all_nodes = (
        edges.select(F.col("a").alias("node"))
        .unionAll(edges.select(F.col("b").alias("node")))
        .distinct()
    )
    if checkpoint_dir is None:
        all_nodes = all_nodes.localCheckpoint(eager=False)
    # durable mode: leave all_nodes UNCUT — it chains to the pinned
    # edges spill, so it stays recomputable after executor loss, whereas
    # a localCheckpoint here would silently defeat the durability this
    # mode exists for (round-5 ADVICE finding)

    prev_sig = None
    prev_edges = None
    for _ in range(max_rounds):
        for large in (True, False):
            sym = edges.unionAll(
                edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
            ).distinct()
            mins = sym.groupBy("a").agg(
                F.least(F.col("a"), F.min("b")).alias("m")
            )
            j = sym.join(mins, "a")
            rewired = j.filter(
                F.col("b") > F.col("a") if large else F.col("b") < F.col("a")
            ).select(F.col("b").alias("a"), F.col("m").alias("b"))
            kept = mins.select(F.col("a"), F.col("m").alias("b"))
            edges = ckpt.cut(
                rewired.unionAll(kept)
                .filter(F.col("a") != F.col("b"))
                .distinct()
            )
        sig = _edge_signature(edges)
        if sig == prev_sig:
            # exact confirmation of the fixed point: the signature says
            # "probably unchanged since last alternation"; accept only
            # if the set truly is (both are distinct sets and the
            # signature's count component matched, so one exceptAll
            # direction proves equality). Costs one job, once.
            if prev_edges is not None and (
                edges.exceptAll(prev_edges).limit(1).count() == 0
            ):
                non_centers = edges.groupBy(F.col("a").alias("node")).agg(
                    F.min("b").alias("component")
                )
                return all_nodes.join(non_centers, "node", "left").select(
                    "node",
                    F.coalesce(F.col("component"), F.col("node")).alias(
                        "component"
                    ),
                )
            # signature collision: keep contracting
        prev_sig = sig
        prev_edges = edges
    raise RuntimeError(
        f"star_contraction_components did not converge in {max_rounds} "
        "alternations — O(log n) bound exceeded; the edge list is likely "
        "pathological (raise max_rounds)"
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 25,
    algorithm: str = "auto",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Undirected connected components over a near-dup pair list:
    (node, component) where component = min node id reachable.

    Min-label propagation: every node starts labelled with itself; each
    round, each node takes the min of its own label and its neighbours'.
    Convergence needs O(graph diameter) rounds — near-dup clusters are
    shallow (a cluster's members all link to a shared survivor within a
    hop or two), so this terminates in a handful of rounds even at
    corpus scale.

    ``algorithm``: "label" = propagation only (raises at max_iters, for
    callers that treat a deep graph as a data bug); "star" = go straight
    to star_contraction_components (O(log n) rounds, diameter-proof);
    "auto" (default) = propagate up to max_iters, then FALL BACK to star
    contraction instead of failing mid-pipeline — an adversarial chain
    from greedy-transitive LSH output degrades to the logarithmic
    algorithm rather than taking down the whole dedup job.

    Scale shape: per round, one groupBy over the (symmetrized) edge list
    joined to current labels — shuffles on node id only, labels frame is
    2 longs per node, edges never mutate. The per-round convergence
    check reuses the aggregated frame (single count of changed labels).
    No driver-side graph state. Lineage is cut per round; with
    ``checkpoint_dir`` set, every ``checkpoint_every``-th cut is a
    durable parquet spill and in-between rounds chain to the last spill
    (recomputable after executor loss — localCheckpoint blocks die with
    their executor; see _IterCheckpointer).
    """
    if algorithm not in ("auto", "label", "star"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}; expected auto|label|star"
        )
    if algorithm == "star":
        return star_contraction_components(
            pairs, a_col, b_col,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        )
    ckpt = _IterCheckpointer(
        pairs.sparkSession, checkpoint_dir, checkpoint_every, tag="label_"
    )
    # cut the INPUT plan's lineage once: `edges` is referenced by EVERY
    # propagation round, and `pairs` is typically the full LSH
    # candidate+verify pipeline — uncut, each round's join + changed
    # count re-executed that whole plan (round-5 finding via the new
    # secondary bench section: dedup_pipeline spent ~75% of its 149s
    # re-running minhash once per round)
    edges = ckpt.cut(
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .unionAll(
            pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
        )
        .distinct(),
        pin=True,  # read by EVERY propagation round — the rolling GC
        # deleting this spill crashed round every+1 (executed repro)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        # min neighbour label per node, folded with own label
        neigh = (
            edges.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "label", "v_label"
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("v_label").alias("neigh_label"))
        )
        merged = ckpt.cut(
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("neigh_label"), F.col("label")),
                ).alias("new_label"),
                F.col("label"),
            )
        )
        changed = merged.filter(F.col("new_label") != F.col("label")).count()
        labels = merged.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    if algorithm == "auto":
        # graph deeper than the propagation bound: degrade to the
        # O(log n) contraction instead of failing the whole dedup job
        import warnings

        warnings.warn(
            f"connected_components: label propagation hit max_iters="
            f"{max_iters} (deep graph); falling back to large-star/"
            "small-star contraction",
            stacklevel=2,
        )
        return star_contraction_components(
            pairs, a_col, b_col,
            checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        "(graph diameter exceeds the bound — raise max_iters, or use "
        "algorithm='auto'/'star' for the O(log n) star contraction)"
    )


def dedupe_by_components(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
    **cc_kwargs,
) -> DataFrame:
    """Keep ONE representative (min id) per near-dup component, plus all
    docs that appear in no pair — the standard last stage of a corpus
    dedup pipeline (pairs from minhash/simhash/embedding candidates).
    One broadcast-sized join when the pair list is small relative to the
    corpus; a plain shuffled left_anti otherwise (Spark picks via AQE).
    Extra kwargs (algorithm=, checkpoint_dir=, checkpoint_every=,
    max_iters=) pass through to :func:`connected_components`."""
    comps = connected_components(pairs, a_col, b_col, **cc_kwargs)
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
