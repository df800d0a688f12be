"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query side,
JVM-side dot products via zip_with/aggregate (no Python in the score
loop), window rank. Exact; O(N*Q) but embarrassingly parallel.

Scale path: random-hyperplane LSH — 64-bit signatures from deterministic
seeded planes, multi-probe via Hamming-block equality (same pigeonhole
blocking as simhash), exact re-rank inside candidate sets only. Sub-linear
candidate generation at 100 TB; planes are a broadcast literal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread_if_narrow


def _vec(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product: sum over zip_with products."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    The query side is broadcast — the corpus never shuffles (a narrow
    single-file corpus scan is fanned out first so the score loop uses
    every core). Ties broken deterministically by vec_id."""
    c = _spread_if_narrow(corpus).select(
        F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _vec(vec_col).alias("qv")
    )
    scored = c.join(F.broadcast(q)).select(
        "query_id", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _planes(dim: int, n_bits: int = 64, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_bits, dim)).astype(np.float64)


def _double_array_sql(values) -> str:
    """SQL text for a literal array<double>. repr() round-trips float64
    exactly; the D suffix makes each element a double literal."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in values) + ")"


def _lit_double_array(values) -> Column:
    """Literal array<double> in ONE py4j call. ``F.array(*[F.lit(x)...])``
    costs a py4j round-trip PER ELEMENT — a 64x64-plane signature built
    that way spent ~9s of pure driver-side gateway latency before any
    data moved (round-5 finding)."""
    return F.expr(_double_array_sql(values))


# above this many plane literals (n_bits * dim) the pure-Catalyst
# signature stops being free: ~50-100k literal nodes per call at real
# embedding widths (768-1536) bloat analysis time and can push generated
# code past the 64KB JVM method limit, falling back to interpreted mode
# exactly on the 100-TB operator. The pandas path is one Arrow-batched
# matmul against a worker-side plane matrix instead.
_CATALYST_SIG_MAX_LITERALS = 8192


def rh_signature_batch(
    vec_col, dim: int, n_bits: int = 64, seed: int = 42,
    cast: bool = True,
) -> Column:
    """Random-hyperplane signature via ONE vectorized pandas UDF: batch
    matmul against the (n_bits x dim) plane matrix + bit-pack. Planes are
    regenerated deterministically inside the worker (same seeded
    RandomState as _planes) — nothing rides the closure but three ints.

    Bitwise-equivalent to the Catalyst form except when a plane dot lands
    within float rounding of exactly 0 (summation order differs); for
    continuous embeddings that is measure-zero and candidate differences
    are absorbed by the exact-cosine verify stage anyway."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        import os

        # the matmul below may dispatch to BLAS: workers ARE the
        # parallelism, so pin library threads to 1. build_session pins
        # these for local mode; this setdefault covers executors whose
        # env was not prepared (cluster deploys) for backends that read
        # the env lazily. (Backends that bound their pool at import keep
        # whatever the executor env said — document in deploy notes.)
        for var in (
            "OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"
        ):
            os.environ.setdefault(var, "1")
        if len(v) == 0:
            return pd.Series([], dtype="Int64")
        planes = _planes(dim, n_bits, seed)  # deterministic per (args)
        vals = v.to_numpy()
        # null / wrong-width rows -> null signature (matching the
        # Catalyst engine, where the dot over a null/short array yields
        # null and the row drops out of the block join) instead of
        # np.stack raising and killing the task (round-4 review finding)
        ok = np.array(
            [x is not None and len(x) == dim for x in vals], dtype=bool
        )
        out = np.zeros(len(vals), dtype=np.int64)
        if ok.any():
            m = np.stack(vals[ok]).astype(np.float64, copy=False)
            bits = (m @ planes.T) > 0  # (ok_rows, n_bits)
            weights = np.left_shift(
                np.uint64(1), np.arange(n_bits, dtype=np.uint64)
            )
            out[ok] = (
                (bits.astype(np.uint64) * weights)
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
        res = pd.Series(out, dtype="Int64")
        res[~ok] = pd.NA
        return res

    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return _sig(F.transform(c, lambda x: x.cast("double")) if cast else c)


def rh_signature(
    vec_col,
    dim: int,
    n_bits: int = 64,
    seed: int = 42,
    engine: str = "auto",
    cast: bool = True,
) -> Column:
    """Random-hyperplane signature as a bigint.

    engine="catalyst": one JVM dot product per bit against literal plane
    arrays, bit-packed — zero Python, but bakes n_bits*dim literals into
    the plan. engine="pandas": rh_signature_batch (one Arrow matmul).
    "auto" picks catalyst below _CATALYST_SIG_MAX_LITERALS and pandas
    above, so small dims keep the pure-JVM plan and real embedding widths
    never hit the codegen cliff.

    ``cast=False`` skips the to-double transform; scan-heavy callers
    hoist ``_vec`` into its own projection and pass that column — the
    inline transform would otherwise be re-evaluated inside every one of
    the n_bits fold expressions (HOFs are CodegenFallback, no CSE; the
    round-5 minhash lesson)."""
    if engine == "auto":
        engine = (
            "catalyst"
            if n_bits * dim <= _CATALYST_SIG_MAX_LITERALS
            else "pandas"
        )
    if engine == "pandas":
        return rh_signature_batch(vec_col, dim, n_bits, seed, cast=cast)
    planes = _planes(dim, n_bits, seed)
    if isinstance(vec_col, str) and vec_col.isidentifier():
        # build the WHOLE signature as one SQL expression — the
        # per-bit Column-API form costs thousands of py4j round trips
        # (plane literals + HOF lambda wrappers), ~9s of driver latency
        # per call at 64x64 before any data moved (round-5 finding);
        # the parser builds the identical tree JVM-side in one call.
        # Simple identifiers only: backticking a dotted/qualified name
        # ('s.embedding') would turn it into one literal identifier and
        # break the resolution F.col provides — those take the Column
        # path below.
        vname = f"`{vec_col}`"
        vexpr = (
            f"transform({vname}, x -> cast(x as double))" if cast else vname
        )
        bits = []
        for i in range(n_bits):
            arr = _double_array_sql(planes[i])
            bits.append(
                f"shiftleft(cast(aggregate(zip_with({vexpr}, {arr}, "
                f"(x, y) -> x * y), 0.0D, (a, x) -> a + x) > 0 as long), "
                f"{i})"
            )
        return F.expr(" | ".join(bits))
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = _vec(c) if cast else c
    bit_cols = []
    for i in range(n_bits):
        plane = _lit_double_array(planes[i])
        bit = (dot(v, plane) > 0).cast("long")
        bit_cols.append(F.shiftleft(bit, i))
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig.bitwiseOR(b)
    return sig


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.9,
    dim: int | None = None,
    n_bits: int = 64,
    n_blocks: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, WITHOUT an all-pairs
    cross join: random-hyperplane signatures (pure Catalyst), pigeonhole
    block equi-join for candidates, exact cosine verify on candidates only
    — the same blocked shape as simhash_near_dups (dedup.py).

    Recall: a pair at cosine c has per-bit flip probability arccos(c)/pi;
    a candidate needs one exact (n_bits/n_blocks)-bit block. At the
    near-dup thresholds this operator is for (c >= ~0.9, flip p <= 0.15)
    the miss probability is (1-(1-p)^8)^8 ~ <1e-3 and falls fast as c->1;
    it is NOT suitable for low thresholds (c ~ 0.5) where an all-pairs or
    multi-table LSH is required.

    Scale shape: one corpus scan for signatures, explode x n_blocks, one
    shuffle on (blk, key); candidates are verified with a JVM cosine. No
    CartesianProduct anywhere in the plan (asserted in tests).

    ``dim`` is required: the hyperplanes are literal arrays baked into the
    plan, and inferring the width from data would need an eager driver-side
    job (``.first()``) inside an otherwise lazy operator (and crash on an
    empty frame)."""
    if dim is None:
        raise ValueError(
            "embedding_near_dups requires dim= (hyperplanes are plan "
            "literals; no eager data peek in a lazy operator)"
        )
    width = n_bits // n_blocks
    mask = (1 << width) - 1
    # hoist the to-double cast: the signature's 64 dot folds and the
    # verify stage all reference ONE materialized "v" instead of
    # re-running the cast transform per fold (CodegenFallback, no CSE)
    pre = _spread_if_narrow(df).select(
        F.col(id_col).alias("id"), _vec(vec_col).alias("v")
    )
    sig = rh_signature("v", dim, n_bits, seed, cast=False)
    base = pre.select("id", "v", sig.alias("sig"))
    blocked = base.select(
        "id", "v",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftrightunsigned("sig", i * width)
                    .bitwiseAND(F.lit(mask)).alias("key"),
                )
                for i in range(n_blocks)
            ])
        ).alias("b"),
    ).select("id", "v", "b.blk", "b.key")
    left = blocked.select("blk", "key", F.col("id").alias("a"),
                          F.col("v").alias("va"))
    right = blocked.select("blk", "key", F.col("id").alias("b"),
                           F.col("v").alias("vb"))
    cands = (
        left.join(right, ["blk", "key"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cands.withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    train_fraction: float | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer ->
    corpus assigned to its nearest centroid -> each query searches only its
    n_probe nearest centroid lists -> exact cosine re-rank inside them.

    Scale shape: the corpus is scanned once for assignment (broadcast
    centroid model), then the search join is an equi-join on centroid id —
    a query touches n_probe/n_centroids of the data. Centroids train on a
    sample (train_fraction) so training never shuffles the full corpus.

    ``centroids`` supplies a pretrained coarse quantizer (the
    train-once-offline pattern): assignment becomes a pure-Catalyst argmin
    over literal centers — no ML training job, fully deterministic (KMeans
    training aggregates floats in partition order, so its centroids can
    differ in final bits across runs)."""
    if centroids is not None:
        c = _spread_if_narrow(corpus).select(
            F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
        )
        dist_structs = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("v"),
                        _lit_double_array(ctr),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(i).alias("centroid"),
            )
            for i, ctr in enumerate(centroids)
        ])
        assigned = c.withColumn(
            "centroid", F.array_min(dist_structs)["centroid"]
        )
        centers = [list(map(float, ctr)) for ctr in centroids]
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        c = _spread_if_narrow(corpus).select(
            F.col(id_col).alias("vec_id"), _vec(vec_col).alias("v")
        ).withColumn("features", array_to_vector("v"))
        train = c
        if train_fraction and train_fraction < 1.0:
            train = c.sample(train_fraction, seed=seed)
        model = KMeans(
            k=n_centroids, seed=seed, featuresCol="features"
        ).fit(train)
        assigned = model.transform(c).withColumnRenamed(
            "prediction", "centroid"
        ).drop("features")
        centers = [np.asarray(v).tolist() for v in model.clusterCenters()]
    centers_df = queries.sparkSession.createDataFrame(
        [(i, c_) for i, c_ in enumerate(centers)],
        "centroid int, center array<double>",
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _vec(vec_col).alias("qv")
    )
    # per query: the n_probe closest centroids (tiny cross join: Q x K)
    qc = q.join(F.broadcast(centers_df)).withColumn(
        "dist",
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("center"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("dist"), F.col("centroid"))
    probes = (
        qc.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= n_probe)
        .select("query_id", "qv", "centroid")
    )
    scored = assigned.join(F.broadcast(probes), "centroid").select(
        "query_id", "vec_id", cosine(F.col("v"), F.col("qv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 64,
    n_blocks: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: candidates share >= one exact 8-bit signature
    block with the query (multi-probe by pigeonhole), re-ranked exactly."""
    width = n_bits // n_blocks
    mask = (1 << width) - 1

    def blocked(df, idc, name):
        pre = df.select(
            F.col(idc).alias(name), _vec(vec_col).alias(f"v_{name}")
        )
        sig = rh_signature(f"v_{name}", dim, n_bits, seed, cast=False)
        base = pre.select(name, f"v_{name}", sig.alias("sig"))
        return base.select(
            name, f"v_{name}",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned("sig", i * width)
                        .bitwiseAND(F.lit(mask)).alias("key"),
                    )
                    for i in range(n_blocks)
                ])
            ).alias("b"),
        ).select(name, f"v_{name}", "b.blk", "b.key")

    cb = blocked(_spread_if_narrow(corpus), id_col, "vec_id")
    qb = blocked(queries, query_id_col, "query_id")
    cands = cb.join(F.broadcast(qb), ["blk", "key"]).select(
        "query_id", "vec_id", "v_vec_id", "v_query_id"
    ).dropDuplicates(["query_id", "vec_id"])
    scored = cands.select(
        "query_id", "vec_id",
        cosine(F.col("v_vec_id"), F.col("v_query_id")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
