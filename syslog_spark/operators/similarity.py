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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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

    The query side is broadcast — the corpus never shuffles. Ties broken
    deterministically by vec_id."""
    c = corpus.select(
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


def rh_signature(vec_col, dim: int, n_bits: int = 64, seed: int = 42) -> Column:
    """Random-hyperplane signature as a bigint (pure Catalyst: one dot
    product per bit against literal plane arrays, bit-packed)."""
    v = _vec(vec_col)
    planes = _planes(dim, n_bits, seed)
    bit_cols = []
    for i in range(n_bits):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (dot(v, plane) > 0).cast("long")
        bit_cols.append(F.shiftleft(bit, i))
    sig = bit_cols[0]
    for b in bit_cols[1:]:
        sig = sig.bitwiseOR(b)
    return sig


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
        sig = rh_signature(vec_col, dim, n_bits, seed).alias("sig")
        base = df.select(F.col(idc).alias(name), _vec(vec_col).alias(f"v_{name}"), sig)
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

    cb = blocked(corpus, id_col, "vec_id")
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
