"""Tests for training-data operators: dedup, similarity, text stats."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d1", "the quick brown fox jumps over the lazy dog"),
        ("d2", "the quick brown fox jumps over the lazy dog"),  # exact dup
        ("d3", "the quick brown fox jumps over the lazy cat"),  # near dup
        ("d4", "completely different content about spark engines"),
        ("d5", "der hund ist nicht und der die das"),
        ("d6", "le chat est sur la table et les chaises"),
        ("d7", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


def test_exact_dedup(spark, docs):
    from syslog_spark.operators.dedup import dedupe_exact, exact_duplicate_groups

    groups = exact_duplicate_groups(docs).collect()
    assert len(groups) == 1 and groups[0]["n_docs"] == 2
    assert groups[0]["keep_doc_id"] == "d1"
    kept = dedupe_exact(docs)
    assert kept.count() == 6
    assert kept.filter("doc_id = 'd2'").count() == 0


def test_minhash_near_dup(spark, docs):
    from syslog_spark.operators.dedup import near_duplicates_minhash

    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in near_duplicates_minhash(
            docs.filter("text != ''"), threshold=0.5
        ).collect()
    }
    assert ("d1", "d2") in pairs and pairs[("d1", "d2")] == 1.0
    assert ("d1", "d3") in pairs and 0.6 < pairs[("d1", "d3")] < 1.0
    assert not any("d4" in p for p in pairs)


def test_minhash_accuracy(spark):
    """Minhash signature similarity approximates true Jaccard."""
    from syslog_spark.operators.dedup import minhash_signature, shingles

    rows = [("a", "abcdefghijklmnopqrstuvwxyz" * 4),
            ("b", "abcdefghijklmnopqrstuvwxyz" * 3 + "0123456789abcdefghijklmnop")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = df.select(
        "doc_id",
        minhash_signature("text", 128).alias("sig"),
        shingles("text").alias("sh"),
    ).collect()
    sig = {r["doc_id"]: r["sig"] for r in out}
    sh = {r["doc_id"]: set(r["sh"]) for r in out}
    true_j = len(sh["a"] & sh["b"]) / len(sh["a"] | sh["b"])
    est_j = sum(x == y for x, y in zip(sig["a"], sig["b"])) / 128
    assert abs(true_j - est_j) < 0.2


def test_simhash_near_dup(spark, docs):
    from syslog_spark.operators.dedup import simhash, simhash_near_dups

    sh = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sh["d1"] == sh["d2"]
    pairs = {(r["a"], r["b"]): r["hamming"]
             for r in simhash_near_dups(docs, max_hamming=16).collect()}
    assert pairs[("d1", "d2")] == 0
    assert ("d1", "d3") in pairs


def test_brute_force_topk(spark):
    from syslog_spark.operators.similarity import brute_force_topk

    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(50, 16)).astype(float)
    rows = [(i, vecs[i].tolist()) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = brute_force_topk(emb, q, k=5).collect()
    assert len(top) == 5
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-9
    # cross-check against numpy
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    want = np.argsort(-sims)[:5].tolist()
    got = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert got == want


def test_lsh_topk_recall(spark):
    from syslog_spark.operators.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(1)
    base = rng.normal(size=(40, 16))
    # plant clear near-neighbours of vec 0
    for i in range(1, 6):
        base[i] = base[0] + rng.normal(scale=0.05, size=16)
    rows = [(i, base[i].tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {r["vec_id"] for r in lsh_topk(emb, q, dim=16, k=5).collect()}
    # strongly-planted neighbours must be recalled
    assert len(exact & approx) >= 4


def test_lsh_bucket_stats_flags_hot_buckets(spark):
    """The cap-monitoring side output: identical texts share every band
    bucket, so a group of n identical docs shows up as bands buckets of
    size n."""
    from syslog_spark.operators.dedup import lsh_bucket_stats

    import hashlib

    rows = [(f"c{i}", "same exact text for every doc here") for i in range(5)]
    rows += [
        (f"u{i}", hashlib.sha256(str(i).encode()).hexdigest())
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    stats = lsh_bucket_stats(df, bands=8, n_hashes=64, min_size=2).collect()
    hot = [r for r in stats if r["bucket_size"] == 5]
    assert len(hot) == 8  # the identical-doc group fills one bucket per band
    assert all(r["bucket_size"] <= 5 for r in stats)


def test_embedding_near_dups_planted(spark):
    """Blocked-LSH near-dup finds every planted high-cosine pair, and the
    exact-cosine verify rejects random pairs — no cross join involved."""
    from syslog_spark.operators.similarity import embedding_near_dups

    rng = np.random.RandomState(2)
    base = rng.normal(size=(60, 32))
    rows = [(i, base[i].tolist()) for i in range(60)]
    # plant near-dups: 100+i is a tiny perturbation of i (cos ~ 0.9999)
    for i in range(10):
        v = base[i].copy()
        v[0] *= 1.001
        rows.append((100 + i, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["a"], r["b"]) for r in
           embedding_near_dups(emb, threshold=0.9, dim=32).collect()}
    want = {(i, 100 + i) for i in range(10)}
    assert got == want


def test_textstats(spark, docs):
    from syslog_spark.operators import textstats as TS

    out = {r["doc_id"]: r for r in docs.select(
        "doc_id",
        TS.whitespace_token_count("text").alias("n"),
        TS.stopword_count("text").alias("sw"),
        TS.lang_id("text").alias("lang"),
        TS.fingerprint_md5("text").alias("fp"),
        TS.quality_score("text").alias("q"),
    ).collect()}
    assert out["d1"]["n"] == 9 and out["d7"]["n"] == 0
    assert out["d1"]["sw"] == 2  # 'the' twice
    assert out["d1"]["lang"] == "en"
    assert out["d5"]["lang"] == "de"
    assert out["d6"]["lang"] == "fr"
    assert out["d7"]["lang"] == "und"
    assert out["d1"]["fp"] == out["d2"]["fp"] != out["d3"]["fp"]
    assert 0 <= out["d7"]["q"] <= out["d1"]["q"] <= 1


def test_rolling_hash(spark, docs):
    from syslog_spark.operators.textstats import (
        POLY_BASES, POLY_MOD, normalized_text, rolling_hash_udf,
    )

    out = {r["doc_id"]: r["rh"] for r in docs.select(
        "doc_id", rolling_hash_udf()(normalized_text("text")).alias("rh")
    ).collect()}
    assert out["d1"] == out["d2"] != out["d3"]

    def py_roll(t):
        accs = []
        for base in POLY_BASES:
            acc = 0
            for b in t.encode():
                acc = (acc * base + b) % POLY_MOD
            accs.append(acc)
        return (accs[0] << 31) | accs[1]

    assert out["d1"] == py_roll("the quick brown fox jumps over the lazy dog")
    # order sensitivity (fingerprint_md5 of the same words would collide)
    assert out["d1"] != py_roll("dog lazy the over jumps fox brown quick the")


def test_ivf_topk_recall(spark):
    from pyspark.sql import functions as F

    from syslog_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(3)
    base = rng.normal(size=(120, 16))
    for i in range(1, 6):
        base[i] = base[0] + rng.normal(scale=0.03, size=16)
    rows = [(i, base[i].tolist()) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["vec_id"] for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {
        r["vec_id"]
        for r in ivf_topk(emb, q, k=5, n_centroids=8, n_probe=3).collect()
    }
    # planted near-neighbours land in the query's own probe lists
    assert len(exact & approx) >= 4


def test_ivf_topk_explicit_centroids(spark):
    """Pretrained-quantizer mode: pure-Catalyst argmin assignment (no
    KMeans job), deterministic, and exact when each query's true top-k
    lives inside its probed cells."""
    from pyspark.sql import functions as F

    from syslog_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(7)
    dim, per = 16, 20
    centers = [[50.0 if i == j else 0.0 for i in range(dim)] for j in range(4)]
    rows = []
    for v in range(4 * per):
        c = centers[v % 4]
        rows.append((v, [c[i] + 0.01 * rng.normal() for i in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 2").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in brute_force_topk(emb, q, k=5).collect()
    )
    pruned = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_topk(emb, q, k=5, n_probe=1, centroids=centers).collect()
    )
    assert pruned == exact
    # n_probe=1 of 4: every result stays in the query's own cluster
    assert all(v % 4 == qid % 4 for qid, _, v in pruned)


def test_connected_components_chains(spark):
    """Transitive merging: chains a-b-c collapse to one component even
    though a and c share no edge; singleton-pair clusters keep min id."""
    from syslog_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "a long, b long",
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_dedupe_by_components_minhash_end_to_end(spark):
    """Pairs from the real minhash detector -> components -> keep one per
    cluster: a 3-doc near-identical cluster keeps only its min id, unique
    docs survive untouched."""
    from pyspark.sql import functions as F

    from syslog_spark.operators.dedup import (
        dedupe_by_components, near_duplicates_minhash,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the band plays "
        "a long tune about shingled text and stable hashing in the park"
    )
    rows = [
        (0, base), (1, base + " extra"), (2, "tail " + base),
        (10, "completely different words about spark catalyst plans and "
             "arrow batches flowing through vectorized parse kernels ok"),
        (11, "yet another unrelated document mentioning parquet footers "
             "bloom filters and dictionary encoded column chunks today"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = near_duplicates_minhash(docs, threshold=0.5, n_hashes=64)
    kept = sorted(
        r["doc_id"] for r in dedupe_by_components(docs, pairs).collect()
    )
    assert kept == [0, 10, 11]


def test_rh_signature_engines_agree(spark):
    """The pandas batch-matmul signature is bitwise-equal to the Catalyst
    per-bit literal form (differences require a plane dot within float
    rounding of exactly 0 — measure-zero for continuous embeddings)."""
    from syslog_spark.operators.similarity import rh_signature

    rng = np.random.RandomState(7)
    rows = [(i, rng.normal(size=64).tolist()) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    both = emb.select(
        "vec_id",
        rh_signature("embedding", dim=64, engine="catalyst").alias("s_cat"),
        rh_signature("embedding", dim=64, engine="pandas").alias("s_pd"),
    ).collect()
    assert len(both) == 200
    for r in both:
        assert r["s_cat"] == r["s_pd"], r["vec_id"]


def test_embedding_near_dups_dim768_no_plan_bloat(spark):
    """Real embedding width (768): the signature must route to the pandas
    matmul — plan analysis stays fast (no 50k literal nodes, no codegen
    64KB fallback) and planted pairs are still found."""
    import time

    from syslog_spark.operators.similarity import embedding_near_dups

    rng = np.random.RandomState(3)
    base = rng.normal(size=(40, 768))
    rows = [(i, base[i].tolist()) for i in range(40)]
    for i in range(5):
        v = base[i].copy()
        v[0] *= 1.001
        rows.append((100 + i, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    t0 = time.monotonic()
    df = embedding_near_dups(emb, threshold=0.9, dim=768)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    analyze_s = time.monotonic() - t0
    # catalyst form at dim=768 bakes ~100k literals and takes minutes to
    # analyze; the pandas route analyzes in well under 10s even cold
    assert analyze_s < 10, f"plan analysis took {analyze_s:.1f}s"
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan
    assert plan.count("-0.") + plan.count("0.") < 5000  # no plane literals

    got = {(r["a"], r["b"]) for r in df.collect()}
    assert got == {(i, 100 + i) for i in range(5)}


def test_star_contraction_matches_label_propagation(spark):
    """Star contraction and label propagation agree on a mixed graph
    (several components, a cycle, a chain, isolated-pair edges)."""
    from syslog_spark.operators.dedup import (
        connected_components, star_contraction_components,
    )

    rng = np.random.RandomState(11)
    edges = [(i, i + 1) for i in range(10)]            # chain 0..10
    edges += [(20, 21), (21, 22), (22, 20)]            # cycle
    edges += [(30, 31)]                                # pair
    edges += [(int(rng.randint(40, 60)), int(rng.randint(40, 60)))
              for _ in range(30)]                      # random blob(s)
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "a long, b long")
    want = {(r["node"], r["component"])
            for r in connected_components(pairs, algorithm="label").collect()}
    got = {(r["node"], r["component"])
           for r in star_contraction_components(pairs).collect()}
    assert got == want


def test_star_contraction_deep_path_graph(spark):
    """A 10k-node path graph (diameter 10k) — the adversarial case where
    label propagation's O(diameter) rounds can never finish — converges
    in O(log n) star alternations with the correct single component."""
    from pyspark.sql import functions as F
    from syslog_spark.operators.dedup import star_contraction_components

    n = 10_000
    pairs = (
        spark.range(n - 1)
        .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    )
    comps = star_contraction_components(pairs)
    agg = comps.agg(
        F.countDistinct("component").alias("ncomp"),
        F.count(F.lit(1)).alias("n"),
        F.min("component").alias("mn"),
        F.max("component").alias("mx"),
    ).first()
    assert agg["n"] == n
    assert agg["ncomp"] == 1
    assert agg["mn"] == 0 and agg["mx"] == 0


def test_connected_components_auto_falls_back(spark):
    """algorithm='auto' degrades to star contraction instead of raising
    when the propagation bound is hit mid-pipeline."""
    import warnings

    from syslog_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "a long, b long"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        comps = connected_components(pairs, max_iters=3).collect()
    assert any("falling back" in str(x.message) for x in w)
    assert {r["component"] for r in comps} == {0}
    assert len(comps) == 61
    with pytest.raises(RuntimeError):
        connected_components(
            pairs, max_iters=3, algorithm="label"
        ).collect()


def test_star_contraction_exact_termination_survives_sig_collision(
    spark, monkeypatch, tmp_path
):
    """The convergence signature is only a PROBE since round 5: a stable
    (count, xor-hash) pair must be confirmed by an exact edge-set
    equality check before terminating. Forcing the signature to collide
    on every round (constant return) simulates the 2^-64 hash collision
    — the old code would return after the second alternation with a
    wrong component map; the exact check must keep contracting until the
    true fixed point."""
    from syslog_spark.operators import dedup as D

    monkeypatch.setattr(D, "_edge_signature", lambda e: (0, 0))
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    comps = D.star_contraction_components(pairs).collect()
    assert len(comps) == n
    assert {r["component"] for r in comps} == {0}


def test_connected_components_parquet_spill_checkpoint(spark, tmp_path):
    """checkpoint_dir spills the iterated labels frame to parquet every
    k rounds (durable lineage cut — localCheckpoint blocks die with an
    executor on a real cluster). A diameter-9 chain drives >=4 rounds
    through the spill path at checkpoint_every=2; results must match the
    default path and old spill dirs must be garbage-collected down to
    the last two."""
    import os

    from syslog_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a long, b long"
    )
    ck = str(tmp_path / "cc_ckpt")
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            pairs, algorithm="label", checkpoint_dir=ck, checkpoint_every=2
        ).collect()
    }
    assert got == {(i, 0) for i in range(10)}
    spills = sorted(d for d in os.listdir(ck) if d.startswith("label_iter_"))
    assert 1 <= len(spills) <= 3  # older spills deleted best-effort
    # the chain needs ~9 propagation rounds -> at every=2 the highest
    # surviving spill index proves >=3 spill cuts actually happened
    assert int(spills[-1].rsplit("_", 1)[1]) >= 6


def test_connected_components_spill_every_round(spark, tmp_path):
    """checkpoint_every=1 (every cut spills): the rolling GC must NOT
    delete the pinned input-edges spill that every round re-reads —
    doing so crashed round every+1 with FAILED_READ_FILE (executed
    repro, round-5 review)."""
    import os

    from syslog_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "a long, b long"
    )
    ck = str(tmp_path / "cc1")
    got = {
        (r["node"], r["component"])
        for r in connected_components(
            pairs, algorithm="label", checkpoint_dir=ck, checkpoint_every=1
        ).collect()
    }
    assert got == {(i, 0) for i in range(10)}
    names = os.listdir(ck)
    assert any(n.startswith("label_pin_") for n in names)  # input pinned


def test_star_contraction_parquet_spill_checkpoint(spark, tmp_path):
    """Star contraction with a durable checkpoint_dir: every half-round
    cut spills to parquet; the component map is unchanged."""
    import os

    from syslog_spark.operators.dedup import star_contraction_components

    n = 100
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    ck = str(tmp_path / "star_ckpt")
    comps = star_contraction_components(
        pairs, checkpoint_dir=ck, checkpoint_every=1
    ).collect()
    assert len(comps) == n
    assert {r["component"] for r in comps} == {0}
    assert any(d.startswith("star_iter_") for d in os.listdir(ck))


def _simhash_fold_reference(hashes):
    """The pre-vectorization per-row fold, kept as the semantic spec."""
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, hs in enumerate(hashes):
        if hs is None or len(hs) == 0:
            continue
        h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        val = int(
            ((votes > 0).astype(np.uint64)
             * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum(
                dtype=np.uint64
            )
        )
        out[i] = val - (1 << 64) if val >= (1 << 63) else val
    return out


def test_simhash_fold_batch_matches_reference():
    """The whole-batch reduceat fold is bitwise-identical to the per-row
    reference, across empty/None/singleton/tie-heavy/large rows and
    chunk boundaries."""
    import pandas as pd

    from syslog_spark.operators.dedup import _simhash_fold_batch

    rng = np.random.RandomState(5)
    rows = []
    for i in range(500):
        k = int(rng.randint(0, 40))
        rows.append(rng.randint(-2**63, 2**63, size=k, dtype=np.int64))
    rows[3] = None
    rows[7] = np.array([], dtype=np.int64)
    rows[11] = np.array([7], dtype=np.int64)
    # tie-heavy: equal votes must give bit 0 (votes > 0 strict)
    rows[13] = np.array([0, -1], dtype=np.int64)
    # one giant row to cross the 2^19-token chunk boundary mid-batch
    rows[200] = rng.randint(-2**63, 2**63, size=600_000, dtype=np.int64)
    got = _simhash_fold_batch(pd.Series(rows)).to_numpy()
    want = _simhash_fold_reference(rows)
    assert (got == want).all()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_star_contraction_random_graphs_vs_union_find(spark, seed):
    """Star contraction agrees with a driver-side union-find ground truth
    on random multigraphs (self-loops, duplicate edges, many components,
    varying density)."""
    from syslog_spark.operators.dedup import star_contraction_components

    rng = np.random.RandomState(100 + seed)
    n_nodes = int(rng.randint(10, 60))
    n_edges = int(rng.randint(5, 80))
    edges = [
        (int(rng.randint(n_nodes)), int(rng.randint(n_nodes)))
        for _ in range(n_edges)
    ]

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {x for e in edges if e[0] != e[1] for x in e}
    want = {}
    for x in sorted(touched):
        r = find(x)
        want[x] = min(y for y in touched if find(y) == r)

    real_edges = [(a, b) for a, b in edges if a != b]
    if not real_edges:
        pytest.skip("degenerate: all self-loops")
    pairs = spark.createDataFrame(real_edges, "a long, b long")
    got = {r["node"]: r["component"]
           for r in star_contraction_components(pairs).collect()}
    assert got == want


def test_rh_signature_pandas_null_and_bad_width_rows(spark):
    """Null or wrong-width embeddings yield NULL signatures in the pandas
    engine (matching Catalyst, where the dot over null/padded arrays is
    null) instead of np.stack killing the task."""
    from syslog_spark.operators.similarity import rh_signature

    rng = np.random.RandomState(4)
    rows = [(0, rng.normal(size=64).tolist()),
            (1, None),
            (2, rng.normal(size=16).tolist()),   # wrong width
            (3, rng.normal(size=64).tolist())]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["s_pd"], r["s_cat"]) for r in emb.select(
        "vec_id",
        rh_signature("embedding", dim=64, engine="pandas").alias("s_pd"),
        rh_signature("embedding", dim=64, engine="catalyst").alias("s_cat"),
    ).collect()}
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[0][0] == got[0][1] is not None
    assert got[3][0] == got[3][1] is not None


def test_rh_signature_sql_and_column_paths_agree(spark):
    """The single-F.expr signature (simple identifier names) and the
    Column-API fallback (Column inputs / non-identifier names) must
    build the SAME values; dotted struct references take the Column
    path and resolve (backticking them would break resolution)."""
    import numpy as np

    from pyspark.sql import functions as F
    from syslog_spark.operators.similarity import rh_signature

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    both = df.select(
        rh_signature("embedding", 8, 16, cast=False).alias("sql_sig"),
        rh_signature(F.col("embedding"), 8, 16, cast=False)
        .alias("col_sig"),
    )
    assert both.filter("sql_sig <> col_sig").count() == 0
    # dotted name through a struct: Column path resolves it
    nested = df.select(F.struct("embedding").alias("s"))
    got = nested.select(
        rh_signature(F.col("s.embedding"), 8, 16, cast=False).alias("sig")
    )
    assert got.filter("sig is null").count() == 0
