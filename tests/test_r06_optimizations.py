"""Round-6 optimization equivalence tests.

Each round-6 rewrite claims RESULT-IDENTITY with the shape it replaced;
these tests pin that claim directly (the oracle gates pin it end-to-end).
"""

import numpy as np
from pyspark.sql import functions as F

# uses the session-scoped `spark` fixture from conftest.py: a local
# module fixture that build_session()s would getOrCreate() the SAME
# underlying session and then stop() it at module teardown, killing the
# shared context for every test file sorted after this one.


def _random_docs(n=40, seed=7):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        words = [
            "".join(rng.choice(list("abcdefgh"), size=rng.randint(3, 9)))
            for _ in range(rng.randint(1, 12))
        ]
        rows.append((f"d{i}", " ".join(words)))
    return rows


def test_numpy_signature_bit_identical_to_catalyst(spark):
    """_signature_batch_udf must return the EXACT values of the Catalyst
    fold chain (same coefficients, same mod arithmetic), including the
    all-NULL signature for NULL text."""
    from syslog_spark.operators.dedup import (
        _signature_batch_udf, _signature_from_hashes, shingle_hashes,
    )

    rows = _random_docs(30) + [("dnull", None), ("dempty", "")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    hashes = df.select(
        "doc_id", shingle_hashes("text", 5).alias("_sh")
    )
    udf_sig = _signature_batch_udf(16, seed=42)
    got = {
        r["doc_id"]: r["s"]
        for r in hashes.select(
            "doc_id", udf_sig(F.col("_sh")).alias("s")
        ).collect()
    }
    want = {
        r["doc_id"]: r["s"]
        for r in hashes.select(
            "doc_id",
            _signature_from_hashes(F.col("_sh"), 16, seed=42).alias("s"),
        ).collect()
    }
    assert got == want
    # NULL text never yields a NULL hash array in Catalyst (substr(NULL)
    # -> [NULL] -> xxhash64(NULL) = seed), and the UDF matches that too
    assert "dnull" in got and "dempty" in got


def test_packed_sketch_prefix_matches_signature(spark):
    """The packed estimate sketch's first n_hashes bytes must be the low
    bytes of the exact signature (the keep-superset compression claim
    rests on byte equality being NECESSARY for component equality)."""
    from syslog_spark.operators.dedup import (
        _minhash_sigs_packed,
    )

    df = spark.createDataFrame(_random_docs(20), "doc_id string, text string")
    out = _minhash_sigs_packed(df, "text", "doc_id", 8, 5, 42, n_extra=24)
    for r in out.collect():
        assert len(r["p"]) == 32
        assert list(r["p"][:8]) == [v & 0xFF for v in r["sig"]]


def test_byte_match_udf_counts(spark):
    from syslog_spark.operators.dedup import _byte_match_udf

    rows = [
        (bytes([1, 2, 3, 4]), bytes([1, 9, 3, 9]), 2),
        (bytes([0, 0, 0, 0]), bytes([0, 0, 0, 0]), 4),
        (bytes([5, 6, 7, 8]), bytes([9, 10, 11, 12]), 0),
        (None, bytes([1, 2, 3, 4]), None),
    ]
    df = spark.createDataFrame(
        [(a, b, w) for a, b, w in rows], "pa binary, pb binary, want long"
    )
    m = _byte_match_udf(4)
    got = df.select(m("pa", "pb").alias("got"), "want").collect()
    for r in got:
        assert r["got"] == r["want"]


def test_simhash_multi_index_equals_all_pairs(spark):
    """The multi-index blocking (max_hamming < n_blocks) must return
    EXACTLY the pairs an all-pairs Hamming filter finds — the pigeonhole
    recall argument, executed."""
    from syslog_spark.operators.dedup import simhash, simhash_near_dups

    rng = np.random.RandomState(3)
    rows = []
    for i in range(30):
        words = [
            "".join(rng.choice(list("xyzw"), size=4)) for _ in range(6)
        ]
        rows.append((f"d{i}", " ".join(words)))
        if i < 8:  # permuted twin => hamming 0
            rng.shuffle(words)
            rows.append((f"p{i}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id string, text string")

    got = {
        (r["a"], r["b"])
        for r in simhash_near_dups(df, max_hamming=3).collect()
    }
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    ids = sorted(sh)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 3
    }
    assert got == want
    assert len(want) >= 8  # the planted twins are all found


def test_minhash_prefilter_keeps_planted_pair(spark):
    """End-to-end: a high-Jaccard planted pair must survive the packed
    prefilter + semi-joined verify (output identity with the old path is
    pinned corpus-wide by the minhash_neardup / dedup_pipeline gates)."""
    from syslog_spark.operators.dedup import near_duplicates_minhash

    rows = _random_docs(25, seed=11)
    rows.append(("twin", rows[0][1] + " zz"))
    df = spark.createDataFrame(rows, "doc_id string, text string")
    pairs = {
        (r["a"], r["b"])
        for r in near_duplicates_minhash(
            df, threshold=0.6, bands=32, n_hashes=64
        ).collect()
    }
    assert ("d0", "twin") in pairs

def test_simhash_legacy_branch_minimal_probe(spark):
    """The single-block branch (max_hamming >= n_blocks) with the
    minimal-probe dedup filter still returns exactly the pairs sharing
    >= 1 exact block with hamming <= h, each pair once — including pairs
    agreeing on MULTIPLE blocks (which the filter must emit exactly once
    via the lowest agreeing block)."""
    from syslog_spark.operators.dedup import simhash, simhash_near_dups

    rng = np.random.RandomState(5)
    rows = []
    for i in range(24):
        words = ["".join(rng.choice(list("qrst"), size=4)) for _ in range(5)]
        rows.append((f"d{i}", " ".join(words)))
        if i < 6:  # identical twin: ALL blocks agree (multi-agreement)
            rows.append((f"t{i}", " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id string, text string")

    out = simhash_near_dups(df, max_hamming=8, n_blocks=4).collect()
    got = [(r["a"], r["b"]) for r in out]
    assert len(got) == len(set(got))  # each pair exactly once
    sh = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    ids = sorted(sh)
    width = 16

    def share_block(x, y):
        return any(
            ((x >> (i * width)) & 0xFFFF) == ((y >> (i * width)) & 0xFFFF)
            for i in range(4)
        )

    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if share_block(sh[a], sh[b])
        and bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1") <= 8
    }
    assert set(got) == want
    assert len(want) >= 6  # planted identical twins all found


def test_raw_bucket_pairs_carry_matches_join(spark):
    """Carrying a payload column through the blocking self-join must
    yield exactly the (a, b, payload_a, payload_b) rows the old
    join-onto-the-pair-stream shape produced."""
    from syslog_spark.operators.dedup import _raw_bucket_pairs

    rows = [
        ("id%02d" % i, i % 3, (i * 7) % 5, ("pay%02d" % i).encode())
        for i in range(30)
    ]
    banded = spark.createDataFrame(
        rows, "id string, band int, bucket int, p binary"
    )
    new = {
        (r["a"], r["b"], bytes(r["p_a"]), bytes(r["p_b"]))
        for r in _raw_bucket_pairs(banded, 200, carry=("p",)).collect()
    }
    base = _raw_bucket_pairs(banded.select("id", "band", "bucket"), 200)
    payload = banded.select("id", "p")
    old = {
        (r["a"], r["b"], bytes(r["p_a"]), bytes(r["p_b"]))
        for r in base.join(
            payload.select(F.col("id").alias("a"), F.col("p").alias("p_a")), "a"
        ).join(
            payload.select(F.col("id").alias("b"), F.col("p").alias("p_b")), "b"
        ).collect()
    }
    assert new == old and len(new) > 0


def test_signature_udf_empty_array_matches_catalyst_null(spark):
    """An EMPTY hash array must produce all-NULL signature components
    (Catalyst: array_min(transform([], ...)) is NULL) — and must not
    corrupt neighbouring rows via reduceat's empty-segment semantics."""
    from pyspark.sql import types as T
    from syslog_spark.operators.dedup import _signature_batch_udf

    rows = [("a", [3, 7, 11]), ("b", []), ("c", None), ("d", [5])]
    df = spark.createDataFrame(
        rows, T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("h", T.ArrayType(T.LongType())),
        ])
    )
    sig = _signature_batch_udf(8, 42)
    got = {r["id"]: r["s"] for r in df.select("id", sig("h").alias("s")).collect()}
    assert got["b"] == [None] * 8
    assert got["c"] == [None] * 8
    assert all(v is not None for v in got["a"])
    assert all(v is not None for v in got["d"])
