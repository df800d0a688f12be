"""Physical-plan assertions: the Catalyst behaviors the engine relies on
at 100 TB must actually appear in the plans (SURVEY.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def routed_dir(spark, tmp_path_factory):
    from syslog_spark.plans.pipeline import run_pipeline
    from syslog_spark.sources.datagen import write_token_table

    tok = str(tmp_path_factory.mktemp("pt") / "tokens")
    out = str(tmp_path_factory.mktemp("pt") / "out")
    write_token_table(spark, tok, 2000, partitions=4)
    run_pipeline(spark, tok, out)
    return out


def test_enrich_join_is_broadcast(spark, sf_dir):
    from syslog_spark.operators.enrich import enrich_with_joins
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.sources.datagen import generate_tokens_df

    df = enrich_with_joins(
        parse_tokens(generate_tokens_df(spark, 100, partitions=2)), spark
    )
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_routed_partition_pruning(spark, routed_dir):
    from syslog_spark.operators.route import read_routed

    pruned = read_routed(spark, routed_dir).filter(
        (F.col("sink_severity") == 3) & (F.col("source") == "rfc5424/h00")
    )
    plan = plan_of(pruned)
    # partition filters reach the scan: no data files outside the matching
    # sink directory are read
    assert "PartitionFilters" in plan
    assert "sink_severity" in plan.split("PartitionFilters")[1][:200]


def test_parquet_predicate_pushdown(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(
        F.col("user_id") == 7
    )
    plan = plan_of(ev)
    assert "PushedFilters" in plan
    assert "user_id" in plan.split("PushedFilters")[1][:120]


def test_column_pruning(spark, routed_dir):
    from syslog_spark.operators.route import read_routed

    slim = read_routed(spark, routed_dir).select("doc_id", "severity")
    plan = plan_of(slim)
    read_schema = plan.split("ReadSchema:")[1][:300]
    # the wide nested column must NOT be read for a 2-column projection
    assert "data" not in read_schema and "message" not in read_schema


def test_manifest_scan_prunes_nested(spark, routed_dir):
    """sink_stats reads the precomputed row_cs, never the nested data."""
    from syslog_spark.operators.aggregate import sink_stats
    from syslog_spark.operators.route import read_routed

    plan = plan_of(sink_stats(read_routed(spark, routed_dir)))
    read_schema = plan.split("ReadSchema:")[1][:400]
    assert "row_cs" in read_schema
    assert "sd_id" not in read_schema  # nested data column pruned


def test_minhash_candidates_no_bucket_materialization(spark):
    """The LSH candidate path must not materialize buckets: no
    collect_list / sort_array aggregation buffers (a degenerate one-bucket
    corpus would OOM a reducer), and no CartesianProduct."""
    from syslog_spark.operators.dedup import minhash_lsh_candidates

    df = spark.createDataFrame(
        [(f"d{i}", f"text number {i} padded padding") for i in range(20)],
        "doc_id string, text string",
    )
    plan = plan_of(minhash_lsh_candidates(df))
    assert "collect_list" not in plan
    assert "sort_array" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_neardup_no_cross_join(spark):
    """embedding_near_dups is the blocked-LSH shape: candidates meet via
    the (blk, key) equi-join, never an all-pairs cross join."""
    import numpy as np

    from syslog_spark.operators.similarity import embedding_near_dups

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(30, 16))
    emb = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    df = embedding_near_dups(emb, threshold=0.9, dim=16)
    plan = plan_of(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_single_shuffle_in_route_plan(spark):
    """parse -> enrich -> sink-key assignment stays shuffle-free; the only
    exchange is the explicit routing repartition."""
    from syslog_spark.operators.enrich import enrich
    from syslog_spark.operators.parse import parse_tokens
    from syslog_spark.operators.route import with_sink_key
    from syslog_spark.sources.datagen import generate_tokens_df

    df = with_sink_key(
        enrich(parse_tokens(generate_tokens_df(spark, 100, partitions=2)))
    )
    assert "Exchange" not in plan_of(df)
    routed = df.repartition(8, "sink_severity", "source")
    plan = plan_of(routed)
    assert plan.count("Exchange") == 1


def test_connected_components_no_cross_join(spark):
    """The per-round propagation is equi-joins + a keyed agg — no
    CartesianProduct, and the final labels carry no unbounded lineage
    (localCheckpoint truncates each round, so the returned plan depends
    only on the last round's frames)."""
    from syslog_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)], "a long, b long"
    )
    comps = connected_components(pairs)
    plan = plan_of(comps)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_star_contraction_no_cross_join(spark):
    """The star-contraction fallback is also pure equi-joins + keyed aggs
    with checkpoint-truncated lineage — no CartesianProduct/BNLJ."""
    from syslog_spark.operators.dedup import star_contraction_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40)], "a long, b long"
    )
    comps = star_contraction_components(pairs)
    plan = plan_of(comps)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_minhash_shingle_hoist_survives_optimizer(spark):
    """The round-5 16x fix: shingle hashing must appear ONCE in the
    optimized banding plan — if CollapseProject ever starts re-inlining
    the hoisted hash array into the 64 min folds, array_distinct (the
    shingle subtree's marker) shows up 64x and this trips."""
    from syslog_spark.operators.dedup import _minhash_banded

    docs = spark.createDataFrame(
        [(1, "hello world the end")], "doc_id long, text string"
    )
    plan = _optimized(_minhash_banded(docs, "text", "doc_id", 64, 16, 5, 42))
    assert plan.count("array_distinct") == 1


def test_document_stats_split_hoist_survives_optimizer(spark):
    """The hoisted tokenizations: exactly 3 split() nodes survive
    optimization (cased words, lowered words, bpe-ish split) — the
    inline form carried ~8."""
    from syslog_spark.operators.textstats import document_stats

    docs = spark.createDataFrame(
        [(1, "hello world the end")], "doc_id long, text string"
    )
    plan = _optimized(document_stats(docs))
    assert plan.count("split(") == 3


def test_rh_signature_cast_hoist_survives_optimizer(spark):
    """embedding_near_dups: the to-double cast transform must not be
    re-inlined into the 64 dot folds (2 transform nodes total: the
    hoisted _vec per join side of the self-join's shared child)."""
    from syslog_spark.operators.similarity import embedding_near_dups

    emb = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id long, embedding array<float>"
    )
    plan = _optimized(embedding_near_dups(emb, dim=8))
    assert plan.count("transform(") <= 2
