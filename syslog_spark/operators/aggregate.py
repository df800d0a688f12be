"""Per-sink aggregation stage + skew-mitigation helpers (SURVEY.md §2.8).

The aggregation keys (severity, source) are deliberately skewed (hot
facility Local7 => two-thirds of rows share few severities). Two tools:

  * AQE handles skewed *partitions* on the shuffle (session.py enables it).
  * ``salted`` runs any *algebraic* aggregate in two phases — partial
    aggregation over (keys + salt) then re-aggregation without the salt —
    so no single reducer sees a whole hot key. Correct for count/sum/min/
    max/bit_xor (associative+commutative); NOT for exact distincts or
    exact percentiles (those need their own two-step shapes below).

Exact percentile is used at test scale (DuckDB-checkable), t-digest-style
``percentile_approx`` at bench/cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = DEFAULT_SALTS,
    salt_on: str = "doc_id",
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys+salt).agg(partial) ->
    groupBy(keys).agg(final over the partials)."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )


def salted_sink_counts(
    routed: DataFrame, n_salts: int = DEFAULT_SALTS
) -> DataFrame:
    """Skew-proof (sink_severity, source) counts + xor row-set checksums —
    result-identical to route.sink_manifest (count and bit_xor are
    associative+commutative), but no reducer ever sees a whole hot sink."""
    from .route import row_checksum

    return salted(
        routed,
        ["sink_severity", "source"],
        {"rows": F.count(F.lit(1)), "cs": F.bit_xor(row_checksum())},
        {"rows": F.sum("rows"), "row_set_checksum": F.bit_xor("cs")},
        n_salts,
    )


def sink_stats(
    routed: DataFrame,
    exact_percentiles: bool = False,
    exact_distinct: bool = False,
) -> DataFrame:
    """ONE pass over the routed table producing both the manifest columns
    (rows, row-set checksum) and the per-sink aggregates — merging the two
    scans halves the post-route IO/CPU. Error-sink rows (sink_severity=-1)
    get null hostname/n_tok stats naturally.

    Distinct hostnames default to the HLL sketch (approx_count_distinct):
    partial-aggregable and skew-immune, so the hot sink never funnels its
    whole hostname set through one reducer (measured: the exact distinct
    made this scan a flat ~4.4s at any core count; the sketch scan is
    ~0.6s and scales). exact_distinct=True restores the exact count for
    small-scale verification (sink_aggregates keeps it too)."""
    from .route import row_checksum

    if exact_percentiles:
        pct = F.percentile("n_tok", [0.5, 0.95, 0.99])
    else:
        # cast first (percentile_approx returns the INPUT element type);
        # accuracy 1000 — this is a monitoring stat, and the sketch insert
        # cost is on every routed row
        pct = F.percentile_approx(
            F.col("n_tok").cast("double"), [0.5, 0.95, 0.99], 1000
        )
    if exact_distinct:
        dh = F.count_distinct("hostname")
    else:
        dh = F.approx_count_distinct("hostname")
    cs = F.col("row_cs") if "row_cs" in routed.columns else row_checksum()
    return routed.groupBy("sink_severity", "source").agg(
        F.count(F.lit(1)).alias("rows"),
        F.bit_xor(cs).alias("row_set_checksum"),
        dh.alias("distinct_hostnames"),
        F.approx_count_distinct("doc_id").alias("approx_docs"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
        F.sum("n_tok").alias("sum_n_tok"),
        pct.alias("n_tok_pcts"),
    )


def sink_aggregates(
    ok: DataFrame, exact_percentiles: bool = True
) -> DataFrame:
    """The per-sink aggregate table the north rule names: count, distinct
    hostnames, approx distinct doc ids, n_tok percentiles."""
    if exact_percentiles:
        pct = F.percentile("n_tok", [0.5, 0.95, 0.99])
    else:
        pct = F.percentile_approx("n_tok", [0.5, 0.95, 0.99], 10_000)
    return ok.groupBy("severity", "source").agg(
        F.count(F.lit(1)).alias("rows"),
        F.count_distinct("hostname").alias("distinct_hostnames"),
        F.approx_count_distinct("doc_id").alias("approx_docs"),
        F.min("n_tok").alias("min_n_tok"),
        F.max("n_tok").alias("max_n_tok"),
        F.sum("n_tok").alias("sum_n_tok"),
        pct.alias("n_tok_pcts"),
    )


def severity_rollup(enriched: DataFrame) -> DataFrame:
    """Global severity histogram with names (the flagship aggregation)."""
    return (
        enriched.filter(F.col("error_msg").isNull())
        .groupBy("severity", "severity_name")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count_distinct("hostname").alias("distinct_hostnames"),
        )
        .orderBy("severity")
    )
