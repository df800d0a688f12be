"""Enrichment stage: broadcast name/tenant lookups (SURVEY.md §2.4, §2.8).

Two interchangeable strategies, result-identical:
  * ``enrich`` (default) — pure Catalyst array-literal lookups; zero
    shuffle, zero join, whole-stage-codegen friendly. Right answer for a
    24/8-row "dimension".
  * ``enrich_with_joins`` — explicit ``F.broadcast`` dimension joins; the
    pattern that generalizes to real dimension tables (source->tenant maps
    with millions of sources). Kept exercised by tests so the join path is
    proven too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.priority import (
    facility_name,
    facility_names_df,
    severity_name,
    severity_names_df,
    tenant_of,
)


def enrich(parsed: DataFrame) -> DataFrame:
    """Add facility_name / severity_name / tenant via literal lookups."""
    return (
        parsed.withColumn("facility_name", facility_name("facility"))
        .withColumn("severity_name", severity_name("severity"))
        .withColumn("tenant", tenant_of("source"))
    )


def enrich_with_joins(parsed: DataFrame, spark) -> DataFrame:
    """Same result via broadcast hash joins (no shuffle on the big side)."""
    fac = facility_names_df(spark)
    sev = severity_names_df(spark)
    out = (
        parsed.join(F.broadcast(fac), "facility", "left")
        .join(F.broadcast(sev), "severity", "left")
        .withColumn(
            "facility_name",
            F.coalesce(
                F.col("facility_name"),
                F.when(F.col("facility").isNotNull(), F.lit("Invalid")),
            ),
        )
        .withColumn(
            "severity_name",
            F.coalesce(
                F.col("severity_name"),
                F.when(F.col("severity").isNotNull(), F.lit("Invalid")),
            ),
        )
        .withColumn("tenant", tenant_of("source"))
    )
    return out
