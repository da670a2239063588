"""Size-tiered partition coalescing (north_rule; SURVEY §4.2).

The reference bounds per-row cost with its tile cap (MIN/MAX_CROPS,
config.py:11-12) and batches uniformly. On a 10^12-doc corpus, document
cost is wildly skewed (a 500-page PDF next to a tweet); hash-random
partitioning makes task runtimes the max of their contents. Fix: compute
a closed-form cost per doc (the tiling token budget or span-array byte
size), bucket into log2 tiers, and repartitionByRange on (tier, doc_id)
— each task then holds docs of comparable cost, so AQE's coalescing
(advisoryPartitionSizeInBytes) yields even task wall-times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_cost(spans_col: str = "spans") -> Column:
    """Per-document processing-cost estimate for the interleaved span
    shape: total text bytes (regex work is linear in it)."""
    return F.aggregate(
        spans_col,
        F.lit(0).cast("long"),
        lambda acc, s: acc + F.coalesce(F.length(s["text"]), F.lit(0)),
    )


def cost_tier(cost: Column) -> Column:
    """log2 bucket of cost — a handful of tiers regardless of skew."""
    return F.floor(F.log2(F.greatest(cost.cast("double"), F.lit(1.0)))).cast("int")


def repartition_by_cost(
    df: DataFrame, cost: Column, partitions: int | None = None
) -> DataFrame:
    """Range-partition by (cost_tier, doc_id): same-tier docs co-locate,
    range bounds keep partitions balanced by row count within a tier.
    The internal _tier helper column is dropped before returning (a
    projection after the exchange — the partitioning survives), so the
    caller's schema is unchanged."""
    tiered = df.withColumn("_tier", cost_tier(cost))
    if partitions:
        out = tiered.repartitionByRange(partitions, "_tier", "doc_id")
    else:
        out = tiered.repartitionByRange("_tier", "doc_id")
    return out.drop("_tier")
