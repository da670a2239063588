"""Bucketed co-located joins (task brief: 'bucketing for co-located
joins'). For recurring fact⋈fact joins (spans ⋈ media, lineitem ⋈
orders) a broadcast is impossible and a shuffle per query is wasteful;
bucketing both tables on the join key at write time makes every
subsequent join exchange-free — each task zips bucket i with bucket i.

At 10^12 docs this is the difference between re-shuffling the corpus
per analytical query and a one-time bucketed layout (Iceberg: bucket
partition transform on doc_id)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 16
) -> None:
    """Persist a table bucketed+sorted on the join key."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables; Catalyst recognizes matching
    output partitionings and plans a SortMergeJoin with NO Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key)


def join_has_no_shuffle(df: DataFrame) -> bool:
    """Plan check: true iff no shuffle Exchange feeds the join (the
    bucketed layout carried the partitioning). BroadcastExchange is not
    a shuffle and is ignored."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan and (
        "Exchange rangepartitioning" not in plan
    )
