"""Skew handling: two-phase salted aggregation and salted repartition
(north_rule: "explicit salting of skewed hosts/mime-types").

Join skew is left to AQE's skew-join splitting
(spark.sql.adaptive.skewJoin.enabled, session.py). Aggregation skew over
hot low-cardinality keys (a Zipf host taking ~46% of a 10^12-doc corpus,
corpus.py HOST_P) needs this explicit rewrite: phase 1 groups on
(key, salt) spreading each hot key over `salt` reducers, phase 2 merges
the partials. Only algebraic aggregates (sum/count/min/max) decompose
this way — that is exactly the metrics surface of this engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def with_salt(df: DataFrame, cols: list[str], buckets: int = DEFAULT_SALT) -> DataFrame:
    """Deterministic salt column derived from row content (not random —
    task retries must produce identical salts)."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column],
    salt_cols: list[str],
    buckets: int = DEFAULT_SALT,
) -> DataFrame:
    """GROUP BY keys with SUM/COUNT measures, executed as salt → partial
    agg → merge. `sums` maps output name → column expression to sum.
    Adds a `n` count column. Semantics identical to the plain groupBy
    (verified against the unsalted oracle in the query registry)."""
    _require_salt_outside_keys(keys, salt_cols)
    salted = with_salt(df, salt_cols, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.count("*").alias("_n"),
        *[F.sum(expr).alias(f"_s_{name}") for name, expr in sums.items()],
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").cast("bigint").alias("n"),
        *[F.sum(f"_s_{name}").alias(name) for name in sums],
    )


def _require_salt_outside_keys(key_cols: list[str], salt_cols: list[str]) -> None:
    """A salt computed purely from the (hot) key is CONSTANT per key
    value — every row of the hot key still hashes to one reducer and the
    salt spreads nothing. The salt must draw entropy from outside the
    key columns; reject the silent no-op."""
    if not salt_cols:
        raise ValueError("salting needs at least one salt column")
    if set(salt_cols) <= set(key_cols):
        raise ValueError(
            f"salt_cols {salt_cols} is a subset of key_cols {key_cols}: "
            "the salt would be a pure function of the key, so a hot key "
            "still lands in a single task. Salt from a high-cardinality "
            "column outside the key (e.g. the row id)."
        )


def repartition_salted(
    df: DataFrame,
    key_cols: list[str],
    partitions: int,
    buckets: int = DEFAULT_SALT,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition on (keys, salt) so a hot key spreads over `buckets`
    tasks — used before per-key-heavy map work, not before joins (a
    salted join side must replicate the other side per salt).

    salt_cols default: every ATOMIC-typed column outside key_cols, so
    distinct rows of a hot key scatter over the buckets (deterministic
    under task retry — rule in with_salt). Atomic-only keeps the default
    safe and cheap: xxhash64 rejects MAP columns outright, and hashing a
    wide array/struct OR a binary payload (a multi-MB scanned image from
    sources/binary.py) per row would dwarf the repartition it salts.
    Passing key columns as the salt source raises: that salt is constant
    per key and spreads nothing. A keys-only (or no-atomic-column) frame
    must pass salt_cols explicitly."""
    if salt_cols is None:
        atomic = {
            f.name
            for f in df.schema.fields
            if f.dataType.typeName()
            not in ("map", "array", "struct", "variant", "binary")
        }
        salt_cols = [c for c in df.columns if c not in key_cols and c in atomic]
    _require_salt_outside_keys(key_cols, salt_cols)
    return (
        with_salt(df, salt_cols, buckets)
        .repartition(partitions, *key_cols, "_salt")
        .drop("_salt")  # projection only — the partitioning survives
    )
