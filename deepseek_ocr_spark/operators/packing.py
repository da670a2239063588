"""Token-budget sequence packing: group documents into packs whose
token totals fill a fixed training-sequence budget — the downstream
consumer of the P7 token-cost model (operators/tiling.py token
estimators; reference ancestry: the closed-form token budgeting of
image_process.py:424-435 that sizes each sample before batching).

Distributed shape (no global sort, no driver loop): documents are
sharded by a hash of doc_id, and within each shard a contiguous-fill
running-sum window assigns pack boundaries. ONE exchange — the window
shuffle on (shard, oversize); the pack aggregation's 3-part key is a
superset of the window partitioning, so Catalyst reuses the existing
hash partitioning instead of re-shuffling (pinned by
tests/test_plan_shapes.py::test_p7b_packing_single_exchange_pruned_scan).
The shuffle ships (doc_id, count, shard) rows only, never document
bodies; whole-stage-codegen arithmetic throughout.

Guarantee: every pack total ≤ budget + (its last doc's count) − 1, and
any document with count STRICTLY ABOVE budget is isolated into its own
singleton pack (flagged oversize — it cannot fit any sequence; a doc of
exactly budget tokens fills a pack perfectly and is NOT oversize). This
is the standard streaming-fill
approximation: exact first-fit-decreasing is inherently sequential and
buys ~1-2% utilization at corpus scale — not worth a driver-side loop
(CLAUDE.md: no collect in operators). Utilization is reported per pack
so the tradeoff is measured, not assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHARDS = 256  # ≥ cluster cores; each shard packs independently


def adaptive_shards(
    total_tokens: int,
    budget: int,
    target_packs_per_shard: int = 8,
    max_shards: int = DEFAULT_SHARDS,
) -> int:
    """Shard count sized to the corpus: shards pack independently, so
    each shard's LAST pack is partially filled — with far fewer packs
    than shards the tail waste dominates (a 24k-token corpus packed at
    256 shards = 1 near-empty pack per shard, utilization 0.06; the
    same corpus at 1 shard packs to ~0.95). Keep ≥
    ``target_packs_per_shard`` expected packs per shard and cap at
    ``max_shards`` (the parallelism bound that matters once the corpus
    is big enough for waste to amortize). Deterministic in the data:
    total_tokens is a property of the corpus, not the cluster."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ideal_packs = max(1, int(total_tokens) // budget)
    return max(1, min(max_shards, ideal_packs // target_packs_per_shard))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    count_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_shards: int = DEFAULT_SHARDS,
    shard_mode: str = "fast",
) -> DataFrame:
    """(pack_id, doc_ids, n_docs, total_tokens, utilization, oversize).

    Every input doc lands in exactly one pack. Oversize docs
    (count > budget) are singleton packs with oversize=true; the caller
    decides to truncate or drop them (the engine does not silently clip
    content)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    raw = F.col(count_col).cast("long")
    # a NULL count would make `oversize` NULL, landing the row in a
    # separate NULL-oversize window partition that is emitted as a
    # normal-looking pack with NULL totals; a NEGATIVE count makes the
    # running prefix sum non-monotone, so floor(prev/budget) can assign
    # later docs to earlier (or negative) packs — both corrupt
    # silently (ADVICE r3 + review r5). Fail loudly, same policy as
    # the budget guard. (raw >= 0 is NULL for NULL raw, so one branch
    # catches both.)
    cnt = F.when(raw >= 0, raw).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"pack_sequences: NULL or negative {count_col} "
                    "(got "
                ),
                F.coalesce(raw.cast("string"), F.lit("NULL")),
                F.lit(") — filter or impute token counts before packing"),
            )
        ).cast("long")
    )
    # fast: xxhash64 (JVM-only). portable: the 28-bit md5-prefix hash of
    # CLAUDE.md rule 12, reproducible in DuckDB — the registry/oracle
    # shard (queries.SQL_P7B mirrors it literally).
    if shard_mode == "fast":
        shard = F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
    elif shard_mode == "portable":
        from .dedup import portable_hash  # rule-12 hash, single-sourced

        shard = F.pmod(
            portable_hash(F.col(id_col).cast("string")), F.lit(n_shards)
        )
    else:
        raise ValueError(f"shard_mode must be 'fast' or 'portable', got {shard_mode!r}")
    sharded = docs.select(
        F.col(id_col).alias("doc_id"),
        cnt.alias("_cnt"),
        (cnt > budget).alias("oversize"),
        shard.cast("int").alias("_shard"),
    )
    w = Window.partitionBy("_shard", "oversize").orderBy("doc_id")
    prev = F.coalesce(
        F.sum("_cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    # duplicate ids break determinism: the window orders by doc_id, so
    # two rows sharing one are tie-broken by arrival order and the
    # running sum (hence pack membership) flickers between runs. Ties
    # are adjacent in this order, so a lag equality check inside the
    # SAME window pass catches every nondeterministic case at zero
    # extra shuffle (dup ids split across the oversize partitions sort
    # deterministically — one row per partition — and need no guard).
    dup_prev = F.lag("doc_id").over(w) == F.col("doc_id")
    assigned = sharded.withColumn(
        "_pack_in_shard",
        # oversize docs: one pack per doc (row_number); normal docs:
        # contiguous fill — pack k holds the docs whose running prefix
        # starts inside [k·budget, (k+1)·budget)
        F.when(
            F.coalesce(dup_prev, F.lit(False)),
            F.raise_error(
                F.concat(
                    F.lit(f"pack_sequences: duplicate {id_col} "),
                    F.col("doc_id").cast("string"),
                    F.lit(" — pack assignment would be nondeterministic; dedup ids first"),
                )
            ).cast("long"),
        )
        .when(F.col("oversize"), F.row_number().over(w).cast("long"))
        .otherwise(F.floor(prev / budget)),
    )
    return (
        assigned.groupBy("_shard", "oversize", "_pack_in_shard")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.count("*").cast("int").alias("n_docs"),
            F.sum("_cnt").cast("long").alias("total_tokens"),
        )
        .select(
            F.concat_ws(
                "-",
                F.col("_shard").cast("string"),
                F.when(F.col("oversize"), F.lit("ov")).otherwise(F.lit("p")),
                F.col("_pack_in_shard").cast("string"),
            ).alias("pack_id"),
            "doc_ids",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / float(budget), 6
            ).alias("utilization"),
            "oversize",
        )
    )


def packing_stats(packs: DataFrame, budget: int) -> DataFrame:
    """One-row report: pack count, mean utilization and max token total
    of NORMAL packs, oversize count — the measured quality of the
    streaming-fill approximation. One aggregation pass: four separate
    actions over the uncached lazy packs plan would re-execute the
    whole shard/window/aggregate pipeline four times (review r4)."""
    row = packs.agg(
        F.count("*").cast("long").alias("n_packs"),
        F.round(
            F.avg(F.when(~F.col("oversize"), F.col("utilization"))), 4
        ).alias("mean_utilization"),
        F.max(
            F.when(~F.col("oversize"), F.col("total_tokens"))
        ).alias("max_pack_tokens"),
        F.coalesce(  # SUM over zero packs is NULL, report 0
            F.sum(F.col("oversize").cast("long")), F.lit(0).cast("long")
        ).alias("n_oversize"),
    ).collect()[0]
    return packs.sparkSession.createDataFrame(
        [tuple(row) + (budget,)],
        "n_packs long, mean_utilization double, max_pack_tokens long, "
        "n_oversize long, budget long",
    )
