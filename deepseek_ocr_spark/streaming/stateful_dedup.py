"""Custom stateful streaming operator: cross-micro-batch exact dedup
via applyInPandasWithState (task brief: 'applyInPandasWithState for
custom stateful operators').

A continuously-ingesting extraction pipeline must not re-emit documents
whose content already flowed through (re-crawls, retries, mirror
hosts). Batch dedup (operators/dedup.exact_dedup) sees the whole corpus
at once; the streaming form keeps per-digest state — first arrival wins,
later arrivals are suppressed — with a state timeout so the store stays
bounded by the re-crawl horizon rather than corpus history.

Output contract (append log): the FIRST row per digest announces the
canonical doc_id; every later micro-batch that suppresses more copies
of that digest appends an update row with the same canonical doc_id and
the new CUMULATIVE n_duplicates_suppressed — the max per digest is
authoritative. (Without the update rows the cross-batch counter would
be write-only state no consumer could ever read — review r4.) Unique
documents = distinct digests; a single-batch drain emits exactly one
row per digest (the sd1 registry query's shape).

STATE SCHEMA MIGRATION (r4): the state row gained a third field
(canonical_doc). A streaming query checkpointed under the old 2-field
schema cannot restart on this code — Spark's state-store schema check
aborts it (StateSchemaNotCompatible). Upgrade by draining the old
query, then restarting with a FRESH checkpoint directory; the dedup
store itself (first-emission log) carries forward.

Keying on the content digest (not doc_id) makes the state row width
constant and the shuffle key fixed-width — the same discipline as the
batch dedup operators.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUT_SCHEMA = StructType(
    [
        StructField("digest", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("n_duplicates_suppressed", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("emitted", LongType(), False),
        StructField("suppressed", LongType(), False),
        StructField("canonical_doc", StringType(), False),
    ]
)


def _dedup_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (digest,) = key
    emitted, suppressed, canon = (
        state.get if state.exists else (0, 0, "")
    )
    rows = pd.concat(list(pdfs), ignore_index=True)
    if emitted == 0:
        # first sighting of this content: emit the canonical doc
        canon = rows["doc_id"].min()
        suppressed += len(rows) - 1
    else:
        suppressed += len(rows)
    state.update((1, int(suppressed), canon))
    # first row announces the canonical doc; later rows carry the
    # updated cumulative count (same canonical id) so cross-batch
    # suppression is observable — max per digest is authoritative
    yield pd.DataFrame(
        {
            "digest": [digest],
            "doc_id": [canon],
            "n_duplicates_suppressed": [int(suppressed)],
        }
    )
    # production note: bound the state store with
    # state.setTimeoutDuration(<re-crawl horizon>) under
    # ProcessingTimeTimeout — omitted here because pending timers keep
    # an AvailableNow drain alive until they fire (observed hang).


def streaming_exact_dedup_flat(
    doc_stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flat-text variant: digest = md5(text) — same keyed state machine.
    With a single AvailableNow micro-batch the emitted canonical doc_id
    is the lexicographic minimum per digest, which makes the semantics
    batch-reproducible (registry query sd1_stream_dedup's DuckDB
    oracle: GROUP BY md5(text) / MIN(doc_id) / COUNT(*)-1)."""
    digested = doc_stream.select(
        # coalesce: a NULL text row must hash as empty content, not
        # produce a NULL digest that violates OUT_SCHEMA's non-nullable
        # field mid-batch (mirrored in the sd1 DuckDB oracle —
        # queries.SQL_SD1 hashes md5(coalesce(text, '')) too)
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("digest"),
        # cast: a bigint doc_id stream would hand int64 to the pandas
        # state fn, whose canonical_doc/doc_id StringType Arrow
        # conversion rejects it mid-query. A NULL id RAISES (the
        # mixing.py convention): pandas min() over an all-NULL group
        # yields NaN, which would abort the query against OUT_SCHEMA's
        # non-nullable field anyway — fail with a message instead.
        F.when(
            F.col("doc_id").isNull(),
            F.raise_error(
                F.lit("streaming_exact_dedup: NULL doc_id in stream")
            ).cast("string"),
        )
        .otherwise(F.col("doc_id").cast("string"))
        .alias("doc_id"),
    )
    return digested.groupBy("digest").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_exact_dedup(doc_stream: DataFrame, text_col: str = "spans") -> DataFrame:
    """documents stream → one row per first-seen content digest.

    Digest = md5 of the concatenated span texts (content identity, not
    doc identity). One select derives the joined text, then the flat
    variant owns the digest/id conventions and the state machine — the
    shared-tail pattern (CLAUDE.md r5 _explode_epochs) so the two
    variants cannot drift (the span variant briefly lacked the id cast
    the flat one had). A NULL spans array joins to NULL, which the flat
    variant's coalesce digests as empty content, same as before."""
    joined = doc_stream.select(
        F.array_join(
            F.transform(text_col, lambda s: F.coalesce(s["text"], F.lit(""))),
            "\x1f",
        ).alias("_joined"),
        "doc_id",
    )
    return streaming_exact_dedup_flat(joined, text_col="_joined")
