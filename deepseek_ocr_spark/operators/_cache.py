"""Cache lifecycle for operators that persist() a heavy intermediate
(minhash/simhash signature tables, the exploded ngram index).

Those intermediates feed multiple branches of ONE returned lazy plan, so
the operator cannot unpersist before the caller's action runs — but
leaving every invocation's cache behind accumulates storage for the
session lifetime (ADVICE r2 / VERDICT r2 #5). ``persist_swap`` bounds
that to ONE live intermediate per operator: persisting a new one
releases the previous, so consecutive invocations hold steady-state
storage while the current plan stays fully lazy and recomputable
(unpersist only drops blocks; lineage still reproduces the old result
if a stale handle is ever re-executed).

``release()`` drops everything eagerly — call it (or
``spark.catalog.clearCache()``) when a long-lived session is done with
the dedup layer entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: dict[str, DataFrame] = {}


def persist_swap(key: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` under ``key``, unpersisting whatever the previous
    invocation of the same operator left cached — UNLESS the new plan is
    ``sameResult`` as the old one, in which case the existing cache is
    kept and reused (CacheManager maps the new persist to the same
    blocks). Repeated invocations over the same corpus therefore hit the
    cache like plain persist() did, while a new corpus swaps the old
    cache out instead of accumulating."""
    old = _live.get(key)
    if old is not None:
        try:
            same = (
                old._jdf.queryExecution()
                .analyzed()
                .sameResult(df._jdf.queryExecution().analyzed())
            )
        except Exception:
            same = False
        if not same:
            _live.pop(key)
            old.unpersist()
    _live[key] = df.persist()
    return df


def release(key: str | None = None) -> None:
    """Unpersist the live intermediate for ``key`` (all keys if None)."""
    keys = [key] if key is not None else list(_live)
    for k in keys:
        df = _live.pop(k, None)
        if df is not None:
            df.unpersist()
