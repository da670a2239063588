"""Cross-document EXACT-SUBSTRING deduplication — the ExactSubstr
family of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better", §4.1; reference tool
github.com/google-research/deduplicate-text-datasets): any n-token
window that occurs at two or more (doc, position) sites in the corpus
is a duplicated passage; all sites except the globally first are
flagged, and the flagged token intervals can be cut out of the text.
Complements the DOC-level families already in the engine (exact d1,
near d2–d4, semantic d5/semantic_dedup, transitive d6): a boilerplate
license header shared by thousands of otherwise-distinct documents is
invisible to doc-level dedup and is exactly what this operator removes.

Relational shape (the suffix array of the published tool re-expressed
for Spark):

1. tokenize + per-token xxhash64 — JVM column expressions, narrow;
2. n-token rolling POLYNOMIAL hash per window — a vectorized numpy
   kernel over the int64 hash arrays (Arrow batch in/out, top-level map
   stage per CLAUDE.md rule 1/19). H_i = Σ_{j=i}^{i+n-1} h_j·B^{i+n-1-j}
   (mod 2^64) computed from ONE wraparound cumsum of h_j·B^{-j}:
   H_i = (S_{i+n} − S_i)·B^{n-1+i} — O(len) per doc, order-sensitive
   (unlike a window SUM, anagram windows do not collide);
3. duplicate detection — groupBy(window_hash) with an AGGREGATE
   min(struct(doc, pos)) picking the canonical site (no window over the
   hash key: a passage repeated millions of times would make a
   pathological window partition, the f1 lesson);
4. per-doc interval merge of overlapping flagged windows — lag window
   keyed by doc (fixed-length intervals sorted by start: new island ⟺
   start > prev_start + n − 1);
5. optional text suppression — array-local JVM rebuild.

Exactness: equality is on a 64-bit order-sensitive hash, so two
DIFFERENT n-token windows collide with probability ~2⁻⁶⁴ (corpus-level
false-flag expectation ~W²/2⁶⁵ for W windows — negligible below ~10¹²
windows; the published tool pays a suffix array for literal equality).
Tokens are whitespace tokens of lower(text), consistent with the
engine's other token operators (the reference tool uses BPE ids; the
pipeline shape is identical).

100 TB: the only wide operation is the groupBy on the 64-bit window
hash — shuffle rows are (doc, pos, hash), fixed width, one per token,
never text. The kernel is a narrow pre-shuffle map. Interval merge
shuffles only FLAGGED windows keyed by doc.
"""

from __future__ import annotations

import numpy as _np
import pandas as _pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf as _pandas_udf

# odd multiplier (2^64 golden ratio | 1) — odd ⟺ invertible mod 2^64
_B = 0x9E3779B97F4A7C15 | 1
_BINV = pow(_B, -1, 2**64)


def token_hashes(text) -> "F.Column":
    """Per-token xxhash64 array of lower(text) whitespace tokens (JVM,
    codegen). NULL text hashes as no tokens."""
    toks = F.split(F.lower(F.coalesce(text, F.lit(""))), r"\s+")
    return F.transform(toks, lambda t: F.xxhash64(t))


def _rolling_kernel(n: int):
    """array<bigint> token hashes → array<bigint> of the L−n+1 window
    hashes (empty when L < n). Per-row numpy (this is a narrow one-pass
    map, not the 64-lane fold hot path that needed slab pooling —
    CLAUDE.md 19b); all arithmetic is uint64 wraparound (mod 2^64), and
    np.cumsum is strictly sequential so results are bit-stable."""

    @_pandas_udf("array<bigint>")
    def kernel(hs: _pd.Series) -> _pd.Series:
        # powers are reused across rows; sized to the batch max
        max_len = 0
        rows = []
        for x in hs:
            if x is None:
                rows.append(None)
                continue
            a = _np.asarray(x)
            if a.dtype != _np.int64:  # Arrow nulls arrive as float64+NaN
                if _np.isnan(a).any():
                    raise ValueError("NULL token hash in window kernel input")
                a = a.astype(_np.int64)
            rows.append(a)
            max_len = max(max_len, len(a))
        # every multiply below wraps mod 2^64 BY DESIGN — silence the
        # per-element overflow RuntimeWarning (it floods executor logs)
        with _np.errstate(over="ignore"):
            pow_b = _np.cumprod(
                _np.full(max_len + 1, _np.uint64(_B), dtype=_np.uint64)
            )
            pow_binv = _np.cumprod(
                _np.full(max_len + 1, _np.uint64(_BINV), dtype=_np.uint64)
            )
            # cumprod starts at B^1; shift to B^0..B^max_len
            pow_b = _np.concatenate(([_np.uint64(1)], pow_b[:-1]))
            pow_binv = _np.concatenate(([_np.uint64(1)], pow_binv[:-1]))
            out = []
            for a in rows:
                if a is None or len(a) < n:
                    out.append([] if a is not None else None)
                    continue
                u = a.view(_np.uint64)
                ln = len(u)
                # S_i = Σ_{j<i} h_j·B^{-j}  (wraparound prefix)
                s = _np.zeros(ln + 1, dtype=_np.uint64)
                _np.cumsum(u * pow_binv[:ln], out=s[1:])
                # H_i = (S_{i+n} − S_i) · B^{n-1+i}
                h = (s[n:] - s[: ln - n + 1]) * pow_b[n - 1 : ln]
                out.append(h.view(_np.int64))
        return _pd.Series(out)

    return kernel


_KERNELS: dict[int, object] = {}


def _kernel(n: int):
    if n not in _KERNELS:
        _KERNELS[n] = _rolling_kernel(n)
    return _KERNELS[n]


def substring_dup_spans(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = True,
) -> DataFrame:
    """Flag duplicated n-token passages: returns one row per doc per
    MERGED token interval covered by windows whose hash occurs at ≥2
    (doc, position) sites — ``(doc_id, start_ord, end_ord)``, 0-based
    inclusive token ordinals. ``keep_first=True`` (the published
    semantics) exempts the globally first site of each window,
    deterministically min(struct(doc, pos)); ``keep_first=False`` flags
    every site (useful for "drop the boilerplate everywhere")."""
    if n < 2:
        raise ValueError(f"n must be ≥ 2 (got {n}) — a 1-token window is d1")
    from ._cache import persist_swap

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        _kernel(n)(token_hashes(F.col(text_col))).alias("_wh"),
    )
    # kernel output consumed as-is by posexplode (rule 1: top-level map).
    # persist_swap: the window table feeds BOTH the duplicate aggregate
    # and the probe side of the join — uncached, each side re-runs the
    # kernel, and worse, the Generate's implicit size>0 pushdown
    # evaluates the UDF a second time WITHIN each side (plan-verified: 4
    # kernel passes per corpus, and the un-materialized right subtree
    # also gets a statically misestimated broadcast that OOMs at ~50M
    # windows). Cached: ONE kernel pass; the join side estimate is the
    # real cached size. MEMORY_AND_DISK via persist — spill-safe.
    wins = persist_swap(
        "substr_wins",
        hashed.select("doc_id", F.posexplode("_wh").alias("ord", "hv")),
    )
    sites = wins.groupBy("hv").agg(
        F.count("*").alias("_c"),
        F.min(F.struct("doc_id", "ord")).alias("_first"),
    )
    dup_sites = sites.filter(F.col("_c") > 1)
    flagged = wins.join(dup_sites, on="hv")
    if keep_first:
        flagged = flagged.filter(
            (F.col("doc_id") != F.col("_first.doc_id"))
            | (F.col("ord") != F.col("_first.ord"))
        )
    w = Window.partitionBy("doc_id").orderBy("ord")
    islands = flagged.select("doc_id", "ord").withColumn(
        "_new",
        F.when(
            F.col("ord") > F.lag("ord").over(w) + (n - 1), 1
        ).otherwise(F.when(F.lag("ord").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return islands.groupBy("doc_id", "_island").agg(
        F.min("ord").cast("bigint").alias("start_ord"),
        (F.max("ord") + (n - 1)).cast("bigint").alias("end_ord"),
    ).select("doc_id", "start_ord", "end_ord")


def suppress_duplicate_substrings(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_first: bool = True,
) -> DataFrame:
    """Cut the flagged passages out of the text: docs with ``text_col``
    rebuilt from the tokens OUTSIDE every flagged interval (token order
    preserved, single-space joined — the engine's token ops are
    whitespace-normalized throughout). Docs with nothing flagged pass
    through fully BYTE-IDENTICAL: the NULL-cuts branch below returns
    the original column untouched — only docs with actual cuts are
    rebuilt (and those collapse whitespace runs, since reconstruction
    is from the token array). The per-doc interval list is the MERGED
    span set (small by construction relative to the doc), applied
    array-locally in JVM."""
    spans = substring_dup_spans(docs, n, text_col, id_col, keep_first)
    cuts = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("start_ord", "end_ord")).alias("_cuts")
    )
    # split the ORIGINAL text (no lower()): detection is case-folded but
    # the surviving tokens must keep their casing; \s+ boundaries are
    # case-independent, so ordinals line up with the hashed windows
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (i >= c["start_ord"]) & (i <= c["end_ord"]),
        ),
    )
    rebuilt = F.array_join(kept, " ")
    return (
        docs.join(
            cuts.withColumnRenamed("doc_id", id_col), on=id_col, how="left"
        )
        .withColumn(
            text_col,
            F.when(F.col("_cuts").isNull(), F.col(text_col)).otherwise(rebuilt),
        )
        .drop("_cuts")
    )


# the benchmark's distinct window hashes must fit a broadcast; eval
# benchmarks are thousands of docs (≪ this), so tripping the bound means
# the CALL is wrong (e.g. decontaminating against another corpus)
MAX_BENCHMARK_WINDOWS = 20_000_000


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_benchmark_windows: int | None = MAX_BENCHMARK_WINDOWS,
) -> DataFrame:
    """Benchmark decontamination — the published training-data practice
    (GPT-3 appendix C uses 13-gram overlap; FineWeb/llm-foundry ship the
    same check): flag every TRAIN doc sharing at least one n-token
    window with any BENCHMARK doc, so evaluation data can be excluded
    from the training corpus.

    Returns ``train``'s rows + (contaminated: boolean, n_hits: bigint =
    number of distinct contaminated window positions in the doc).
    Callers drop or audit ``contaminated`` rows; per-passage excision
    instead of whole-doc dropping is ``suppress_duplicate_substrings``
    over ``train ∪ benchmark`` with keep_first=False restricted to
    train ids — whole-doc dropping is the published default.

    100 TB shape: the benchmark side is tiny (eval sets are thousands of
    docs), so its distinct window hashes broadcast; the train side is
    one narrow kernel pass + a broadcast semi-join — NO shuffle of the
    train corpus at all. Same 64-bit collision caveat as the module
    docstring (~2⁻⁶⁴ per window pair, false-POSITIVE only — safe
    direction for decontamination)."""
    if n < 2:
        raise ValueError(f"n must be ≥ 2 (got {n})")
    bench_hv = (
        benchmark.select(
            F.explode(_kernel(n)(token_hashes(F.col(text_col)))).alias("hv")
        )
        .distinct()
    )
    # EAGER broadcast-size guard (cosine_topk's house style): a bounded
    # limit+count probe at construction, so misuse raises instead of
    # OOMing the driver mid-job; pass None to skip in plan-only contexts.
    # The guarded table is persisted first — otherwise the probe runs
    # the full benchmark tokenize/kernel/distinct once and the broadcast
    # join below re-runs the identical plan (one wasted kernel pass per
    # call; bounded by the benchmark's size, still pure waste).
    if max_benchmark_windows is not None:
        from ._cache import persist_swap

        bench_hv = persist_swap("decontam_bench_hv", bench_hv)
        probe = bench_hv.limit(max_benchmark_windows + 1).count()
        if probe > max_benchmark_windows:
            raise ValueError(
                f"decontaminate broadcasts the benchmark's distinct window "
                f"hashes; this benchmark exceeds max_benchmark_windows="
                f"{max_benchmark_windows}. Eval sets are thousands of docs — "
                "a bigger 'benchmark' is a corpus: use "
                "substring_dup_spans over the union instead, or raise the "
                "bound explicitly."
            )
    wins = train.select(
        F.col(id_col).alias("_tid"),
        F.explode(_kernel(n)(token_hashes(F.col(text_col)))).alias("hv"),
    )
    hits = (
        wins.join(F.broadcast(bench_hv), on="hv")
        .groupBy("_tid")
        .agg(F.count("*").cast("bigint").alias("n_hits"))
    )
    return (
        train.join(
            hits.withColumnRenamed("_tid", id_col), on=id_col, how="left"
        )
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )
