"""F1 faithful: windowed no-repeat-ngram suppression, re-expressed
relationally (reference: process/ngram_norepeat.py:7-40, applied with
params (20,50) run_dpsk_ocr_pdf.py:46, (30,90) run_dpsk_ocr_image.py:162,
(40,90) run_dpsk_ocr_eval_batch.py:37; whitelist = {<td>, </td>} ids).

Reference semantics (a logits processor at decode step t): with history
s[0..t-1], candidate s[t] is banned iff some i in [t-window, t-n]
starts an ngram whose first n-1 tokens equal the last n-1 history
tokens and whose last token equals s[t] — i.e. iff the full ngram
ending at t already occurs, starting in [t-window, t-n]. Detection over
a static token sequence is that rule under teacher forcing; in ngram
start positions, start j is banned iff an equal ngram starts at some
i with 1 <= j - i <= window - n + 1. The NEAREST previous equal start decides
it: if the nearest previous occurrence is farther than the window, every
earlier one is too — so banned(j) ⟺ start - lag(start) <= max_gap over a
window partitioned by (doc_id, ngram), ordered by start. The 100 TB
shape: ONE shuffle on (doc_id, ngram), per-key cost O(M log M) in the
ngram multiplicity M — the r2 self-join form enumerated M² pairs before
its residual distance filter, which a single degenerate page
("x " × 5000) blows up to 25M rows; the lag form is multiplicity-linear
(measured: bench f1_degenerate line in BENCH.md). No Python anywhere.
The span-level consecutive-run collapse in
spans_pipeline._collapse_expr stays as the cheap zero-shuffle fast path;
this operator is the faithful windowed-history form (a phrase repeated
with one word in between IS caught here, as in the reference).

Golden parity: tests/test_ngram_ban.py checks positions against
oracle.oracle_ngram_ban, a statement-level port of the reference
processor, across the reference's (ngram, window) parameter set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import NGRAM_SIZE, NGRAM_WHITELIST_SUBSTRINGS, NGRAM_WINDOW

SEP = "\x1f"  # token joiner for ngram identity (tokens never contain \x1f)
# single-sourced from schema.py (the declared home of byte-exact
# reference constants; ngram_norepeat.py:33 token-id whitelist)
WHITELIST = NGRAM_WHITELIST_SUBSTRINGS


def ngram_array(toks, n: int):
    """SEP-joined n-gram key array of a token-array column — the single
    source of the operator's ngram identity (bench.py's multiplicity
    metric must measure the same key this operator shuffles on).

    Built from n aligned slices folded with zip_with — O(n·len); the
    per-index transform(sequence, j -> slice(toks, j, n)) form re-copies
    the token array per element (O(len²), 6x slower at sf0.1). Docs
    shorter than n tokens yield an empty array (guarded — an unguarded
    negative-length slice would return empty arrays per slice and fold
    to nothing only by accident of zip_with null-padding)."""
    span = F.size(toks) - (n - 1)
    sl = [F.slice(toks, k + 1, span) for k in range(n)]
    zipped = sl[0]
    for k in range(1, n):
        zipped = F.zip_with(zipped, sl[k], lambda x, y: F.concat(x, F.lit(SEP), y))
    return F.when(F.size(toks) >= n, zipped).otherwise(
        F.array().cast("array<string>")
    )


def ngram_ban_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_size: int = NGRAM_SIZE,
    window_size: int = NGRAM_WINDOW,
    whitelist: tuple[str, ...] = WHITELIST,
) -> DataFrame:
    """Banned-token positions per doc: (doc_id, pos, token), pos = the
    0-based token index the reference processor would have banned.

    Tokens are whitespace-split, case-sensitive (stand-ins for the
    reference's token ids). window_size < ngram_size bans nothing, as in
    the reference (empty search range).

    Precondition: tokens must not contain U+001F (SEP) — it is the
    ngram joiner, so an embedded separator could alias two different
    token tuples to one ngram key. Not regex-\\s, so it survives
    tokenization: strip it upstream for binary-contaminated corpora."""
    n = ngram_size
    # tokenize once (projection boundary keeps the split from being
    # re-evaluated per ngram by CollapseProject)
    # NULL text ≡ '' (the engine-wide split convention: one empty
    # token) — split(NULL) is NULL and posexplode of NULL emits zero
    # rows, which would silently DROP the document from per-doc outputs
    tokenized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+").alias("toks"),
    )
    flat = (
        tokenized.select(
            "doc_id",
            F.posexplode(ngram_array(F.col("toks"), n)).alias("start", "ng"),
        )
        # last token of the ngram = its last SEP field (tokens are
        # SEP-free per the precondition above; n=1 has no SEP and
        # substring_index returns the whole ngram, which IS the token)
        .select(
            "doc_id",
            "start",
            "ng",
            F.substring_index("ng", SEP, -1).alias("last_tok"),
        )
    )
    max_gap = window_size - n + 1
    # nearest-previous-occurrence form: start values are distinct within
    # a doc (posexplode), so lag(start) < start and the >=1 distance
    # bound holds by construction; banned iff the nearest previous equal
    # ngram is within max_gap. One shuffle, no self-join, no persist
    # (single consumer), multiplicity-linear on degenerate pages.
    w = Window.partitionBy("doc_id", "ng").orderBy("start")
    banned = (
        flat.withColumn("prev", F.lag("start").over(w))
        .filter(
            F.col("prev").isNotNull()
            & (F.col("start") - F.col("prev") <= max_gap)
        )
        .select(
            "doc_id",
            (F.col("start") + n - 1).cast("bigint").alias("pos"),
            F.col("last_tok").alias("token"),
        )
        .filter(~F.col("token").isin(*whitelist))
    )
    return banned


def apply_ngram_ban(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_size: int = NGRAM_SIZE,
    window_size: int = NGRAM_WINDOW,
    whitelist: tuple[str, ...] = WHITELIST,
) -> DataFrame:
    """Suppression view of the ban: (doc_id, clean_text, n_kept,
    n_banned) with banned-position tokens removed and the remainder
    re-joined with single spaces. This is the post-hoc cleaning
    composition (detect → drop) a degenerate-OCR filter runs; it is a
    token-level view — original whitespace runs are not preserved.
    Relational shape: token explode ⟕ banned positions (anti) →
    per-doc ordered sort-agg, all keyed on doc_id."""
    banned = ngram_ban_flags(
        docs, text_col, id_col, ngram_size, window_size, whitelist
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        # same NULL ≡ '' convention as ngram_ban_flags: a NULL-text doc
        # must appear in the output (clean_text '', n_kept 1, n_banned
        # 0), not vanish from the per-doc contract
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+")
        ).alias("pos", "tok"),
    )
    # ONE left flag-join + ONE per-doc aggregate: kept text, n_kept and
    # n_banned all come out of the same groupBy (collect_list skips the
    # NULLs the unmatched when() emits), replacing the former
    # anti-join + second banned groupBy + doc_id re-join — one less
    # aggregation and one less shuffle-side join on this per-doc job
    flagged = toks.join(
        banned.select("doc_id", "pos", F.lit(1).alias("_b")),
        on=["doc_id", "pos"],
        how="left",
    )
    kept_struct = F.when(
        F.col("_b").isNull(), F.struct("pos", "tok")
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.when(F.col("_b").isNull(), 1)).cast("bigint").alias("n_kept"),
        F.count("_b").cast("bigint").alias("n_banned"),
    )
