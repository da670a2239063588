"""Gopher-style repetition quality signals (Rae et al. 2021, Table A1 —
the filter family FineWeb and Dolma reuse): documents dominated by
repeated lines or repeated n-grams are generation/boilerplate artifacts
that length/stopword gates (c1/a2) cannot see. Two signal groups:

- line level (array-local JVM, zero shuffle): fraction of duplicate
  LINES and the fraction of CHARACTERS sitting in duplicated lines;
- n-gram level (one NARROW kernel pass, zero shuffle): for small n,
  the character fraction covered by the most frequent n-gram
  (``top_frac``); for larger n, the character fraction covered by
  n-grams occurring more than once (``dup_frac``). These are PER-DOC
  statistics, so no cross-doc aggregation exists to shuffle for: a
  vectorized numpy kernel computes all requested n values per doc from
  the token-hash and token-length arrays (rolling polynomial window
  hashes + np.unique counts — the substring_dedup kernel's math). The
  first implementation exploded every (doc, n, gram) row into a
  groupBy — 9× token volume, 590M spilling shuffle rows at 400k docs,
  ~13 min; the kernel pass runs the same corpus in seconds.

Character coverage follows the published accounting: a gram of t tokens
occurring c times covers c·len(gram) characters for top_frac, and
(its occurrences)·len for dup_frac, capped at the doc's total
non-space characters (overlapping grams can over-count; the cap keeps
the fraction in [0, 1] — FineWeb's implementation does the same).

``gopher_repetition_ok`` applies the published thresholds
(dup_line_frac 0.30, dup_line_char_frac 0.20, top n∈{2,3,4} →
0.20/0.18/0.16, dup n∈{5..10} → 0.15/0.14/0.13/0.12/0.11/0.10).
"""

from __future__ import annotations

import numpy as _np
import pandas as _pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf as _pandas_udf

from .substring_dedup import _B, _BINV

TOP_NGRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_NGRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
DUP_LINE_FRAC_MAX = 0.30
DUP_LINE_CHAR_FRAC_MAX = 0.20


def _line_signals(text) -> list:
    """Array-local duplicate-line fractions (lines = split on \\n).

    Duplicate-char accounting is O(L log L), not O(L²): sort the lines
    (JVM native), then a line is duplicated ⟺ it equals its sorted
    predecessor or successor — two aligned slices + zip_with, all O(L)
    interpreted lane-ops (rule 19: the earlier nested F.filter form was
    O(L²) interpreted, ~minutes on one adversarial 10k-line doc)."""
    lines = F.split(F.coalesce(text, F.lit("")), r"\n")
    n_lines = F.size(lines)
    n_dupl = n_lines - F.size(F.array_distinct(lines))
    # chars in lines whose value occurs more than once (counts every
    # copy, matching the published definition)
    srt = F.array_sort(lines)
    m = F.greatest(n_lines - 1, F.lit(0))
    eq = F.zip_with(
        F.slice(srt, 1, m), F.slice(srt, 2, m), lambda a, b: a.eqNullSafe(b)
    )
    dup_flag = F.zip_with(
        F.concat(F.array(F.lit(False)), eq),
        F.concat(eq, F.array(F.lit(False))),
        lambda a, b: a | b,
    )
    dup_chars = F.aggregate(
        F.zip_with(
            srt,
            dup_flag,
            lambda x, fl: F.when(fl, F.length(x)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    total_chars = F.aggregate(
        lines, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    safe = F.nullif(n_lines.cast("double"), F.lit(0.0))
    safe_c = F.nullif(total_chars.cast("double"), F.lit(0.0))
    return [
        F.coalesce(F.round(n_dupl / safe, 6), F.lit(0.0)).alias(
            "dup_line_frac"
        ),
        F.coalesce(F.round(dup_chars / safe_c, 6), F.lit(0.0)).alias(
            "dup_line_char_frac"
        ),
        total_chars.cast("bigint").alias("_n_chars"),
    ]


def _coverage_kernel(ns: tuple):
    """(token hashes, token lengths) → array<double> of per-n character
    coverages, one entry per n in ``ns``: count(gram)·len(gram) for the
    most frequent n-gram (``top_``-style use takes the max-count gram,
    ties broken by larger coverage) AND the summed coverage of grams
    occurring more than once — emitted interleaved as [top_n..., dup_n...]
    per the caller's split of ``ns``. Window identity is the rolling
    polynomial hash of substring_dedup (uint64 wraparound, ~2⁻⁶⁴
    collisions); gram char length = sum of its token lengths + (n−1)
    separators, exactly the SEP-joined string length the relational
    form measured. Per-row numpy: np.unique gives counts and first
    indices in one pass."""

    @_pandas_udf("array<double>")
    def kernel(th: _pd.Series, tl: _pd.Series) -> _pd.Series:
        b = _np.uint64(_B)
        binv = _np.uint64(_BINV)
        # normalize rows first so the prefix-power arrays are built ONCE
        # per Arrow batch, sized to the batch max (the _rolling_kernel
        # discipline) — the previous form ran two cumprods and allocated
        # two fresh power buffers per ROW, pure allocator churn of the
        # rule-19b class on a 400k-doc curation pass. Same values: the
        # per-row slices pow_*[:ln] read identical powers, bit-exact.
        rows = []
        max_len = 0
        for hs, ls in zip(th, tl):
            if hs is None:
                rows.append(None)
                continue
            a = _np.asarray(hs)
            if a.dtype != _np.int64:
                if _np.isnan(a).any():
                    raise ValueError("NULL token hash in coverage kernel")
                a = a.astype(_np.int64)
            rows.append((a, _np.asarray(ls, dtype=_np.int64)))
            max_len = max(max_len, len(a))
        out = []
        with _np.errstate(over="ignore"):
            pow_b = _np.cumprod(_np.full(max_len + 1, b, dtype=_np.uint64))
            pow_binv = _np.cumprod(
                _np.full(max_len + 1, binv, dtype=_np.uint64)
            )
            # cumprod starts at B^1; shift to B^0..B^max_len
            pow_b = _np.concatenate(([_np.uint64(1)], pow_b[:-1]))
            pow_binv = _np.concatenate(([_np.uint64(1)], pow_binv[:-1]))
            for row in rows:
                if row is None:
                    out.append([0.0] * (2 * len(ns)))
                    continue
                a, lens = row
                ln = len(a)
                u = a.view(_np.uint64)
                s = _np.zeros(ln + 1, dtype=_np.uint64)
                _np.cumsum(u * pow_binv[:ln], out=s[1:])
                pl = _np.zeros(ln + 1, dtype=_np.int64)
                _np.cumsum(lens, out=pl[1:])
                tops, dups = [], []
                for n in ns:
                    if ln < n:
                        tops.append(0.0)
                        dups.append(0.0)
                        continue
                    wh = (s[n:] - s[: ln - n + 1]) * pow_b[n - 1 : ln]
                    glen = pl[n:] - pl[: ln - n + 1] + (n - 1)
                    uniq, first, counts = _np.unique(
                        wh, return_index=True, return_counts=True
                    )
                    cov = counts * glen[first]
                    mx = counts.max()
                    tops.append(float(cov[counts == mx].max()))
                    dups.append(float(cov[counts > 1].sum()))
                out.append(tops + dups)
        return _pd.Series(out)

    return kernel


_COV_KERNELS: dict[tuple, object] = {}


def repetition_signals(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """Per-doc repetition signals + the composite
    ``gopher_repetition_ok`` gate. One row per input doc; the whole
    operator is a narrow map (line signals array-local JVM, n-gram
    coverages in one vectorized kernel pass) — zero shuffle."""
    ns = (*top_ns, *dup_ns)
    if ns not in _COV_KERNELS:
        _COV_KERNELS[ns] = _coverage_kernel(ns)
    toks = F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        *_line_signals(F.col(text_col)),
        _COV_KERNELS[ns](
            F.transform(toks, lambda t: F.xxhash64(t)),
            F.transform(toks, lambda t: F.length(t)),
        ).alias("_cov"),
    )
    # kernel layout: [top-cov for every n in ns...] ++ [dup-cov for
    # every n in ns...]; top_ns occupy the first positions of ns and
    # dup_ns the rest
    sig_cols = []
    for i, n in enumerate(top_ns):
        sig_cols.append((f"top_{n}gram_char_frac", i))
    for i, n in enumerate(dup_ns):
        sig_cols.append((f"dup_{n}gram_char_frac", len(ns) + len(top_ns) + i))
    # kernel output consumed as-is from the materialized projection
    # (rule 1); fracs derived in a SEPARATE select
    out = base.select("doc_id", "dup_line_frac", "dup_line_char_frac", "_n_chars", "_cov")
    safe_c = F.nullif(F.col("_n_chars").cast("double"), F.lit(0.0))
    for name, idx in sig_cols:
        # coalesce BEFORE the cap: F.least skips NULLs (least(null, 1.0)
        # = 1.0), so a missing signal must become 0.0 first
        out = out.withColumn(
            name,
            F.least(
                F.coalesce(
                    F.round(F.col("_cov")[idx] / safe_c, 6), F.lit(0.0)
                ),
                F.lit(1.0),
            ),
        )
    ok = (F.col("dup_line_frac") <= DUP_LINE_FRAC_MAX) & (
        F.col("dup_line_char_frac") <= DUP_LINE_CHAR_FRAC_MAX
    )
    for n, thr in TOP_NGRAM_THRESHOLDS.items():
        if n in top_ns:
            ok = ok & (F.col(f"top_{n}gram_char_frac") <= thr)
    for n, thr in DUP_NGRAM_THRESHOLDS.items():
        if n in dup_ns:
            ok = ok & (F.col(f"dup_{n}gram_char_frac") <= thr)
    return out.select(
        "doc_id",
        "dup_line_frac",
        "dup_line_char_frac",
        *[name for name, _ in sig_cols],
        ok.alias("gopher_repetition_ok"),
    )


# --- PII detection / redaction ----------------------------------------------
# The regex family Dolma ships (EMAIL/PHONE/IP, replaced with typed
# sentinels) — pre-training corpora redact these before packing. Pure
# JVM regexp ops: codegen, zero Python, zero shuffle.

PII_PATTERNS = {
    # local@domain.tld — conservative, no quoted-local-part exotica
    "email": r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+",
    # NANP-ish phone numbers: optional +1 / (area) / separators; the
    # lookarounds reject a "phone" embedded in a longer digit/dash run
    # ("555-123-45678", "id 9555-123-4567") — same guard family as IP
    "phone": r"(?<![\d-])(\+?1[-. ]?)?(\(\d{3}\)|\d{3})[-. ]\d{3}[-. ]\d{4}(?![\d-])",
    # IPv4 dotted quad (0-255 per octet); the lookarounds reject a quad
    # embedded in a longer dotted run ("version 1.2.3.4.5") — \b alone
    # matches its first four octets
    "ip": r"(?<!\d\.)\b((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b(?!\.\d)",
}
PII_SENTINELS = {
    "email": "|||EMAIL_ADDRESS|||",
    "phone": "|||PHONE_NUMBER|||",
    "ip": "|||IP_ADDRESS|||",
}


def pii_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs + one ``n_<kind>`` count column per PII pattern — the audit
    view (what WOULD be redacted). Counts are regexp_extract_all sizes,
    evaluated in whole-stage codegen."""
    out = docs
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")), F.lit(pat), 0
                )
            ).cast("bigint"),
        )
    return out


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs with every PII match in ``text_col`` replaced by its typed
    sentinel (Dolma's replacement convention). Order matters: emails
    first (a phone regex must not eat digits inside an already-redacted
    span; sentinels contain no digits or @, so later passes cannot match
    inside earlier replacements)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    # iterate PII_PATTERNS itself (dict order: email first, per the
    # ordering contract above) — a pattern added there must redact, not
    # just be counted by pii_signals, or the audit view reports PII the
    # redaction pass then ships into the corpus
    for kind in PII_PATTERNS:
        text = F.regexp_replace(text, PII_PATTERNS[kind], PII_SENTINELS[kind])
    return docs.withColumn(text_col, text)
