"""Scalar text-normalization operators (SURVEY §2.6) not already inlined
in the pipelines: the T3 formula cleaner.

Reference semantics (run_dpsk_ocr_eval_batch.py:53-68 clean_formula):
within every ``\\[ ... \\]`` display-formula block, drop
``\\quad\\s*\\([^)]*\\)`` annotation runs, then strip surrounding
whitespace — the per-match ``.strip()`` makes the replacement
function-valued, hence the faithful implementation is an Arrow-batched
pandas UDF (the one legitimate Python hot-path in §2.6).

``clean_formula_expr`` is the JVM equivalent for inputs where ``\\quad(``
only occurs inside formula blocks (true of model output; the two are
equivalence-tested on the synthetic corpus in tests/).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_FORMULA_RE = re.compile(r"\\\[(.*?)\\\]", re.DOTALL)
_QUAD_RE = re.compile(r"\\quad\s*\([^)]*\)")


def clean_formula_py(text: str) -> str:
    """Faithful per-string mirror of the reference's clean_formula."""
    if text is None:
        return None

    def fix(m: re.Match) -> str:
        return r"\[" + _QUAD_RE.sub("", m.group(1)).strip() + r"\]"

    return _FORMULA_RE.sub(fix, text)


@F.pandas_udf(StringType())
def clean_formula_udf(texts: pd.Series) -> pd.Series:
    # vectorized pre-screen: rows without a formula block skip Python re
    mask = texts.str.contains(r"\[", regex=False, na=False)
    out = texts.copy()
    if mask.any():
        out[mask] = texts[mask].map(clean_formula_py)
    return out


def clean_formula_expr(t: Column) -> Column:
    """JVM-side equivalent under the no-\\quad-outside-formulas invariant:
    drop annotation runs globally, then trim inside each block.

    (?U) makes Java's \\s Unicode-aware like Python's (same device as
    spans_pipeline's kept filter): without it a NBSP- or U+2028-padded
    formula trims differently between this expr and clean_formula_py.
    Residual fringe: Python str.strip() also strips U+001C–001F/U+0085
    separators that Unicode White_Space (hence Java (?U)\\s) excludes —
    control-char-padded formulas are one remaining divergence,
    test-pinned as out of contract.

    The annotation class excludes ``]`` as well as ``)``: the global
    replace would otherwise match ACROSS a block's closing ``\\]`` when
    a ``\\quad(`` has no ``)`` before the block ends but one occurs
    later in the document — eating the delimiter and corrupting the
    block (the reference, confined to the block interior, leaves such
    annotations alone). Since any boundary-crossing match must contain
    ``]``, excluding it makes delimiter corruption impossible; the cost
    is the conservative direction only — an annotation that itself
    contains ``]`` (e.g. a citation ``\\quad (see [3])``) is left in
    place rather than dropped. RE2 has no lookarounds (CLAUDE.md rule
    8), so the DuckDB oracle mirrors this exact class."""
    t = F.regexp_replace(t, r"(?U)\\quad\s*\([^)\]]*\)", "")
    return F.regexp_replace(t, r"(?sU)\\\[\s*(.*?)\s*\\\]", r"\\[$1\\]")
