"""Driver-compare safety scan: the correctness gate sorts result rows
by the alphabetically-ordered column tuple; Python cannot ORDER a tuple
whose tie reaches a None next to a str/int. For every oracled registry
query, find the first (in sorted column order) column that actually
contains NULLs and verify the columns BEFORE it form a unique key — if
they do, no comparator can ever reach the NULL during sorting.

First real catch: s7_annotation_plan at sf0.1 (color-triple collisions
tied two rows through to the nullable crop_path); its registry
projection now emits -1/'' sentinels instead.

Usage: python tools/scan_null_ties.py [sf_dir]   (default sf0.01)
Exit code 1 if any query is at risk.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from deepseek_ocr_spark import queries as Q
    from deepseek_ocr_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    risky = []
    for name, (fn, sql) in Q.REGISTRY.items():
        if sql is None:
            continue
        rows = fn(spark, sf_dir).collect()
        if not rows:
            print(f"{name:32s} empty result — fine")
            continue
        cols = sorted(rows[0].asDict().keys())
        null_i = next(
            (i for i, c in enumerate(cols) if any(r[c] is None for r in rows)),
            None,
        )
        if null_i is None:
            continue
        prefix = Counter(tuple(r[c] for c in cols[:null_i]) for r in rows)
        ties = sum(v - 1 for v in prefix.values())
        tag = "SAFE (unique prefix)" if ties == 0 else f"RISK ties={ties}"
        print(f"{name:32s} first-null '{cols[null_i]}' -> {tag}")
        if ties:
            risky.append(name)
    print("risky:", risky or "none")
    return 1 if risky else 0


if __name__ == "__main__":
    sys.exit(main())
