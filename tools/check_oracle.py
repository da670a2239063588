"""Local replica of the driver's correctness gate: run every REGISTRY query
on Spark and its oracle SQL on DuckDB at sf0.01, compare row count, column
names, and order-insensitive values. Floats compared exactly after the
rounding the queries themselves apply — any divergence printed with detail.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from deepseek_ocr_spark import queries as Q
from deepseek_ocr_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
STRICT = os.environ.get("STRICT_FLOATS", "1") == "1"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    # normalized forms are TYPE-TAGGED tuples: a float repr'd to '1.5'
    # must not compare equal to a VARCHAR '1.5' from the other engine
    # (e.g. an oracle missing its final CAST AS DOUBLE), and Python's
    # bool-is-int (True == 1) must not hide a boolean/int divergence
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        if STRICT:
            return ("float", repr(v))  # exact: surfaces any ulp diff
        return ("float", repr(round(v, 9)))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("date", v.isoformat())
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort key must be collision-free across types: mixed None/str/int
    # tuples are not orderable in Python (first hit: s7 at sf0.1), and a
    # plain str(v) key ties int 1 with str '1' (or a literal '\x00' with
    # the old None marker), making tie order engine-input-order dependent
    # and the list equality falsely FAIL on a matching multiset.
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(
            (v is None, type(v).__name__, str(v)) for v in t
        ),
    )


def main(only: list[str]) -> int:
    unknown = [n for n in only if n not in Q.REGISTRY]
    if unknown:
        # a typo must not produce a green '0 failures' over zero queries
        print(f"FAIL unknown query name(s): {unknown}")
        print(f"known: {sorted(Q.REGISTRY)}")
        return 1
    spark = get_spark(parallelism=8, shuffle_partitions=8, app_name="check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    for name, (fn, sql) in Q.REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if sql is None:
            if len(rows) == 0:
                # a flagship pipeline emitting nothing is a failure, not
                # a warning — the gate must not stay green on it
                print(f"FAIL {name}: rows-only query returned zero rows")
                failures += 1
            else:
                print(
                    f"ok   {name}: rows-only, {len(rows)} rows"
                    f" ({time.time()-t0:.1f}s)"
                )
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(cols)} vs {sorted(ocols)}")
            ok = False
        if len(rows) != len(orows):
            print(f"FAIL {name}: row count {len(rows)} vs {len(orows)}")
            ok = False
        if ok:
            a, b = _rows_to_set(cols, rows), _rows_to_set(ocols, orows)
            if a != b:
                sa, sb = set(a), set(b)  # hoisted: once, not per row
                diff_a = [r for r in a if r not in sb][:3]
                diff_b = [r for r in b if r not in sa][:3]
                print(f"FAIL {name}: value mismatch\n  spark-only: {diff_a}\n  duck-only:  {diff_b}")
                ok = False
        if ok:
            print(f"ok   {name}: {len(rows)} rows match ({time.time()-t0:.1f}s)")
        else:
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
