"""Bucketed co-located join: same result as the shuffle join, with an
executed plan containing NO Exchange."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.plans.bucketing import (
    colocated_join,
    join_has_no_shuffle,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    wh = tempfile.mkdtemp(prefix="wh_")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{wh}'")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "bucketdb.li_b", "l_orderkey", buckets=8)
    write_bucketed(od, "bucketdb.od_b", "l_orderkey", buckets=8)
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")
    shutil.rmtree(wh, ignore_errors=True)


def test_colocated_join_no_exchange(bucketed, sf_dir):
    spark = bucketed
    # force the sort-merge path so the bucket co-location (not a
    # broadcast) is what eliminates the shuffle; restore via finally —
    # the session is suite-shared and a mid-test failure must not leak
    # broadcast-off into the plan-shape tests
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(
            spark, "bucketdb.li_b", "bucketdb.od_b", "l_orderkey"
        )
        agg = joined.groupBy("o_orderpriority").agg(
            F.count("*").cast("bigint").alias("n")
        )
        # the join itself must not shuffle (bucket layout carries hashing)
        assert join_has_no_shuffle(joined)
        # and results equal the plain shuffle join over the SAME corpus
        # the fixture bucketed (sf_dir, not a hardcoded sf0.01)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        od = spark.read.parquet(f"{sf_dir}/orders.parquet")
        expected = {
            (r["o_orderpriority"], r["n"])
            for r in li.join(od, li.l_orderkey == od.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("n"))
            .collect()
        }
        got = {(r["o_orderpriority"], r["n"]) for r in agg.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == expected
