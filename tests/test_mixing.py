"""Deterministic corpus mixing (operators/mixing.py): DuckDB byte-exact
parity for the hash gate (the rule-12 portable hash computed by both
engines over the same parquet), temperature-rate math, epoch
upsampling, holdout stability, and the domain-cardinality guard."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.mixing import (
    SAMPLE_SPACE,
    apply_domain_rates,
    deterministic_sample,
    holdout_split,
    mix_corpus,
    sample_key,
    temperature_rates,
    _rate_to_copies,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    return con


DUCK_KEY = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':{salt}'), 1, 7))::BIGINT"
)


def test_sample_membership_matches_duckdb_exactly(spark, sf_dir):
    """The sampled id set — not its size, its MEMBERSHIP — is identical
    across engines: the gate is a pure function of the data."""
    rate = 0.37
    _, thr = _rate_to_copies(rate)
    got = sorted(
        r[0]
        for r in deterministic_sample(
            _docs(spark, sf_dir), rate, salt="parity"
        )
        .select("doc_id")
        .collect()
    )
    con = _duck(sf_dir)
    exp = sorted(
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM documents WHERE "
            f"{DUCK_KEY.format(salt='parity')} < {thr}"
        ).fetchall()
    )
    assert got == exp and 0 < len(got) < _docs(spark, sf_dir).count()


def test_upsample_epochs_match_duckdb_exactly(spark, sf_dir):
    """rate = 2.4: every doc appears at epochs 0 and 1, and under the
    fractional gate also at epoch 2 — (doc_id, epoch) multiset equal
    across engines."""
    rate = 2.4
    base, thr = _rate_to_copies(rate)
    got = sorted(
        (r[0], r[1])
        for r in deterministic_sample(
            _docs(spark, sf_dir), rate, salt="up", with_epoch=True
        )
        .select("doc_id", "epoch")
        .collect()
    )
    con = _duck(sf_dir)
    exp = sorted(
        (r[0], r[1])
        for r in con.execute(
            f"""
            SELECT doc_id, unnest(range(0, {base} +
              CASE WHEN {DUCK_KEY.format(salt='up')} < {thr}
                   THEN 1 ELSE 0 END)) AS epoch
            FROM documents
            """
        ).fetchall()
    )
    assert got == exp
    n_docs = _docs(spark, sf_dir).count()
    per_doc_min = n_docs * base
    assert per_doc_min < len(got) < n_docs * (base + 1)


def test_rate_above_one_requires_epoch_flag(spark, sf_dir):
    with pytest.raises(ValueError, match="with_epoch"):
        deterministic_sample(_docs(spark, sf_dir), 1.5)


def test_rate_exactly_one_is_a_passthrough(spark, sf_dir):
    """rate=1.0 is (base=1, thr=0) — exactly one copy of every row, no
    duplication possible, so the with_epoch guard must NOT fire and the
    output is the input."""
    docs = _docs(spark, sf_dir)
    out = deterministic_sample(docs, 1.0)
    assert out.count() == docs.count()
    assert "epoch" not in out.columns


def test_null_id_raises_loudly(spark):
    """md5(NULL) is NULL, so a NULL id would silently fall out of every
    hash gate (even at rate 2.0) and diverge from the oracle's
    complement filter — the gate raises instead (house policy)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    docs = spark.createDataFrame(
        [("a", "en"), (None, "en")], "doc_id string, lang string"
    )
    for lazy in (
        deterministic_sample(docs, 0.5),
        holdout_split(docs),
        apply_domain_rates(docs, {"en": 0.5}),
    ):
        with pytest.raises((SparkRuntimeException, Py4JJavaError)):
            lazy.collect()


def test_mix_corpus_null_domain_raises(spark):
    """NULL domains inflate the rate normalization but match neither
    gate strategy (when-chain equality and inner join both drop NULL) —
    mix_corpus must refuse instead of silently losing rows."""
    docs = spark.createDataFrame(
        [("a", "en"), ("b", None)], "doc_id string, lang string"
    )
    with pytest.raises(ValueError, match="NULL values in domain"):
        mix_corpus(docs)


def test_sample_rate_statistically_close(spark, sf_dir):
    """The 28-bit key is uniform: realized rate within a few points of
    the nominal one on the sf corpus."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    kept = deterministic_sample(docs, 0.5, salt="stat").count()
    assert abs(kept / n - 0.5) < 0.07


def test_temperature_rates_math():
    counts = {"big": 9_000, "small": 1_000}
    # alpha=1: natural proportions at constant budget => every rate 1
    r1 = temperature_rates(counts, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in r1.values())
    # alpha=0: uniform over domains => small domain upsampled 5x,
    # big subsampled to 5/9
    r0 = temperature_rates(counts, alpha=0.0)
    assert abs(r0["small"] - 5.0) < 1e-12
    assert abs(r0["big"] - 5.0 / 9.0) < 1e-12
    # expected output size == budget for any alpha
    for alpha in (0.0, 0.3, 0.7, 1.0):
        r = temperature_rates(counts, alpha=alpha, budget=4_000)
        assert (
            abs(sum(r[d] * counts[d] for d in counts) - 4_000) < 1e-6
        )
    # empty corpus: all-zero rates, no division crash
    assert temperature_rates({"a": 0, "b": 0}) == {"a": 0.0, "b": 0.0}


def test_mix_corpus_rebalances_and_is_deterministic(spark, sf_dir):
    """alpha=0.5 over the real lang column: minority languages gain
    relative share, total stays near the budget (=N), and running the
    job twice yields the identical (doc_id, epoch) set."""
    docs = _docs(spark, sf_dir)
    before = {
        r[0]: r[1] for r in docs.groupBy("lang").count().collect()
    }
    mixed = mix_corpus(docs, domain_col="lang", alpha=0.5, salt="mx")
    after = {
        r[0]: r[1] for r in mixed.groupBy("lang").count().collect()
    }
    n_before = sum(before.values())
    n_after = sum(after.values())
    assert abs(n_after - n_before) / n_before < 0.08
    # every minority domain's share strictly increases at alpha<1
    for d, n in before.items():
        if n / n_before < 1.0 / len(before):
            assert after.get(d, 0) / n_after > n / n_before
    twice = mix_corpus(docs, domain_col="lang", alpha=0.5, salt="mx")
    a = sorted(map(tuple, mixed.select("doc_id", "epoch").collect()))
    b = sorted(map(tuple, twice.select("doc_id", "epoch").collect()))
    assert a == b


def test_apply_domain_rates_drops_unlisted_domains(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    langs = [r[0] for r in docs.select("lang").distinct().collect()]
    keep = langs[0]
    out = apply_domain_rates(docs, {keep: 1.0}, domain_col="lang")
    assert out.filter(F.col("lang") != keep).count() == 0
    assert out.count() == docs.filter(F.col("lang") == keep).count()


def test_holdout_split_stable_under_corpus_growth(spark, sf_dir):
    """A doc's split is a function of (id, salt) only: computing the
    split on a half corpus and the full corpus agrees on the shared
    ids — eval membership never churns as data arrives."""
    docs = _docs(spark, sf_dir)
    full = {
        r[0]: r[1]
        for r in holdout_split(docs, 0.05).select("doc_id", "split").collect()
    }
    half = {
        r[0]: r[1]
        for r in holdout_split(docs.filter(F.col("doc_id") % 2 == 0), 0.05)
        .select("doc_id", "split")
        .collect()
    }
    assert half == {k: v for k, v in full.items() if k % 2 == 0}
    n_hold = sum(1 for v in full.values() if v == "holdout")
    assert 0 < n_hold < len(full) * 0.15


def test_holdout_and_mix_salts_are_independent(spark, sf_dir):
    """Distinct salts give uncorrelated gates: the holdout fraction
    inside the mixed sample matches the global holdout fraction."""
    docs = holdout_split(_docs(spark, sf_dir), 0.2, salt="h")
    sampled = deterministic_sample(docs, 0.5, salt="s")
    frac = (
        sampled.filter(F.col("split") == "holdout").count()
        / max(sampled.count(), 1)
    )
    assert abs(frac - 0.2) < 0.08


def test_holdout_boundary_fractions(spark, sf_dir):
    """frac=1.0 marks EVERYTHING holdout and frac=0.0 nothing — the
    full fraction reaches the threshold (a copy-split of 1.0 into
    (base=1, thr=0) would silently tag everything 'train')."""
    docs = _docs(spark, sf_dir)
    n = docs.count()
    all_h = holdout_split(docs, 1.0)
    assert all_h.filter(F.col("split") == "holdout").count() == n
    none_h = holdout_split(docs, 0.0)
    assert none_h.filter(F.col("split") == "train").count() == n


def test_large_rate_map_join_path_matches_when_chain(spark, sf_dir):
    """Above WHEN_CHAIN_MAX domains the gate switches to a broadcast
    join against the rate table; both strategies compare the same
    integers, so the output (membership AND epochs) is identical."""
    from deepseek_ocr_spark.operators import mixing

    docs = _docs(spark, sf_dir).withColumn(
        "dom", (F.col("doc_id") % 100).cast("string")
    )
    rates = {str(i): 0.1 + (i % 30) / 10.0 for i in range(100)}
    big = apply_domain_rates(docs, rates, domain_col="dom")
    # force the when-chain on the same 100-domain map
    orig = mixing.WHEN_CHAIN_MAX
    mixing.WHEN_CHAIN_MAX = 1000
    try:
        chain = apply_domain_rates(docs, rates, domain_col="dom")
    finally:
        mixing.WHEN_CHAIN_MAX = orig
    a = sorted(map(tuple, big.select("doc_id", "epoch").collect()))
    b = sorted(map(tuple, chain.select("doc_id", "epoch").collect()))
    assert a == b and len(a) > 0
    # identical means COLUMN ORDER too (review r5): the using-join
    # hoists the key to the front -- a rate map growing past
    # WHEN_CHAIN_MAX must not silently reorder the schema under a
    # positional consumer (union-by-position, tuple unpacking)
    assert big.columns == chain.columns


def test_domain_guard_raises():
    with pytest.raises(ValueError, match="MAX_DOMAINS"):
        apply_domain_rates(
            None, {str(i): 1.0 for i in range(100_001)}
        )


def test_negative_rate_raises(spark, sf_dir):
    with pytest.raises(ValueError, match="negative"):
        deterministic_sample(_docs(spark, sf_dir), -0.1)


def test_sampling_plan_is_shuffle_free(spark, sf_dir):
    """The sampling/upsampling gate is a narrow map+filter+explode —
    zero Exchange, zero Python (pure codegen md5/conv arithmetic). The
    only aggregation in the mixing layer is mix_corpus's bounded domain
    count, which is driver-side and outside this plan."""
    out = apply_domain_rates(
        _docs(spark, sf_dir), {"en": 0.5, "zh": 2.5}, domain_col="lang"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_sample_key_range(spark, sf_dir):
    stats = (
        _docs(spark, sf_dir)
        .select(sample_key(F.col("doc_id")).alias("k"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()[0]
    )
    assert 0 <= stats["lo"] and stats["hi"] < SAMPLE_SPACE


def test_large_rate_map_int_domain(spark, sf_dir):
    """Review r5: the broadcast-path rate table must inherit the
    corpus's domain TYPE — a hardcoded string field made an int-domain
    corpus work on the when-chain path but crash createDataFrame the
    moment the domain count crossed WHEN_CHAIN_MAX."""
    from deepseek_ocr_spark.operators import mixing

    docs = _docs(spark, sf_dir).withColumn("dom", F.col("doc_id") % 100)
    rates = {i: 0.1 + (i % 30) / 10.0 for i in range(100)}
    assert len(rates) > mixing.WHEN_CHAIN_MAX
    big = apply_domain_rates(docs, rates, domain_col="dom")
    orig = mixing.WHEN_CHAIN_MAX
    mixing.WHEN_CHAIN_MAX = 1000
    try:
        chain = apply_domain_rates(docs, rates, domain_col="dom")
    finally:
        mixing.WHEN_CHAIN_MAX = orig
    a = sorted(map(tuple, big.select("doc_id", "epoch").collect()))
    b = sorted(map(tuple, chain.select("doc_id", "epoch").collect()))
    assert a == b and len(a) > 0
