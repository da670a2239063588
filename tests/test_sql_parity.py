"""Spark-vs-DuckDB parity on corpora the driver testdata does NOT
contain — edge shapes that would silently break the byte-exact gate on
a different corpus (ADVICE r1: SQL_D2's missing short-doc fallback was
latent because testdata has no 1-2-token docs). These run both engines
on tiny in-memory tables."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_spark.operators.dedup import (
    jaccard_pairs_blocked,
    minhash_lsh_pairs,
    portable_hash,
)


@pytest.fixture()
def short_docs(spark, tmp_path):
    """Docs including <3-token texts and exact short dups."""
    rows = [
        (1, "en", "web", "hello"),
        (2, "en", "web", "hello"),  # 1-token exact dup of 1
        (3, "en", "web", "two words"),
        (4, "en", "web", "two words"),  # 2-token exact dup of 3
        (5, "en", "web", "a full three token document here"),
        (6, "en", "web", "a full three token document here"),
        (7, "en", "web", "completely different text with many words inside"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    p = str(tmp_path / "documents.parquet")
    df.write.mode("overwrite").parquet(p)
    return df, p


def test_d2_short_doc_fallback_matches_duckdb(spark, short_docs):
    """The whole-text-shingle fallback for <3-token docs must agree
    between the Spark operator and the SQL_D2 mirror."""
    from deepseek_ocr_spark.queries import SQL_D2

    df, p = short_docs
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in jaccard_pairs_blocked(
            df, ["lang", "source"], threshold=0.1
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    exp = set(con.execute(SQL_D2).fetchall())
    assert got == exp
    # the short-doc dups are found on BOTH sides (jaccard 1.0)
    assert (1, 2, 1.0) in got and (3, 4, 1.0) in got


def test_minhash_portable_handles_short_docs(spark, short_docs):
    df, _ = short_docs
    found = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            df, jaccard_threshold=0.5, hash_mode="portable"
        ).collect()
    }
    assert {(1, 2), (3, 4), (5, 6)} <= found


def test_d3_full_query_parity_on_short_docs(spark, short_docs):
    """The REGISTRY d3 query (planted-dup CTE + portable minhash + bands
    + cap + verify) against its generated SQL on a corpus with <3-token
    docs — exercises SQL_D3's short-doc fallback branch, which the
    driver testdata never hits (the SQL_D2 lesson, ADVICE r1)."""
    from deepseek_ocr_spark import queries as Q

    _, p = short_docs
    sf_dir = p.rsplit("/", 1)[0]  # dir containing documents.parquet
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in Q.d3_minhash_lsh(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    exp = set(con.execute(Q._sql_d3()).fetchall())
    assert got == exp
    assert got, "short-doc corpus must produce pairs"


def test_portable_hash_matches_duckdb(spark):
    """The cross-engine hash primitive itself: identical values on a
    unicode-heavy sample."""
    samples = ["", "hello", "ünïcødé ƒun", "a b c", "ὠ0emoji?", "x" * 500]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r["s"]: r["h"] for r in sdf.select("s", portable_hash(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in samples:
        (h,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 7))::BIGINT", [s]
        ).fetchone()
        assert got[s] == h, s


def test_portable_signatures_column_vs_sql_forms(spark):
    """r3 moved the portable minhash/simhash constructors to SQL-parsed
    strings; the Column forms stay as the readable reference API. This
    pins their equivalence permanently (code-review r3 finding: the
    DuckDB oracle now only exercises the SQL strings)."""
    from deepseek_ocr_spark.operators.dedup import (
        _minhash_signature_portable_sql,
        _portable_shingle_hashes_sql,
        _simhash_portable_sql,
        minhash_signature_portable,
        shingles,
        simhash_portable,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two"),
            (3, "x"),
            (4, "repeat repeat repeat repeat repeat repeat"),
        ],
        "doc_id long, text string",
    )
    col_form = docs.select(
        "doc_id",
        minhash_signature_portable(F.col("text")).alias("mh"),
        simhash_portable(F.col("text")).alias("sh"),
        F.array_distinct(
            F.transform(shingles(F.col("text")), portable_hash)
        ).alias("shg"),
    )
    sql_form = docs.select(
        "doc_id",
        F.expr(_minhash_signature_portable_sql("`text`")).alias("mh"),
        F.expr(_simhash_portable_sql("`text`")).alias("sh"),
        F.expr(_portable_shingle_hashes_sql("`text`")).alias("shg"),
    )
    assert col_form.exceptAll(sql_form).count() == 0
    assert sql_form.exceptAll(col_form).count() == 0


def test_signature_kernels_match_column_forms(spark):
    """r4 moved the k=64-lane signature folds (minhash minima, simhash
    votes) into vectorized numpy kernels (HOF lambdas are interpreted —
    see the dedup.py kernel note). This pins all four kernels bit-exact
    against the Column reference constructors, including NULL text,
    empty string, 1-token, and all-repeat docs."""
    from deepseek_ocr_spark.operators.dedup import (
        _MINHASH_FAST_KERNEL,
        _MINHASH_PORTABLE_KERNEL,
        _PHASH_SQL,
        _SIMHASH_KERNELS,
        _portable_shingle_hashes_sql,
        _tokens_sql,
        minhash_signature,
        minhash_signature_portable,
        shingle_hashes,
        simhash,
        simhash_portable,
        tokens,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two"),
            (3, "x"),
            (4, "repeat repeat repeat repeat repeat repeat"),
            (5, ""),
            (6, None),
            (7, "ünïcødé ƒun tokens here and more of them"),
            # oversize docs: more hashes than one _KERNEL_CHUNK slab
            # (512) — exercises the sub-slab fold path, which must be
            # byte-identical (int64 min/add are associative)
            (8, " ".join(f"tok{i}" for i in range(1500))),
            (9, " ".join(f"w{i % 97}" for i in range(600))),
            # TRAILING empty/NULL docs: a trailing zero-hash segment in
            # a slab group used to steal the previous doc's last hash
            # row via the reduceat offset clamp (silent wrong signature
            # for doc 9; found by the property fuzz)
            (10, ""),
            (11, None),
        ],
        "doc_id long, text string",
    )
    # pack the Column-form simhash bits into chunks the same way the
    # kernel does, so both sides compare on the packed representation
    pack_sql = (
        "CASE WHEN b IS NULL THEN NULL ELSE"
        " transform(sequence(0, 3), c -> aggregate(sequence(0, 15),"
        " CAST(0 AS BIGINT), (s, j) -> s + b[c * 16 + j]"
        " * CAST(pow(2, j) AS BIGINT))) END"
    )
    th_portable = F.expr(
        f"transform({_tokens_sql('`text`')}, t -> {_PHASH_SQL.format(s='t')})"
    )
    th_fast = F.transform(tokens(F.col("text")), lambda t: F.xxhash64(t))
    sh_fast = shingle_hashes(F.col("text"))
    ref = docs.select(
        "doc_id",
        simhash_portable(F.col("text")).alias("sp"),
        simhash(F.col("text")).alias("sf"),
        minhash_signature_portable(F.col("text")).alias("min_p"),
        minhash_signature(F.col("text")).alias("min_f"),
    ).select(
        "doc_id",
        F.expr(pack_sql.replace("b ", "sp ").replace("b[", "sp[")).alias("sim_p"),
        F.expr(pack_sql.replace("b ", "sf ").replace("b[", "sf[")).alias("sim_f"),
        "min_p",
        "min_f",
    )
    got = (
        docs.select(
            "doc_id",
            th_portable.alias("_thp"),
            th_fast.alias("_thf"),
            F.expr(_portable_shingle_hashes_sql("`text`")).alias("_shp"),
            sh_fast.alias("_shf"),
        )
        .select(
            "doc_id",
            _SIMHASH_KERNELS["portable"]("_thp").alias("sim_p"),
            _SIMHASH_KERNELS["fast"]("_thf").alias("sim_f"),
            _MINHASH_PORTABLE_KERNEL("_shp").alias("min_p"),
            _MINHASH_FAST_KERNEL(
                F.transform("_shf", lambda s: F.xxhash64(s)),
                F.transform("_shf", lambda s: F.xxhash64(s, F.lit(1))),
            ).alias("min_f"),
        )
    )
    assert ref.exceptAll(got).count() == 0
    assert got.exceptAll(ref).count() == 0


def test_bucket_tables_kernel_matches_jvm_buckets(spark):
    """The d5 all-tables bucket kernel (numpy cumsum fold) must be
    byte-exact vs hyperplane_bucket for every table block — float math,
    so this is the sequential-rounding contract, not just approx-equal.
    Pins the wrong-width and NULL-embedding raises (the JVM width
    guard's CASE falls through to raise_error on a NULL vector, so the
    kernel must raise there too, not emit NULL)."""
    from pyspark.errors.exceptions.captured import PythonException

    from deepseek_ocr_spark.operators.similarity import (
        _bucket_tables_kernel,
        hyperplane_bucket,
    )

    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-2, 2) for _ in range(64)]) for i in range(300)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kern = _bucket_tables_kernel(8, 4, 64)
    got = vecs.select("vec_id", kern("embedding").alias("bk"))
    ref = vecs.select(
        "vec_id",
        F.array(
            *[hyperplane_bucket("embedding", 8, 64, base=t * 8) for t in range(4)]
        ).alias("bk"),
    )
    g = {r["vec_id"]: r["bk"] for r in got.collect()}
    e = {r["vec_id"]: r["bk"] for r in ref.collect()}
    for i in range(300):
        assert g[i] == e[i], (i, g[i], e[i])
    bad = spark.createDataFrame(
        [(1, [0.5] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(PythonException, match="declared dim"):
        bad.select(kern("embedding")).collect()
    nul = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(PythonException, match="NULL embedding"):
        nul.select(kern("embedding")).collect()


def test_hyperplane_margins_str_vs_column_paths(spark):
    """The str (SQL-parsed) and Column constructions of the hyperplane
    margins must agree bitwise, for both fixed-dim and runtime-sliced
    forms, and the str path must enforce the dim guard too."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from deepseek_ocr_spark.operators.similarity import (
        _dlit,
        hyperplane_margins,
    )

    vecs = spark.createDataFrame(
        [(i, [float((i * 7 + j * 13) % 11) - 5.0 for j in range(16)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    for dim in (16, None):
        a = vecs.select(
            "vec_id",
            hyperplane_margins(F.col("embedding"), 5, dim).alias("m"),
        )
        b = vecs.select(
            "vec_id", hyperplane_margins("embedding", 5, dim).alias("m")
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, dim
    with pytest.raises(SparkRuntimeException, match="declared dim"):
        vecs.select(hyperplane_margins("embedding", 4, dim=8)).collect()
    # non-finite literals must construct and round-trip (code-review r3:
    # repr() would emit unparseable 'nanD'/'infD')
    got = spark.range(1).select(
        _dlit([float("nan"), float("inf"), float("-inf"), 1.5]).alias("a")
    ).collect()[0]["a"]
    assert got[1] == float("inf") and got[2] == float("-inf") and got[3] == 1.5
    assert got[0] != got[0]


def test_x5_degenerate_sql_matches_duckdb(spark):
    """x5 left the registry (folded into x5b) but its oracle SQL is kept
    as the documented degenerate case — keep it executed, not rotting."""
    from deepseek_ocr_spark import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    spark_rows = sorted(
        tuple(r) for r in Q.x5_media_ref_resolution(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    duck_rows = sorted(tuple(r) for r in con.execute(Q.SQL_X5).fetchall())
    assert spark_rows == duck_rows and len(spark_rows) > 0


def test_shingle_and_ngram_folds_match_naive_python(spark):
    """Differential check of the aligned-slices zip_with constructors
    (rule 11 rewrites) against naive Python n-gram builds, over one
    batched Spark job: 200 seeded random texts + edge shapes (empty,
    1/2/3 tokens, all-repeats, unicode, long)."""
    import random

    from deepseek_ocr_spark.operators.dedup import shingles
    from deepseek_ocr_spark.operators.ngram_ban import SEP, ngram_array

    rnd = random.Random(99)
    words = ["a", "bb", "ccc", "züg", "x1", "<td>", "the"]
    texts = [
        "",
        "one",
        "two words",
        "three tok ens",
        "r r r r r r r r",
        " ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 80))),
    ]
    texts += [
        " ".join(rnd.choice(words) for _ in range(rnd.randrange(1, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r["i"]: (r["sh"], r["ng"])
        for r in df.select(
            "i",
            shingles(F.col("text")).alias("sh"),
            ngram_array(F.split(F.col("text"), r"\s+"), 3).alias("ng"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split(" ")  # shingles() lowercases; \s+ split
        # on these fixtures single-space split == \s+ split
        if len(toks) >= 3:
            exp_sh, exp_ng = [], []
            for j in range(len(toks) - 2):
                exp_sh.append(" ".join(toks[j : j + 3]))
                exp_ng.append(SEP.join(t.split(" ")[j : j + 3]))
            seen = set()
            exp_sh = [s for s in exp_sh if not (s in seen or seen.add(s))]
        else:
            exp_sh, exp_ng = [" ".join(toks)], []
        assert got[i][0] == exp_sh, (i, t)
        assert got[i][1] == exp_ng, (i, t)


def test_topk_ranks_on_rounded_value(spark, tmp_path):
    """q_topk_daily_users must rank on the ROUNDED value with id
    tiebreak (CLAUDE.md rule 2): DuckDB's ORDER BY binds to the rounded
    alias, so ranking raw Spark-side diverges when sub-1e-6 raw
    differences straddle the LIMIT boundary in the opposite order of
    event_id (code-review r3 finding). Driver testdata never ties at 6
    decimals, so this plants the tie."""
    import datetime

    from deepseek_ocr_spark import queries as Q

    ts = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(i, 7, "click", 1.0 - i * 0.001, ts) for i in range(90)] + [
        # 30-way tie at round(,6): raw values INCREASE with event_id, so
        # raw-ranking would keep ids 110-119; rounded-ranking keeps 90-99
        (i, 7, "click", 0.5 + (i - 90) * 1e-9, ts)
        for i in range(90, 120)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, value double, ts timestamp",
    )
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    got = [
        tuple(r) for r in Q.q_topk_daily_users(spark, str(tmp_path)).collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{p}/*.parquet'")
    exp = con.execute(Q.SQL_TOPK_DAILY).fetchall()
    assert sorted(map(repr, got)) == sorted(map(repr, exp))
    kept_tied = sorted(r[0] for r in got if r[0] >= 90)
    assert kept_tied == list(range(90, 100)), kept_tied


def test_bucket_probe_str_vs_column_paths(spark):
    """r3 single-expr constructors: bucket and multi-probe lists built
    from ONE SQL parse must agree exactly with the Column-composed
    forms (the ~20x cheaper construction must not change a value)."""
    from pyspark.sql import functions as F

    from deepseek_ocr_spark.operators.similarity import (
        hyperplane_bucket,
        probe_buckets,
    )

    vecs = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 13) % 11) - 5.0 for j in range(16)])
            for i in range(32)
        ],
        "vec_id long, embedding array<float>",
    )
    for dim in (16, None):
        for n_probe in (1, 2, 3):
            a = vecs.select(
                "vec_id",
                hyperplane_bucket(F.col("embedding"), 8, dim, base=8).alias("b"),
                probe_buckets(F.col("embedding"), 8, n_probe, dim, base=8).alias(
                    "pr"
                ),
            )
            b = vecs.select(
                "vec_id",
                hyperplane_bucket("embedding", 8, dim, base=8).alias("b"),
                probe_buckets("embedding", 8, n_probe, dim, base=8).alias("pr"),
            )
            assert a.exceptAll(b).count() == 0, (dim, n_probe)
            assert b.exceptAll(a).count() == 0, (dim, n_probe)
