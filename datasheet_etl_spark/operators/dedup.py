"""Deduplication operators for large-scale corpus curation.

Five families, all engineered for the 100 TB design point:

- **exact**      : hash-groupBy on a business key — one shuffle, the
                   canonical representative chosen deterministically.
- **MinHash+LSH**: shingle → signature → banded buckets → candidate
                   pairs → exact-Jaccard verify. The signature is
                   computed entirely JVM-side (xxhash64 + affine
                   permutations inside array HOFs — no UDFs), so the
                   expensive full-corpus pass stays in codegen; only
                   bucket-mates are ever pair-compared (no N² join).
- **SimHash**    : 64-bit fingerprint via per-bit majority vote;
                   near-dup pairs from 16-bit chunk banding + bit_count
                   Hamming verify.
- **n-gram Jaccard**: exact similarity on word-bigram shingle sets —
                   the verification predicate for both hash families.
- **embedding cosine**: near-dup by cosine over an embedding column;
                   brute probe×corpus for small probe sets, random-
                   hyperplane LSH buckets as the all-pairs scale path.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datasheet_etl_spark.operators.relational import top_k_per_group

MERSENNE_PRIME = (1 << 31) - 1


def word_shingles(tokens: Column, n: int = 2) -> Column:
    """Word n-gram shingles from a token array (JVM-side: sequence +
    transform); n=1 degenerates to the token set."""
    if n == 1:
        return F.array_distinct(tokens)
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(tokens, i + 1, n), " ")
    )
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _permutations(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MERSENNE_PRIME), rng.randrange(0, MERSENNE_PRIME))
        for _ in range(num_perm)
    ]


def minhash_signature(shingles: Column, num_perm: int = 64, seed: int = 42) -> Column:
    """MinHash signature as array<long>, no UDFs.

    Each shingle hashes once (xxhash64 → pmod p); each permutation is an
    affine map a·x+b mod p (p Mersenne 2³¹−1, products stay < 2⁶², so no
    ANSI overflow); the signature component is the min over shingles.
    Empty shingle sets get the max value (matches nothing).
    """
    perms = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in _permutations(num_perm, seed)
        ]
    )
    base = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_PRIME)))
    sig = F.transform(
        perms,
        lambda p: F.coalesce(
            F.array_min(
                F.transform(base, lambda x: F.pmod(p["a"] * x + p["b"], F.lit(MERSENNE_PRIME)))
            ),
            F.lit(MERSENNE_PRIME),
        ),
    )
    return sig


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str,
    bands: int = 8,
) -> DataFrame:
    """Banded LSH: split the signature into ``bands`` equal slices, hash
    each band to a bucket, self-join within buckets.

    Scale: the self-join shuffles on (band, bucket) — only documents
    agreeing on a full band ever meet, so the join output is ~linear in
    the number of true near-dups, not N².
    """
    sig_len_df = df.select(F.size(sig_col).alias("n")).limit(1).collect()
    rows_per_band = (sig_len_df[0]["n"] if sig_len_df else 0) // bands or 1
    banded = df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band), b
                ),
            )
        ).alias("band", "bucket"),
    )
    left = banded.withColumnRenamed(id_col, "id_a")
    right = banded.withColumnRenamed(id_col, "id_b")
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 8,
    threshold: float = 0.5,
    shingle_n: int = 2,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates from banding,
    verified with *exact* shingle-set Jaccard ≥ threshold.

    Returns (id_a, id_b, est_jaccard, jaccard) — est from signature
    agreement, exact from the shingle sets.
    """
    from datasheet_etl_spark.functions import tokens

    sh = docs.select(
        F.col(id_col),
        word_shingles(tokens(F.col(text_col)), shingle_n).alias("sh"),
    )
    sigs = sh.select(id_col, "sh", minhash_signature(F.col("sh"), num_perm).alias("sig"))
    cands = lsh_candidate_pairs(sigs, id_col, "sig", bands)

    a = sigs.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), F.col("sig").alias("sig_a")
    )
    b = sigs.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), F.col("sig").alias("sig_b")
    )
    joined = cands.join(a, "id_a").join(b, "id_b")
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    ) / F.size("sig_a")
    jac = F.when(
        F.size(F.array_union("sh_a", "sh_b")) > 0,
        F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b")),
    ).otherwise(F.lit(0.0))
    return (
        joined.select(
            "id_a",
            "id_b",
            F.round(est, 6).alias("est_jaccard"),
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy("id_a", "id_b")
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash, pure expression: per-bit majority vote over token
    hashes, reassembled with shifts. Stays in codegen — the full-corpus
    fingerprint pass never leaves the JVM."""
    hashes = F.transform(tokens_col, lambda t: F.xxhash64(t))
    # Unroll the 64 bits with literal masks (bit test = h & mask ≠ 0 —
    # shift functions don't accept lambda variables through py4j); each
    # vote is one aggregate HOF over the token hashes.
    def _vote(mask: int) -> Column:
        # separate factory: a default-arg lambda would read as 3-ary to
        # PySpark's HOF arity detection
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1),
        )

    fingerprint = F.lit(0).cast("long")
    for j in range(64):
        mask = (1 << j) if j < 63 else -(1 << 63)  # signed-long bit 63
        fingerprint = fingerprint.bitwiseOR(
            F.when(_vote(mask) > 0, F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fingerprint


def simhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: 4×16-bit chunk banding (any exact chunk
    match → candidate; guarantees recall for Hamming ≤ 3 and catches most
    ≤ 8), verified with bit_count(xor) ≤ max_hamming."""
    from datasheet_etl_spark.functions import tokens

    fps = docs.select(F.col(id_col), simhash64(tokens(F.col(text_col))).alias("fp"))
    chunks = fps.select(
        id_col,
        "fp",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("fp"), c * 16).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col("fp").alias("fp_a"), "chunk_idx", "chunk"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col("fp").alias("fp_b"), "chunk_idx", "chunk"
    )
    cands = (
        a.join(b, ["chunk_idx", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cands.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def exact_dedup(
    df: DataFrame, key_cols: list[str], order_col: str, keep: str = "min"
) -> DataFrame:
    """Exact dedup with a deterministic winner (W5 top-1 shape): one
    shuffle on the key, first/last by ``order_col``."""
    order = [F.col(order_col).asc() if keep == "min" else F.col(order_col).desc()]
    return top_k_per_group(df, key_cols, order, k=1)
