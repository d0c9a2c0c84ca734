"""Deduplication operators for web-scale training-data pipelines.

Five strategies, all shuffle-conscious:

- exact:   md5(text) groupBy — one shuffle on the hash, map-side
           partial aggregation for free.
- minhash: word-shingles -> K polynomial-hash minhashes -> B bands;
           candidate pairs join only inside (band, band_hash) buckets
           (classic MinHash-LSH), so the join is band-bucket-local
           instead of all-pairs.
- simhash: 32-bit sign-of-weighted-bit-sums fingerprint; near-dups =
           equal fingerprints (or equal on rotated bands for 1-2 bit
           tolerance).
- ngram-jaccard: exact Jaccard over word shingles for candidate pairs.
- embedding cosine near-dup: see webxtract.similarity.

All hash functions are engine-neutral polynomial hashes (h*31+cp mod
2^31-1) so DuckDB oracles can reproduce results bit-for-bit — no
xxhash64/murmur dependence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webxtract.textops import FINGERPRINT_MOD, fingerprint_expr, word_shingles_expr

# (a, b) parameters for the K minhash permutations h_i(x) = (a*x+b) mod P.
# Fixed small primes — deterministic across engines.
MINHASH_PARAMS = [
    (1_000_003, 12_345), (999_983, 54_321), (1_000_033, 7_777),
    (1_000_037, 1_234_567), (1_000_039, 999), (1_000_081, 31_337),
    (1_000_099, 8_675_309), (1_000_117, 42), (1_000_121, 2_718_281),
    (1_000_133, 3_141_592), (1_000_151, 1_618_033), (1_000_159, 1_414_213),
]
MINHASH_K = len(MINHASH_PARAMS)
MINHASH_BANDS = 4  # 4 bands x 3 rows


def shingle_hashes_expr(text: Column, k: int = 2) -> Column:
    """Distinct word-shingle polynomial hashes (bigint array)."""
    return F.array_distinct(
        F.transform(word_shingles_expr(text, k), fingerprint_expr_str)
    )


def fingerprint_expr_str(s: Column) -> Column:
    """Polynomial hash of one string value (same recurrence as
    textops.fingerprint_expr, applied inside a transform lambda)."""
    chars = F.split(s, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % FINGERPRINT_MOD,
    )


def _perm(a: int, b: int):
    return lambda h: (h * a + b) % FINGERPRINT_MOD


def minhash_expr(text: Column, k: int = 2) -> Column:
    """Array of MINHASH_K minhash values over word-k-shingles."""
    hashes = shingle_hashes_expr(text, k)
    sigs = [
        F.array_min(F.transform(hashes, _perm(a, b))) for a, b in MINHASH_PARAMS
    ]
    return F.array(*sigs)


def band_hashes_expr(minhashes: Column) -> Column:
    """Combine each band's rows into one bucket key."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    bands = []
    for b in range(MINHASH_BANDS):
        acc = F.lit(0).cast("bigint")
        for r in range(rows_per_band):
            acc = (acc * 1_000_003 + F.element_at(minhashes, b * rows_per_band + r + 1)) % FINGERPRINT_MOD
        bands.append(acc)
    return F.array(*bands)


def simhash_expr(text: Column, bits: int = 32) -> Column:
    """SimHash: per token hash, sum +-1 per bit position, sign -> bit."""
    tok_hashes = F.transform(
        F.split(F.trim(text), r"\s+"), fingerprint_expr_str
    )
    def _bit_merge(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(bits):
        s = F.aggregate(tok_hashes, F.lit(0).cast("bigint"), _bit_merge(b))
        bit_cols.append(
            F.when(s > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: md5(text) -> (keep lowest id, dup count).
    Single shuffle on the 128-bit hash (never on the text payload)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 2,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (a < b) with exact Jaccard
    verification of band-bucket candidates.

    Scale shape: explode to (band, band_hash) keys -> shuffle on the
    bucket key only -> self-join inside buckets (tiny groups) -> exact
    verify. No all-pairs shuffle; skewed buckets are split by AQE.
    """
    sigs = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes_expr(F.col(text_col), shingle_k).alias("shingles"),
        minhash_expr(F.col(text_col), shingle_k).alias("mh"),
    ).withColumn("bands", band_hashes_expr(F.col("mh")))

    # candidate generation carries ONLY (id, band, band_hash) through the
    # bucket shuffle — the shingle payloads are joined back after the
    # (a, b) pair set is deduplicated, so the wide arrays cross the wire
    # once per doc, not once per candidate pair.
    buckets = sigs.select(
        "id", F.posexplode("bands").alias("band", "band_hash")
    )
    cand = (
        buckets.alias("l")
        .join(
            buckets.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    sh = sigs.select("id", "shingles")
    joined = (
        cand.join(sh.withColumnRenamed("id", "a").withColumnRenamed("shingles", "sa"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("shingles", "sb"), "b")
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return (
        joined.select(
            "a",
            "b",
            F.round(inter / union.cast("double"), 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact-simhash duplicate groups (hamming distance 0): one shuffle
    on the 32-bit fingerprint."""
    return (
        df.select(simhash_expr(F.col(text_col)).alias("simhash"), F.col(id_col))
        .groupBy("simhash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard between candidate pairs found by sharing at
    least one shingle hash (inverted-index join on shingle, the
    suffix-array-free exact method). Quadratic only within a posting
    list, never globally."""
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes_expr(F.col(text_col), shingle_k).alias("shingles"),
    )
    posting = sh.select("id", F.explode("shingles").alias("shingle"))
    cand = (
        posting.alias("l")
        .join(
            posting.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    joined = (
        cand.join(sh.withColumnRenamed("id", "a").withColumnRenamed("shingles", "sa"), "a")
        .join(sh.withColumnRenamed("id", "b").withColumnRenamed("shingles", "sb"), "b")
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size(F.col("sa")) + F.size(F.col("sb")) - inter
    return joined.select(
        "a", "b", F.round(inter / union.cast("double"), 6).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
