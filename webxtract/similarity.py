"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a broadcast query vector
  — the correctness baseline. The dot product is a zip_with +
  aggregate (JVM-side); top-k is a single `orderBy ... limit k`
  which Spark executes as TakeOrderedAndProject (per-partition heaps +
  driver merge, no full sort, no shuffle of the corpus).
- lsh_topk: random-hyperplane (signed-projection) bucketing — the scale
  path: candidates only from the query's bucket (and optional
  neighboring probes), then exact re-rank. At 10^12 vectors the
  bucket join touches ~1/2^H of the data.
- near_dup_pairs: embedding-cosine near-duplicate pairs via the same
  hyperplane buckets.

Vectors are cast float->double before arithmetic so results (and the
DuckDB oracle, which computes in float64 over the same float32 inputs,
same summation order) agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

# Deterministic pseudo-random hyperplanes: plane h, dim i weight =
# ((h*1009 + i*9176) % 2000)/1000 - 1  in [-1, 1).
N_PLANES = 8


def _plane_weight(h: int, i: int) -> float:
    return ((h * 1009 + i * 9176) % 2000) / 1000.0 - 1.0


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k; ties broken by id for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def bucket_expr(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Signed-random-projection bucket id (0..2^n_planes-1)."""
    out = F.lit(0)
    for h in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(_plane_weight(h, i)) for i in range(dim)]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj >= 0, F.lit(2 ** h)).otherwise(F.lit(0))
    return out


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN top-k: restrict to the query's hyperplane bucket, then exact
    re-rank. Recall < 1 by construction; the scale path for 10^12 rows
    (bucket column is precomputable/persistable as a partition key)."""
    dim = len(query)
    qbucket = sum(
        (2 ** h) if sum(_plane_weight(h, i) * query[i] for i in range(dim)) >= 0 else 0
        for h in range(n_planes)
    )
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.withColumn("bucket", bucket_expr(F.col(vec_col), dim, n_planes))
        .filter(F.col("bucket") == qbucket)
        .select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by hyperplane
    signature, all-pairs only inside buckets, exact cosine verify."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        bucket_expr(F.col(vec_col), dim, n_planes).alias("bucket"),
    )
    pairs = (
        b.alias("l")
        .join(
            b.alias("r"),
            (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.round(cosine_expr(F.col("l.v"), F.col("r.v")), 6).alias("cosine"),
        )
    )
    return pairs.filter(F.col("cosine") >= threshold)
