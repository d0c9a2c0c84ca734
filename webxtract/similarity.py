"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k against a broadcast query vector
  — the correctness baseline. The dot product is a string-built
  unrolled codegen expression (see dot_sql); top-k is a single
  `orderBy ... limit k` which Spark executes as TakeOrderedAndProject
  (per-partition heaps + driver merge, no full sort, no shuffle of
  the corpus).
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

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column

# Deterministic pseudo-random hyperplanes: plane h, dim i weight =
# ((h*1009 + i*9176) % 2000)/1000 - 1  in [-1, 1).
N_PLANES = 8


def _plane_weight(h: int, i: int) -> float:
    return ((h * 1009 + i * 9176) % 2000) / 1000.0 - 1.0


# Corpus embedding dimensionality (embeddings.parquet; every oracle
# sums range(1, 65)). Fixed-dim lets the dot/norm kernels unroll.
EMBED_DIM = 64


def dot_expr(a: Column, b: Column) -> Column:
    """Generic (variable-length) HOF dot product — kept for arrays of
    unknown dimension. For the fixed-dim corpus embeddings use the
    string-built unrolled kernels below: Spark evaluates zip_with/
    aggregate lambdas INTERPRETED at ~1us/element, which made every
    cosine-bearing operator scan-CPU-bound at volume."""
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


def _elem(sql: str, i: int) -> str:
    # try_element_at: 1-based, NULL (never an ANSI throw) out of range
    return f"CAST(try_element_at({sql}, {i + 1}) AS DOUBLE)"


def dot_sql(a_sql: str, b, dim: int = EMBED_DIM) -> str:
    """In-order float64 dot product as ONE unrolled SQL string —
    codegen arithmetic with a single py4j/parse round trip.

    Three forms were measured at sf0.1 (2k-row brute-force scan):
    HOF lambdas 0.31s warm but interpreted (~1us/element — the wall
    for every operator that evaluates cosines per candidate PAIR);
    Column-object unrolling 1.2-2.4s warm (O(dim) py4j round trips
    per query, and F.get against a literal-array query clones the
    64-literal array into all 64 terms); this string form ~0.3s warm
    AND codegen — the same one-expression-string lesson as _proj_sql.
    Left-to-right + association reproduces the oracle's in-order
    list_sum exactly.

    ``b`` is either a SQL expression string (column form) or a
    list/tuple of floats (broadcast query form — literals are inlined
    via repr, which round-trips float64 exactly)."""
    if isinstance(b, (list, tuple)):
        terms = [
            f"{_elem(a_sql, i)} * CAST({float(b[i])!r} AS DOUBLE)"
            for i in range(dim)
        ]
    else:
        terms = [f"{_elem(a_sql, i)} * {_elem(b, i)}" for i in range(dim)]
    return "(" + " + ".join(terms) + ")"


def norm_sql(a_sql: str, dim: int = EMBED_DIM) -> str:
    return f"sqrt({dot_sql(a_sql, a_sql, dim)})"


def cosine_sql(a_sql: str, b, dim: int = EMBED_DIM) -> str:
    """round(dot/(norm*norm), 6) with the oracle's exact association.
    For a list-valued ``b`` the query norm is inlined as a Python
    float (same in-order float64 sum, exact repr round trip)."""
    if isinstance(b, (list, tuple)):
        qn = math.sqrt(_inorder_sumsq(b))
        nb = f"CAST({qn!r} AS DOUBLE)"
    else:
        nb = norm_sql(b, dim)
    return (
        f"round({dot_sql(a_sql, b, dim)}"
        f" / ({norm_sql(a_sql, dim)} * {nb}), 6)"
    )


def _inorder_sumsq(v) -> float:
    s = 0.0
    for x in v:
        s = s + float(x) * float(x)
    return s


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k; ties broken by id for determinism. The
    cosine is the string-built unrolled kernel (see dot_sql): the
    whole-corpus scan is this operator's cost at 10^12 rows, and the
    unrolled form keeps it inside whole-stage codegen instead of
    interpreted lambda dispatch."""
    return (
        df.select(
            F.col(id_col),
            F.expr(cosine_sql(vec_col, list(query), len(query))).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _proj_sql(vec_sql: str, h: int, dim: int) -> str:
    """Signed projection as ONE SQL expression with the plane weights
    computed ARITHMETICALLY in-plan (same integer formula as
    _plane_weight, and as the DuckDB oracle) instead of literal
    arrays. Two wins at once: building the Column is one py4j call
    instead of dim+1 per plane, and the plan carries ~20 expression
    nodes per plane instead of ``dim`` literal nodes — AQE re-optimizes
    the plan between stages, and tree walks over thousands of literals
    were the dominant cost of the near-dup queries (measured 16.6s
    build + slow replans -> sub-second)."""
    return (
        f"aggregate(zip_with({vec_sql}, sequence(0, {dim - 1}), "
        f"(x, i) -> CAST(x AS DOUBLE) * "
        f"((({h} * 1009 + i * 9176) % 2000) / 1000.0 - 1.0)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def bucket_expr(vec_sql: str, dim: int, n_planes: int = N_PLANES) -> Column:
    """Signed-random-projection bucket id (0..2^n_planes-1).
    ``vec_sql`` is the vector column's SQL name/expression."""
    terms = [
        f"IF({_proj_sql(vec_sql, h, dim)} >= 0, {2 ** h}, 0)"
        for h in range(n_planes)
    ]
    return F.expr(" + ".join(terms))


def lsh_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = N_PLANES,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN top-k: restrict to the query's hyperplane bucket, then exact
    re-rank. Recall < 1 by construction; the scale path for 10^12 rows
    (bucket column is precomputable/persistable as a partition key).

    ``multiprobe=True`` additionally probes every Hamming-distance-1
    bucket (each single plane flipped): vectors near a hyperplane land
    on either side by a hair, so the 1-flip neighborhood recovers most
    of the single-probe recall loss for ~(n_planes+1)x the candidate
    volume — still a 2^n_planes/(n_planes+1) fraction of the corpus,
    and the probe set is a driver-side constant (no extra pass)."""
    dim = len(query)
    qbucket = sum(
        (2 ** h) if sum(_plane_weight(h, i) * query[i] for i in range(dim)) >= 0 else 0
        for h in range(n_planes)
    )
    probes = [qbucket]
    if multiprobe:
        probes += [qbucket ^ (1 << h) for h in range(n_planes)]
    return (
        df.withColumn("bucket", bucket_expr(vec_col, dim, n_planes))
        .filter(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.expr(cosine_sql(vec_col, list(query), dim)).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def band_bucket_expr(
    vec_sql: str, dim: int, band: int, planes_per_band: int
) -> Column:
    """Bucket id for one band: planes band*P .. band*P+P-1 of the shared
    deterministic plane family. ``vec_sql`` is the vector column's SQL
    name/expression (see _proj_sql for why this is string-built)."""
    terms = [
        f"IF({_proj_sql(vec_sql, band * planes_per_band + j, dim)} >= 0, {2 ** j}, 0)"
        for j in range(planes_per_band)
    ]
    return F.expr(" + ".join(terms))


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    planes_per_band: int = 16,
    n_bands: int = 2,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH:
    per band, bucket by a ``planes_per_band``-bit signed-projection
    signature; candidates are pairs sharing ANY band's bucket; exact
    cosine verifies.

    Scale shape (round-6 form): 16 planes/band gives 65,536 buckets
    per band (vs 256), multiple bands restore recall, and
    ``max_bucket_size`` drops degenerate hot buckets outright (a
    bucket holding more vectors than the cap is a near-constant
    region; all-pairs inside it is quadratic poison at 10^12 rows, and
    its pairs are recoverable by raising the cap or adding planes).
    The cap is ON by default — at 10^12 rows hot buckets are a
    certainty, so unbounded generation is the explicit opt-in
    (``max_bucket_size=None``), not the default.

    Both the banding and the within-bucket verification run as
    vectorized NumPy kernels (the semantic_dedup_pairs lesson: the
    round-5 JVM form evaluated the 64-term unrolled cosine inside a
    self-join — past HotSpot's 8 KB JIT cap, hence interpreted — and
    the signed projections as interpreted HOF lambdas, ~2 ms/row at
    production width). Kernel A computes each vector's ``n_bands``
    bucket ids (in-order float64 projections, exactly the oracle's
    association) and emits one (band, bucket, id, v) row per band —
    the vector ships n_bands times instead of being re-joined twice
    after pair dedup, a deliberate trade: both designs move O(n_bands
    x corpus) vector bytes once, this one without two join stages and
    a candidate shuffle. Kernel B receives one bucket's rows, applies
    the cap, generates a<b pairs and verifies exact cosine (in-order
    dot, Decimal HALF_UP round inside a 0.5e-6 threshold margin);
    survivors dedup on (a, b) across bands — band-identical values,
    so the kept row is well-defined."""
    planes = [
        [
            _plane_weight(band * planes_per_band + j, i)
            for i in range(dim)
        ]
        for band in range(n_bands)
        for j in range(planes_per_band)
    ]
    thr = float(threshold)
    cap = max_bucket_size

    def _bucketize(batches):  # noqa: ANN001, ANN202
        import numpy as np
        import pandas as pd

        W = np.asarray(planes, dtype=np.float64)  # (n_bands*P, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # in-order projection per plane: acc over dims, vectorized
            # across rows (same left-to-right association as _proj_sql)
            out_band, out_bucket, out_id, out_v = [], [], [], []
            for band in range(n_bands):
                bucket = np.zeros(len(V), dtype=np.int64)
                for j in range(planes_per_band):
                    w = W[band * planes_per_band + j]
                    acc = V[:, 0] * w[0]
                    for i in range(1, dim):
                        acc = acc + V[:, i] * w[i]
                    bucket += (acc >= 0).astype(np.int64) << j
                out_band.append(np.full(len(V), band, dtype=np.int32))
                out_bucket.append(bucket)
                out_id.append(ids)
                out_v.append(pdf[vec_col].to_numpy())
            yield pd.DataFrame(
                {
                    "band": np.concatenate(out_band),
                    "bucket": np.concatenate(out_bucket),
                    "id": np.concatenate(out_id),
                    "v": np.concatenate(out_v),
                }
            )

    def _bucket_pairs(pdf):  # noqa: ANN001, ANN202
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2 or (cap is not None and n > cap):
            return empty
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        acc = V[:, 0] * V[:, 0]
        for i in range(1, dim):
            acc = acc + V[:, i] * V[:, i]
        nrm = np.sqrt(acc)
        iu, ju = np.triu_indices(n, 1)
        A, B = V[iu], V[ju]
        d = A[:, 0] * B[:, 0]
        for i in range(1, dim):
            d = d + A[:, i] * B[:, i]
        cos = d / (nrm[iu] * nrm[ju])
        m = cos >= thr - 5.000001e-7
        if not m.any():
            return empty
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        out_a, out_b, out_c = [], [], []
        for pa, pb, c in zip(ids[iu[m]], ids[ju[m]], cos[m]):
            r = float(Decimal(repr(float(c))).quantize(q6, ROUND_HALF_UP))
            if r >= thr:
                out_a.append(int(pa))
                out_b.append(int(pb))
                out_c.append(r)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.asarray(out_a, dtype=np.int64),
                "b": np.asarray(out_b, dtype=np.int64),
                "cosine": np.asarray(out_c, dtype=np.float64),
            }
        )

    vec_type = df.schema[vec_col].dataType.simpleString()
    posting = df.select(
        F.col(id_col).alias(id_col), F.col(vec_col).alias(vec_col)
    ).mapInPandas(
        _bucketize,
        f"band int, bucket long, id long, v {vec_type}",
    )
    return (
        posting.groupBy("band", "bucket")
        .applyInPandas(_bucket_pairs, "a long, b long, cosine double")
        .dropDuplicates(["a", "b"])
    )


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """One Lloyd assignment step — the embedding-clustering primitive
    behind semantic-dedup / SemDeDup-style curation (cluster the
    corpus, then prune within clusters): assign every vector to its
    nearest centroid by squared L2, ties to the lower centroid index.
    Returns (id, cluster, dist2) with dist2 rounded to 6 dp (the same
    float64-stability contract as cosine_expr's oracle).

    Scale shape: centroids ship as ONE array<array<double>> literal
    (a single py4j Literal, not k*dim Column objects — the round-3
    plane-weight lesson), so assignment is a pure narrow projection:
    no join, no shuffle, no Python; 10^12 vectors cost one map pass.
    The argmin is array_min over (dist2, index) structs — struct
    ordering gives lowest-distance-then-lowest-index exactly. The k
    seed vectors are fetched by the CALLER (a k-row collect, the same
    class as the 1-row query-vector fetch); full Lloyd iterations
    would alternate this map pass with a (cluster, dim)-keyed mean —
    the driver never touches corpus rows."""
    best = assign_expr(F.col(vec_col), centroids)
    return df.select(
        F.col(id_col),
        best["cluster"].alias("cluster"),
        best["dist2"].alias("dist2"),
    )


def assign_expr(v: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid struct (dist2, cluster) for one vector column —
    the kernel of kmeans_assign / kmeans_update. See kmeans_assign for
    the determinism and literal-shipping contract. Kept in the HOF
    literal form deliberately: at k=8 it benches 1.1s warm at sf0.1 —
    a string-built unrolled variant (8*64*2 inline literals) was
    measured SLOWER (kmeans_update 4-5.8s), because here the tree
    feeds a generator rewrite that re-walks it; the unrolled kernels
    win only where expressions are evaluated per candidate PAIR or
    cloned into join-side filters (see dot_sql / assign_clusters,
    which is also the form to use for k beyond ~16)."""
    cent = F.lit([[float(x) for x in c] for c in centroids])
    scored = F.transform(
        cent,
        lambda c, j: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(
                        v, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
                    ),
                    F.lit(0.0),
                    lambda acc, d: acc + d,
                ),
                6,
            ).alias("dist2"),
            j.cast("long").alias("cluster"),
        ),
    )
    return F.array_min(scored)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Broadcast-join form of nearest-centroid assignment — same
    (round-6dp dist2, lowest-cluster-wins) contract as assign_expr,
    different physical shape: centroids become a k-row broadcast
    DataFrame, each vector meets all k via BroadcastNestedLoopJoin,
    and min(struct(dist2, cid)) per id picks the winner with map-side
    partial aggregation (the k candidate rows for an id are produced
    consecutively in one task, so the combine collapses them BEFORE
    the shuffle — the exchange ships one (id, vector, cluster) row
    per document, not k).

    Why not assign_expr here: the literal form inlines a k*dim
    constant into the expression tree, and any operator that makes
    the optimizer COPY that tree (a self-join's inferred isnotnull
    pushdown, as in semantic_dedup_pairs) multiplies a megabyte-scale
    plan — at k=64 the plan alone cost more than the data pass
    (measured: 15-30s warm at 2.2k rows vs <1s in this form). The
    join form is also the only one that survives k in the thousands,
    the regime SemDeDup actually runs at (k ~ N/target).

    The distance itself is an UNROLLED left-to-right sum of
    (v[i]-cv[i])^2 terms — plain codegen arithmetic, not a zip_with/
    aggregate HOF: Spark evaluates higher-order-function lambdas
    interpreted (~1us per element), which at k*dim*N elements was the
    measured bottleneck (9M lambda evals ~ 10 core-s at sf0.1), and
    the assignment projection runs at INPUT parallelism, before any
    shuffle can widen it. Unrolling is possible precisely because the
    join form makes cv a column: the term count is dim, independent
    of k. Left-to-right association reproduces the oracle's in-order
    1..dim float64 summation exactly.

    Returns (id, v, cluster)."""
    spark = df.sparkSession
    dim = len(centroids[0])
    cent = spark.createDataFrame(
        [(j, [float(x) for x in c]) for j, c in enumerate(centroids)],
        "cid bigint, cv array<double>",
    )
    diffs = [f"({_elem('v', i)} - {_elem('cv', i)})" for i in range(dim)]
    d2 = F.expr(
        "round(" + " + ".join(f"{d} * {d}" for d in diffs) + ", 6)"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(cent))
        .select(
            "id",
            "v",
            F.struct(d2.alias("dist2"), F.col("cid").alias("cluster")).alias(
                "__s"
            ),
        )
        .groupBy("id")
        .agg(
            F.any_value("v").alias("v"),
            F.min("__s").getField("cluster").alias("cluster"),
        )
    )


def kmeans_update(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The other half of a Lloyd iteration: per-cluster member count
    and the recomputed mean centroid (each dimension rounded 6 dp).
    Returns (cluster, n_members, centroid: array<double>); empty
    clusters simply emit no row (the caller re-seeds or drops them).

    Scale shape: assignment is the narrow assign_expr pass; the mean
    is a posexplode to (cluster, dim, value) followed by a
    groupBy(cluster, dim) average — k*dim groups total (e.g. 8*64 =
    512), so partial aggregation collapses every partition to <= k*dim
    rows before a tiny shuffle, then a second k-group reduce
    reassembles the arrays with sort_array over (dim, mean) structs.
    The driver never sees a corpus row; a full k-means run is this op
    + a k-row collect per iteration. Cross-engine float contract: the
    per-dimension mean is a float64 group sum (order-free after the
    6 dp round; members-per-cluster sums are exact integers)."""
    # two projections: mixing the struct-field access with a generator
    # in ONE select loses the lambda-struct's field names (Spark 4
    # renames them col1/col2 during the generator rewrite)
    a = df.select(
        assign_expr(F.col(vec_col), centroids)["cluster"].alias("cluster"),
        F.col(vec_col).alias("__v"),
    ).select("cluster", F.posexplode("__v").alias("dim", "val"))
    per_dim = a.groupBy("cluster", "dim").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("m"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        per_dim.groupBy("cluster")
        .agg(
            F.max("n").cast("long").alias("n_members"),
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("__s"),
        )
        .select(
            "cluster",
            "n_members",
            F.transform(F.col("__s"), lambda s: s["m"]).alias("centroid"),
        )
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: k-means clusters
    as the blocking key, exact cosine only WITHIN a cluster, pairs with
    cosine >= threshold (a < b, cosine rounded 6 dp). Clustering turns
    the O(N^2) all-pairs cosine into O(sum |c|^2): at 10^12 documents
    the operator is run with k ~ N/target so each cluster holds ~1-10k
    vectors and the per-cluster quadratic runs inside one task; the
    shuffle ships each (cluster, id, vector) row exactly once.

    Assignment (round 6) runs in the SAME kernel family as the pair
    stage: a mapInPandas pass computes each vector's nearest centroid
    in NumPy — in-order float64 squared-L2 per (row, centroid), exact
    only-where-it-can-matter rounding (entries within 1.5e-6 of the
    row minimum get the Decimal HALF_UP 6 dp round and the
    (dist2, cluster) lexicographic tie-break; a gap above 1e-6 cannot
    be reordered by two sub-0.5e-6 rounds). This replaces the
    broadcast-nested-loop join + groupBy(id) argmin, whose unrolled
    128-term distance evaluated interpreted (HotSpot 8 KB JIT cap,
    ~19 CPU core-s at sf1.0) and whose argmin exchange shipped every
    vector once more. assign_clusters (the JVM broadcast-join form)
    remains for callers at k beyond literal-table sizes.

    The pair stage is a per-cluster vectorized NumPy kernel
    (applyInPandas), not a JVM self-join. The round-5 self-join form
    evaluated one 64-term unrolled dot per candidate PAIR inside the
    SortMergeJoin condition; the generated method for that expression
    exceeds HotSpot's 8 KB JIT bytecode cap (DontCompileHugeMethods),
    so every pair ran in the bytecode interpreter at ~15 us/pair —
    measured 1000 CPU core-s / 238 s wall on 6.4M candidates at sf1.0
    (vs 24 s with codegen forced off via hugeMethodLimit, vs ~3 s
    here). NumPy does the same arithmetic two orders of magnitude
    faster, and only N rows cross the Python boundary — pairs are
    generated and filtered inside the worker, survivors only come
    back.

    Float contract (bit-exact vs the DuckDB oracle): the dot and the
    norms accumulate in float64 left-to-right over dimensions — the
    kernel loops over dims, vectorized ACROSS pairs, so each pair's
    sum has exactly the oracle's in-order association; cosine =
    dot / (na * nb); rounding reproduces Spark's round() (BigDecimal
    HALF_UP over the shortest-repr decimal) via Decimal(repr(x)) on
    the few pairs inside the 0.5e-6 margin of the threshold — below
    the margin a raw cosine cannot round up to the threshold, so the
    cheap vectorized comparison disposes of everything else."""
    dim = len(centroids[0])
    cents = [[float(x) for x in c] for c in centroids]
    thr = float(threshold)

    def _assign(batches):  # noqa: ANN001, ANN202
        from decimal import ROUND_HALF_UP, Decimal

        import numpy as np
        import pandas as pd

        C = np.asarray(cents, dtype=np.float64)  # (k, dim)
        k = len(C)
        q6 = Decimal("0.000001")

        def r6(x: float) -> float:
            return float(Decimal(repr(x)).quantize(q6, ROUND_HALF_UP))

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = len(V)
            D = np.empty((n, k), dtype=np.float64)
            for j in range(k):
                diff0 = V[:, 0] - C[j, 0]
                acc = diff0 * diff0
                for i in range(1, dim):
                    d = V[:, i] - C[j, i]
                    acc = acc + d * d
                D[:, j] = acc
            raw_min = D.min(axis=1)
            clusters = np.empty(n, dtype=np.int64)
            for r in range(n):
                cand = np.nonzero(D[r] - raw_min[r] < 1.5e-6)[0]
                if len(cand) == 1:
                    clusters[r] = cand[0]
                else:
                    best = min((r6(float(D[r, j])), int(j)) for j in cand)
                    clusters[r] = best[1]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "v": pdf[vec_col].to_numpy(),
                    "cluster": clusters,
                }
            )

    vec_type = df.schema[vec_col].dataType.simpleString()
    a = df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _assign, f"id long, v {vec_type}, cluster long"
    )

    def _cluster_pairs(pdf):  # noqa: ANN001, ANN202
        import numpy as np
        import pandas as pd

        n = len(pdf)
        empty = pd.DataFrame(
            {
                "a": pd.Series(dtype="int64"),
                "b": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        V = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        # in-order sum of squares per row (vectorized across rows)
        acc = V[:, 0] * V[:, 0]
        for i in range(1, dim):
            acc = acc + V[:, i] * V[:, i]
        nrm = np.sqrt(acc)
        out_a, out_b, out_c = [], [], []
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("0.000001")
        # chunk the upper-triangle pair set so peak memory stays
        # ~2 * chunk * dim * 8B per task regardless of cluster size
        chunk = 200_000
        iu, ju = np.triu_indices(n, 1)
        for s in range(0, len(iu), chunk):
            ci, cj = iu[s : s + chunk], ju[s : s + chunk]
            A, B = V[ci], V[cj]
            d = A[:, 0] * B[:, 0]
            for i in range(1, dim):
                d = d + A[:, i] * B[:, i]
            cos = d / (nrm[ci] * nrm[cj])
            # margin: raw below thr - 0.5e-6 cannot round up to thr
            m = cos >= thr - 5.000001e-7
            if not m.any():
                continue
            for pa, pb, c in zip(ids[ci[m]], ids[cj[m]], cos[m]):
                r = float(
                    Decimal(repr(float(c))).quantize(q6, ROUND_HALF_UP)
                )
                if r >= thr:
                    out_a.append(int(pa))
                    out_b.append(int(pb))
                    out_c.append(r)
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "a": np.asarray(out_a, dtype=np.int64),
                "b": np.asarray(out_b, dtype=np.int64),
                "cosine": np.asarray(out_c, dtype=np.float64),
            }
        )

    return (
        a.select("cluster", "id", "v")
        .groupBy("cluster")
        .applyInPandas(_cluster_pairs, "a long, b long, cosine double")
    )
