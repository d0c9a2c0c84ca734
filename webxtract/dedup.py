"""Deduplication operators for web-scale training-data pipelines.

Five strategies, all shuffle-conscious:

- exact:   md5(text) groupBy — one shuffle on the hash, map-side
           partial aggregation for free.
- minhash: word-shingles -> K minhashes (a*h+b mod P permutations over
           a 60-bit md5-derived shingle hash) -> B bands; candidate
           pairs join only inside (band, band_hash) buckets (classic
           MinHash-LSH), so the join is band-bucket-local instead of
           all-pairs.
- simhash: 32-bit sign-of-weighted-bit-sums fingerprint computed in ONE
           aggregate pass (per-token hash once, 32 bit-slots
           accumulated via zip_with) — near-dups = equal fingerprints.
- ngram-jaccard: exact Jaccard over word shingles for candidate pairs,
           with a document-frequency cap on posting lists so a hot
           shingle cannot go quadratic.
- embedding cosine near-dup: see webxtract.similarity.

Ordering contract for the pair generators' default hot-bucket caps: run
EXACT dedup first. A cluster of >cap byte-identical documents (common
boilerplate at crawl scale) saturates its LSH bucket and the default
cap drops it from candidate generation — by design, because all-pairs
inside it is quadratic poison — but exact_dedup collapses identical
texts with a linear hash-groupBy, so after that pass the caps only ever
suppress degenerate NEAR-duplicate clusters, where the boilerplate
argument applies. Callers needing exhaustive pair recall without the
exact-dedup pre-pass opt out with max_bucket_size=None.

Hashing is ENGINE-NEUTRAL *and* JVM-fast: every shingle/token hash is
the low 60 bits of md5 (one native call — Spark
``conv(substr(md5(s),1,15),16,10)``, DuckDB
``('0x' || substr(md5(s),1,15))::BIGINT``), reduced mod P = 2^31-1
where a permutation needs a bounded domain. Round 1 used a
per-character interpreted polynomial hash for oracle-neutrality; it
cost 42 ms/doc (212.7s for 5k docs). md5 keeps the DuckDB oracles exact
without per-character lambdas.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webxtract.exprs import bind_once
from webxtract.textops import FINGERPRINT_MOD, stable_hash60_expr, word_shingles_expr

# (a, b) parameters for the K minhash permutations h_i(x) = (a*x+b) mod P.
# Fixed small primes — deterministic across engines. x < P = 2^31-1 and
# a ~ 10^6 keep a*x+b < 2^52: no 64-bit overflow in either engine.
MINHASH_PARAMS = [
    (1_000_003, 12_345), (999_983, 54_321), (1_000_033, 7_777),
    (1_000_037, 1_234_567), (1_000_039, 999), (1_000_081, 31_337),
    (1_000_099, 8_675_309), (1_000_117, 42), (1_000_121, 2_718_281),
    (1_000_133, 3_141_592), (1_000_151, 1_618_033), (1_000_159, 1_414_213),
]
MINHASH_K = len(MINHASH_PARAMS)
MINHASH_BANDS = 4  # 4 bands x 3 rows

SIMHASH_BITS = 32


def shingle_hashes_expr(text: Column, k: int = 2) -> Column:
    """Distinct word-shingle hashes (bigint array, values in [0, 2^31-1))."""
    return F.array_distinct(
        F.transform(
            word_shingles_expr(text, k),
            lambda s: stable_hash60_expr(s) % FINGERPRINT_MOD,
        )
    )


def minhash_expr(text: Column, k: int = 2) -> Column:
    """Array of MINHASH_K minhash values over word-k-shingles. The
    shingle-hash array is bound once; each permutation is one
    array_min(transform(...)) over it."""
    def _perm(a: int, b: int):
        # NB: pyspark derives lambda arity from the Python signature, so
        # constants must be closed over, never default parameters.
        return lambda h: (h * a + b) % FINGERPRINT_MOD

    return bind_once(
        shingle_hashes_expr(text, k),
        lambda hs: F.array(
            *[
                F.array_min(F.transform(hs, _perm(a, b)))
                for a, b in MINHASH_PARAMS
            ]
        ),
    )


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


def simhash_expr(text: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash: per-token 60-bit hash (low ``bits`` used), one aggregate
    pass accumulating a per-bit +/-1 slot array, sign -> bit.

    Round-1 shape was 32 separate aggregate passes, each re-splitting
    the text and re-hashing every token per character; this is one
    tokenize + one hash per token + one pass."""
    tok_hashes = F.transform(
        F.split(F.trim(text), r"\s+"), lambda t: stable_hash60_expr(t)
    )
    pow2 = F.array(*[F.lit(2 ** b).cast("bigint") for b in range(bits)])
    sums = F.aggregate(
        tok_hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            pow2,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            sums, pow2, lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint"))
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


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


def dedup_incremental(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_col: str = "text_hash",
) -> DataFrame:
    """Cross-run incremental exact dedup — the resumable-curation
    primitive: a periodic crawl increment is deduplicated against the
    fingerprint table committed by all PRIOR runs (anti-join on the
    md5), then keep-first within the increment itself. Returns
    (text_hash, keep_id, dup_count): exactly the rows whose hashes the
    caller appends to the fingerprint table for the next run — dedup
    state is a plain, idempotently-appendable table, never driver or
    executor memory.

    Scale shape: both the anti-join and the keep-first aggregation
    hash-partition on the 128-bit md5; the seen side ships ONLY its
    hash column (Catalyst prunes the rest) and the increment side ships
    (hash, id) pairs — text never shuffles. No broadcast assumption: a
    years-deep fingerprint table is large, so the anti-join is allowed
    to stay a shuffled join (AQE still broadcasts a small seen side)
    instead of OOMing on a forced build."""
    inc = df.select(F.md5(F.col(text_col)).alias(hash_col), F.col(id_col))
    fresh = inc.join(seen.select(hash_col), hash_col, "left_anti")
    return fresh.groupBy(hash_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 2,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (a < b) with exact Jaccard
    verification of band-bucket candidates.

    Scale shape: explode to (band, band_hash) keys -> shuffle on the
    bucket key only -> self-join inside buckets (tiny groups) -> exact
    verify. No all-pairs shuffle; skewed buckets are split by AQE.
    ``max_bucket_size`` (default ON) drops band-buckets holding more
    docs than the cap before the self-join: a bucket that large is a
    boilerplate/near-constant signature cluster, and all-pairs inside
    it is quadratic poison at 10^12 docs. Unbounded generation is the
    explicit opt-in (``max_bucket_size=None``).

    The input is hash-repartitioned on the id first: signature hashing
    is the CPU-heavy stage and must use every core even when the scan
    produced few splits (a filtered slice of one parquet file lands in
    one partition otherwise); at production scale the scan already
    yields thousands of splits and this exchange is a no-op cost-wise
    (it moves raw text once, before any per-candidate amplification).
    """
    df = df.repartition(F.col(id_col))
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes_expr(F.col(text_col), shingle_k).alias("shingles"),
    )
    # Signatures via explode + codegen'd min-aggregation instead of
    # 12 interpreted array passes: each permutation is plain JVM
    # arithmetic inside whole-stage codegen, the groupBy gets map-side
    # partial aggregation for free, and the plan tree stays tiny (the
    # HOF formulation's large tree made Catalyst re-optimization itself
    # a per-query cost).
    posting = sh.select("id", F.explode("shingles").alias("h"))
    P = FINGERPRINT_MOD
    mins = posting.groupBy("id").agg(
        *[
            F.min((F.col("h") * a + b) % P).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_PARAMS)
        ]
    )
    rows_per_band = MINHASH_K // MINHASH_BANDS
    band_cols = []
    for bnd in range(MINHASH_BANDS):
        acc = F.lit(0).cast("bigint")
        for r in range(rows_per_band):
            acc = (acc * 1_000_003 + F.col(f"m{bnd * rows_per_band + r}")) % P
        band_cols.append(acc)
    sigs = mins.select("id", F.array(*band_cols).alias("bands"))

    # candidate generation carries ONLY (id, band, band_hash) through the
    # bucket shuffle — the shingle payloads are joined back after the
    # (a, b) pair set is deduplicated, so the wide arrays cross the wire
    # once per doc, not once per candidate pair.
    buckets = sigs.select(
        "id", F.posexplode("bands").alias("band", "band_hash")
    )
    if max_bucket_size is not None:
        # window count over the self-join's own shuffle key — cap for
        # free (exchange reuse), no extra agg+join branches
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_hash")
        buckets = (
            buckets.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
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


def _band_vals_expr(sh: Column, max_hamming: int, bits: int) -> Column:
    """The ``max_hamming + 1`` bit-bands of a simhash as an array —
    any pair within the hamming budget agrees exactly on at least one
    band (pigeonhole), so equal band values are a 100%-recall candidate
    key. Shared by the batch pair generator and the incremental/
    streaming near-dedup."""
    n_bands = max_hamming + 1
    base = bits // n_bands
    sizes = [base + (1 if i < bits % n_bands else 0) for i in range(n_bands)]
    offs = [sum(sizes[:i]) for i in range(n_bands)]
    return F.array(
        *[
            F.shiftright(sh, offs[i]).bitwiseAND(F.lit((1 << sizes[i]) - 1))
            for i in range(n_bands)
        ]
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """SimHash near-duplicate pairs (a < b, hamming distance <=
    ``max_hamming``) via the standard bit-band trick: split the
    fingerprint into ``max_hamming + 1`` bands — any pair within the
    distance budget must agree EXACTLY on at least one band
    (pigeonhole), so candidates are same-(band, band_value) pairs and
    the exact ``bit_count(xor)`` verify gives 100% recall at the
    threshold.

    Scale shape: the posting rows carry (id, simhash, band, band_value)
    — one bigint of payload, no text — so the bucket shuffle is as
    cheap as the key itself; ``max_bucket_size`` (default ON) drops
    degenerate bands (e.g. the all-zeros band of near-empty documents)
    before the quadratic self-join, same contract as the other pair
    generators."""
    sh = df.select(
        F.col(id_col).alias("id"), simhash_expr(F.col(text_col), bits).alias("sh")
    )
    posting = sh.select(
        "id", "sh",
        F.posexplode(_band_vals_expr(F.col("sh"), max_hamming, bits)).alias(
            "band", "bval"
        ),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "bval")
        posting = (
            posting.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    cand = (
        posting.alias("l")
        .join(
            posting.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bval") == F.col("r.bval"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.sh").alias("sha"),
            F.col("r.sh").alias("shb"),
        )
        .dropDuplicates(["a", "b"])
    )
    hamming = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return cand.select("a", "b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def near_dedup_increment(
    df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Cross-run incremental NEAR-dedup — the hamming<=``max_hamming``
    twin of ``dedup_incremental``: a crawl increment is cleaned against
    the simhash fingerprint table (column ``sh``) committed by all
    prior runs, and near-dups WITHIN the increment are suppressed
    keep-smallest-id — a doc is dropped iff some bucket-mate within the
    hamming budget is a committed fingerprint or a smaller-id increment
    doc. Greedy, so a chain a~b~c with a!~c drops both b and c where
    sequential processing would keep c; documented over-drop, the safe
    direction for train-data hygiene, and increments are small next to
    history. Returns surviving
    (id, simhash) rows — exactly the fingerprints the caller appends
    for the next run. NULL-text docs carry a NULL simhash: they always
    survive (their NULL band values never equi-join) and callers must
    not fingerprint them.

    Scale shape — bucket-local, join-free candidate generation: inc
    and seen postings (band, bval, sh, id?) union into ONE frame — two
    bigints a row, never text — and ONE hash shuffle on (band, bval)
    serves both the window bucket-cap and the groupBy that collects
    each bucket's members (the agg reuses the window's partitioning:
    no second exchange). The hamming verify runs as array HOFs INSIDE
    the bucket — no candidate self-join at all — and only dropped ids
    leave the stage, so the follow-up anti-join against the increment
    ships ids, nothing else. The first candidate-join draft of this
    function re-derived the increment subtree per join (9 scans / 22
    exchanges in the initial plan); this shape scans the increment
    twice (postings + final anti-join) with ~4 exchanges. Per-bucket
    member arrays are bounded by the cap BEFORE collection
    (collect_list skips the NULLed-out over-cap structs), so a
    degenerate band can never materialize an unbounded array; capped
    buckets generate no candidates but their docs still survive via
    the anti-join (same contract as the pair generators, module
    docstring). The seen side is never assumed broadcastable (years of
    fingerprints) and never joins — it only shuffles its postings."""
    from pyspark.sql import Window

    inc = df.select(
        F.col(id_col).alias("id"), simhash_expr(F.col(text_col), bits).alias("sh")
    )
    null_id = F.lit(None).cast(inc.schema["id"].dataType)

    def postings(frame: DataFrame, is_seen: bool) -> DataFrame:
        return frame.select(
            (F.col("id") if not is_seen else null_id).alias("id"),
            "sh",
            F.lit(is_seen).alias("is_seen"),
            F.posexplode(_band_vals_expr(F.col("sh"), max_hamming, bits)).alias(
                "band", "bval"
            ),
        )

    u = postings(inc.filter(F.col("sh").isNotNull()), False).unionByName(
        postings(
            seen.select(F.col("sh")).filter(F.col("sh").isNotNull()).distinct(),
            True,
        )
    )
    member = F.struct("id", "sh", "is_seen")
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bval")
        member = F.when(
            F.count(F.lit(1)).over(w) <= max_bucket_size, member
        )  # otherwise NULL -> collect_list drops it: over-cap buckets go inert
    buckets = (
        u.select("band", "bval", member.alias("m"))
        .groupBy("band", "bval")
        .agg(F.collect_list("m").alias("ms"))
    )
    # a doc is dropped iff some bucket-mate within the hamming budget is
    # a committed fingerprint OR a smaller-id increment doc
    dropped = buckets.select(
        F.explode(
            F.filter(
                F.col("ms"),
                lambda m: ~m["is_seen"]
                & F.exists(
                    F.col("ms"),
                    lambda x: (
                        F.bit_count(x["sh"].bitwiseXOR(m["sh"])) <= max_hamming
                    )
                    & (x["is_seen"] | (x["id"] < m["id"])),
                ),
            )
        ).alias("d")
    ).select(F.col("d.id").alias("id")).distinct()
    return inc.join(dropped, "id", "left_anti").select(
        F.col("id").alias(id_col), F.col("sh").alias("simhash")
    )


def dedup_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over a near-duplicate pair list: (id,
    component) where component is the minimum doc id reachable through
    the pair graph — the standard "cluster near-dups, keep one
    canonical doc per cluster" step after any pair generator.

    Algorithm: iterative min-label propagation with POINTER JUMPING
    over the symmetrized edge list. Each round every vertex takes
    min(own label, neighbors' labels), then additionally follows its
    label's own label (label-of-label self-join) — the standard
    doubling trick, so a chain of diameter d converges in O(log d)
    rounds instead of O(d) (measured: 12 rounds -> 4 on a planted
    diameter-11 chain). Each round is two joins + one aggregation; the
    loop materializes labels per round (localCheckpoint, flat lineage)
    and the convergence flag rides in the same materialized frame. At
    10^12-doc scale the loop holds because labels/edges carry two
    bigints per row.

    Only vertices that appear in ``pairs`` are labeled (singletons are
    their own trivial component and never needed the shuffle)."""
    # materialize once: edges are re-read every round, and the upstream
    # pair generation (LSH explode + self-join) must not re-execute per
    # iteration
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("component")
    )
    for _ in range(max_iterations):
        # neighbor minimum, then min with own label; the convergence
        # flag rides along in the SAME materialized frame so the check
        # is a filter over checkpointed data, not an extra join
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("component").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, "id", "left").select(
            "id",
            F.col("component").alias("__old"),
            F.least(
                F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
            ).alias("c1"),
        )
        # pointer jump: component <- label of my component
        self_map = stepped.select(
            F.col("id").alias("__cid"), F.col("c1").alias("__cc")
        )
        jumped = (
            stepped.join(self_map, stepped.c1 == self_map.__cid, "left")
            .select(
                "id",
                F.least(
                    F.col("c1"), F.coalesce(F.col("__cc"), F.col("c1"))
                ).alias("component"),
                F.col("__old"),
            )
            .select(
                "id",
                "component",
                (F.col("component") < F.col("__old")).alias("__changed"),
            )
            # LAZY checkpoint + a FULL count: the count computes every
            # partition (through the narrow filter), persisting the
            # round's labels, and doCheckpoint then truncates lineage
            # without launching a second job — one job per round where
            # the eager-checkpoint + limit(1).count() form paid two
            # (measured ~0.2-0.3 s of pure scheduling per round at
            # fixture scale).
            .localCheckpoint(eager=False)
        )
        changed = jumped.filter(F.col("__changed")).count()
        labels = jumped.drop("__changed")
        if changed == 0:
            break
    return labels


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Exact n-gram Jaccard between candidate pairs found by sharing at
    least one shingle hash (inverted-index join on shingle, the
    suffix-array-free exact method). Quadratic only within a posting
    list — and posting lists are CAPPED: shingles appearing in more
    than ``max_doc_freq`` documents are dropped from candidate
    generation (a df-cap "stop shingle" rule; such shingles are
    boilerplate and near-dup pairs sharing ONLY them are below any
    useful threshold anyway). Without the cap one hot shingle at
    10^12 docs makes a quadratic posting-list self-join.

    Recall contract of the default cap: a pair whose EVERY shared
    shingle is corpus-common (> max_doc_freq docs) never becomes a
    candidate, even above ``threshold`` — by construction such a pair
    is made of boilerplate. Callers needing exhaustive recall on small
    corpora pass ``max_doc_freq=None`` (the explicit opt-in)."""
    df = df.repartition(F.col(id_col))
    sh = df.select(
        F.col(id_col).alias("id"),
        shingle_hashes_expr(F.col(text_col), shingle_k).alias("shingles"),
    )
    posting = sh.select("id", F.explode("shingles").alias("shingle"))
    if max_doc_freq is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("shingle")
        posting = (
            posting.withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= max_doc_freq)
            .drop("__df")
        )
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


# ------------------------------------------------- substring-level dedup


def chunk_spans_expr(text: Column, boundary_mod: int = 16) -> Column:
    """Content-defined chunking of whitespace tokens:
    ``array<struct<idx:int, n_tok:int, chunk:string>>``.

    A chunk boundary falls AFTER token *i* whenever
    ``stable_hash60(token_i) % boundary_mod == 0`` — boundaries depend
    only on local content, never on position, so a passage duplicated
    across documents (or at a different offset in the same document)
    produces byte-identical interior chunks. This is the
    position-independence trick that lets substring-level dedup (the
    "train-data repeated-passage" problem, Lee et al. 2022's suffix-
    array dedup) run as a hash-groupBy instead of a suffix array:
    fixed-stride windows would misalign across documents, content-
    defined boundaries cannot. Expected chunk length ~= boundary_mod
    tokens; edge chunks of a shared passage differ (documented recall
    loss vs exact maximal-repeat detection).

    Pure expression layer: tokens bound once per row, one md5 per
    token, no UDF, no shuffle.
    """
    from webxtract.exprs import bind_once
    from webxtract.textops import tokens_expr

    def hash60(s: Column) -> Column:
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")

    def build(toks: Column) -> Column:
        # bind_once at every level: HOF expressions are interpreted
        # (CodegenFallback, no CSE), so a subtree referenced inside a
        # lambda re-evaluates at EVERY reference site. Without the
        # inner binding, each element_at(starts/ends, j) re-ran the
        # full per-token md5 boundary filter — O(chunks x tokens)
        # hashes per document (measured 64.9s for the rewrite query at
        # sf0.1; the round-3 shingle lesson verbatim).
        n = F.size(toks)
        bidx = F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: hash60(F.element_at(toks, i)) % boundary_mod == 0,
        )
        bounds = F.struct(
            F.concat(F.array(F.lit(1)), F.transform(bidx, lambda b: b + 1)).alias(
                "s"
            ),
            F.concat(bidx, F.array(n)).alias("e"),
        )
        from webxtract.exprs import bind_once as _bind

        return _bind(
            bounds,
            lambda se: F.transform(
                F.sequence(F.lit(1), F.size(se["s"])),
                lambda j: F.struct(
                    j.cast("int").alias("idx"),
                    (
                        F.element_at(se["e"], j) - F.element_at(se["s"], j) + 1
                    ).cast("int").alias("n_tok"),
                    F.array_join(
                        F.slice(
                            toks,
                            F.element_at(se["s"], j),
                            F.element_at(se["e"], j)
                            - F.element_at(se["s"], j)
                            + 1,
                        ),
                        " ",
                    ).alias("chunk"),
                ),
            ),
        )

    empty = F.array().cast(
        "array<struct<idx:int,n_tok:int,chunk:string>>"
    )
    return F.when(
        F.coalesce(F.trim(text), F.lit("")) == "", empty
    ).otherwise(bind_once(tokens_expr(text), build))


def _py_chunk_spans(text, boundary_mod: int):  # noqa: ANN001, ANN202
    """CPython twin of ``chunk_spans_expr``: [(idx, n_tok, chunk)].
    Identical semantics — space-only trim emptiness guard, Java-ASCII
    \\s tokenization, boundary after token i when md5-60(token_i) %
    boundary_mod == 0, chunks joined by single spaces, 1-based idx."""
    import hashlib
    import re

    t = text or ""
    if t.strip(" ") == "":
        return []
    ws = _py_chunk_spans._ws
    if ws is None:
        ws = _py_chunk_spans._ws = re.compile(r"\s+", re.ASCII)
    toks = ws.split(t.strip(" "))
    n = len(toks)
    starts, ends = [1], []
    for i in range(1, n):
        h = int(
            hashlib.md5(toks[i - 1].encode("utf-8")).hexdigest()[:15], 16
        )
        if h % boundary_mod == 0:
            ends.append(i)
            starts.append(i + 1)
    ends.append(n)
    return [
        (j + 1, e - s + 1, " ".join(toks[s - 1 : e]))
        for j, (s, e) in enumerate(zip(starts, ends))
    ]


_py_chunk_spans._ws = None


def _chunk_meta_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
) -> DataFrame:
    """(id, idx, n_tok, chunk_hash) — the chunk META rows all three
    chunk operators start from, produced by ONE mapInPandas pass
    instead of the HOF chunker + explode + per-chunk md5 expression
    (higher-order lambdas evaluate interpreted — this meta branch was
    25-40 executor-CPU core-s per chunk query at sf1.0, ~2 core-s
    here). Chunk text never leaves the task; only (id, idx, n_tok,
    hash60) rows come back — the same two-bigint-ish shuffle payload
    contract as before."""
    id_field = docs.schema[id_col]

    def _kernel(batches):  # noqa: ANN001, ANN202
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, ntoks, hs = [], [], [], []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                for j, ntok, chunk in _py_chunk_spans(t, boundary_mod):
                    ids.append(rid)
                    idxs.append(j)
                    ntoks.append(ntok)
                    hs.append(
                        int(
                            hashlib.md5(chunk.encode("utf-8")).hexdigest()[
                                :15
                            ],
                            16,
                        )
                    )
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "idx": pd.array(idxs, dtype="int32"),
                    "n_tok": pd.array(ntoks, dtype="int32"),
                    "chunk_hash": pd.array(hs, dtype="int64"),
                }
            )

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", id_field.dataType, True),
            StructField("idx", IntegerType(), True),
            StructField("n_tok", IntegerType(), True),
            StructField("chunk_hash", LongType(), True),
        ]
    )
    return docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(_kernel, schema)


def duplicate_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
    min_dup_tokens: int = 8,
) -> DataFrame:
    """Duplicated-passage candidates: (chunk_hash, n_tok, n_occurrences,
    n_docs) for every content-defined chunk of >= ``min_dup_tokens``
    tokens that occurs more than once corpus-wide. The short-chunk
    floor keeps trivial fragments ("the end") out of the dup set.

    Scale: one explode to (id, idx, n_tok, hash) — the chunk TEXT never
    leaves its partition; the only shuffle carries the 60-bit hash plus
    two ints, with map-side partial aggregation. No pair join anywhere,
    so a million-fold-duplicated boilerplate chunk costs one group, not
    a quadratic bucket."""
    ch = _chunk_meta_frame(docs, id_col, text_col, boundary_mod)
    return (
        ch.filter(F.col("n_tok") >= min_dup_tokens)
        .groupBy("chunk_hash")
        .agg(
            F.first("n_tok").alias("n_tok"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )


def dedup_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
    min_dup_tokens: int = 8,
) -> DataFrame:
    """Substring-level dedup rewrite: every repeated passage keeps its
    FIRST occurrence (global (id, idx) order) and is dropped everywhere
    else; chunks under ``min_dup_tokens`` tokens are never dropped.
    Returns (id, clean_text, n_chunks, n_dropped).

    Plan shape (the 100-TB profile, same discipline as
    remove_boilerplate): two scans of ``docs``. Scan 1 derives
    (id, idx, hash) meta only — full text never shuffles — and a
    window over chunk_hash ranks occurrences; rows ranked >1 become the
    per-document drop lists (tiny: only documents that lose a chunk).
    Scan 2 joins the drop lists back by id (broadcast-eligible,
    unforced — AQE degrades to shuffle join instead of OOM when the
    corpus is pathologically duplicated) and rebuilds the text with a
    pure HOF filter over the same deterministic chunking. The rewrite
    itself is exchange-free."""
    from pyspark.sql.window import Window

    ch = _chunk_meta_frame(docs, id_col, text_col, boundary_mod)
    w = Window.partitionBy("chunk_hash").orderBy("id", "idx")
    drops = (
        ch.filter(F.col("n_tok") >= min_dup_tokens)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("id")
        .agg(F.collect_list("idx").alias("drop_idx"))
    )
    # unforced join, as before: AQE broadcasts the (small) drop list at
    # runtime but degrades to a shuffle join instead of OOMing on a
    # pathologically duplicated corpus
    joined = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias(text_col)
    ).join(drops, "id", "left")
    id_field = docs.schema[id_col]

    def _rebuild(batches):  # noqa: ANN001, ANN202
        import pandas as pd

        for pdf in batches:
            ids, cleans, n_ch, n_dr = [], [], [], []
            for rid, t, drop in zip(
                pdf["id"], pdf[text_col], pdf["drop_idx"]
            ):
                spans = _py_chunk_spans(t, boundary_mod)
                if drop is None or (
                    hasattr(drop, "__len__") and len(drop) == 0
                ):
                    dropset, nd = set(), 0
                else:
                    dropset = {int(x) for x in drop}
                    nd = len(drop)
                cleans.append(
                    " ".join(c for j, _, c in spans if j not in dropset)
                )
                ids.append(rid)
                n_ch.append(len(spans))
                n_dr.append(nd)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "clean_text": cleans,
                    "n_chunks": pd.array(n_ch, dtype="int32"),
                    "n_dropped": pd.array(n_dr, dtype="int32"),
                }
            )

    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", id_field.dataType, True),
            StructField("clean_text", StringType(), True),
            StructField("n_chunks", IntegerType(), True),
            StructField("n_dropped", IntegerType(), True),
        ]
    )
    # the rebuild kernel re-derives the deterministic chunking from the
    # text and filters the drop list — same contract as the HOF
    # rewrite, interpreted-lambda-free; the broadcast hint keeps the
    # drop-list join off the shuffle path exactly as before (drops is
    # bounded by documents-that-lose-a-chunk)
    return joined.select("id", text_col, "drop_idx").mapInPandas(
        _rebuild, schema
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    score: Column | None = None,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Cluster-representative selection — the step every fuzzy-dedup
    pipeline runs after its pair generator: resolve near-dup pairs to
    connected components, then keep exactly ONE member per cluster —
    the highest-`score` document (ties break to the lowest id), the
    "keep best, not first" policy quality-aware pipelines use instead
    of arbitrary keep-first. Documents in no pair are their own
    singleton cluster and always keep themselves.

    Returns (id, component, keep, kept_id): `keep` marks the
    representative and `kept_id` points every dropped member at the doc
    that replaces it (the redirect map for provenance/audit).

    Scale shape: components carry two bigints per row (see
    dedup_components); the representative choice is one window over
    `component` whose rows are (id, score, component) only — `score` is
    computed BEFORE the join so document text never shuffles. Cluster
    sizes are candidate-pair bounded (the upstream generators cap
    bucket fan-out), so the per-component window partition stays small
    by construction."""
    from pyspark.sql import Window

    comp = dedup_components(
        pairs, a_col=a_col, b_col=b_col, max_iterations=max_iterations
    )
    s = score if score is not None else F.length("text")
    base = docs.select(F.col(id_col).alias("id"), s.alias("__score"))
    j = base.join(comp, "id", "left").select(
        "id",
        "__score",
        F.coalesce("component", F.col("id")).alias("component"),
    )
    w = Window.partitionBy("component").orderBy(F.desc("__score"), F.col("id"))
    ranked = j.select(
        "id",
        "component",
        F.row_number().over(w).alias("__rn"),
        F.first("id").over(w).alias("kept_id"),
    )
    return ranked.select(
        "id", "component", (F.col("__rn") == 1).alias("keep"), "kept_id"
    )


def doc_containment(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    boundary_mod: int = 16,
    min_tok: int = 8,
    min_ratio: float = 0.8,
    min_chunks: int = 3,
    max_df: int = 1000,
) -> DataFrame:
    """Asymmetric containment detection: ordered pairs ``(a, b,
    shared_chunks, n_chunks_a, containment)`` where a fraction >=
    ``min_ratio`` of document a's content-defined chunk SET also
    occurs in document b — catching quote-expansion pages, syndicated
    articles wrapped in new boilerplate, and superset re-posts that
    symmetric Jaccard misses (|A∩B|/|A∪B| stays low when B is much
    larger, |A∩B|/|A| does not).

    Chunking: the same content-defined boundaries as dedup_chunks
    (position-independent, so a passage embedded at any offset in b
    hashes identically); only chunks of >= ``min_tok`` tokens count,
    keeping trivial fragments out of both sets. Documents with <
    ``min_chunks`` qualifying chunks produce no a-side row (one edge
    chunk would dominate the ratio).

    Scale shape: chunk TEXT never leaves its partition — ONE kernel
    pass emits each document's DISTINCT qualifying chunk hashes plus
    its set size (within-doc dedup IS the global (id, hash) dedup, and
    the per-doc count is known locally, so neither needs a shuffle).
    The hashes group once by chunk_hash into bounded posting buckets
    — the ``max_df`` cap is exactly the bucket size, so the cap filter
    and the pair generation share that single exchange (the former
    posting SELF-join re-evaluated the chunking subtree per side) —
    and ordered pairs explode per bucket into the (a, b) count
    aggregation. Chunks occurring in > ``max_df`` documents are
    dropped BEFORE any pair exists (default-ON, the LSH bucket-cap
    contract: a boilerplate chunk shared by 10^6 pages must not become
    a 10^12-row bucket join); dropped hot chunks can only LOWER recall
    for pairs that were already near-identical elsewhere, never create
    false pairs.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    id_field = docs.schema[id_col]

    def _kernel(batches):  # noqa: ANN001, ANN202
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, hs, ns = [], [], []
            for rid, t in zip(pdf[id_col], pdf[text_col]):
                seen = set()
                for _j, ntok, chunk in _py_chunk_spans(t, boundary_mod):
                    if ntok >= min_tok:
                        seen.add(
                            int(
                                hashlib.md5(
                                    chunk.encode("utf-8")
                                ).hexdigest()[:15],
                                16,
                            )
                        )
                n = len(seen)
                for h in seen:
                    ids.append(rid)
                    hs.append(h)
                    ns.append(n)
            yield pd.DataFrame(
                {
                    "id": pd.array(ids, dtype="int64"),
                    "chunk_hash": pd.array(hs, dtype="int64"),
                    "n_chunks": pd.array(ns, dtype="int64"),
                }
            )

    schema = StructType(
        [
            StructField("id", id_field.dataType, True),
            StructField("chunk_hash", LongType(), True),
            StructField("n_chunks", LongType(), True),
        ]
    )
    sets = docs.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col)
    ).mapInPandas(_kernel, schema)
    buckets = (
        sets.groupBy("chunk_hash")
        .agg(F.collect_list(F.struct("id", "n_chunks")).alias("m"))
        .filter(F.size("m") <= max_df)
    )
    pairs = (
        buckets.select(F.explode("m").alias("a"), "m")
        .select("a", F.explode("m").alias("b"))
        .filter(F.col("a.id") != F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("a"),
            F.col("a.n_chunks").alias("n_chunks_a"),
            F.col("b.id").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_chunks"))
    )
    ratio = F.col("shared_chunks").cast("double") / F.col(
        "n_chunks_a"
    ).cast("double")
    return (
        pairs.filter(
            (F.col("n_chunks_a") >= min_chunks)
            & (ratio >= F.lit(float(min_ratio)))
        )
        .select(
            "a",
            "b",
            "shared_chunks",
            "n_chunks_a",
            F.round(ratio, 6).alias("containment"),
        )
    )
