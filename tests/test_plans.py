"""Physical-plan audits: the properties that make these operators hold
at 100 TB are asserted on the plan itself, so a refactor that silently
adds a shuffle, drops predicate pushdown, or flips a broadcast join to
a sort-merge join fails CI — not a cluster bill.

(The extraction stage's zero-shuffle guarantee is asserted separately
in test_extract.test_no_shuffle_in_extraction_plan.)
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

TESTDATA = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _nodes(plan: str, name: str) -> int:
    """Count distinct physical nodes of a type (explain('formatted')
    repeats node names in the details section; node ids are unique)."""
    return len(set(re.findall(rf"\((\d+)\) {name}", plan)))


def test_q1_pushdown_pruning_partial_agg(spark):
    from webxtract.contract import q_tpch_q1_agg

    plan = _plan(q_tpch_q1_agg(spark, TESTDATA))
    # filter reaches the parquet scan
    assert "LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 6 needed columns are read
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_comment" not in schema_line and "l_orderkey" not in schema_line
    assert "l_quantity" in schema_line
    # map-side combine: partial + final HashAggregate around one shuffle
    assert _nodes(plan, "HashAggregate") == 2
    assert _nodes(plan, "Exchange") <= 2  # agg shuffle (+ output sort)


def test_small_dim_join_broadcasts(spark):
    from webxtract.contract import q_broadcast_revenue_by_nation

    plan = _plan(q_broadcast_revenue_by_nation(spark, TESTDATA))
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert _nodes(plan, "SortMergeJoin") == 0  # big side never shuffles for the join


def test_exact_dedup_reads_only_needed_columns(spark):
    from webxtract.contract import q_exact_dedup

    plan = _plan(q_exact_dedup(spark, TESTDATA))
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    # shuffle carries md5+id, never the payload; the scan reads only
    # the hashed column and the id
    assert "text" in schema_line and "doc_id" in schema_line
    assert "lang" not in schema_line and "url" not in schema_line


def test_pipeline_has_exactly_one_exchange(spark, corpus):
    from webxtract.pipeline import run_pipeline

    pages_path, _ = corpus
    plan = _plan(run_pipeline(spark.read.parquet(pages_path)))
    # the salted url-hash bucketing is the ONLY wide dependency in the
    # whole extract->validate lifecycle
    assert _nodes(plan, "Exchange") == 1


def test_benchmark_overlap_broadcasts_benchmark_side(spark):
    """Decontamination must broadcast the (small) benchmark shingle
    set: the corpus side is the 100 TB table and must never shuffle
    for the join."""
    from webxtract.contract import q_benchmark_overlap

    plan = _plan(q_benchmark_overlap(spark, TESTDATA))
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert _nodes(plan, "SortMergeJoin") == 0
    # exchanges: benchmark-side distinct (small side only), per-doc
    # hit-count agg, output sort — the corpus scan itself never
    # shuffles before the join
    assert _nodes(plan, "Exchange") <= 3


def test_pii_redaction_is_narrow(spark):
    """Regex redaction is pure projection: zero exchanges, and the scan
    reads only (doc_id, text)."""
    from webxtract.contract import q_pii_redaction

    plan = _plan(q_pii_redaction(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 0
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text" in schema_line and "lang" not in schema_line


def test_deterministic_sample_is_narrow(spark):
    """Hash-threshold sampling is a pure narrow filter: no joins, and
    the only exchange is the query's output orderBy (the md5 threshold
    is a computed predicate, so parquet-level pushdown is not expected
    — what must never appear is a shuffle or join for the sampling
    decision itself)."""
    from webxtract.contract import q_deterministic_sample

    plan = _plan(q_deterministic_sample(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1  # output sort only
    assert "Join" not in plan
    assert _nodes(plan, "Filter") >= 1


def test_repetition_signals_is_shuffle_free(spark):
    """Top-n-gram repetition statistics are document-local: the whole
    operator must stay a single projection over one scan (sorted-gram
    run-length scan per n), never the explode + groupBy + join-back
    shape. The OPERATOR itself adds zero exchanges (first assert, on
    its own plan); the contract query adds only its output orderBy
    (scan parallelism comes from the input layout — bench.py re-chunks
    its fixture — not from an in-query repartition)."""
    from webxtract.contract import q_repetition_signals
    from webxtract.curation import repetition_signals

    df = spark.createDataFrame(
        [(1, "a b c a b c")], "doc_id long, text string"
    )
    op_plan = _plan(repetition_signals(df))
    assert _nodes(op_plan, "Exchange") == 0
    assert "Join" not in op_plan
    assert _nodes(op_plan, "Generate") == 0  # no explode
    assert _nodes(op_plan, "HashAggregate") == 0

    plan = _plan(q_repetition_signals(spark, TESTDATA))
    assert _nodes(plan, "Exchange") <= 1  # output sort only
    assert "Join" not in plan
    assert _nodes(plan, "Generate") == 0
    assert _nodes(plan, "HashAggregate") == 0


def test_pack_sequences_single_window_exchange(spark):
    """Packing is one shuffle on the shard key (the window), plus the
    final per-sequence aggregation reusing that partitioning where AQE
    allows; never a driver-side sequential scan."""
    from webxtract.contract import q_pack_sequences

    plan = _plan(q_pack_sequences(spark, TESTDATA))
    assert _nodes(plan, "Window") == 1
    assert _nodes(plan, "Exchange") <= 3  # window + agg + output sort


def test_cosine_topk_uses_takeordered(spark):
    from webxtract.contract import q_cosine_topk

    plan = _plan(q_cosine_topk(spark, TESTDATA))
    # top-k must be per-partition heaps + driver merge, not a full sort
    assert "TakeOrderedAndProject" in plan


def test_host_stats_partial_agg_no_join(spark):
    """Per-host rollup: map-side partial aggregation before the host
    exchange, and no join anywhere (the rollup is pure groupBy)."""
    from webxtract.contract import q_host_stats

    plan = _plan(q_host_stats(spark, TESTDATA))
    assert _nodes(plan, "HashAggregate") >= 2
    assert "Join" not in plan


def test_domain_filter_broadcast_anti(spark):
    """Blocklist filtering must be a broadcast LEFT ANTI: the corpus
    never shuffles and the join never degrades to sort-merge."""
    from webxtract.contract import q_domain_filter

    plan = _plan(q_domain_filter(spark, TESTDATA))
    assert _nodes(plan, "BroadcastHashJoin") == 1
    assert "BroadcastHashJoin LeftAnti BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_normalize_text_is_narrow_arrow(spark):
    """Text normalization is one narrow pass: the only exchange is the
    query's output orderBy, and the NFC step runs on the Arrow-batched
    pandas path (ArrowEvalPython), never row-at-a-time Python."""
    from webxtract.contract import q_normalize_text

    plan = _plan(q_normalize_text(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1  # output sort only
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_dedup_paragraphs_shuffle_budget(spark):
    """Paragraph dedup's documented scale shape: at most 4 exchanges
    (winner agg on the hash, join-back, per-doc regroup, output sort —
    one may collapse when AQE broadcasts the winner set), map-side
    partial aggregation for both the struct-min winner and the rebuild,
    and zero Python anywhere."""
    from webxtract.contract import q_dedup_paragraphs

    plan = _plan(q_dedup_paragraphs(spark, TESTDATA))
    assert _nodes(plan, "Exchange") <= 4
    # partial + final for winner min(struct) and for the rebuild agg
    agg_nodes = (
        _nodes(plan, "SortAggregate")
        + _nodes(plan, "HashAggregate")
        + _nodes(plan, "ObjectHashAggregate")
    )
    assert agg_nodes >= 4
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_top_tokens_partial_agg_topk(spark):
    """Corpus vocabulary head: exactly ONE exchange (post-partial-count,
    carrying ~vocab-size rows), and the global top-k is a
    TakeOrderedAndProject — never a full sort of the vocabulary."""
    from webxtract.contract import q_top_tokens

    plan = _plan(q_top_tokens(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1
    assert _nodes(plan, "HashAggregate") == 2
    assert _nodes(plan, "TakeOrderedAndProject") == 1
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_dedup_incremental_hash_only_payload(spark):
    """Incremental dedup's scale shape: the anti-join and keep-first
    agg run on md5-only payloads (text never shuffles), no Cartesian
    product, no Python, and the seen side is pruned to its hash
    column."""
    from webxtract.contract import q_dedup_incremental

    plan = _plan(q_dedup_incremental(spark, TESTDATA))
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert _nodes(plan, "Exchange") <= 4
    # map-side partial aggregation for the keep-first groups
    assert _nodes(plan, "HashAggregate") >= 2


def test_temperature_mix_broadcast_rates_no_corpus_shuffle(spark):
    """The rate table (#sources rows) broadcasts onto the corpus; the
    corpus side never shuffles for the sampling decision — the only
    exchanges are the tiny per-source count aggregation and the query's
    output orderBy."""
    from webxtract.contract import q_temperature_mix

    plan = _plan(q_temperature_mix(spark, TESTDATA))
    assert _nodes(plan, "BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    # count-agg exchange (sources only) + broadcast + output sort; the
    # corpus branch itself must contribute no shuffle
    assert _nodes(plan, "Exchange") <= 3


def test_chunk_tokens_is_narrow(spark):
    """Token windowing is document-local: one scan, one generate, zero
    joins; the only exchange is the query's output orderBy."""
    from webxtract.contract import q_chunk_tokens

    plan = _plan(q_chunk_tokens(spark, TESTDATA))
    assert "Join" not in plan
    assert _nodes(plan, "Exchange") == 1  # output sort only
    assert _nodes(plan, "Generate") == 1


def test_chunk_dedup_plan_text_never_shuffles(spark):
    """Substring dedup rewrite: the meta branch shuffles only
    (id, idx, hash) rows (window on chunk_hash + drop-list groupBy);
    the document TEXT is joined back by a broadcast-eligible join and
    rewritten exchange-free — never sort-merge-joined, never shuffled."""
    from webxtract.dedup import dedup_chunks
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{TESTDATA}/documents.parquet").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    plan = _plan(dedup_chunks(d, boundary_mod=8, min_dup_tokens=4))
    assert _nodes(plan, "SortMergeJoin") == 0
    assert _nodes(plan, "BroadcastHashJoin") == 1
    # window shuffle + drop-list groupBy shuffle + the broadcast: no
    # exchange ever carries the text column
    assert _nodes(plan, "Exchange") <= 3
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line and "chunk" not in line.split("hashpartitioning")[0]


def test_extraction_eval_is_narrow_single_aggregate(spark):
    """Per-row extraction scoring must stay embarrassingly parallel:
    zero exchanges/joins besides the query's output orderBy (vs the
    oracle's explode→group→join formulation, which at 10^12 docs would
    shuffle ~10^14 token rows), and the multiset-intersection aggregate
    must appear ONCE in the plan (CollapseProject duplicating it across
    the three metric columns would triple the per-row cost)."""
    from webxtract.contract import q_extraction_eval

    plan = _plan(q_extraction_eval(spark, TESTDATA))
    # one exchange: the contract orderBy's range partitioning
    assert _nodes(plan, "Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan
    assert plan.count("aggregate(") == 1


def test_c4_clean_is_narrow(spark):
    """The C4 ruleset is one narrow projection over the scan: zero
    joins/explodes, the only exchange is the output orderBy."""
    from webxtract.contract import q_c4_clean

    plan = _plan(q_c4_clean(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan


def test_wet_records_is_narrow(spark):
    """WET serialization is one narrow projection over the scan: zero
    joins/explodes/Python; the only exchange is the output orderBy."""
    from webxtract.contract import q_wet_records

    plan = _plan(q_wet_records(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan
    assert "Python" not in plan


def test_fix_mojibake_is_narrow(spark):
    """The repair chain is one narrow projection: zero joins/explodes/
    Python; the only exchange is the output orderBy."""
    from webxtract.contract import q_fix_mojibake

    plan = _plan(q_fix_mojibake(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan
    assert "Python" not in plan


def test_postings_plan_bounded(spark):
    """Postings build: no cartesian/broadcast-nested-loop, no Python,
    and a bounded exchange count (tf agg, salt window, term window,
    stats agg, join, output sort)."""
    from webxtract.contract import q_postings

    plan = _plan(q_postings(spark, TESTDATA))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Python" not in plan
    assert _nodes(plan, "Exchange") <= 6


def test_tag_topics_is_narrow(spark):
    """Topic tagging is one narrow projection (lit-array exists, no
    rule-table join): zero joins/explodes/Python, one output-sort
    exchange."""
    from webxtract.contract import q_tag_topics

    plan = _plan(q_tag_topics(spark, TESTDATA))
    assert _nodes(plan, "Exchange") == 1
    assert "Join" not in plan and "Generate" not in plan
    assert "Python" not in plan


def test_value_percentiles_window_over_histogram(spark):
    """The ordered window runs over the value HISTOGRAM: exactly one
    Window node, fed by an aggregate (the groupBy(value) reduce), and
    the doc-side join is a broadcast — never a row-level global sort
    of the corpus."""
    from webxtract.contract import q_value_percentiles

    plan = _plan(q_value_percentiles(spark, TESTDATA))
    assert _nodes(plan, "Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # the window's running sum is over the histogram COUNT column, not
    # raw document rows — the proof it scales with value cardinality
    assert re.search(r"sum\(__c", plan)
    assert _nodes(plan, "HashAggregate") >= 1


def test_host_cap_sample_two_phase_windows(spark):
    """The per-host cap ranks in TWO window phases (salted then final)
    so a hot host never collapses into one window partition — two
    Window nodes, no join, no Python."""
    from webxtract.contract import q_host_cap_sample

    plan = _plan(q_host_cap_sample(spark, TESTDATA))
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 2
    # Spark's rank-limit pushdown kicks in on both phases: each window
    # gets a Partial WindowGroupLimit BEFORE its exchange, so even the
    # salted phase ships at most cap rows per (host, salt) group
    assert _nodes(plan, "WindowGroupLimit") >= 2
    assert "Join" not in plan
    assert "Python" not in plan


def test_bpe_pairs_vocab_reduce_then_topk(spark):
    """The corpus-wide shuffle is the word-frequency reduce (partial
    agged); the pair explode runs over the DISTINCT vocab; top-k is
    TakeOrderedAndProject, never a global sort; no joins, no Python."""
    from webxtract.contract import q_bpe_pairs

    plan = _plan(q_bpe_pairs(spark, TESTDATA))
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan and "Python" not in plan
    assert _nodes(plan, "HashAggregate") >= 3  # partial+final x2 aggs
    assert _nodes(plan, "Exchange") <= 2  # vocab reduce + pair reduce


def test_dsir_scoring_is_narrow(spark):
    """DSIR scoring ships the log-ratio table as ONE literal and folds
    per document: no join, no aggregation shuffle beyond the output
    sort, no Python."""
    from webxtract.contract import q_dsir_weights

    plan = _plan(q_dsir_weights(spark, TESTDATA))
    assert "Join" not in plan
    assert "Python" not in plan
    assert _nodes(plan, "Exchange") == 1  # output sort only
    assert _nodes(plan, "HashAggregate") == 0


def test_bigram_perplexity_broadcast_stats(spark):
    """Scoring joins the top-k stats tables as BROADCASTS (three of
    them + the 1-row total); the corpus bigram stream itself never
    shuffles for a join — no SortMergeJoin anywhere."""
    from webxtract.contract import q_bigram_perplexity

    plan = _plan(q_bigram_perplexity(spark, TESTDATA))
    assert "SortMergeJoin" not in plan
    assert _nodes(plan, "BroadcastHashJoin") >= 3
    assert "TakeOrderedAndProject" in plan  # the top-k stats heads


def test_semantic_dedup_blocked_kernel_no_lambdas(spark):
    """SemDeDup pair stage (round-6 shape): (1) the within-cluster
    quadratic runs in ONE per-cluster vectorized NumPy kernel
    (FlatMapGroupsInPandas) — never a JVM self-join whose per-pair
    unrolled dot falls out of HotSpot JIT (8 KB bytecode cap; measured
    ~15 us/pair interpreted = 238 s at sf1.0 vs ~5 s here) and never a
    cartesian; (2) each (cluster, id, vector) row is shuffled exactly
    once (one Exchange on cluster beyond the assignment's broadcast);
    (3) no interpreted higher-order functions anywhere; (4) assignment
    is the mapInPandas NumPy kernel — no joins of any kind in the
    whole plan (the round-5 BroadcastNestedLoopJoin centroid attach
    and its groupBy(id) argmin exchange are gone)."""
    from webxtract.contract import q_semantic_dedup

    plan = _plan(q_semantic_dedup(spark, TESTDATA))
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "MapInPandas" in plan  # the assignment kernel
    assert "Join" not in plan
    # exactly one hash exchange: group by cluster for the pair kernel
    # (the only other exchange is the output orderBy's range partition)
    assert plan.count("hashpartitioning(") == 1
    for hof in ("zip_with", "aggregate(", "transform("):
        assert hof not in plan, f"interpreted HOF {hof} in semantic_dedup plan"


def test_near_dedup_increment_is_bucket_local(spark):
    """Candidate generation must stay INSIDE the (band, bval) buckets —
    no posting self-join — and the increment must be scanned at most
    twice (postings + final anti-join). The first draft of this op
    re-derived the increment per candidate join: 9 scans and 22
    exchanges. Pinned on a plain parquet input (the contract query's
    union fixture triggers Catalyst's push-through-union rewrite, which
    legitimately clones the subtree per branch)."""
    from pyspark.sql import functions as F

    from webxtract.dedup import near_dedup_increment, simhash_expr

    d = spark.read.parquet(f"{TESTDATA}/documents.parquet")
    seen = d.filter(F.col("doc_id") % 7 == 0).select(
        simhash_expr(F.col("text")).alias("sh")
    )
    plan = _plan(near_dedup_increment(d.select("doc_id", "text"), seen))
    assert _nodes(plan, "SortMergeJoin") == 0
    # exactly one join in the whole plan: the dropped-id anti-join
    assert len(set(re.findall(r"\((\d+)\) \w*Join", plan))) == 1
    assert _nodes(plan, "Scan parquet") <= 3
    assert _nodes(plan, "Exchange") + _nodes(plan, "BroadcastExchange") <= 4


def test_split_sentences_is_narrow(spark):
    """Sentence segmentation is a pure projection + explode: zero
    exchanges, zero Python, no joins — it parallelizes with the scan
    at any corpus size."""
    from webxtract.contract import q_split_sentences

    plan = _plan(q_split_sentences(spark, TESTDATA).limit(10))
    assert _nodes(plan, "Exchange") == 0
    assert "Python" not in plan
    assert "Join" not in plan
    assert _nodes(plan, "Generate") == 1  # the posexplode


def test_stratified_keep_window_over_histogram(spark):
    """Per-stratum relative thresholding windows over the (strata,
    value) HISTOGRAM — one Window node fed by an aggregate, histogram
    and per-stratum counts broadcast back; never a row-level window
    over corpus rows."""
    from webxtract.contract import q_stratified_keep

    plan = _plan(q_stratified_keep(spark, TESTDATA))
    assert _nodes(plan, "Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(r"sum\(__c", plan)


def test_frontier_schedule_two_phase_salted_broadcast_delay(spark):
    """The frontier's per-host ranking is the two-phase salted window
    (hot hosts never collapse into one partition; rank-limit pushdown
    applies on both phases) and the per-host crawl-delay table joins
    BROADCAST — the url side never shuffles for the join."""
    from webxtract.contract import q_frontier_schedule

    plan = _plan(q_frontier_schedule(spark, TESTDATA))
    assert len(re.findall(r"\(\d+\) Window\n", plan)) == 2
    assert _nodes(plan, "WindowGroupLimit") >= 2
    assert _nodes(plan, "BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    # the robots fixture arrives via createDataFrame (a PythonRDD
    # scan); what must be absent is Python EVALUATION over the urls
    assert "EvalPython" not in plan


def test_doc_containment_hash_only_shuffles_no_cartesian(spark):
    """Containment detection never shuffles chunk text: the explode
    emits (id, hash) before the set-dedup, the posting self-join keys
    on the hash, and everything downstream carries two bigints. No
    cartesian product, no sort-merge explosion on the text column."""
    from webxtract.contract import q_doc_containment

    plan = _plan(q_doc_containment(spark, TESTDATA))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # chunk text exists only below the hash projection: no Exchange
    # input schema may carry the chunk STRING column (`chunk#N`;
    # `chunk_hash#N` is the two-bigint payload and is expected)
    for m in re.finditer(r"\(\d+\) Exchange\n(?:.+\n)+?", plan):
        assert not re.search(r"\bchunk#\d", m.group(0))


def test_wat_records_is_narrow(spark):
    """WAT serialization is one codegen'd concat per row: zero
    exchanges (bar the output sort), zero Python, zero joins."""
    from webxtract.contract import q_wat_records

    plan = _plan(q_wat_records(spark, TESTDATA).limit(5))
    assert _nodes(plan, "Exchange") == 0
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_robots_sitemaps_is_narrow(spark):
    from webxtract.contract import q_robots_sitemaps

    plan = _plan(q_robots_sitemaps(spark, TESTDATA).limit(5))
    assert _nodes(plan, "Exchange") == 0
    assert "EvalPython" not in plan


def test_classifier_score_is_narrow(spark):
    """Model serving is one map pass: zero Python, zero joins — the
    weight table is a literal. The OPERATOR adds zero exchanges (first
    assert, on its own plan); the contract query adds only its output
    orderBy (scan parallelism is the input layout's job — bench.py
    re-chunks its fixture — not an in-query repartition)."""
    from pyspark.sql import functions as F

    from webxtract.contract import q_classifier_score
    from webxtract.curation import classifier_score_expr, classifier_weights

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    op_plan = _plan(
        df.select(
            classifier_score_expr(F.col("text"), classifier_weights(64))
        )
    )
    assert _nodes(op_plan, "Exchange") == 0
    assert "EvalPython" not in op_plan
    assert "Join" not in op_plan

    plan = _plan(q_classifier_score(spark, TESTDATA).limit(5))
    assert _nodes(plan, "Exchange") == 0  # orderBy+limit folds to TakeOrdered
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_shard_assign_text_never_shuffles(spark):
    """The shard window shuffles (id, shard, hash, n_tokens) only —
    no Exchange carries the text column, and there is no join."""
    from webxtract.contract import q_shard_assign

    plan = _plan(q_shard_assign(spark, TESTDATA))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    for m in re.finditer(r"\(\d+\) Exchange\n(?:.+\n)+?", plan):
        assert not re.search(r"\btext#\d", m.group(0))


def test_sitemap_entries_is_narrow(spark):
    from webxtract.contract import q_sitemap_entries

    plan = _plan(q_sitemap_entries(spark, TESTDATA).limit(5))
    assert _nodes(plan, "Exchange") == 0
    assert "EvalPython" not in plan


def test_structured_metadata_is_narrow(spark):
    from webxtract.contract import q_structured_metadata

    plan = _plan(q_structured_metadata(spark, TESTDATA).limit(5))
    assert _nodes(plan, "Exchange") == 0
    assert "EvalPython" not in plan
