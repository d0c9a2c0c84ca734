"""Structured-Streaming ingestion for incremental WARC/page drops.

The reference is purely request/response — it has zero streaming
constructs (SURVEY.md §1.4) — but the rebuild's batch pipeline lifts
directly onto Structured Streaming because every stage is a stateless
narrow transformation: readStream over the pages directory ->
extract/validate -> append sink, with Trigger.AvailableNow for
catch-up-then-stop incremental runs (the Iceberg-incremental-read
analog in this sandbox).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from webxtract.schemas import PAGES_SCHEMA


def read_page_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream of page parquet drops."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def start_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """pages stream -> extraction -> append parquet sink.

    available_now=True processes everything present then stops —
    the incremental batch mode; False runs continuously. Exactly-once
    via the checkpoint (file-source offsets + file-sink manifest).
    """
    from webxtract.ops.extract import extract_pages

    stream = read_page_stream(spark, input_path)
    extracted = extract_pages(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_pipeline_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    run_date: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """pages stream -> FULL pipeline (extract -> fields -> type ->
    fake -> validators -> summary) -> append parquet sink.

    Everything after extraction is a stateless projection, so the whole
    batch pipeline lifts onto the stream unchanged; the salted url-hash
    exchange inside run_pipeline becomes a per-microbatch shuffle.
    Exactly-once via the checkpoint, as with the extraction stream."""
    from webxtract.config import DEFAULT_RUN_DATE
    from webxtract.pipeline import run_pipeline

    stream = read_page_stream(spark, input_path)
    out = run_pipeline(stream, run_date=run_date or DEFAULT_RUN_DATE)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_audited_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    audit_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Extraction stream with the batch job's audit contract: every
    microbatch appends output partitioned by run_id (= batch-<id>) AND
    writes its per-partition lineage/metrics rows to the audit table —
    the streaming form of audit.run_extraction_job.

    Replay safety: a recovered microbatch re-runs with the SAME batch
    id, and BOTH writes use dynamic partition overwrite on run_id, so
    the replayed batch replaces its own output partition AND its own
    audit partition instead of appending duplicates — foreachBatch is
    at-least-once, idempotence must come from the sink."""
    from pyspark.sql import functions as F

    from webxtract.audit import audit_rows
    from webxtract.ops.extract import extract_pages

    stream = read_page_stream(spark, input_path)
    extracted = extract_pages(stream)

    def _write_batch(batch_df, batch_id):  # noqa: ANN001
        run_id = f"batch-{batch_id}"
        out = (
            batch_df.withColumn("run_id", F.lit(run_id))
            .withColumn("partition_id", F.spark_partition_id())
            .persist()
        )
        try:
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id")
                .parquet(output_path)
            )
            (
                audit_rows(out.drop("run_id"), run_id)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id")
                .parquet(audit_path)
            )
        finally:
            out.unpersist()

    writer = extracted.writeStream.foreachBatch(_write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ----------------------------------------------- windowed aggregation


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window event metrics with a watermark for late data.

    On a streaming DataFrame: events later than ``watermark`` behind the
    max seen event time are dropped and window state is evicted — the
    standard bounded-state late-data policy. On a batch DataFrame the
    watermark is a no-op and the result is exact, which is how the
    driver's DuckDB oracle checks the window arithmetic
    (``windowed_event_counts`` in webxtract.contract/oracles).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# ------------------------------------------- stateful sessionization


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# epoch-micros + counters; kept flat and integer-typed so state rows are
# small (streaming state lives in the state store per key)
SESSION_STATE_SCHEMA = "start long, last long, n long, total double"


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (``applyInPandasWithState``) — the streaming twin of the batch
    lag+running-sum sessionizer (webxtract.contract.q_sessionize_events).

    Per user_id the state holds the open session (start/last/n/total in
    epoch micros). A closed session is emitted as soon as a later event
    arrives past the gap, so sessions interrupted by a microbatch
    boundary continue seamlessly; a session with no successor event
    closes via event-time timeout once the watermark passes
    last + gap. The final open session at end-of-stream stays in state
    (exactly the semantics a continuous pipeline wants; AvailableNow
    catch-up runs pick it up on the next increment).

    Watermark discipline: keep ``watermark`` <= ``gap_seconds`` (the
    default aligns them). Within that bound every admitted late event
    satisfies ``us >= last - gap``, so min/max merging into the single
    open session is exactly the batch semantics. With watermark > gap
    an admitted event older than ``start - gap`` would belong to a
    SEPARATE earlier session that single-interval state cannot
    represent; such an event is emitted as its own closed session
    (best-effort — a later bridging event cannot reopen it).
    """
    import pandas as pd  # local: workers import lazily
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                }
            )
            return

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        out = {k: [] for k in ("user_id", "session_start", "session_end", "n_events", "total_value")}
        for ts, value in zip(rows["ts"], rows["value"]):
            us = int(ts.value // 1000)  # pandas ns -> us
            if start is None:
                start, last, n, total = us, us, 1, float(value)
            elif us - last > gap_us:
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(start, unit="us"))
                out["session_end"].append(pd.Timestamp(last, unit="us"))
                out["n_events"].append(n)
                out["total_value"].append(round(total, 6))
                start, last, n, total = us, us, 1, float(value)
            elif us < start - gap_us:
                # only reachable when watermark > gap: the event is a
                # separate EARLIER session this single-interval state
                # cannot hold — emit it as its own closed session
                # (best-effort, see docstring)
                out["user_id"].append(user_id)
                out["session_start"].append(pd.Timestamp(us, unit="us"))
                out["session_end"].append(pd.Timestamp(us, unit="us"))
                out["n_events"].append(1)
                out["total_value"].append(round(float(value), 6))
            else:
                # batches are sorted internally but NOT ordered across
                # microbatches: an out-of-order event (allowed within
                # the watermark) must never rewind the session bounds —
                # merge with min/max so later gap checks compare against
                # the true session end
                start = min(start, us)
                last = max(last, us)
                n, total = n + 1, total + float(value)

        state.update((start, last, n, total))
        # close the open session once the watermark passes last + gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)
        if out["user_id"]:
            yield pd.DataFrame(out)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUT_SCHEMA,
            SESSION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "24 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact dedup: the streaming twin of
    ``dedup.exact_dedup``'s keep-first contract for incremental page
    drops — a page whose md5(text) was already seen (in this run OR a
    prior checkpointed run) within the watermark horizon is dropped;
    the first arrival passes through unchanged.

    ``dropDuplicatesWithinWatermark`` keeps the dedup state BOUNDED: a
    hash is held only until the event-time watermark passes it, so
    state size tracks the crawl-recency window, not corpus history —
    a plain streaming dropDuplicates would grow driver-unbounded state
    at 100 TB/day ingest. Recrawls older than the watermark are the
    (documented) false-negative tradeoff; the batch
    ``dedup_incremental`` against the committed fingerprint table is
    the unbounded-horizon complement. Exactly-once via the checkpoint
    (file-source offsets + sink manifest + dedup state snapshots);
    NULL-text pages key on their url instead of the (NULL) hash, so
    two textless pages never collapse into one."""
    stream = read_page_stream(spark, input_path)
    hashed = stream.select(
        "*",
        F.coalesce(
            F.md5(F.col("text")),
            F.concat(F.lit("nulltext:"), F.col("url")),
        ).alias("text_hash"),
    )
    deduped = hashed.withWatermark(
        "warc_ts", watermark
    ).dropDuplicatesWithinWatermark(["text_hash"])
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_near_dedup_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    fingerprint_path: str,
    checkpoint_path: str,
    max_hamming: int = 3,
    horizon: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming NEAR-dedup for incremental page drops — the
    hamming<=k twin of ``start_dedup_stream``. Near-dup needs a banded
    candidate join plus a bit_count verify, which
    ``dropDuplicatesWithinWatermark``'s exact-key state cannot express,
    so this is a ``foreachBatch`` composition of the batch kernel
    (``dedup.near_dedup_increment``) against a committed fingerprint
    table — dedup state is a plain appendable table, never executor
    memory.

    Per microbatch: (1) read the fingerprints committed by PRIOR
    batches — this batch's own run_id partition is EXCLUDED, so a
    replayed batch never sees its own half-committed fingerprints and
    suppresses itself; (2) if ``horizon`` is set (e.g. "72 hours"),
    prune fingerprints older than the batch's max warc_ts minus the
    horizon — the watermark analog that bounds state by crawl recency
    instead of corpus history (recrawls older than the horizon are the
    documented false-negative tradeoff, same as the exact stream);
    (3) run the kernel keyed by url (keep-smallest-url within the
    batch); (4) write surviving pages AND their non-NULL fingerprints,
    each dynamic-partition-overwriting its own run_id partition —
    foreachBatch is at-least-once, idempotence comes from the sinks.

    Scale: the kernel shuffles (band, bval, simhash) postings only;
    page payloads are written once and never join-shuffled (survivor
    urls rejoin the persisted batch, which AQE broadcasts — a
    microbatch is small by construction)."""
    from webxtract.audit import _exists
    from webxtract.dedup import near_dedup_increment

    stream = read_page_stream(spark, input_path)

    def _write_batch(batch_df, batch_id):  # noqa: ANN001
        run_id = f"batch-{batch_id}"
        if _exists(fingerprint_path, spark):
            seen = spark.read.parquet(fingerprint_path).filter(
                F.col("run_id") != run_id
            )
            if horizon is not None:
                hi = batch_df.agg(F.max("warc_ts")).collect()[0][0]
                if hi is not None:
                    seen = seen.filter(
                        F.col("warc_ts")
                        >= F.lit(hi) - F.expr(f"INTERVAL {horizon}")
                    )
            seen = seen.select("sh")
        else:
            seen = spark.createDataFrame([], "sh bigint")
        pages = batch_df.persist()
        try:
            keep = near_dedup_increment(
                pages, seen, text_col="text", id_col="url",
                max_hamming=max_hamming,
            )
            survivors = pages.join(keep.select("url"), "url")
            (
                survivors.withColumn("run_id", F.lit(run_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id")
                .parquet(output_path)
            )
            fps = (
                keep.filter(F.col("simhash").isNotNull())
                .join(pages.select("url", "warc_ts"), "url")
                .select(
                    F.col("simhash").alias("sh"),
                    "warc_ts",
                    F.lit(run_id).alias("run_id"),
                )
            )
            (
                fps.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("run_id")
                .parquet(fingerprint_path)
            )
        finally:
            pages.unpersist()

    writer = stream.writeStream.foreachBatch(_write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_warc_stream(
    spark: SparkSession,
    input_path: str,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """File-source stream of WARC segment drops: binaryFile streaming
    source -> the same Arrow-batched member/record parser the batch
    reader uses (`webxtract.warc.read_warc`). New crawl segments landing
    in ``input_path`` are picked up per microbatch; segment files are
    the parallelism AND progress-tracking unit (file-source offsets in
    the checkpoint record which segments are committed — exactly the
    crawl-ingest contract: a segment is either fully extracted and
    committed or replayed whole)."""
    from webxtract import warc as W

    seg = (
        spark.readStream.format("binaryFile")
        # streaming file sources require an explicit schema; binaryFile's
        # is fixed by the format
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.warc*")
        .load(input_path)
        .select("path", "content")
    )
    # reuse the batch parser's closure via mapInPandas on the stream —
    # stateless narrow transform, so it lifts unchanged
    def parse(batches):
        cols = [f.name for f in W.WARC_SCHEMA.fields]
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for row in W._parse_segment(path_, bytes(content)):
                    if row[3] == "response":
                        rows.append(row)
            out = pd.DataFrame(rows, columns=cols)
            if len(out):
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce", format="ISO8601"
                ).dt.tz_localize(None)
            else:
                out["warc_ts"] = pd.Series([], dtype="datetime64[ns]")
            yield out

    return seg.mapInPandas(parse, schema=W.WARC_SCHEMA)


def start_warc_extraction_stream(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """WARC segments -> pages contract -> extraction -> append parquet
    sink. The incremental crawl-ingest path: each AvailableNow run
    extracts exactly the segments that landed since the last committed
    checkpoint (the Iceberg-incremental-read analog for raw crawl
    data), idempotently under replay."""
    from webxtract import warc as W
    from webxtract.ops.extract import extract_pages

    pages = W.warc_to_pages(read_warc_stream(spark, input_path))
    extracted = extract_pages(pages)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
