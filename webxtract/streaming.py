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
