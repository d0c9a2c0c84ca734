"""Scale features (SURVEY.md §2.1 S5 + §4.3): url-hash partitioning
with salting for skewed hosts, per-partition lineage/metrics audit
rows, and idempotent resume via anti-join against committed output.

On a real cluster the output + audit tables are Iceberg and resume uses
snapshot ids; in this sandbox both are parquet directories and the
lineage token is the run_id — the dataflow (observe-style metric
aggregation, anti-join resume) is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webxtract.schemas import AUDIT_SCHEMA


def partition_by_url(
    df: DataFrame,
    num_partitions: int,
    salt_hot_hosts: int = 4,
) -> DataFrame:
    """Repartition by url-hash with host-salting.

    Plain hash(url) already spreads rows, but task *byte* weight skews
    when one host contributes most of the bytes (Zipf hosts) because
    its pages also tend to be uniformly large; salting by a per-row
    shard id keeps any single (host, shard) bucket bounded. The salt
    is derived from the url hash itself — deterministic, no RNG.
    """
    salt = (F.xxhash64("url") % salt_hot_hosts).cast("int")
    key = F.xxhash64(F.concat_ws("#", F.col("url"), salt.cast("string")))
    return df.repartition(num_partitions, key)


def with_partition_metrics(df: DataFrame) -> DataFrame:
    """Attach the partition id so audit metrics can be grouped per task
    (the columnar analog of the reference's per-request RequestLogs row,
    middleware.py:113-135 — one row per *partition* instead of per doc)."""
    return df.withColumn("__pid", F.spark_partition_id())


def audit_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """Per-partition lineage + metrics: url_count, bytes_in,
    parse_failures (north_rule audit table)."""
    return (
        with_partition_metrics(extracted)
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("url_count"),
            F.sum("n_bytes").alias("bytes_in"),
            F.sum(F.col("parse_failure").cast("long")).alias("parse_failures"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("__pid").alias("partition_id"),
            "url_count",
            "bytes_in",
            "parse_failures",
            F.lit(None).cast("double").alias("wall_ms"),
        )
    )


def resume_filter(pages: DataFrame, output_path: str, spark: SparkSession) -> DataFrame:
    """Idempotent resume: LEFT ANTI join against already-committed urls
    so a re-run only processes the remainder (SURVEY.md §4.3.3). The
    done-set is a column-pruned scan of just the url column; the anti
    join is a full shuffle join on url at scale (at 10^12 committed
    urls the done-set is NOT broadcastable). Production variants that
    avoid even that shuffle: bucket both tables by url-hash and use a
    storage-partitioned join, or — on Iceberg — read only the snapshot
    range committed since the last successful run (incremental scan)
    so the anti join's right side is one run's urls, not the history."""
    if not _exists(output_path, spark):
        return pages
    done = spark.read.parquet(output_path).select("url")
    return pages.join(done, "url", "left_anti")


def run_extraction_job(
    pages: DataFrame,
    output_path: str,
    audit_path: str,
    run_id: str,
    spark: SparkSession,
    num_partitions: int | None = None,
) -> dict:
    """The production job shape: resume -> salt/partition -> extract ->
    write output (+ run_id lineage column, hive-partitioned by run) ->
    audit THIS run only. Returns this run's metrics.

    Run-level stats come from ``df.observe`` on the write itself — zero
    extra passes (SURVEY.md §2.1-S5). The per-partition audit rows are
    computed from a run_id-pruned read-back of just-committed files
    (never a rescan of the full history: at 10^12 accumulated urls a
    full-table re-aggregation per incremental run is a non-starter)."""
    from pyspark.sql import Observation

    from webxtract.ops.extract import extract_pages

    todo = resume_filter(pages, output_path, spark)
    if num_partitions:
        todo = partition_by_url(todo, num_partitions)
    extracted = extract_pages(todo).withColumn("run_id", F.lit(run_id))

    obs = Observation(f"webxtract-{run_id}")
    observed = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("urls"),
        F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes_in"),
        F.coalesce(F.sum(F.col("parse_failure").cast("long")), F.lit(0)).alias(
            "failures"
        ),
    )
    observed.write.mode("append").partitionBy("run_id").parquet(output_path)
    stats = obs.get

    this_run = spark.read.parquet(output_path).filter(F.col("run_id") == run_id)
    audit = audit_rows(this_run.drop("run_id"), run_id)
    audit.write.mode("append").parquet(audit_path)

    return {
        "run_id": run_id,
        "urls": stats["urls"],
        "bytes_in": stats["bytes_in"],
        "parse_failures": stats["failures"],
    }


def _exists(path: str, spark: SparkSession) -> bool:
    if path.startswith("/") or path.startswith("file:"):
        return os.path.exists(path.removeprefix("file:"))
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
