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
    """Repartition by (host, shard) — bounded host locality.

    Partitioning on plain hash(url) spreads rows but scatters every
    host across ALL partitions; partitioning on host alone serializes
    a Zipf-hot host into one task. The (host, shard) key with
    shard = xxhash64(url) % salt_hot_hosts keeps each host's pages in
    at most ``salt_hot_hosts`` buckets (locality for per-host work:
    robots/rate metadata reuse, per-host dedup) while guaranteeing no
    host exceeds ~1/salt_hot_hosts of its bytes per task. Deterministic
    — the shard comes from the url hash, no RNG."""
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    shard = F.pmod(F.xxhash64("url"), F.lit(salt_hot_hosts)).cast("int")
    key = F.xxhash64(
        F.concat_ws("#", F.coalesce(host, F.col("url")), shard.cast("string"))
    )
    return df.repartition(num_partitions, key)


def with_partition_metrics(df: DataFrame) -> DataFrame:
    """Attach the partition id so audit metrics can be grouped per task
    (the columnar analog of the reference's per-request RequestLogs row,
    middleware.py:113-135 — one row per *partition* instead of per doc)."""
    return df.withColumn("__pid", F.spark_partition_id())


def audit_rows(
    extracted: DataFrame,
    run_id: str,
    wall_by_pid: dict[int, float] | None = None,
) -> DataFrame:
    """Per-partition lineage + metrics: url_count, bytes_in,
    parse_failures, wall_ms (north_rule audit table; the reference's
    per-request processingTimeMs, middleware.py:68,127, becomes a
    per-partition task wall).

    If the frame already carries a ``partition_id`` column (recorded by
    the writer via spark_partition_id()) it is used as-is — essential
    for read-back audits, where recomputing partition ids would reflect
    the read split layout, not the write tasks. ``wall_by_pid`` maps
    write-task index -> task duration ms (from the scheduler's task
    metrics); it is tiny (one entry per task) and joined broadcast."""
    base = extracted
    if "partition_id" not in base.columns:
        base = with_partition_metrics(base).withColumnRenamed("__pid", "partition_id")
    agg = base.groupBy("partition_id").agg(
        F.count(F.lit(1)).alias("url_count"),
        F.sum("n_bytes").alias("bytes_in"),
        F.sum(F.col("parse_failure").cast("long")).alias("parse_failures"),
    )
    if wall_by_pid:
        spark = extracted.sparkSession
        walls = spark.createDataFrame(
            [(int(k), float(v)) for k, v in wall_by_pid.items()],
            schema="partition_id int, wall_ms double",
        )
        agg = agg.join(F.broadcast(walls), "partition_id", "left")
    else:
        agg = agg.withColumn("wall_ms", F.lit(None).cast("double"))
    return agg.select(
        F.lit(run_id).alias("run_id"),
        "partition_id",
        "url_count",
        "bytes_in",
        "parse_failures",
        "wall_ms",
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
    transform=None,
) -> dict:
    """The production job shape: resume -> salt/partition -> extract ->
    write output (+ run_id lineage column, hive-partitioned by run) ->
    audit THIS run only. Returns this run's metrics.

    Run-level stats come from ``df.observe`` on the write itself — zero
    extra passes (SURVEY.md §2.1-S5). The per-partition audit rows are
    computed from a run_id-pruned read-back of just-committed files
    (never a rescan of the full history: at 10^12 accumulated urls a
    full-table re-aggregation per incremental run is a non-starter).

    ``transform`` swaps the per-page job body (default: extract_pages;
    the CLI passes the full validation pipeline for --mode pipeline) —
    it must preserve the url / n_bytes / parse_failure columns the
    observe stats and audit aggregation read."""
    from pyspark.sql import Observation

    from webxtract.ops.extract import extract_pages

    if transform is None:
        transform = extract_pages
    todo = resume_filter(pages, output_path, spark)
    if num_partitions:
        todo = partition_by_url(todo, num_partitions)
    extracted = (
        transform(todo)
        .withColumn("run_id", F.lit(run_id))
        # recorded at write time: spark_partition_id() in the write
        # stage IS the write task index, so the read-back audit can
        # group by the producing task and join its scheduler wall time
        .withColumn("partition_id", F.spark_partition_id())
    )

    obs = Observation(f"webxtract-{run_id}")
    observed = extracted.observe(
        obs,
        F.count(F.lit(1)).alias("urls"),
        F.coalesce(F.sum("n_bytes"), F.lit(0)).alias("bytes_in"),
        F.coalesce(F.sum(F.col("parse_failure").cast("long")), F.lit(0)).alias(
            "failures"
        ),
    )
    group = f"webxtract-write-{run_id}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "extraction write", False)
    try:
        observed.write.mode("append").partitionBy("run_id").parquet(output_path)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    stats = obs.get
    walls = _task_walls_for_group(spark, group)

    this_run = spark.read.parquet(output_path).filter(F.col("run_id") == run_id)
    audit = audit_rows(this_run.drop("run_id"), run_id, wall_by_pid=walls)
    audit.write.mode("append").parquet(audit_path)

    return {
        "run_id": run_id,
        "urls": stats["urls"],
        "bytes_in": stats["bytes_in"],
        "parse_failures": stats["failures"],
    }


def _task_walls_for_group(spark: SparkSession, group: str) -> dict[int, float]:
    """Per-task wall-clock of the write stage, {task index: duration ms},
    from the status REST API (the same task metrics a cluster history
    server records). Returns {} when the UI/REST endpoint is disabled —
    wall_ms then stays NULL rather than failing the job."""
    import json
    import urllib.request

    sc = spark.sparkContext
    base = sc.uiWebUrl
    if not base:
        return {}
    try:
        tracker = sc.statusTracker()
        stage_ids: list[int] = []
        for jid in tracker.getJobIdsForGroup(group):
            info = tracker.getJobInfo(jid)
            if info:
                stage_ids.extend(info.stageIds)
        if not stage_ids:
            return {}
        # the ResultStage of the write job has the highest stage id
        sid = max(stage_ids)
        url = (
            f"{base}/api/v1/applications/{sc.applicationId}"
            f"/stages/{sid}?details=true"
        )
        attempts = json.load(urllib.request.urlopen(url, timeout=10))
        walls: dict[int, float] = {}
        for att in attempts:
            for task in (att.get("tasks") or {}).values():
                idx, dur = task.get("index"), task.get("duration")
                if idx is not None and dur is not None:
                    walls[int(idx)] = float(dur)
        return walls
    except Exception:
        return {}


def _exists(path: str, spark: SparkSession) -> bool:
    if path.startswith("/") or path.startswith("file:"):
        return os.path.exists(path.removeprefix("file:"))
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)
