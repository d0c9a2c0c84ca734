"""Iceberg-aware table IO (north_rule: the pipeline runs "over Iceberg
tables of Common-Crawl-style web pages" and "resumes idempotently from
the last committed snapshot").

This sandbox ships no iceberg-spark runtime jar, so every Iceberg leg
is capability-gated exactly like the reference's own library probes
(`app/services/image_ocr.py:82-88` `is_available()`): the probe is
honest (`Class.forName` on the catalog class), the gated code is real
spark-iceberg API, and the tested stand-in is plain parquet with the
identical dataflow (see `webxtract/audit.py` module docstring for the
resume-semantics mapping).

Source strings: ``iceberg:catalog.db.table`` reads a table through a
configured Iceberg catalog; anything else is a parquet path. On a real
cluster the catalog conf comes from spark-submit ``--conf`` pairs —
``iceberg_submit_conf()`` generates exactly those pairs so the launch
recipe is executable documentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def iceberg_submit_conf(
    catalog: str = "webx",
    warehouse: str = "hdfs:///warehouse/webxtract",
    catalog_type: str = "hadoop",
) -> dict[str, str]:
    """The spark-submit ``--conf`` pairs that make ``iceberg:{catalog}.
    db.table`` sources resolve. Emitted as a dict so tests can assert
    them and ops can render them into a submit script:

        spark-submit $(python -c "from webxtract.table_io import \
            iceberg_submit_conf as c; print(' '.join(f'--conf {k}={v}' \
            for k,v in c().items()))") --py-files webxtract.zip cli.py …
    """
    return {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": catalog_type,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }


def is_iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark runtime jar is on the JVM classpath
    (the catalog class loads). Mirrors the reference's is_available()
    probe pattern — capability detection, never a try/except around the
    actual work."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_pages(spark: SparkSession, source: str) -> DataFrame:
    """Read the pages table: ``iceberg:catalog.db.table`` via the
    catalog (full predicate/partition pruning through Iceberg's
    metadata), otherwise a parquet path. Both legs produce the same
    (url, warc_ts, html, text, lang) frame."""
    if source.startswith(ICEBERG_PREFIX):
        return spark.read.table(source[len(ICEBERG_PREFIX):])
    return spark.read.parquet(source)


def last_committed_snapshot(spark: SparkSession, source: str) -> int | None:
    """Latest snapshot id of an Iceberg table (its ``.snapshots``
    metadata table, ordered by commit time). None for an empty table.
    Iceberg-only: the parquet stand-in has no snapshot lineage — its
    resume token is the committed url set (audit.resume_filter)."""
    table = _require_iceberg(spark, source, "last_committed_snapshot")
    row = (
        spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots "  # noqa: S608 — catalog identifier, not user data
            "ORDER BY committed_at DESC LIMIT 1"
        ).head(1)
    )
    return int(row[0][0]) if row else None


def incremental_pages(
    spark: SparkSession, source: str, after_snapshot_id: int
) -> DataFrame:
    """Only the rows appended AFTER ``after_snapshot_id`` — Iceberg's
    incremental read. This is the scale path for recurring crawls: the
    resume anti-join's right side shrinks from 10^12 accumulated urls
    to one increment's worth, because the storage layer already knows
    what is new (see audit.resume_filter's docstring)."""
    table = _require_iceberg(spark, source, "incremental_pages")
    return (
        spark.read.format("iceberg")
        .option("start-snapshot-id", str(after_snapshot_id))
        .table(table)
    )


def _require_iceberg(spark: SparkSession, source: str, op: str) -> str:
    if not source.startswith(ICEBERG_PREFIX):
        raise ValueError(f"{op} requires an {ICEBERG_PREFIX}… source, got {source!r}")
    if not is_iceberg_available(spark):
        raise RuntimeError(
            f"{op}: iceberg-spark runtime jar not on the classpath; "
            "launch with iceberg_submit_conf() and the runtime jar, or "
            "use a parquet source"
        )
    return source[len(ICEBERG_PREFIX):]
