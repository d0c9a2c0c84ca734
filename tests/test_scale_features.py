"""Scale-feature tests: salting/partitioning, audit lineage rows,
idempotent resume, streaming ingest, multimodal plumbing."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_partition_by_url_balances(spark, corpus):
    from webxtract.audit import partition_by_url

    pages_path, _ = corpus
    df = partition_by_url(spark.read.parquet(pages_path), 8)
    sizes = (
        df.groupBy(F.spark_partition_id().alias("pid")).count().toPandas()
    )
    assert len(sizes) == 8
    # deterministic salt -> reasonably balanced (no partition > 3x mean)
    assert sizes["count"].max() <= 3 * sizes["count"].mean()


def test_audit_and_resume(spark, corpus, tmp_path):
    from webxtract.audit import resume_filter, run_extraction_job

    pages_path, _ = corpus
    pages = spark.read.parquet(pages_path)
    half = pages.limit(200)
    out = str(tmp_path / "out")
    audit = str(tmp_path / "audit")

    m1 = run_extraction_job(half, out, audit, "run-1", spark, num_partitions=4)
    assert m1["urls"] == 200

    # resume: second run over the FULL input must only process the rest
    remaining = resume_filter(pages, out, spark)
    assert remaining.count() == pages.count() - 200

    m2 = run_extraction_job(pages, out, audit, "run-2", spark, num_partitions=4)
    assert m2["urls"] == pages.count()  # no duplicates after resume

    audit_df = spark.read.parquet(audit).toPandas()
    assert set(audit_df["run_id"]) == {"run-1", "run-2"}
    r1 = audit_df[audit_df["run_id"] == "run-1"]
    assert r1["url_count"].sum() == 200
    assert (r1["bytes_in"] >= 0).all()

    # third run is a no-op (fully idempotent)
    assert resume_filter(pages, out, spark).count() == 0


def test_streaming_extraction(spark, corpus, tmp_path):
    from webxtract.streaming import start_extraction_stream

    pages_path, expected = corpus
    # file-stream sources need a directory of drops, not a single file
    drops = str(tmp_path / "drops")
    spark.read.parquet(pages_path).repartition(3).write.parquet(drops)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extraction_stream(spark, drops, out, ckpt, available_now=True)
    q.awaitTermination(300)
    res = spark.read.parquet(out).toPandas().set_index("url").sort_index()
    exp = expected.set_index("url").sort_index()
    assert len(res) == len(exp)
    for url in exp.index[:50]:
        g = res.loc[url, "extracted_text"]
        e = exp.loc[url, "extracted_text"]
        assert (g if pd.notna(g) else None) == (e if pd.notna(e) else None)


def test_multimodal_sniff_and_features(spark):
    from webxtract.multimodal import extract_features, sniff_media_expr

    rows = [
        ("u1", b"\x89PNG\r\n\x1a\n" + b"\x00" * 20),
        ("u2", b"\xff\xd8\xff\xe0" + b"\x01" * 20),
        ("u3", b"RIFF\x00\x00\x00\x00WAVEfmt "),
        ("u4", b"\x00\x00\x00\x18ftypmp42AAAA"),
        ("u5", b"%PDF-1.4 stub"),
        ("u6", b"garbage bytes here"),
        ("u7", b""),
    ]
    df = spark.createDataFrame(rows, schema="url string, payload binary")
    meta = (
        df.select("url", sniff_media_expr().alias("m"))
        .toPandas()
        .set_index("url")["m"]
    )
    assert meta["u1"]["format"] == "png" and meta["u1"]["media_kind"] == "image"
    assert meta["u2"]["format"] == "jpeg"
    assert meta["u3"]["format"] == "wav" and meta["u3"]["media_kind"] == "audio"
    assert meta["u4"]["format"] == "mp4" and meta["u4"]["media_kind"] == "video"
    assert meta["u5"]["format"] == "pdf"
    assert meta["u6"]["format"] == "unknown"

    feats = extract_features(df).toPandas().set_index("url")
    assert feats.loc["u1", "feature"] is not None
    assert len(bytes(feats.loc["u1", "feature"])) == 16
    assert feats.loc["u7", "feature"] is None  # undecodable -> null, no crash


def test_lsh_topk_recall_vs_bruteforce(spark):
    """ANN sanity: the LSH top-k must be a subset of the brute-force
    ranking restricted to the query's bucket, and the query's own vector
    (cosine 1.0) must always be found."""
    from webxtract.contract import _query_vec, q_ann_lsh_topk, q_cosine_topk

    sf = "/root/testdata/sf0.001"
    bf = q_cosine_topk(spark, sf).toPandas()
    ann = q_ann_lsh_topk(spark, sf).toPandas()
    assert bf.iloc[0]["vec_id"] == 0 and bf.iloc[0]["cosine"] == pytest.approx(1.0)
    assert 0 in set(ann["vec_id"])  # query vector is in its own bucket
    assert (ann["cosine"] <= bf["cosine"].max() + 1e-9).all()
