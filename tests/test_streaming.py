"""Structured Streaming tests: incremental file-source extraction with
exactly-once resume (checkpoint), and the windowed event aggregation."""

import shutil

from pyspark.sql import functions as F

from parserpdf_spark.sources.synth import synth_docs_df
from parserpdf_spark.streaming.ingest import (
    run_incremental_extraction,
    windowed_event_counts,
)


def test_incremental_extraction_exactly_once(spark, sf_small, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = synth_docs_df(spark, sf_small).persist()
    batch1 = docs.filter(F.col("doc_id").cast("long") < 100)
    batch2 = docs.filter(
        (F.col("doc_id").cast("long") >= 100) & (F.col("doc_id").cast("long") < 150)
    )

    # drop 1: first file lands, drain
    batch1.coalesce(1).write.mode("append").parquet(in_dir)
    run_incremental_extraction(spark, in_dir, out_dir, ckpt)
    got1 = spark.read.parquet(out_dir)
    n_docs1 = got1.filter(F.col("kind") == "_metrics").count()
    assert n_docs1 == 100

    # drop 2: second file lands; only the new docs are processed
    batch2.coalesce(1).write.mode("append").parquet(in_dir)
    run_incremental_extraction(spark, in_dir, out_dir, ckpt)
    got2 = spark.read.parquet(out_dir)
    metrics = got2.filter(F.col("kind") == "_metrics")
    assert metrics.count() == 150
    # exactly-once: no doc extracted twice
    assert metrics.select("doc_id").distinct().count() == 150
    docs.unpersist()


def test_windowed_event_counts_matches_batch(spark, sf_small):
    events = spark.read.parquet(f"{sf_small}/events.parquet")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["value_cents"])
        for r in windowed_event_counts(events).collect()
    }
    expected = {
        (r["ws"], r["event_type"]): (r["n"], r["vc"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("vc"),
        )
        .collect()
    }
    assert got == expected
