"""Bucketing: the SURVEY §7.4-7 claim — store exploded spans bucketed by
doc_id and the reassembly groupBy runs WITHOUT an Exchange (the single
biggest 10^12-scale lever for span-per-row inputs)."""

import pytest
from pyspark.sql import functions as F

from parserpdf_spark.operators.skew import explode_docs
from parserpdf_spark.sources.synth import synth_docs_df
from tests.test_plans import node_count, plan_of


def test_bucketed_reassembly_has_no_shuffle(spark, sf_small, tmp_path):
    # table lands in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf that can't move per-test
    exploded = explode_docs(synth_docs_df(spark, sf_small, partitions=4))
    table = "exploded_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        exploded.write.bucketBy(8, "doc_id")
        .sortBy("doc_id", "offset")
        .format("parquet")
        .mode("overwrite")
        .saveAsTable(table)
    )
    stored = spark.table(table)

    assembled = stored.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("spans")
    )
    plan = plan_of(assembled)
    assert node_count(plan, "Exchange") == 0, plan

    # and it is still correct
    n = assembled.count()
    assert n == 500
    one = assembled.filter(F.col("doc_id") == "0").collect()[0]
    assert [s["offset"] for s in one["spans"]] == list(
        range(len(one["spans"]))
    )

    # the unbucketed equivalent DOES shuffle — the claim is a contrast
    unbucketed = exploded.groupBy("doc_id").agg(F.count("*").alias("n"))
    assert node_count(plan_of(unbucketed), "Exchange") >= 1
    spark.sql(f"DROP TABLE IF EXISTS {table}")
