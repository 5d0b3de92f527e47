"""The corpus-curation funnel: quality gate → exact dedup → stratified
sample, composed from the engine's oracled primitives — the end-to-end
shape a training-data pipeline runs over extracted text (each stage is
individually gated elsewhere; this operator chains them and reports the
funnel counts, the number every curation run is judged by).

All three stages are deterministic (no RNG, no partitioning
sensitivity), so the curated doc set is reproducible run-to-run and
engine-to-engine:

- quality: the Gopher-rule ``keep`` gate (textops.gopher_quality)
- dedup: keep the min-doc_id copy per distinct text (dedup family)
- sample: md5 hash-threshold per stratum (dedup.stratified_sample)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from parserpdf_spark.operators.dedup import stratified_sample
from parserpdf_spark.operators.textops import gopher_quality


def curate(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "lang",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """(curated_docs, funnel) — curated rows plus per-stage counts.

    ``funnel`` is (stage string, n_docs bigint) for
    raw → quality → dedup → sample, each stage applied to the previous
    stage's survivors.  One action materializes all four counts (the
    stages are cached as a single lineage; counts are cheap aggregates).
    """
    quality_ids = gopher_quality(docs, text_col=text_col).filter(
        F.col("keep")
    ).select("doc_id")
    quality = docs.join(quality_ids, "doc_id", "left_semi")

    canonical = (
        quality.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(canonical, "doc_id", "left_semi")

    sampled = stratified_sample(
        deduped, fractions, key_col=key_col, id_col="doc_id"
    )

    spark = docs.sparkSession
    counts = [
        ("1_raw", docs.count()),
        ("2_quality", quality.count()),
        ("3_dedup", deduped.count()),
        ("4_sample", sampled.count()),
    ]
    funnel = spark.createDataFrame(counts, "stage string, n_docs long")
    return sampled, funnel


def pack_shards(
    docs: DataFrame,
    shard_tokens: int,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-budget training shards: running token total
    in a deterministic order, shard = floor(cumulative_before / budget).

    The order column makes packing reproducible (training-data shards
    must be stable across reruns); a doc larger than the budget still
    lands in exactly one shard.  The single global-ordering window is
    the op's honest cost — at corpus scale, pack per partition key
    (e.g. per language) so each stratum's window is independent."""
    from pyspark.sql import Window as W

    toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    )
    w = W.orderBy(F.col(order_col).asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    before = F.coalesce(
        F.sum(toks).over(w), F.lit(0).cast("bigint")
    )
    return docs.select(
        F.col(order_col).alias("doc_id"),
        toks.cast("bigint").alias("n_tokens"),
        F.floor(before / F.lit(int(shard_tokens))).cast("int").alias("shard_id"),
    )
