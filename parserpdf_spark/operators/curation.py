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

from pyspark.sql import DataFrame, Window as W, functions as F

from parserpdf_spark.operators.dedup import stratified_sample
from parserpdf_spark.operators.textops import gopher_quality


def curate(
    docs: DataFrame,
    fractions: dict[str, float],
    key_col: str = "lang",
    text_col: str = "text",
    default_fraction: float = 0.0,
) -> tuple[DataFrame, DataFrame]:
    """(curated_docs, funnel) — curated rows plus per-stage counts.

    ``funnel`` is (stage string, n_docs bigint) for
    raw → quality → dedup → sample, each stage applied to the previous
    stage's survivors.  The two heavy stages are persisted while the
    four counts materialize, so the Gopher gate and the dedup semi-joins
    each execute exactly ONCE per curate() call (not once per count);
    both caches are freed before returning.  The returned curated
    DataFrame is an ordinary lazy plan — persist it at the call site if
    it feeds multiple downstream actions.
    """
    from pyspark import StorageLevel

    quality_ids = gopher_quality(docs, text_col=text_col).filter(
        F.col("keep")
    ).select("doc_id")
    quality = docs.join(quality_ids, "doc_id", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    canonical = (
        quality.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = quality.join(canonical, "doc_id", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )

    sampled = stratified_sample(
        deduped, fractions, key_col=key_col, id_col="doc_id",
        default=default_fraction,
    )

    spark = docs.sparkSession
    # count order matters: quality.count() populates the quality cache,
    # so deduped.count() computes canonical FROM that cache (the gopher
    # lineage runs once); sampled is a filter over the deduped cache
    counts = [
        ("1_raw", docs.count()),
        ("2_quality", quality.count()),
        ("3_dedup", deduped.count()),
        ("4_sample", sampled.count()),
    ]
    quality.unpersist()
    deduped.unpersist()
    funnel = spark.createDataFrame(counts, "stage string, n_docs long")
    return sampled, funnel


def pack_shards(
    docs: DataFrame,
    shard_tokens: int,
    *,
    stratum_col: str | None,
    text_col: str = "text",
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign docs to fixed-budget training shards: running token total
    in a deterministic order, shard = floor(cumulative_before / budget).

    ``stratum_col`` is required (pass ``None`` explicitly for the global
    form): with a stratum (e.g. language, domain, date bucket) each
    stratum packs independently under
    ``Window.partitionBy(stratum).orderBy(order)`` — strata sort in
    parallel across the cluster and no task ever sees the whole corpus.
    ``stratum_col=None`` is the tiny-corpus special case: a single
    global ordering window, which Spark executes as a one-task
    single-partition sort — correct, but deliberately opt-in because it
    cannot scale.

    The order column makes packing reproducible (training-data shards
    must be stable across reruns); a doc larger than the budget still
    lands in exactly one shard.
    """
    toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
    )
    if stratum_col is None:
        w = W.orderBy(F.col(order_col).asc())
        lead_cols = []
    else:
        w = W.partitionBy(stratum_col).orderBy(F.col(order_col).asc())
        lead_cols = [F.col(stratum_col).alias(stratum_col)]
    w = w.rowsBetween(W.unboundedPreceding, -1)
    before = F.coalesce(
        F.sum(toks).over(w), F.lit(0).cast("bigint")
    )
    return docs.select(
        *lead_cols,
        F.col(order_col).alias("doc_id"),
        toks.cast("bigint").alias("n_tokens"),
        F.floor(before / F.lit(int(shard_tokens))).cast("int").alias("shard_id"),
    )
