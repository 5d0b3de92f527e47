"""spark-submit entry point for the corpus-curation pipeline.

The training-data composition the engine's operators exist for, as one
command: quality gate → exact dedup → (optional) train/eval
decontamination → deterministic stratified sampling → per-stratum
token-budget shard packing → shards written as
``{output}/lang=…/shard_id=…/`` parquet partitions.

Cluster use::

    zip -r engine.zip parserpdf_spark
    spark-submit --py-files engine.zip parserpdf_spark/jobs/curate_job.py \\
        --input <docs parquet dir | sf dir> --output <dir> \\
        --fraction en=0.5 --fraction de=0.25 --shard-tokens 1000000 \\
        [--eval <eval docs parquet dir>]

Local smoke (this sandbox)::

    python parserpdf_spark/jobs/curate_job.py \\
        --input /root/testdata/sf0.001 --output /tmp/shards --cores 8 \\
        --fraction en=0.5 --fraction de=0.5 --fraction es=0.5 \\
        --fraction fr=0.5 --fraction zh=0.5 --shard-tokens 10000

Every stage is deterministic (hash-threshold sampling, min-id dedup,
doc_id-ordered packing), so re-running over the same input reproduces
the same shards byte-for-byte — the property training-data pipelines
are audited on.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
if _REPO_ROOT not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
    ).rstrip(os.pathsep)


def _read_docs(spark, path: str):
    if os.path.exists(os.path.join(path, "documents.parquet")):
        return spark.read.parquet(os.path.join(path, "documents.parquet"))
    return spark.read.parquet(path)


def main(argv=None, spark=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="docs parquet dir with (doc_id, text, lang) or an "
                         "sf dir containing documents.parquet")
    ap.add_argument("--output", required=True)
    ap.add_argument("--fraction", action="append", default=[],
                    metavar="LANG=F",
                    help="per-stratum keep fraction (repeatable)")
    ap.add_argument("--default-fraction", type=float, default=0.0)
    ap.add_argument("--shard-tokens", type=int, default=1_000_000)
    ap.add_argument("--eval", default=None,
                    help="optional eval-set parquet (doc_id, text): curated "
                         "docs sharing an 8-gram with it are dropped")
    ap.add_argument("--cores", default=None,
                    help="local[N] cores; omit under spark-submit")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    owns_session = spark is None
    if owns_session:
        if args.cores is not None:
            from parserpdf_spark.session import get_spark

            spark = get_spark(cores=args.cores, app_name="parserpdf_curate_job")
        else:
            spark = (
                SparkSession.builder.appName("parserpdf_curate_job").getOrCreate()
            )

    from pyspark.sql import functions as F

    from parserpdf_spark.operators.curation import curate, pack_shards
    from parserpdf_spark.operators.dedup import ngram_contamination

    fractions = {}
    for spec in args.fraction:
        lang, _, frac = spec.partition("=")
        fractions[lang] = float(frac)

    docs = _read_docs(spark, args.input).select("doc_id", "text", "lang")
    curated, funnel = curate(
        docs, fractions, key_col="lang", text_col="text",
        default_fraction=args.default_fraction,
    )
    report = {
        "funnel": {r["stage"]: r["n_docs"] for r in funnel.collect()},
    }

    if args.eval is not None:
        eval_docs = _read_docs(spark, args.eval).select("doc_id", "text")
        flagged = ngram_contamination(curated, eval_docs, n=8)
        clean_ids = flagged.filter(~F.col("contaminated")).select("doc_id")
        curated = curated.join(clean_ids, "doc_id", "left_semi")

    packed = pack_shards(
        curated, shard_tokens=args.shard_tokens, stratum_col="lang"
    )
    # persist the FINAL frame: the whole quality→dedup→sample→decontam→
    # pack lineage materializes once and serves the write + every report
    # aggregate (curate()'s internal caches are freed before it returns)
    shards = packed.join(
        docs.select("doc_id", "text"), "doc_id"
    ).select("lang", "shard_id", "doc_id", "n_tokens", "text").persist()
    n_written = shards.count()
    if args.eval is not None:
        report["funnel"]["5_decontaminated"] = n_written
    if n_written:
        shards.write.mode("overwrite").partitionBy("lang", "shard_id").parquet(
            args.output
        )
    report["n_docs_written"] = n_written
    report["n_shards"] = shards.select("lang", "shard_id").distinct().count()
    report["total_tokens"] = (
        shards.agg(F.sum("n_tokens").cast("bigint").alias("t"))
        .collect()[0]["t"] or 0
    )
    shards.unpersist()
    print(json.dumps(report))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
