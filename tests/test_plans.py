"""Physical-plan guards: the scale claims (zero-shuffle extraction,
filter pushdown, column pruning, broadcast joins) asserted on
`.explain` output so a regression that silently adds a shuffle or drops
a pushdown fails CI."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def node_count(plan: str, name: str) -> int:
    """Count physical nodes by their detail headers '(n) <Name>' —
    the tree section prints every node a second time."""
    n = 0
    for line in plan.splitlines():
        s = line.strip()
        if s.startswith("(") and ") " in s:
            label = s.split(") ", 1)[1]
            if label == name or label.startswith(name + " "):
                n += 1
    return n


def test_extraction_plan_has_no_exchange(spark, sf_small):
    """The core claim: array-input extraction is one narrow stage."""
    from parserpdf_spark.operators.extract import extract_combined

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("html").alias("kind"),
                F.lit("<p>x</p>").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )
    plan = plan_of(extract_combined(docs))
    assert node_count(plan, "Exchange") == 0
    assert node_count(plan, "BroadcastExchange") == 0
    assert "MapInArrow" in plan


def test_pricing_summary_pushdown_and_pruning(spark, sf_med):
    import __spark_entry__ as m

    plan = plan_of(m.q_pricing_summary(spark, sf_med))
    # the shipdate filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: only the 6 needed columns are read
    read_schema = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ][0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_extendedprice" in read_schema


def test_dimension_joins_are_broadcast(spark, sf_med):
    import __spark_entry__ as m

    plan = plan_of(m.q_broadcast_join_segments(spark, sf_med))
    assert node_count(plan, "BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    plan2 = plan_of(m.q_star_join_regions(spark, sf_med))
    assert node_count(plan2, "BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan2


def test_page_filter_stays_array_local(spark, sf_small):
    from parserpdf_spark.operators.extract import extract_combined
    from parserpdf_spark.operators.pages import filter_pages
    from parserpdf_spark.sources.synth import synth_docs_df

    docs = filter_pages(synth_docs_df(spark, sf_small, partitions=4), "0")
    plan = plan_of(extract_combined(docs))
    # one Exchange is the synth scaffold's repartition of the raw text
    # table; page filtering + extraction must not add another
    assert node_count(plan, "Exchange") <= 1


def test_salted_assembly_splits_hot_keys(spark, sf_small):
    """The salted path's plan partially aggregates per (doc_id, salt)
    before the final per-doc merge, and splits giant/normal docs with a
    literal isin predicate (collected skew tail) — no join at all."""
    from parserpdf_spark.operators.skew import assemble_spans, explode_docs
    from parserpdf_spark.sources.synth import synth_docs_df

    exploded = explode_docs(
        synth_docs_df(spark, sf_small, giant_doc_ids=["7"], giant_spans=900,
                      partitions=4)
    )
    plan = plan_of(assemble_spans(exploded, giant_threshold=500, num_salts=4))
    assert "pmod" in plan  # the salt key
    # the split is a literal filter, not a join of the span data
    assert "Join" not in plan


def test_file_ingestion_plan_has_no_exchange(spark):
    """The scan → bridge → extraction path is narrow end-to-end: the
    binaryFile splits ARE the parallelism, nothing shuffles."""
    import os

    from parserpdf_spark.operators.extract import extract_combined
    from parserpdf_spark.sources.files import files_to_docs, ingested_docs
    from parserpdf_spark.sources.scans import scan_files

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fixtures", "files_corpus",
    )
    files = scan_files(spark, fixtures, "*", with_content=True)
    plan = plan_of(extract_combined(ingested_docs(files_to_docs(files))))
    assert node_count(plan, "Exchange") == 0
    assert "MapInPandas" in plan and "MapInArrow" in plan

    # the OCR tier keeps the same narrow shape: the recognizer runs
    # inside the bridge's mapInPandas, nothing shuffles
    ocr_fixtures = os.path.join(os.path.dirname(fixtures), "ocr_corpus")
    ocr_files = scan_files(spark, ocr_fixtures, "*", with_content=True)
    plan = plan_of(
        extract_combined(ingested_docs(files_to_docs(ocr_files, ocr=True)))
    )
    assert node_count(plan, "Exchange") == 0
    assert "MapInPandas" in plan and "MapInArrow" in plan


def test_bucketed_embedding_dedup_never_cartesian(spark, sf_med):
    """The SRP scale path must stay an equi-join on (band, key) — a
    regression to crossJoin/BNLJ is the 100 TB killer."""
    from parserpdf_spark.operators.dedup import embedding_dup_pairs_bucketed

    emb = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    plan = plan_of(embedding_dup_pairs_bucketed(emb, threshold=0.95))
    assert node_count(plan, "CartesianProduct") == 0
    assert node_count(plan, "BroadcastNestedLoopJoin") == 0


def test_ivf_probe_join_broadcasts_queries(spark, sf_med):
    """The IVF bucket join broadcasts the probe side so the corpus-sized
    assigned table never shuffles for the join."""
    from pyspark.sql import functions as F

    from parserpdf_spark.operators.ann import ann_ivf_topk

    emb = spark.read.parquet(f"{sf_med}/embeddings.parquet")
    df = ann_ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=3, every=50,
                      n_probe=2)
    assert node_count(plan_of(df), "BroadcastHashJoin") >= 1


def test_decontamination_broadcasts_eval_shingles(spark, sf_med):
    """The eval shingle set is small by construction; the semi-join must
    broadcast it so the exploded TRAIN shingles (the dominant volume at
    100 TB) are never shuffled on the join key."""
    import __spark_entry__ as m

    plan = plan_of(m.q_decontamination(spark, sf_med))
    assert "BroadcastHashJoin" in plan
    # no sort-merge semi-join on the shingle anywhere in the plan
    assert "SortMergeJoin LeftSemi" not in plan


def test_minhash_signatures_zero_shuffle(spark, sf_small):
    """r6: the 64-permutation signature pass is a pure narrow map —
    array-local mins over the per-doc shingle-hash array, with NO
    exploded shuffle and NO aggregate at all."""
    from parserpdf_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = plan_of(minhash_signatures(docs))
    assert node_count(plan, "Exchange") == 0
    assert node_count(plan, "HashAggregate") == 0


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


# the two documented brute-force baselines are the ONLY queries allowed
# a cartesian/broadcast-nested-loop pair space
_CARTESIAN_OK = {"embedding_dups", "ann_topk", "ann_ivf_full_probe"}


def test_no_driver_query_is_accidentally_cartesian(spark, sf_small):
    """Plan-hygiene sweep over the whole driver surface: any query that
    grows a CartesianProduct/BroadcastNestedLoopJoin outside the
    documented brute-force baselines is a 100 TB regression."""
    import __spark_entry__ as m

    offenders = {}
    for name, q in m.queries().items():
        if name in _CARTESIAN_OK:
            continue
        plan = q(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
        bad = [
            node for node in ("CartesianProduct", "BroadcastNestedLoopJoin")
            if node in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"cartesian pair spaces crept in: {offenders}"
