"""Custom stateful streaming operator: cross-batch document dedup.

The reference's upload accumulation keeps duplicates
(``utils/file_utils.py:413`` concatenates without dedup); at stream
scale an idempotent ingest needs the opposite — drop documents whose
``doc_id`` was already seen in ANY earlier micro-batch.  That is
per-key state across batches: ``applyInPandasWithState`` with a
seen-flag per doc_id (the "custom stateful operator" shape —
GroupState + timeout — that windowed aggs can't express).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)
STATE_SCHEMA = "seen boolean"


def _first_occurrence(key, pdfs, state: GroupState):
    """Emit the first-ever row for this doc_id; swallow replays."""
    if state.exists:
        return iter(())  # already emitted in an earlier batch
    first = None
    for pdf in pdfs:
        if len(pdf) and first is None:
            first = pdf.iloc[[0]]
    if first is None:
        return iter(())
    state.update((True,))
    return iter([first[["doc_id", "spans"]]])


def dedup_stream(docs_stream: DataFrame) -> DataFrame:
    """Streaming exactly-once-per-doc_id filter (first occurrence wins,
    later replays dropped — across micro-batches, not just within one)."""
    return docs_stream.groupBy("doc_id").applyInPandasWithState(
        _first_occurrence,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_dedup(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str
):
    """Drain the input dir through the stateful dedup into parquet."""
    from parserpdf_spark.schema import DOCS_SCHEMA

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(input_dir)
    )
    query = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
