"""The Spark extraction stage — the engine's core operator.

Reference parity: this is the Spark re-expression of the reference's
per-document map chain ``convert_files → extract → converter(src_path)``
(``converters/pdf_to_md.py:121-250``) and its three pool strategies
(``ui/gradio_process.py:61-176``).  Design points:

- **Zero-shuffle by construction**: the input table keeps a document's
  spans co-located in one row (``array<struct>``), so extraction is a
  single ``mapInPandas`` pass — no explode, no reassembly shuffle.  This
  is the single biggest 10^12-scale lever (SURVEY.md §7.4-7): the plan
  is Scan → ArrowEvalPython → (sink), with zero Exchange nodes.
- **Arrow-vectorized**: documents cross the JVM↔Python boundary as
  Arrow record batches (``maxRecordsPerBatch`` bounds giant-doc memory);
  no per-row Python UDF (input_hint).
- **Row-level error capture**: a malformed document yields a
  ``status="error"`` metrics row, never a task failure — mirroring the
  reference's return-not-raise contract (``pdf_to_md.py:240-243``).
  Task-level transient failures stay with ``spark.task.maxFailures``.
- **One pass, two outputs**: span rows and per-doc metrics rows ride the
  same iterator (metrics rows carry ``kind='_metrics'``), so extraction
  runs once; callers split with two cheap filters (write the combined
  frame first at scale, or persist).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from parserpdf_spark.kernels.extract import extract_document_safe
from parserpdf_spark.schema import COMBINED_DDL

_METRICS_KIND = "_metrics"

_SPAN_COLS = ["doc_id", "kind", "text", "media_ref", "offset"]
_METRIC_COLS = [
    "doc_id", "status", "error", "n_input_spans", "n_output_spans", "n_images",
]


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """docs(doc_id, spans) batches → combined span+metrics row batches.

    Executor-side analog of the reference's worker loop; per-executor
    one-time init (the reference's model-dict singleton,
    ``ui/gradio_process.py:39-54``) is module import itself — the
    kernels build no per-call state.
    """
    for pdf in batches:
        span_rows: dict[str, list] = {c: [] for c in _SPAN_COLS}
        met_rows: dict[str, list] = {c: [] for c in _METRIC_COLS}
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            out, metrics = extract_document_safe(
                list(spans) if spans is not None else None
            )
            for s in out:
                span_rows["doc_id"].append(doc_id)
                span_rows["kind"].append(s["kind"])
                span_rows["text"].append(s["text"])
                span_rows["media_ref"].append(s["media_ref"])
                span_rows["offset"].append(s["offset"])
            met_rows["doc_id"].append(doc_id)
            for k in _METRIC_COLS[1:]:
                met_rows[k].append(metrics[k])

        spans_df = pd.DataFrame(span_rows)
        spans_df["status"] = None
        spans_df["error"] = None
        spans_df["n_input_spans"] = None
        spans_df["n_output_spans"] = None
        spans_df["n_images"] = None

        met_df = pd.DataFrame(met_rows)
        met_df["kind"] = _METRICS_KIND
        met_df["text"] = None
        met_df["media_ref"] = None
        met_df["offset"] = None

        cols = [
            "doc_id", "kind", "text", "media_ref", "offset",
            "status", "error", "n_input_spans", "n_output_spans", "n_images",
        ]
        yield pd.concat(
            [spans_df[cols], met_df[cols]], ignore_index=True
        )


def extract_combined(docs: DataFrame) -> DataFrame:
    """docs(doc_id, spans) → combined frame of span rows + metrics rows.

    Single narrow stage; write this once at scale, then derive the two
    tables from the stored result.
    """
    return docs.mapInPandas(_extract_batches, schema=COMBINED_DDL)


def split_combined(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """combined → (extracted spans, metrics) — two pushdown-able filters."""
    extracted = combined.filter(F.col("kind") != _METRICS_KIND).select(*_SPAN_COLS)
    metrics = combined.filter(F.col("kind") == _METRICS_KIND).select(*_METRIC_COLS)
    return extracted, metrics


def extract_docs(
    docs: DataFrame, persist: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(extracted, metrics) from a docs table.

    ``persist=True`` caches the combined frame so materializing both
    outputs runs extraction once; at 100 TB prefer
    ``extract_combined(...).write`` + ``split_combined(spark.read...)``.
    """
    combined = extract_combined(docs)
    if persist:
        combined = combined.persist()
    return split_combined(combined)


def reassemble(extracted: DataFrame) -> DataFrame:
    """Exploded output spans → one row per doc with an ordered span array.

    ``sort_array`` on ``struct(offset, …)`` sorts by offset first (struct
    comparison is field-order lexicographic), giving the deterministic
    span-sequence the equality invariant needs even though
    ``collect_list`` is shuffle-order-nondeterministic.
    """
    return extracted.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
        ).alias("spans")
    )
