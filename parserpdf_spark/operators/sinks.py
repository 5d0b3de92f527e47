"""Export sinks: per-document markdown files + media manifests.

The canonical store is the relational ``extracted`` table (chunked
parquet, plans/checkpoint.py); these sinks materialize the reference's
on-disk layout from it when a consumer needs files:

- K1 markdown sink (reference ``utils/file_utils.py:474-558``): one
  ``{out}/{doc_id}/{doc_id}.md`` per document, image spans rendered as
  ``![](ref)`` lines exactly like the golden artifact.
- K2 image sink (reference ``:562-626``): payloads live outside the
  engine (the reference also writes them straight to disk); we emit the
  per-doc media manifest (ref list) the writer needs.

Distribution: ``foreachPartition`` — each executor writes its own docs,
no driver collect.  Only the export is file-per-doc; at 10^12 docs you
export *selections*, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def render_markdown_col(extracted: DataFrame) -> DataFrame:
    """(doc_id, markdown, media_refs) — the assembled export view."""
    rendered = F.when(
        F.col("kind") == "image",
        F.concat(F.lit("![]("), F.coalesce(F.col("media_ref"), F.lit("")), F.lit(")")),
    ).otherwise(F.col("text"))
    return (
        extracted.select("doc_id", "offset", rendered.alias("md"), "media_ref")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("offset", "md"))),
                    lambda s: s["md"],
                ),
            ).alias("markdown"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("media_ref").isNotNull(),
                           F.struct("offset", "media_ref"))
                )
            ).alias("_refs"),
        )
        .select(
            "doc_id",
            "markdown",
            F.transform(F.col("_refs"), lambda s: s["media_ref"]).alias(
                "media_refs"
            ),
        )
    )


def export_markdown_files(extracted: DataFrame, out_dir: str) -> int:
    """Write ``{out_dir}/{doc_id}/{doc_id}.md`` (+ ``media.txt`` manifest
    when the doc has media) for every document; returns docs written."""
    view = render_markdown_col(extracted)

    def write_partition(rows):
        import os as _os

        for row in rows:
            doc_dir = _os.path.join(out_dir, row["doc_id"])
            _os.makedirs(doc_dir, exist_ok=True)
            with open(
                _os.path.join(doc_dir, f"{row['doc_id']}.md"), "w"
            ) as fh:
                fh.write(row["markdown"])
                fh.write("\n")
            if row["media_refs"]:
                with open(_os.path.join(doc_dir, "media.txt"), "w") as fh:
                    fh.write("\n".join(row["media_refs"]) + "\n")

    os.makedirs(out_dir, exist_ok=True)
    view.foreachPartition(write_partition)
    return len(os.listdir(out_dir))
