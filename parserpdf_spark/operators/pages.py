"""Page-range pruning (reference F4).

The reference plumbs a ``page_range`` spec ("0,4-8,16") into Marker so
only selected pages parse (``converters/extraction_converter.py:57,79,
197``; UI default first-page-only ``ui/gradio_ui.py:194-200``).  Here
pages are data, so the spec becomes a plain filter over ``pdf_block``
spans — Catalyst folds the page-set literal and the pruning happens
before any kernel work, the same position in the plan the reference's
hand-rolled optimization occupies (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def parse_page_spec(spec: str) -> list[int]:
    """"0,4-8,16" → [0,4,5,6,7,8,16] (the reference's spec grammar)."""
    pages: list[int] = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "-" in part:
            lo, hi = part.split("-", 1)
            pages.extend(range(int(lo), int(hi) + 1))
        else:
            pages.append(int(part))
    return sorted(set(pages))


def filter_pages(docs: DataFrame, spec: str) -> DataFrame:
    """Keep only ``pdf_block`` spans on pages in ``spec`` (html/media
    spans are pageless and always pass) — array-local, zero shuffle.

    A pdf_block whose JSON is malformed or lacks a page field parses to
    NULL; such spans are KEPT, not dropped — downstream the kernel's
    ValueError path turns them into a ``status="error"`` metrics row.
    Dropping them here would silently truncate a broken document and
    report it ok."""
    pages = parse_page_spec(spec)
    return docs.withColumn(
        "spans",
        F.filter(
            F.col("spans"),
            lambda s: (s["kind"] != "pdf_block")
            | F.get_json_object(s["text"], "$.page").cast("int").isin(pages)
            | F.get_json_object(s["text"], "$.page").cast("int").isNull(),
        ),
    )
