"""File-source scans — the reference's recursive path collectors
re-expressed as Spark readers.

Reference parity (SURVEY.md §2.1):
- S1 ``collect_pdf_paths``      (``utils/file_utils.py:442-450``)
- S2 ``collect_html_paths``     (``:452-463``; note the reference's
  2-arg ``rglob("*.html", ".htm")`` bug silently drops ``.htm`` — here
  the pattern list is explicit)
- S3 ``collect_pdf_html_paths`` (``:427-440``, chained rglobs)
- S4 ``collect_markdown_paths`` (``:465-471``)
- F2 file-with-extension gate   (``:351-356``)

Spark shape: the ``binaryFile`` source with ``pathGlobFilter`` +
``recursiveFileLookup`` — the scan itself is distributed, pushdown
applies to the glob, and the result is a DataFrame of
(path, modificationTime, length, content) instead of a driver-side
``list[Path]`` — the difference between 10^3 and 10^9 files.

Caveat (Spark source behavior, verified): **zero-byte files are not
listed** by the binaryFile source (no splits → no rows), so they bypass
the bridges' keep-with-status rows entirely.  Recordless-but-nonempty
files DO surface as error rows.  Audit empty files at the storage layer
if their absence matters.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

# the reference's allowed-extension tuple (globals.py:16)
FILE_TYPES = (".pdf", ".html", ".docx", ".doc")


def scan_files(
    spark: SparkSession,
    root: str,
    glob: str,
    with_content: bool = False,
) -> DataFrame:
    """One recursive glob scan → (path, modificationTime, length[, content])."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    cols = ["path", "modificationTime", "length"]
    if with_content:
        cols.append("content")
    return df.select(*cols)


def scan_pdfs(spark: SparkSession, root: str, **kw) -> DataFrame:
    """S1: recursive ``*.pdf`` scan."""
    return scan_files(spark, root, "*.pdf", **kw)


def scan_html(spark: SparkSession, root: str, **kw) -> DataFrame:
    """S2: recursive ``*.html`` + ``*.htm`` scan (the reference intended
    both; its 2-arg rglob call makes ``.htm`` dead code)."""
    return scan_multi(spark, root, ["*.html", "*.htm"], **kw)


def scan_markdown(spark: SparkSession, root: str, **kw) -> DataFrame:
    """S4: recursive ``*.md`` scan."""
    return scan_files(spark, root, "*.md", **kw)


def scan_multi(
    spark: SparkSession, root: str, globs: list[str], **kw
) -> DataFrame:
    """S3/U2: multi-pattern scan as per-pattern scans + unionByName
    (each glob still pushes down to the file index)."""
    scans = [scan_files(spark, root, g, **kw) for g in globs]
    return reduce(lambda a, b: a.unionByName(b), scans)


def with_extension_gate(files: DataFrame, allowed=FILE_TYPES) -> DataFrame:
    """F1/F2: keep-with-status extension gate — rows are never silently
    dropped; mirrors the reference's "skipped {name}" rows
    (``converters/pdf_to_md.py:214-224``)."""
    suffix = F.lower(F.regexp_extract(F.col("path"), r"(\.[^./\\]+)$", 1))
    return files.select(
        "*",
        suffix.alias("suffix"),
        F.when(suffix.isin(*allowed), F.lit("accepted"))
        .otherwise(F.lit("skipped"))
        .alias("status"),
    )


def accumulate_scans(batches: list[DataFrame]) -> DataFrame:
    """S5: incremental source accumulation — the reference concatenates
    upload batches into session state (``utils/file_utils.py:392-424``,
    no dedup, duplicates preserved); ``unionByName`` is the Spark
    equivalent.  For continuous arrival use streaming/ingest.py."""
    return reduce(lambda a, b: a.unionByName(b), batches)
