"""File-bytes → docs ingestion bridge (sources/files.py) and the docx
shim kernel (kernels/docx_extract.py): the reference's *path in,
markdown out* loop (converters/pdf_to_md.py:121-189) run end-to-end on
the committed real-file fixture corpus."""

import os

import pytest
from pyspark.sql import functions as F

from parserpdf_spark.kernels.docx_extract import docx_to_html
from parserpdf_spark.operators.extract import extract_docs
from parserpdf_spark.sources.files import files_to_docs, ingested_docs, route_file
from parserpdf_spark.sources.scans import scan_files

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "fixtures", "files_corpus")


# ---------------------------------------------------------------------------
# docx kernel (pure python)
# ---------------------------------------------------------------------------

def _fixture_bytes(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as fh:
        return fh.read()


def test_docx_to_html_structure():
    html = docx_to_html(_fixture_bytes("doc_1.docx"))
    assert html.startswith("<body><article><h1>")
    assert "<p>" in html
    assert '<img src="media/figure1.png"/>' in html  # nid%4==1 → image


def test_docx_table():
    html = docx_to_html(_fixture_bytes("doc_4.docx"))  # nid%2==0 → table
    assert "<table><tr><td>" in html


def test_docx_rejects_garbage():
    with pytest.raises(ValueError, match="not a docx"):
        docx_to_html(b"this is not an OOXML zip archive")
    with pytest.raises(ValueError, match="not a docx"):
        # a zip, but no word/document.xml inside
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr("other.txt", "x")
        docx_to_html(buf.getvalue())


def test_route_file_statuses():
    assert route_file("/x/a.html", b"<p>hi</p>")["ingest_status"] == "ok"
    assert route_file("/x/a.pdf", b"%PDF")["ingest_status"] == "needs_prechunk"
    assert route_file("/x/a.txt", b"t")["ingest_status"] == "skipped"
    assert route_file("/x/LICENSE", b"t")["ingest_status"] == "skipped"
    bad = route_file("/x/a.docx", b"garbage")
    assert bad["ingest_status"] == "error" and "docx" in bad["ingest_error"]
    # invalid utf-8 html is an error row, not a task failure
    bad_utf = route_file("/x/a.html", b"\xff\xfe\x00broken")
    assert bad_utf["ingest_status"] == "error"
    # doc_id is the stem
    assert route_file("/deep/dir/my.file.html", b"<p>x</p>")["doc_id"] == "my.file"


# ---------------------------------------------------------------------------
# Spark bridge, end-to-end on the fixture corpus
# ---------------------------------------------------------------------------

def test_scan_to_extract_end_to_end(spark):
    files = scan_files(spark, FIXTURES, "*", with_content=True)
    bridged = files_to_docs(files)
    statuses = {
        r["ingest_status"]: r["n"]
        for r in bridged.groupBy("ingest_status").agg(F.count("*").alias("n")).collect()
    }
    assert statuses == {"ok": 26, "error": 1, "needs_prechunk": 1, "skipped": 2}

    extracted, metrics = extract_docs(ingested_docs(bridged), persist=True)
    assert metrics.filter(F.col("status") != "ok").count() == 0
    assert metrics.count() == 26

    # the distributed path reproduces the committed pure-python golden
    golden = spark.read.parquet(os.path.join(REPO, "goldens", "extract_files.parquet"))
    got = {tuple(r) for r in extracted.collect()}
    want = {tuple(r) for r in golden.select(*extracted.columns).collect()}
    assert got == want


def test_docx_and_html_agree_on_shared_structure(spark):
    """A docx doc and an html doc derived from the same source text get
    the same heading — one extraction path, two ingest formats."""
    files = scan_files(spark, FIXTURES, "*.docx", with_content=True)
    docs = ingested_docs(files_to_docs(files))
    extracted, _ = extract_docs(docs)
    headings = {
        r["doc_id"]: r["text"]
        for r in extracted.filter(F.col("kind") == "heading").collect()
    }
    import pandas as pd

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    by_id = dict(zip(src["doc_id"].astype(int), src["text"]))
    for doc_id, heading in headings.items():
        nid = int(doc_id.split("_")[1])
        words = [w for w in by_id[nid].split(" ") if w]
        assert heading == "# " + " ".join(words[:3])
