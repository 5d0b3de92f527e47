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


def test_docx_corrupt_deflate_is_error_row_not_zlib_error():
    """A structurally-valid zip whose word/document.xml deflate stream
    is corrupt raises zlib.error from zipfile.read — that must map to
    the ValueError → status='error' contract, not kill the task."""
    good = bytearray(_fixture_bytes("doc_1.docx"))
    # stomp bytes shortly after the first local file header's name —
    # inside the first member's deflate stream (document order: the
    # [Content_Types].xml member; any member corruption must be caught)
    start = good.find(b"word/document.xml")
    if start < 0:  # fall back to corrupting past the first header
        start = 60
    good[start + 40 : start + 56] = b"\x00" * 16
    with pytest.raises(ValueError, match="docx"):
        docx_to_html(bytes(good))
    row = route_file("/x/doc_1.docx", bytes(good))
    assert row["ingest_status"] == "error"


def test_route_file_statuses():
    assert route_file("/x/a.html", b"<p>hi</p>")["ingest_status"] == "ok"
    # a PDF outside the built-in text subset keeps the pre-chunker contract
    assert route_file("/x/a.pdf", b"%PDF-1.4 no objects")["ingest_status"] == "needs_prechunk"
    assert route_file("/x/a.pdf", b"not even a pdf")["ingest_status"] == "needs_prechunk"
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
    assert statuses == {"ok": 30, "error": 1, "needs_prechunk": 1, "skipped": 2}

    extracted, metrics = extract_docs(ingested_docs(bridged), persist=True)
    assert metrics.filter(F.col("status") != "ok").count() == 0
    assert metrics.count() == 30

    # the distributed path reproduces the committed pure-python golden
    golden = spark.read.parquet(os.path.join(REPO, "goldens", "extract_files.parquet"))
    got = {tuple(r) for r in extracted.collect()}
    want = {tuple(r) for r in golden.select(*extracted.columns).collect()}
    assert got == want


def test_streaming_file_ingestion_incremental(spark, tmp_path):
    """Drop real files into a watched dir, drain, drop more, drain again:
    only new files are processed (exactly-once via checkpoint), and the
    extraction output matches the committed golden for those docs."""
    import shutil

    from parserpdf_spark.operators.extract import split_combined
    from parserpdf_spark.streaming.ingest import run_incremental_file_ingestion

    watch = tmp_path / "watch"
    watch.mkdir()
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    for name in ("doc_0.html", "doc_1.docx"):
        shutil.copy(os.path.join(FIXTURES, name), watch)
    run_incremental_file_ingestion(spark, str(watch), out, ck)
    first = spark.read.parquet(out)
    _, m1 = split_combined(first)
    assert sorted(r["doc_id"] for r in m1.collect()) == ["doc_0", "doc_1"]

    # second drop: one new html, one skipped txt — only the html lands
    shutil.copy(os.path.join(FIXTURES, "doc_3.html"), watch)
    shutil.copy(os.path.join(FIXTURES, "readme_1.txt"), watch)
    run_incremental_file_ingestion(spark, str(watch), out, ck)
    extracted, metrics = split_combined(spark.read.parquet(out))
    docs = sorted(r["doc_id"] for r in metrics.collect())
    assert docs == ["doc_0", "doc_1", "doc_3"]  # no dupes, no txt

    golden = spark.read.parquet(
        os.path.join(REPO, "goldens", "extract_files.parquet")
    ).filter(F.col("doc_id").isin("doc_0", "doc_1", "doc_3"))
    got = {tuple(r) for r in extracted.select(*golden.columns).collect()}
    want = {tuple(r) for r in golden.collect()}
    assert got == want


def test_extract_job_over_raw_files(spark, tmp_path):
    """The spark-submit entry accepts a plain directory of files and
    reports both ingest statuses and extraction statuses."""
    import io
    import json
    from contextlib import redirect_stdout

    from parserpdf_spark.jobs.extract_job import main

    out = str(tmp_path / "jobout")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["--input", FIXTURES, "--output", out, "--chunks", "4"],
            spark=spark,
        )
    assert rc == 0
    report = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert report["files_by_ingest_status"] == {
        "ok": 30, "error": 1, "needs_prechunk": 1, "skipped": 2,
    }
    assert report["docs_by_status"] == {"ok": 30}
    assert sorted(report["committed_this_run"]) == [0, 1, 2, 3]


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


# ---------------------------------------------------------------------------
# PDF binary kernel (pure python)
# ---------------------------------------------------------------------------

def test_pdf_binary_roundtrip_reading_order():
    """Real .pdf bytes (built fixtures, one raw + one Flate) parse into
    blocks whose kernel extraction reproduces the source text in exact
    2-column reading order."""
    import json

    import pandas as pd

    from parserpdf_spark.kernels.pdf_binary import pdf_to_blocks
    from parserpdf_spark.kernels.pdf_extract import extract_pdf_blocks

    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    by_id = dict(zip(src["doc_id"].astype(int), src["text"]))
    for name in ("doc_25.pdf", "doc_28.pdf"):  # raw, FlateDecode
        blocks = pdf_to_blocks(_fixture_bytes(name))
        spans = extract_pdf_blocks([(json.dumps(b), None) for b in blocks])
        nid = int(name.split("_")[1].split(".")[0])
        words = [w for w in by_id[nid].split(" ") if w]
        assert spans[0]["kind"] == "heading"
        assert spans[0]["text"] == "# " + " ".join(words[:3])
        chunks = [
            " ".join(words[3:][i:i + 12])
            for i in range(0, len(words) - 3, 12)
        ]
        assert [s["text"] for s in spans if s["kind"] == "para"] == chunks


def test_pdf_binary_rejects_out_of_subset():
    from parserpdf_spark.kernels.pdf_binary import pdf_to_blocks

    with pytest.raises(ValueError, match="not a PDF"):
        pdf_to_blocks(b"plain bytes")
    with pytest.raises(ValueError, match="encrypted"):
        pdf_to_blocks(b"%PDF-1.4\n1 0 obj << /Encrypt 2 0 R >> endobj")
    with pytest.raises(ValueError, match="no extractable text"):
        pdf_to_blocks(b"%PDF-1.4\n%% nothing else")


def test_pdf_string_escapes():
    from parserpdf_spark.kernels.pdf_binary import _decode_pdf_string

    assert _decode_pdf_string(rb"a\(b\)c \\ d") == "a(b)c \\ d"
    assert _decode_pdf_string(rb"x\ny\t\101") == "x\ny\tA"
