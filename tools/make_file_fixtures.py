"""Generate the committed real-file ingestion corpus + its goldens.

Builds ``fixtures/files_corpus/`` — actual .html/.htm/.docx/.pdf/.txt
files on disk, deterministically derived from the sandbox's
``sf0.001/documents.parquet`` — and the two goldens the driver oracles
read:

- ``goldens/extract_files.parquet``      — expected extraction spans for
  every ingestable fixture file (pure-python route + kernels, no Spark)
- ``goldens/file_ingest_status.parquet`` — expected keep-with-status row
  per scanned file

Regenerate (together, committed together) whenever the kernels, the
synthesizer, or the routing in sources/files.py change:

    python tools/make_file_fixtures.py
"""

from __future__ import annotations

import os
import shutil
import sys
import zipfile
from xml.etree import ElementTree as ET

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from parserpdf_spark.kernels.extract import extract_document_safe  # noqa: E402
from parserpdf_spark.sources.synth import (  # noqa: E402
    HEAD_WORDS,
    PARA_WORDS,
    _chunks,
    _words,
    synth_html_doc,
)

SF_DIR = "/root/testdata/sf0.001"
FIXTURES = os.path.join(REPO, "fixtures", "files_corpus")
GOLDENS = os.path.join(REPO, "goldens")

_NS = {
    "w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main",
    "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships",
    "wp": "http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing",
    "a": "http://schemas.openxmlformats.org/drawingml/2006/main",
    "pic": "http://schemas.openxmlformats.org/drawingml/2006/picture",
}
for _p, _u in _NS.items():
    ET.register_namespace(_p, _u)


def _w(tag: str) -> str:
    return f"{{{_NS['w']}}}{tag}"


def _para(body, text: str, style: str | None = None):
    p = ET.SubElement(body, _w("p"))
    if style:
        ppr = ET.SubElement(p, _w("pPr"))
        ET.SubElement(ppr, _w("pStyle"), {_w("val"): style})
    r = ET.SubElement(p, _w("r"))
    t = ET.SubElement(r, _w("t"))
    t.text = text
    return p


def _image_para(body, rel_id: str):
    p = ET.SubElement(body, _w("p"))
    r = ET.SubElement(p, _w("r"))
    drawing = ET.SubElement(r, _w("drawing"))
    inline = ET.SubElement(drawing, f"{{{_NS['wp']}}}inline")
    graphic = ET.SubElement(inline, f"{{{_NS['a']}}}graphic")
    gdata = ET.SubElement(graphic, f"{{{_NS['a']}}}graphicData")
    pic = ET.SubElement(gdata, f"{{{_NS['pic']}}}pic")
    fill = ET.SubElement(pic, f"{{{_NS['pic']}}}blipFill")
    ET.SubElement(
        fill, f"{{{_NS['a']}}}blip", {f"{{{_NS['r']}}}embed": rel_id}
    )


def _table(body, cells2x3: list[str]):
    tbl = ET.SubElement(body, _w("tbl"))
    for row in (cells2x3[:3], cells2x3[3:6]):
        tr = ET.SubElement(tbl, _w("tr"))
        for cell in row:
            tc = ET.SubElement(tr, _w("tc"))
            p = ET.SubElement(tc, _w("p"))
            r = ET.SubElement(p, _w("r"))
            t = ET.SubElement(r, _w("t"))
            t.text = cell


def build_docx(nid: int, text: str) -> bytes:
    """A realistic minimal OOXML package: heading + body paragraphs,
    a table on even ids, an embedded image on ids with nid % 4 == 1."""
    words = _words(text)
    doc = ET.Element(_w("document"))
    body = ET.SubElement(doc, _w("body"))
    _para(body, " ".join(words[:HEAD_WORDS]), style="Heading1")
    if nid % 2 == 0:
        _table(body, [wd for wd in words[:6]])
    with_image = nid % 4 == 1
    for chunk in _chunks(words[HEAD_WORDS:], PARA_WORDS):
        _para(body, " ".join(chunk))
    if with_image:
        _image_para(body, "rId5")

    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Default Extension="png" ContentType="image/png"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "word/document.xml",
            ET.tostring(doc, encoding="unicode", xml_declaration=True),
        )
        if with_image:
            zf.writestr(
                "word/_rels/document.xml.rels",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                '<Relationship Id="rId5" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/image" Target="media/figure1.png"/>'
                "</Relationships>",
            )
            zf.writestr(
                "word/media/figure1.png",
                b"\x89PNG\r\n\x1a\n" + bytes([nid % 251] * 16),
            )
    return buf.getvalue()


def build_corpus() -> None:
    src = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_id = dict(zip(src["doc_id"].astype(int), src["text"]))

    if os.path.isdir(FIXTURES):
        shutil.rmtree(FIXTURES)
    os.makedirs(FIXTURES)

    html_ids = sorted(i for i in by_id if i % 3 == 0)
    docx_ids = sorted(i for i in by_id if i % 3 == 1)

    for i in html_ids[:12]:
        spans = synth_html_doc(str(i), by_id[i], i)
        html = "".join(s["text"] for s in spans)
        with open(os.path.join(FIXTURES, f"doc_{i}.html"), "w") as fh:
            fh.write(html)
    for i in html_ids[12:18]:
        spans = synth_html_doc(str(i), by_id[i], i)
        with open(os.path.join(FIXTURES, f"doc_{i}.htm"), "w") as fh:
            fh.write("".join(s["text"] for s in spans))

    for i in docx_ids[:8]:
        with open(os.path.join(FIXTURES, f"doc_{i}.docx"), "wb") as fh:
            fh.write(build_docx(i, by_id[i]))

    # edge cases: corrupt docx, pdf needing the pre-chunker, skipped kinds
    with open(os.path.join(FIXTURES, "broken_99.docx"), "wb") as fh:
        fh.write(b"this is not an OOXML zip archive")
    with open(os.path.join(FIXTURES, "report_7.pdf"), "wb") as fh:
        fh.write(b"%PDF-1.4\n% fake binary for the pre-chunker contract\n")
    with open(os.path.join(FIXTURES, "readme_1.txt"), "w") as fh:
        fh.write("plain text sidecar, not an extraction input\n")
    with open(os.path.join(FIXTURES, "LICENSE"), "w") as fh:
        fh.write("no extension at all\n")


WARC_FIXTURES = os.path.join(REPO, "fixtures", "warc")


def _warc_record(wtype: str, uri: str | None, payload: bytes, rec_no: int) -> bytes:
    headers = [
        "WARC/1.0",
        f"WARC-Type: {wtype}",
        f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-{rec_no:012d}>",
        "WARC-Date: 2026-01-01T00:00:00Z",
    ]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Length: {len(payload)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str) -> bytes:
    head = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1")
    return head + body


def build_warc_corpus() -> None:
    """Three deterministic WARC files (one gzipped): html captures that
    must extract, plus warcinfo/request/image/bad-utf8 records that must
    surface as skipped/error — never silently vanish."""
    import gzip

    src = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    by_id = dict(zip(src["doc_id"].astype(int), src["text"]))
    html_of = lambda i: "".join(  # noqa: E731
        s["text"] for s in synth_html_doc(str(i), by_id[i], i)
    ).encode()
    ids = sorted(i for i in by_id if i % 3 == 2)  # family-2 ids, unused above

    if os.path.isdir(WARC_FIXTURES):
        shutil.rmtree(WARC_FIXTURES)
    os.makedirs(WARC_FIXTURES)
    rec_no = 0

    def rec(wtype, uri, payload):
        nonlocal rec_no
        rec_no += 1
        return _warc_record(wtype, uri, payload, rec_no)

    uri_of = lambda i: f"https://crawl.example/docs/doc_{i}.html"  # noqa: E731

    w0 = [rec("warcinfo", None, b"software: synthetic-crawler/1.0\r\n")]
    for i in ids[:6]:
        w0.append(rec("response", uri_of(i), _http_response(html_of(i), "text/html; charset=utf-8")))
    w0.append(rec("request", uri_of(ids[0]), b"GET /docs HTTP/1.1\r\nHost: crawl.example\r\n"))
    w0.append(rec("response", "https://crawl.example/img/logo_3.jpeg",
                  _http_response(b"\xff\xd8\xff fake jpeg", "image/jpeg")))
    with open(os.path.join(WARC_FIXTURES, "crawl_0.warc"), "wb") as fh:
        fh.write(b"".join(w0))

    w1 = [rec("response", uri_of(i), _http_response(html_of(i), "text/html"))
          for i in ids[6:12]]
    w1.append(rec("response", "https://crawl.example/docs/broken_5.html",
                  _http_response(b"\xff\xfe not utf8 \x80", "text/html")))
    with open(os.path.join(WARC_FIXTURES, "crawl_1.warc"), "wb") as fh:
        fh.write(b"".join(w1))

    w2 = [rec("response", uri_of(i), _http_response(html_of(i), "application/xhtml+xml"))
          for i in ids[12:16]]
    with open(os.path.join(WARC_FIXTURES, "crawl_2.warc.gz"), "wb") as fh:
        fh.write(gzip.compress(b"".join(w2)))


def build_warc_goldens() -> None:
    from parserpdf_spark.sources.warc import warc_file_rows

    span_rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    status_rows = {
        "doc_id": [], "src_path": [], "record_uri": [], "record_type": [],
        "content_type": [], "ingest_status": [],
    }
    for name in sorted(os.listdir(WARC_FIXTURES)):
        path = os.path.join(WARC_FIXTURES, name)
        with open(path, "rb") as fh:
            rows = warc_file_rows(path, fh.read())
        for r in rows:
            for k in status_rows:
                status_rows[k].append(r[k])
            if r["ingest_status"] != "ok":
                continue
            out, metrics = extract_document_safe(r["spans"])
            assert metrics["status"] == "ok", (name, r["record_uri"], metrics)
            for s in out:
                span_rows["doc_id"].append(r["doc_id"])
                span_rows["kind"].append(s["kind"])
                span_rows["text"].append(s["text"])
                span_rows["media_ref"].append(s["media_ref"])
                span_rows["offset"].append(s["offset"])

    spans = pd.DataFrame(span_rows)
    spans["offset"] = spans["offset"].astype("int32")
    spans.to_parquet(os.path.join(GOLDENS, "extract_warc.parquet"), index=False)
    pd.DataFrame(status_rows).to_parquet(
        os.path.join(GOLDENS, "warc_ingest_status.parquet"), index=False
    )
    print(
        f"{WARC_FIXTURES}: {len(status_rows['ingest_status'])} records; "
        f"goldens: {len(spans)} spans, {spans['doc_id'].nunique()} docs"
    )


def build_goldens() -> None:
    from parserpdf_spark.sources.files import route_file

    span_rows = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
    status_rows = {"doc_id": [], "src_path": [], "ingest_status": [], "n_spans": []}
    for name in sorted(os.listdir(FIXTURES)):
        path = os.path.join(FIXTURES, name)
        with open(path, "rb") as fh:
            routed = route_file(path, fh.read())
        status_rows["doc_id"].append(routed["doc_id"])
        status_rows["src_path"].append(routed["src_path"])
        status_rows["ingest_status"].append(routed["ingest_status"])
        status_rows["n_spans"].append(len(routed["spans"]))
        if routed["ingest_status"] != "ok":
            continue
        out, metrics = extract_document_safe(routed["spans"])
        assert metrics["status"] == "ok", (name, metrics)
        for s in out:
            span_rows["doc_id"].append(routed["doc_id"])
            span_rows["kind"].append(s["kind"])
            span_rows["text"].append(s["text"])
            span_rows["media_ref"].append(s["media_ref"])
            span_rows["offset"].append(s["offset"])

    os.makedirs(GOLDENS, exist_ok=True)
    spans = pd.DataFrame(span_rows)
    spans["offset"] = spans["offset"].astype("int32")
    spans.to_parquet(os.path.join(GOLDENS, "extract_files.parquet"), index=False)
    status = pd.DataFrame(status_rows)
    status["n_spans"] = status["n_spans"].astype("int32")
    status.to_parquet(
        os.path.join(GOLDENS, "file_ingest_status.parquet"), index=False
    )
    print(
        f"{FIXTURES}: {len(status)} files; goldens: {len(spans)} spans, "
        f"{spans['doc_id'].nunique()} extractable docs"
    )


if __name__ == "__main__":
    build_corpus()
    build_goldens()
    build_warc_corpus()
    build_warc_goldens()
