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


PAGE_W, PAGE_H = 612, 842
PDF_LEFT_X, PDF_RIGHT_X = 50, 310
PDF_TOP_Y = 120
PDF_ROW_PITCH = 50
PDF_ROWS_PER_COL = 6
PDF_BODY_SIZE, PDF_TITLE_SIZE = 10, 18
PDF_LEADING = 12


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _pdf_text_block(x: float, y_top: float, size: int, lines: list[str]) -> str:
    """One BT..ET block: absolute Td to the first baseline, T* steps."""
    y_baseline = PAGE_H - y_top - size
    ops = [f"BT /F1 {size} Tf {PDF_LEADING} TL {x} {y_baseline} Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append("T*")
        ops.append(f"({_pdf_escape(line)}) Tj")
    ops.append("ET")
    return " ".join(ops)


def _wrap_words(words: list[str], per_line: int = 6) -> list[str]:
    # 6 words/line → 2 lines per 12-word chunk → block height ~24pt at
    # 50pt row pitch: the >15pt inter-row gap that separates 2-column
    # TEXT from table grids in the layout kernel (ROW_GAP_MAX_PT)
    return [" ".join(words[i:i + per_line]) for i in range(0, len(words), per_line)]


def build_pdf(nid: int, text: str, compress: bool) -> bytes:
    """A real (minimal, valid-xref) PDF: full-width title + two-column
    body in the synth geometry; Flate-compressed streams on request."""
    import zlib

    words = _words(text)
    pages_ops: dict[int, list[str]] = {}
    title = " ".join(words[:HEAD_WORDS])
    pages_ops[0] = [_pdf_text_block(PDF_LEFT_X, 40, PDF_TITLE_SIZE, [title])]
    for i, chunk in enumerate(_chunks(words[HEAD_WORDS:], PARA_WORDS)):
        page = i // (2 * PDF_ROWS_PER_COL)
        slot = i % (2 * PDF_ROWS_PER_COL)
        x = PDF_LEFT_X if slot < PDF_ROWS_PER_COL else PDF_RIGHT_X
        row = slot % PDF_ROWS_PER_COL
        y_top = PDF_TOP_Y + row * PDF_ROW_PITCH
        pages_ops.setdefault(page, []).append(
            _pdf_text_block(x, y_top, PDF_BODY_SIZE, _wrap_words(chunk))
        )

    n_pages = len(pages_ops)
    # object numbering: 1 catalog, 2 pages-root, 3 font,
    # then per page: 4+2k page, 5+2k contents
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{4 + 2 * k} 0 R" for k in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objs[3] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    for k in range(n_pages):
        content = "\n".join(pages_ops[k]).encode("latin-1")
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b"/Filter /FlateDecode "
        objs[4 + 2 * k] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {PAGE_W} {PAGE_H}] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {5 + 2 * k} 0 R >>".encode()
        )
        objs[5 + 2 * k] = (
            b"<< " + filt + f"/Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream"
        )

    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += f"xref\n0 {n_obj}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


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

    # real text-bearing PDFs through the binary kernel (2 raw, 2 Flate)
    pdf_ids = docx_ids[8:12]
    for j, i in enumerate(pdf_ids):
        with open(os.path.join(FIXTURES, f"doc_{i}.pdf"), "wb") as fh:
            fh.write(build_pdf(i, by_id[i], compress=j % 2 == 1))

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
