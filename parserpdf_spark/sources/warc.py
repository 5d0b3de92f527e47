"""WARC ingestion — the web-archive format web-scale corpora ship in.

The reference ingests loose files from disk; a 100 TB crawl corpus
arrives instead as WARC containers (millions of HTTP captures per
file).  This module parses WARC/1.0 from scratch with the stdlib
(record framing per ISO 28500: header block, CRLFCRLF, Content-Length
payload, CRLFCRLF gap) and bridges ``response`` records carrying HTML
into the engine's canonical docs table, so
``scan → warc_to_docs → extract_docs`` runs end-to-end from crawl data.

Keep-with-status like sources/files.py: every record yields one row —
``ok`` (HTML response, decoded into a ``kind="html"`` span), ``skipped``
(non-response record types, non-HTML content types), or ``error``
(undecodable payload).  Whole-file gzip (including the usual
member-per-record .warc.gz layout — ``gzip.decompress`` handles
concatenated members) is transparent.

Scale shape: one ``mapInPandas`` over (path, content) Arrow batches; a
WARC file is the natural work unit (binaryFile gives one split per
file, and real crawls ship ~1 GB files by convention).
"""

from __future__ import annotations

import gzip
from typing import Any, Iterator

from pyspark.sql import DataFrame

WARC_DOCS_DDL = (
    "doc_id string, src_path string, record_uri string, "
    "record_type string, content_type string, ingest_status string, "
    "ingest_error string, spans array<struct<"
    "kind:string,text:string,media_ref:string,offset:int>>"
)


def parse_warc(data: bytes) -> list[dict[str, Any]]:
    """WARC bytes → [{headers: {lower-name: value}, body: bytes}].

    Raises ValueError on structurally broken input (missing WARC/
    version line, truncated payload) — callers wrap per-file.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    records: list[dict[str, Any]] = []
    pos, n = 0, len(data)
    while pos < n:
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"unterminated record header at offset {pos}")
        lines = data[pos:head_end].decode("utf-8", "replace").split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"missing WARC version line at offset {pos}")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            name, _, value = line.partition(":")
            headers[name.strip().lower()] = value.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError as exc:
            raise ValueError(f"bad Content-Length at offset {pos}") from exc
        body = data[head_end + 4 : head_end + 4 + length]
        if len(body) < length:
            raise ValueError(f"truncated payload at offset {pos}")
        records.append({"headers": headers, "body": body})
        pos = head_end + 4 + length
    return records


def _split_http(body: bytes) -> tuple[str, bytes]:
    """HTTP response bytes → (content-type, payload bytes)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return "", body
    ctype = ""
    for line in body[:sep].decode("latin-1").split("\r\n")[1:]:
        name, _, value = line.partition(":")
        if name.strip().lower() == "content-type":
            ctype = value.strip()
    return ctype, body[sep + 4 :]


def _doc_id_from_uri(uri: str) -> str:
    """URI → doc id: the path basename without extension (crawl files
    name captures by page), query/fragment stripped."""
    tail = uri.split("?", 1)[0].split("#", 1)[0].rstrip("/").rsplit("/", 1)[-1]
    stem, dot, _ = tail.rpartition(".")
    return stem if dot else tail


def warc_file_rows(path: str, data: bytes) -> list[dict[str, Any]]:
    """One WARC file → one row per record (pure python; reused by the
    golden generator so goldens stay independent of the Spark path)."""
    try:
        records = parse_warc(bytes(data))
    except (ValueError, OSError, EOFError) as exc:
        return [{
            "doc_id": None, "src_path": path, "record_uri": None,
            "record_type": None, "content_type": None,
            "ingest_status": "error",
            "ingest_error": f"unparseable WARC: {exc}", "spans": [],
        }]
    if not records:
        # keep-with-status: an empty/recordless file must not vanish
        return [{
            "doc_id": None, "src_path": path, "record_uri": None,
            "record_type": None, "content_type": None,
            "ingest_status": "error",
            "ingest_error": "WARC contains no records", "spans": [],
        }]
    rows = []
    for rec in records:
        headers = rec["headers"]
        rtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri", "")
        row: dict[str, Any] = {
            "doc_id": _doc_id_from_uri(uri) if uri else None,
            "src_path": path,
            "record_uri": uri or None,
            "record_type": rtype or None,
            "content_type": None,
            "ingest_status": "skipped",
            "ingest_error": None,
            "spans": [],
        }
        if rtype != "response":
            row["ingest_error"] = f"record type {rtype!r} is not a capture"
            rows.append(row)
            continue
        ctype, payload = _split_http(rec["body"])
        row["content_type"] = ctype.split(";", 1)[0].strip() or None
        if row["content_type"] not in ("text/html", "application/xhtml+xml"):
            row["ingest_error"] = f"content type {row['content_type']!r}"
            rows.append(row)
            continue
        try:
            text = payload.decode("utf-8")
        except UnicodeDecodeError as exc:
            row["ingest_status"] = "error"
            row["ingest_error"] = f"UnicodeDecodeError: {exc}"
            rows.append(row)
            continue
        row["ingest_status"] = "ok"
        row["spans"] = [
            {"kind": "html", "text": text, "media_ref": None, "offset": 0}
        ]
        rows.append(row)
    return rows


def warc_to_docs(files: DataFrame) -> DataFrame:
    """binaryFile scan of .warc/.warc.gz → per-record rows with ingest
    status; filter ``ingest_status == 'ok'`` and select (doc_id, spans)
    for the extraction stage."""
    import pandas as pd

    cols = [
        "doc_id", "src_path", "record_uri", "record_type", "content_type",
        "ingest_status", "ingest_error", "spans",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(warc_file_rows(p, c))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(run, schema=WARC_DOCS_DDL)
