"""ODT (OpenDocument text) → HTML shim kernel (pure python, stdlib).

LibreOffice/OpenOffice documents are zips of XML (public OASIS ODF
spec) — the same shape as OOXML, so the shim mirrors the docx kernel:

- ``content.xml`` → ``office:body/office:text``
- ``text:h`` with ``text:outline-level`` → ``<hN>``
- ``text:p`` → ``<p>`` (``text:s`` runs expand to spaces,
  ``text:tab``/``text:line-break`` normalize)
- ``table:table`` / ``table:table-row`` / ``table:table-cell`` →
  ``<table><tr><td>``
- ``text:list`` / ``text:list-item`` → ``<ul><li>``
- ``draw:image`` hrefs → ``<img src="…"/>`` (payloads ride the media
  bridge like docx ``word/media``)

Unparseable input raises ValueError → ``status="error"``.
"""

from __future__ import annotations

import io
import zipfile
import zlib
from html import escape

from parserpdf_spark.kernels.ziputil import bounded_read

# text:c declares a run of spaces; a crafted count ("2000000000")
# must not allocate a multi-GB string (ADVICE r4) — no real document
# carries kilobyte space runs, so cap like the PNG/TIFF area caps.
_MAX_SPACE_RUN = 4096

_T = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TAB = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_O = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_D = "{urn:oasis:names:tc:opendocument:xmlns:drawing:1.0}"
_X = "{http://www.w3.org/1999/xlink}"


def _text_of(node) -> str:
    parts: list[str] = []
    if node.text:
        parts.append(escape(node.text))
    for child in node:
        tag = child.tag
        if tag == f"{_T}s":  # run of spaces
            try:
                count = int(child.get(f"{_T}c") or 1)
            except ValueError as exc:
                raise ValueError("malformed text:s count") from exc
            parts.append(" " * max(0, min(count, _MAX_SPACE_RUN)))
        elif tag in (f"{_T}tab", f"{_T}line-break"):
            parts.append(" ")
        elif tag == f"{_D}image":
            href = child.get(f"{_X}href")
            if href:
                parts.append(f'<img src="{escape(href, quote=True)}"/>')
        else:
            parts.append(_text_of(child))
        if child.tail:
            parts.append(escape(child.tail))
    return "".join(parts)


def _walk(node, out: list[str]) -> None:
    for child in node:
        tag = child.tag
        if tag == f"{_T}h":
            lvl = child.get(f"{_T}outline-level") or "1"
            try:
                lvl_i = min(max(int(lvl), 1), 6)
            except ValueError:
                lvl_i = 1
            text = _text_of(child).strip()
            if text:
                out.append(f"<h{lvl_i}>{text}</h{lvl_i}>")
        elif tag == f"{_T}p":
            text = _text_of(child).strip()
            if text:
                out.append(f"<p>{text}</p>")
        elif tag == f"{_TAB}table":
            rows = []
            for tr in child.iter(f"{_TAB}table-row"):
                cells = [
                    _text_of(tc).strip()
                    for tc in tr.findall(f"{_TAB}table-cell")
                ]
                rows.append("<tr>" + "".join(
                    f"<td>{c}</td>" for c in cells) + "</tr>")
            if rows:
                out.append("<table>" + "".join(rows) + "</table>")
        elif tag == f"{_T}list":
            items = [
                _text_of(li).strip()
                for li in child.findall(f"{_T}list-item")
            ]
            items = [i for i in items if i]
            if items:
                out.append("<ul>" + "".join(
                    f"<li>{i}</li>" for i in items) + "</ul>")
        elif tag == f"{_T}section":
            _walk(child, out)


def odt_to_html(data: bytes) -> str:
    from xml.etree import ElementTree as ET

    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data)))
        content = bounded_read(zf, "content.xml")
    except (zipfile.BadZipFile, KeyError, OSError, zlib.error,
            RuntimeError, NotImplementedError) as exc:
        raise ValueError(f"not an ODT (ODF zip): {exc}") from exc
    try:
        root = ET.fromstring(content)
    except ET.ParseError as exc:
        raise ValueError(f"malformed content.xml: {exc}") from exc
    body = root.find(f"{_O}body/{_O}text")
    if body is None:
        raise ValueError("content.xml has no office:text body")
    out: list[str] = ["<body><article>"]
    try:
        _walk(body, out)
    except RecursionError as exc:
        # _text_of/_walk recurse per nesting level; a crafted
        # deeply-nested document must stay inside the ValueError-only
        # contract, not kill the task
        raise ValueError("ODT content nested too deeply") from exc
    out.append("</article></body>")
    return "".join(out)


def odt_media_rows(data: bytes) -> list[tuple[str, bytes]]:
    """``Pictures/*`` members → (media_ref, payload) for the K2 sink,
    refs matching the ``<img src>`` values the shim emits."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"not an ODT (ODF zip): {exc}") from exc
    rows = []
    for info in zf.infolist():
        if info.filename.startswith("Pictures/"):
            try:
                rows.append((info.filename, bounded_read(zf, info)))
            except (zipfile.BadZipFile, zlib.error, RuntimeError,
                    NotImplementedError, ValueError):
                # corrupt OR bomb-sized picture: drop the member, keep
                # the document (keep-with-status)
                continue
    return rows
