"""DOCX → HTML shim kernel (pure python, stdlib only).

The reference accepts ``.docx``/``.doc`` uploads (``globals.py:16``;
extension gate ``converters/pdf_to_md.py:218``) and delegates parsing to
Marker.  This container ships no docx library, but OOXML is a zip of
XML, so a from-scratch stdlib parse (zipfile + ElementTree) covers the
structural surface the extraction pipeline needs: headings (pStyle
Heading1-6/Title), paragraph runs, tabs/breaks, tables, numbered and
bulleted lists (w:numPr / ListParagraph style → ``<ul><li>``, flat),
and embedded images (a:blip relationship ids resolved through
document.xml.rels).

The output is the same normalized HTML dialect the synthesizer emits
(``<body><article>…``), so documents flow through the existing HTML
main-content kernel — one extraction path, not two.

Legacy binary ``.doc`` (OLE2) is NOT parseable with the stdlib; callers
route it here anyway and get the ValueError → ``status="error"``
contract, mirroring how the reference surfaces Marker failures as error
strings rather than raising (``pdf_to_md.py:240-243``).
"""

from __future__ import annotations

import io
import zipfile
import zlib
from html import escape
from xml.etree import ElementTree as ET

from parserpdf_spark.kernels.ziputil import bounded_read

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _rels(zf: zipfile.ZipFile) -> dict[str, str]:
    """Relationship id → target (image paths live here)."""
    try:
        data = bounded_read(zf, "word/_rels/document.xml.rels")
    except KeyError:
        return {}
    except (zipfile.BadZipFile, OSError, zlib.error) as exc:
        raise ValueError(f"not a docx (corrupt rels stream): {exc}") from exc
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return {}
    return {
        rel.get("Id"): rel.get("Target")
        for rel in root.findall(f"{_REL}Relationship")
        if rel.get("Id") and rel.get("Target")
    }


def _para_html(p, rels: dict[str, str]) -> tuple[str, bool]:
    """→ (html fragment, is_list_item)."""
    style = ""
    pstyle = p.find(f"{_W}pPr/{_W}pStyle")
    if pstyle is not None:
        style = pstyle.get(f"{_W}val") or ""
    is_item = (p.find(f"{_W}pPr/{_W}numPr") is not None
               or style == "ListParagraph")
    parts: list[str] = []
    for node in p.iter():
        tag = node.tag
        if tag == f"{_W}t":
            parts.append(escape(node.text or ""))
        elif tag == f"{_W}tab":
            parts.append(" ")
        elif tag == f"{_W}br":
            parts.append("<br/>")
        elif tag == f"{_A}blip":
            target = rels.get(node.get(f"{_R}embed") or "")
            if target:
                parts.append(f'<img src="{escape(target, quote=True)}"/>')
    text = "".join(parts)
    if style.startswith("Heading") and style[len("Heading"):].isdigit():
        lvl = min(max(int(style[len("Heading"):]), 1), 6)
        return f"<h{lvl}>{text}</h{lvl}>", False
    if style == "Title":
        return f"<h1>{text}</h1>", False
    if is_item and text.strip():
        return f"<li>{text}</li>", True
    if not text.strip() and "<img" not in text:
        return "", False  # empty paragraph (spacing) — no content
    return f"<p>{text}</p>", False


def _table_html(tbl) -> str:
    rows = []
    for tr in tbl.findall(f"{_W}tr"):
        cells = []
        for tc in tr.findall(f"{_W}tc"):
            txt = "".join(escape(t.text or "") for t in tc.iter(f"{_W}t"))
            cells.append(f"<td>{txt}</td>")
        rows.append("<tr>" + "".join(cells) + "</tr>")
    return "<table>" + "".join(rows) + "</table>"


def docx_to_html(data: bytes) -> str:
    """docx bytes → normalized HTML for the main-content kernel.

    Raises ValueError on anything that is not a parseable OOXML document
    (bad zip, missing/malformed document.xml) — the dispatcher's
    return-not-raise wrapper converts that to ``status="error"``.
    """
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        doc = bounded_read(zf, "word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError, zlib.error,
            RuntimeError, NotImplementedError) as exc:
        # RuntimeError: password-protected entry; NotImplementedError:
        # unsupported compression method — both must map to the
        # status="error" contract, not kill the task
        # zlib.error: structurally-valid zip whose deflate body is
        # corrupt — must map to the status="error" contract, not a
        # task-killing exception
        raise ValueError(f"not a docx (OOXML zip): {exc}") from exc
    try:
        root = ET.fromstring(doc)
    except ET.ParseError as exc:
        raise ValueError(f"malformed document.xml: {exc}") from exc
    body = root.find(f"{_W}body")
    if body is None:
        raise ValueError("document.xml has no w:body")
    rels = _rels(zf)
    out = ["<body><article>"]
    in_list = False
    for child in body:
        if child.tag == f"{_W}p":
            html, is_item = _para_html(child, rels)
            if is_item and not in_list:
                out.append("<ul>")
                in_list = True
            elif in_list and not is_item and html:
                # only CONTENT closes a list — Word authors commonly put
                # empty spacing paragraphs between items
                out.append("</ul>")
                in_list = False
            out.append(html)
        elif child.tag == f"{_W}tbl":
            if in_list:
                out.append("</ul>")
                in_list = False
            out.append(_table_html(child))
    if in_list:
        out.append("</ul>")
    out.append("</article></body>")
    return "".join(out)
