"""EPUB → HTML shim kernel (pure python, stdlib only).

EPUB is the dominant e-book format in document corpora and is, at
heart, a zip of XHTML — exactly the content the existing HTML
main-content kernel consumes.  This shim walks the OCF/OPF structure
(public IDPF/W3C spec):

- ``META-INF/container.xml`` names the OPF package file
- the OPF ``<manifest>`` maps ids to hrefs and the ``<spine>`` gives
  the reading ORDER of content documents
- each spine item's XHTML body is concatenated (in spine order) into
  one normalized ``<body><article>…`` stream for the extraction kernel

Fallback (broken container.xml/OPF but valid zip): every ``.xhtml`` /
``.html`` member in path order — better than losing the book over a
manifest quirk; a completely unparseable zip raises ValueError →
``status="error"``.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
import zlib
from urllib.parse import unquote

from parserpdf_spark.kernels.ziputil import bounded_read

_NS_CONTAINER = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_NS_OPF = "{http://www.idpf.org/2007/opf}"


def _spine_hrefs(zf: zipfile.ZipFile) -> list[str]:
    from xml.etree import ElementTree as ET

    container = ET.fromstring(bounded_read(zf, "META-INF/container.xml"))
    rootfile = container.find(
        f"{_NS_CONTAINER}rootfiles/{_NS_CONTAINER}rootfile")
    if rootfile is None or not rootfile.get("full-path"):
        raise ValueError("container.xml without a rootfile")
    opf_path = rootfile.get("full-path")
    opf = ET.fromstring(bounded_read(zf, opf_path))
    base = posixpath.dirname(opf_path)
    manifest = {
        item.get("id"): item.get("href")
        for item in opf.iter(f"{_NS_OPF}item")
        if item.get("id") and item.get("href")
    }
    hrefs = []
    for ref in opf.iter(f"{_NS_OPF}itemref"):
        href = manifest.get(ref.get("idref") or "")
        if href:
            # OPF hrefs are IRIs: strip any fragment and percent-decode
            # before treating them as zip member names
            href = unquote(href.split("#", 1)[0])
            hrefs.append(posixpath.normpath(posixpath.join(base, href)))
    if not hrefs:
        raise ValueError("OPF spine is empty")
    return hrefs


def _body_of(xhtml: str) -> str:
    m = re.search(r"<body[^>]*>(.*)</body>", xhtml, re.S | re.I)
    return m.group(1) if m else xhtml


def epub_to_html(data: bytes) -> str:
    """EPUB bytes → one normalized HTML document in spine order."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except (zipfile.BadZipFile, OSError) as exc:
        raise ValueError(f"not an EPUB (OCF zip): {exc}") from exc
    try:
        hrefs = _spine_hrefs(zf)
    except Exception:  # noqa: BLE001 - fallback is the point: a broken
        # manifest must not lose a book whose content members are fine
        hrefs = sorted(
            n for n in zf.namelist()
            if n.lower().endswith((".xhtml", ".html", ".htm"))
            and not n.startswith("META-INF/")
        )
    if not hrefs:
        raise ValueError("EPUB without any content documents")
    parts = ["<body><article>"]
    found = 0
    for href in hrefs:
        try:
            raw = bounded_read(zf, href)
        except (KeyError, zipfile.BadZipFile, zlib.error,
                RuntimeError, NotImplementedError, ValueError):
            # missing, corrupt, DRM-encrypted (zipfile raises
            # RuntimeError), AES-compressed (NotImplementedError), or
            # bomb-sized (bounded_read ValueError) spine items must not
            # lose the rest of the book — and must NEVER escape as a
            # non-ValueError task killer
            continue
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.decode("latin-1")
        parts.append(_body_of(text))
        found += 1
    if not found:
        raise ValueError("EPUB spine items all unreadable")
    parts.append("</article></body>")
    return "".join(parts)
