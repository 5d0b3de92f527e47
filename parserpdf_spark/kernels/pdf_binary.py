"""Minimal PDF *binary* text extractor (pure python, stdlib + zlib).

The reference feeds PDF files to Marker (``converters/pdf_to_md.py:159``);
this container ships no PDF library, but the subset of PDF that carries
digital text is parseable from scratch: objects are plain ``N 0 obj …
endobj`` frames, page content streams are either raw or FlateDecode
(zlib), and text is positioned with a small operator set (Tf/Td/TD/TL/
T*/Tm) and shown with Tj/TJ.  This module turns such PDFs into the
engine's ``pdf_block`` span dicts — the SAME input contract the layout
kernel (kernels/pdf_extract.py) already consumes — so real .pdf bytes
flow through the existing band/column/reading-order machinery:

    pdf bytes → pdf_to_blocks → {"page","bbox","font_size","text",…}
             → extract_pdf_blocks → ordered markdown spans

Scope (honest): text-bearing, non-encrypted PDFs with per-BT text
blocks; no font-metric width tables (widths are estimated from char
counts), no image XObjects, no CID/Type0 re-encoding.  Anything outside
the subset raises ValueError and the ingestion bridge keeps the
``needs_prechunk`` contract for it.

Coordinates: PDF user space is bottom-up; blocks are converted to the
top-down convention the layout kernel uses (y0 = page_height − top).
"""

from __future__ import annotations

import re
import zlib

_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
# one operator step inside a text object: operands then an operator name
_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)|\[(?:[^\]\\]|\\.)*\]|/[A-Za-z0-9]+"
    rb"|-?\d+(?:\.\d+)?|[A-Za-z*']+"
)
_STRING_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)")

# estimated glyph width as a fraction of font size (no metrics tables in
# scope; only relative geometry matters to the layout kernel)
CHAR_WIDTH_FRAC = 0.5
LINE_LEADING_FRAC = 1.2


def _decode_pdf_string(raw: bytes) -> str:
    """(…) literal → text, handling \\ escapes and octal codes."""
    out = []
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c == 0x5C and i + 1 < n:  # backslash
            nxt = raw[i + 1]
            if nxt in b"nrtbf":
                out.append({"n": "\n", "r": "\r", "t": "\t",
                            "b": "\b", "f": "\f"}[chr(nxt)])
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal \nnn (1-3 digits)
                j = i + 1
                digits = b""
                while j < n and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += raw[j:j + 1]
                    j += 1
                out.append(chr(int(digits, 8)))
                i = j
            else:
                out.append(chr(nxt))
                i += 2
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


def _page_stream(body: bytes) -> bytes | None:
    """Stream payload of one object.  Sized by /Length when present —
    compressed bytes can contain ``endstream``/``endobj`` sequences, so
    delimiter scanning alone silently truncates (observed)."""
    sm = re.search(rb"stream\r?\n", body)
    if sm is None:
        return None
    head = body[: sm.start()]
    lm = re.search(rb"/Length\s+(\d+)", head)
    if lm:
        data = body[sm.end() : sm.end() + int(lm.group(1))]
    else:  # indirect /Length: fall back to the delimiter scan
        end = body.find(b"endstream", sm.end())
        if end < 0:
            return None
        data = body[sm.end() : end].rstrip(b"\r\n")
    if b"/FlateDecode" in head:
        try:
            data = zlib.decompress(data)
        except zlib.error as exc:
            raise ValueError(f"broken FlateDecode stream: {exc}") from exc
    return data


class _TextState:
    __slots__ = ("x", "y", "size", "leading", "line_x", "line_y")

    def __init__(self):
        self.x = self.y = 0.0
        self.size = 12.0
        self.leading = 0.0
        self.line_x = self.line_y = 0.0


def _blocks_from_stream(
    content: bytes, page_no: int, page_h: float
) -> list[dict]:
    blocks: list[dict] = []
    for bt in _BT_RE.finditer(content):
        st = _TextState()
        lines: list[tuple[float, float, float, str]] = []  # x, y, size, text
        cur_text: list[str] = []

        def flush_line():
            if cur_text:
                lines.append((st.line_x, st.line_y, st.size, "".join(cur_text)))
                cur_text.clear()

        stack: list[bytes] = []
        for tok in _TOKEN_RE.finditer(bt.group(1)):
            t = tok.group(0)
            if t.startswith(b"(") or t.startswith(b"[") or t.startswith(b"/") \
                    or t[:1].isdigit() or t.startswith(b"-"):
                stack.append(t)
                continue
            op = t
            if op == b"Tf" and len(stack) >= 1:
                st.size = float(stack[-1])
            elif op in (b"Td", b"TD") and len(stack) >= 2:
                flush_line()
                st.x += float(stack[-2])
                st.y += float(stack[-1])
                if op == b"TD":
                    st.leading = -float(stack[-1])
                st.line_x, st.line_y = st.x, st.y
            elif op == b"TL" and len(stack) >= 1:
                st.leading = float(stack[-1])
            elif op == b"T*":
                flush_line()
                st.y -= st.leading
                st.line_x, st.line_y = st.x, st.y
            elif op == b"Tm" and len(stack) >= 6:
                flush_line()
                st.x, st.y = float(stack[-2]), float(stack[-1])
                st.line_x, st.line_y = st.x, st.y
            elif op == b"Tj" and stack and stack[-1].startswith(b"("):
                cur_text.append(_decode_pdf_string(stack[-1][1:-1]))
            elif op == b"TJ" and stack and stack[-1].startswith(b"["):
                for s in _STRING_RE.finditer(stack[-1]):
                    cur_text.append(_decode_pdf_string(s.group(0)[1:-1]))
            stack.clear()
        flush_line()

        if not lines:
            continue
        size = max(s for _, _, s, _ in lines)
        min_x = min(x for x, _, _, _ in lines)
        top_y_pdf = max(y for _, y, _, _ in lines)
        bot_y_pdf = min(y for _, y, _, _ in lines)
        width = max(len(txt) for _, _, _, txt in lines) * size * CHAR_WIDTH_FRAC
        y0 = page_h - (top_y_pdf + size)  # top-down top edge
        y1 = page_h - bot_y_pdf + size * (LINE_LEADING_FRAC - 1.0)
        text = " ".join(txt for _, _, _, txt in lines if txt.strip())
        blocks.append({
            "page": page_no,
            "bbox": [round(min_x, 2), round(y0, 2),
                     round(min_x + width, 2), round(y1, 2)],
            "font_size": size,
            "text": text,
            "block_type_hint": None,
        })
    return blocks


def pdf_to_blocks(data: bytes) -> list[dict]:
    """PDF bytes → pdf_block dicts (the layout kernel's input contract).

    Raises ValueError when the file is outside the supported subset
    (not a PDF, encrypted, no parseable text) — the ingestion bridge
    maps that to the external pre-chunker contract, never silent loss.
    """
    if not bytes(data).startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    data = bytes(data)
    if b"/Encrypt" in data:
        raise ValueError("encrypted PDF — external pre-chunker required")

    # object bodies span to the NEXT object header (not to 'endobj':
    # binary stream payloads can contain that word by chance)
    headers = list(re.finditer(rb"(\d+)\s+\d+\s+obj\b", data))
    objects: dict[int, bytes] = {}
    for i, m in enumerate(headers):
        end = headers[i + 1].start() if i + 1 < len(headers) else len(data)
        objects[int(m.group(1))] = data[m.end() : end]

    # pages in document order; /Contents N 0 R resolves into objects
    pages: list[bytes] = []
    page_heights: list[float] = []
    for num, body in objects.items():
        head = body.split(b"stream", 1)[0]
        if b"/Type" in head and b"/Page" in head and b"/Pages" not in head:
            cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", head)
            if not cm or int(cm.group(1)) not in objects:
                continue
            stream = _page_stream(objects[int(cm.group(1))])
            if stream is None:
                continue
            mb = re.search(
                rb"/MediaBox\s*\[\s*[\d.]+\s+[\d.]+\s+[\d.]+\s+([\d.]+)", head
            )
            pages.append(stream)
            page_heights.append(float(mb.group(1)) if mb else 842.0)

    blocks: list[dict] = []
    for page_no, (stream, page_h) in enumerate(zip(pages, page_heights)):
        blocks.extend(_blocks_from_stream(stream, page_no, page_h))
    if not blocks:
        raise ValueError("no extractable text (scanned/image-only PDF?)")
    return blocks
