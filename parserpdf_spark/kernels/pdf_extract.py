"""PDF layout extraction kernel (pure python/numpy, no Spark).

Re-implements from scratch the layout capabilities the reference obtains
from Marker's PdfConverter (``converters/pdf_to_md.py:159``, configured
at ``converters/extraction_converter.py:168-177``): page block
segmentation → reading-order sort (column clustering on x-intervals,
then lexsort by page/band/column/y/x) → heading/table/figure/caption
classification → ordered markdown spans.

Input: a list of "pdf_block" spans whose ``text`` is a serialized layout
block (FIXTURES.md §1)::

    {"page": int, "bbox": [x0, y0, x1, y1], "font_size": float,
     "text": str, "block_type_hint": str|None}

and whose ``media_ref``, when set, marks a figure block.  Input order is
arbitrary (scrambled offsets); bbox determines true reading order.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from parserpdf_spark.kernels import constants as K

_REQUIRED = ("page", "bbox", "font_size", "text")


class Block:
    __slots__ = (
        "page", "x0", "y0", "x1", "y1", "font_size", "text", "hint",
        "media_ref", "band", "col", "is_spanning",
    )

    def __init__(self, d: dict[str, Any], media_ref: str | None):
        for key in _REQUIRED:
            if key not in d:
                raise ValueError(f"pdf_block missing field {key!r}")
        bbox = d["bbox"]
        if not isinstance(bbox, (list, tuple)) or len(bbox) != 4:
            raise ValueError("pdf_block bbox must be [x0,y0,x1,y1]")
        self.page = int(d["page"])
        self.x0, self.y0, self.x1, self.y1 = (float(v) for v in bbox)
        self.font_size = float(d["font_size"])
        self.text = str(d["text"]) if d["text"] is not None else ""
        self.hint = d.get("block_type_hint")
        self.media_ref = media_ref
        self.band = 0
        self.col = 0
        self.is_spanning = False

    @property
    def width(self) -> float:
        return self.x1 - self.x0


def parse_block(text: str, media_ref: str | None) -> Block:
    try:
        d = json.loads(text)
    except (TypeError, json.JSONDecodeError) as exc:
        raise ValueError(f"invalid pdf_block JSON: {exc}") from exc
    if not isinstance(d, dict):
        raise ValueError("pdf_block JSON must be an object")
    return Block(d, media_ref)


# ---------------------------------------------------------------------------
# Reading order: bands (split by full-width blocks) then columns then y/x
# ---------------------------------------------------------------------------

def _cluster_columns(blocks: list[Block]) -> None:
    """Assign ``col`` by clustering x-intervals: sort by x0, start a new
    column whenever a block starts beyond the current column's right edge
    plus the column gap.  (The "column clustering on x-intervals" of the
    north star; verified by FIXTURES.md B2.)
    """
    if not blocks:
        return
    order = sorted(blocks, key=lambda b: (b.x0, b.y0))
    col = 0
    right = order[0].x1
    order[0].col = 0
    for b in order[1:]:
        if b.x0 > right + K.COLUMN_GAP_PT:
            col += 1
            right = b.x1
        else:
            right = max(right, b.x1)
        b.col = col


def order_page(blocks: list[Block]) -> list[Block]:
    """Reading order for one page's blocks.

    1. Blocks spanning ≥ SPANNING_WIDTH_FRAC of the content width are
       full-width: they split the page into vertical bands (title above a
       2-column body reads first).
    2. Within a band, cluster remaining blocks into columns on x-gaps.
    3. Emit bands top→bottom; inside a band: columns left→right, each
       column sorted by (y0, x0) via numpy lexsort.
    """
    if not blocks:
        return []
    min_x = min(b.x0 for b in blocks)
    max_x = max(b.x1 for b in blocks)
    content_w = max(max_x - min_x, 1.0)

    def crosses_columns(b) -> bool:
        """True when b reaches into the x-range of a block that starts in
        a DIFFERENT column (strictly right of b's start by more than the
        column gap).  Width alone misfires on pages whose right column is
        nearly empty: a wide left-column paragraph can cover most of the
        observed content width without ever crossing the gutter."""
        for o in blocks:
            if o is b:
                continue
            if (
                o.x0 > b.x0 + K.COLUMN_GAP_PT
                and b.x1 > o.x0 + K.COLUMN_GAP_PT
            ):
                return True
        return False

    spanning = []
    flowing = []
    for b in blocks:
        b.is_spanning = (
            len(blocks) > 1
            and b.width / content_w >= K.SPANNING_WIDTH_FRAC
            and crosses_columns(b)
        )
        (spanning if b.is_spanning else flowing).append(b)
    spanning.sort(key=lambda b: (b.y0, b.x0))

    # band i = region after spanning[i-1] and up to spanning[i]
    cuts = [b.y0 for b in spanning]

    def band_of(b: Block) -> int:
        yc = (b.y0 + b.y1) / 2.0
        for i, cut in enumerate(cuts):
            if yc < cut:
                return i
        return len(cuts)

    bands: dict[int, list[Block]] = {}
    for b in flowing:
        bands.setdefault(band_of(b), []).append(b)

    ordered: list[Block] = []
    for i in range(len(cuts) + 1):
        members = bands.get(i, [])
        _cluster_columns(members)
        if members:
            cols = np.array([b.col for b in members])
            y0s = np.array([b.y0 for b in members])
            x0s = np.array([b.x0 for b in members])
            idx = np.lexsort((x0s, y0s, cols))
            ordered.extend(members[j] for j in idx)
        if i < len(spanning):
            ordered.append(spanning[i])
    return ordered


# ---------------------------------------------------------------------------
# Classification
# ---------------------------------------------------------------------------

def _heading_levels(blocks: list[Block]) -> tuple[float, dict[float, int]]:
    """(body_size, {font_size: heading_level}) per document.

    body_size = text-length-weighted median font size; distinct sizes
    ≥ body*HEADING_SIZE_RATIO rank into levels largest-first ("heading via
    font-size quantiles", north star; FIXTURES.md B1/B3).
    """
    sizes = np.array([b.font_size for b in blocks])
    weights = np.array([max(len(b.text), 1) for b in blocks], dtype=float)
    order = np.argsort(sizes)
    cum = np.cumsum(weights[order])
    body_size = float(sizes[order[np.searchsorted(cum, cum[-1] / 2.0)]])
    heading_sizes = sorted(
        {s for s in sizes.tolist() if s >= body_size * K.HEADING_SIZE_RATIO},
        reverse=True,
    )
    levels = {
        s: min(i + 1, K.MAX_HEADING_LEVEL) for i, s in enumerate(heading_sizes)
    }
    return body_size, levels


class TableUnit:
    """A detected grid of blocks, ordered as a single unit."""

    __slots__ = ("page", "x0", "y0", "x1", "y1", "font_size", "text", "hint",
                 "media_ref", "band", "col", "is_spanning", "cells")

    def __init__(self, cells: list[Block]):
        self.cells = cells
        self.page = cells[0].page
        self.x0 = min(c.x0 for c in cells)
        self.y0 = min(c.y0 for c in cells)
        self.x1 = max(c.x1 for c in cells)
        self.y1 = max(c.y1 for c in cells)
        self.font_size = cells[0].font_size
        self.text = ""
        self.hint = "table"
        self.media_ref = None
        self.band = 0
        self.col = 0
        self.is_spanning = False

    @property
    def width(self) -> float:
        return self.x1 - self.x0


def _detect_tables_page(blocks: list[Block]) -> tuple[list, list[TableUnit]]:
    """Split one page's blocks into (non-table units, table units).

    A table is ≥2 *vertically adjacent* rows of ≥2 cells whose rounded x0
    edge-sets agree across rows (FIXTURES.md B4: "consistent x-edges
    across rows").  Adjacency (row gap ≤ ROW_GAP_MAX_PT) distinguishes a
    grid from a 2-column text layout, whose blocks also align on x but
    sit far apart vertically (B2 must stay columns).
    """
    tol = K.TABLE_ALIGN_TOL
    candidates = [b for b in blocks if not b.media_ref]

    # bin into visual rows by rounded y0
    rows: dict[int, list[Block]] = {}
    for b in candidates:
        rows.setdefault(round(b.y0 / tol), []).append(b)
    row_keys = sorted(rows)

    def edge_set(row: list[Block]) -> tuple:
        return tuple(sorted(round(b.x0 / tol) for b in row))

    grouped: set[int] = set()
    tables: list[TableUnit] = []
    i = 0
    while i < len(row_keys):
        row = rows[row_keys[i]]
        if len(row) < 2:
            i += 1
            continue
        edges = edge_set(row)
        run = [row]
        j = i + 1
        while j < len(row_keys):
            nxt = rows[row_keys[j]]
            if len(nxt) < 2 or edge_set(nxt) != edges:
                break
            prev_bottom = max(b.y1 for b in run[-1])
            next_top = min(b.y0 for b in nxt)
            if next_top - prev_bottom > K.ROW_GAP_MAX_PT:
                break
            run.append(nxt)
            j += 1
        if len(run) >= 2:
            cells = [b for r in run for b in r]
            tables.append(TableUnit(cells))
            grouped.update(id(b) for b in cells)
            i = j
        else:
            i += 1

    units = [b for b in blocks if id(b) not in grouped]
    return units, tables


def _render_table(cells: list) -> str:
    rows: dict[int, list[Block]] = {}
    tol = K.TABLE_ALIGN_TOL
    keys: list[float] = []
    for b in sorted(cells, key=lambda b: (b.y0, b.x0)):
        for k in keys:
            if abs(b.y0 - k) <= tol:
                rows[round(k, 1)].append(b)
                break
        else:
            keys.append(b.y0)
            rows[round(b.y0, 1)] = [b]
    grid = [
        [c.text.replace("|", "\\|").strip() for c in sorted(row, key=lambda b: b.x0)]
        for _, row in sorted(rows.items())
    ]
    width = max(len(r) for r in grid)
    grid = [r + [""] * (width - len(r)) for r in grid]
    lines = ["| " + " | ".join(grid[0]) + " |"]
    lines.append("|" + "|".join(["---"] * width) + "|")
    for r in grid[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def _is_caption(prev: Block, b: Block) -> bool:
    if b.media_ref:
        return False
    low = b.text.lstrip().lower()
    if not low.startswith(K.CAPTION_PREFIXES):
        return False
    return (
        b.page == prev.page
        and b.y0 >= prev.y1 - 1.0
        and b.y0 - prev.y1 <= K.CAPTION_MAX_GAP_PT
    )


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def _span(kind: str, text: str, media_ref=None) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref}


def extract_pdf_blocks(raw: list[tuple[str, str | None]]) -> list[dict]:
    """[(block_json, media_ref)] (arbitrary order) → ordered output spans.

    Raises ValueError on malformed block JSON — the dispatcher converts
    that into a per-document error row, mirroring the reference's
    return-not-raise contract (``converters/pdf_to_md.py:240-243``).
    """
    blocks = [parse_block(t, ref) for t, ref in raw]
    if not blocks:
        return []

    body_size, levels = _heading_levels(blocks)

    by_page: dict[int, list[Block]] = {}
    for b in blocks:
        by_page.setdefault(b.page, []).append(b)

    ordered: list = []
    for page in sorted(by_page):
        flowing, tables = _detect_tables_page(by_page[page])
        ordered.extend(order_page(flowing + tables))

    out: list[dict] = []
    i = 0
    n = len(ordered)
    while i < n:
        b = ordered[i]
        if isinstance(b, TableUnit):
            out.append(_span("table", _render_table(b.cells)))
            i += 1
            continue
        hint = b.hint
        if b.media_ref or hint == "figure":
            out.append(_span("image", "", b.media_ref))
            if i + 1 < n and not isinstance(ordered[i + 1], TableUnit) and _is_caption(
                b, ordered[i + 1]
            ):
                cap = ordered[i + 1]
                out.append(_span("caption", f"**{cap.text.strip()}**"))
                i += 2
                continue
            i += 1
            continue
        level = levels.get(b.font_size)
        if hint == "heading" and level is None:
            level = 1
        if level is not None and hint in (None, "heading") and b.text:
            out.append(_span("heading", "#" * level + " " + b.text.strip()))
        elif b.text.strip():
            out.append(_span("para", b.text.strip()))
        i += 1
    return out
