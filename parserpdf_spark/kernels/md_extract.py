"""Markdown → spans splitter (pure python, stdlib only).

The reference collects ``.md`` files alongside converted documents
(``utils/file_utils.py:465-471``) — markdown IS its output format, so
ingesting one is a passthrough, not a conversion.  This module splits a
markdown document into the engine's span kinds, inverting the canonical
rendering of ``operators/sinks.render_markdown_col`` (spans joined by
blank lines; image spans as ``![](ref)`` lines; headings/lists/tables
verbatim):

- ATX headings (``# …``)            → ``heading`` (kept verbatim)
- ```` ``` ```` fenced blocks        → ``code`` (fences stripped)
- ``![alt](ref)``-only blocks        → ``image`` (media_ref = ref)
- ``|``-table blocks                 → ``table`` (verbatim)
- ``- ``-prefixed line blocks        → ``list`` (verbatim)
- ``**Fig./Figure/Table/Tab. …**``   → ``caption`` (verbatim)
- everything else                    → ``para`` (hard wraps unwrapped)
"""

from __future__ import annotations

import re

# the ref is a whitespace-free path: greedy \S* lets a ref containing
# ')' ("fig(1).png") round-trip, while a line with trailing content
# after the image ("![a](x.png) ![b](y.png)", "![a](x.png) (enlarge)")
# fails the match and falls through to para — never a corrupt ref
_IMAGE_RE = re.compile(r"^!\[[^\]]*\]\((\S*)\)\s*$")
_HEADING_RE = re.compile(r"^#{1,6}\s")
_CAPTION_RE = re.compile(r"^\*\*(?:fig\.|figure|table|tab\.)", re.I)


def _split_blocks(text: str) -> list[str]:
    """Blank-line separated blocks, with fenced code kept whole."""
    blocks: list[str] = []
    cur: list[str] = []
    in_fence = False
    for line in text.split("\n"):
        if line.lstrip().startswith("```"):
            if not in_fence and cur:
                # CommonMark: a fence needs no preceding blank line —
                # flush the paragraph so code never glues into prose
                blocks.append("\n".join(cur))
                cur = []
            cur.append(line)
            if in_fence:  # closing fence ends the block
                blocks.append("\n".join(cur))
                cur = []
            in_fence = not in_fence
            continue
        if in_fence:
            cur.append(line)
            continue
        if line.strip() == "":
            if cur:
                blocks.append("\n".join(cur))
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append("\n".join(cur))
    return blocks


def _classify_block(block: str) -> list[dict]:
    stripped = block.strip()
    if not stripped:
        return []
    m = _IMAGE_RE.match(stripped)
    if m:
        return [{"kind": "image", "text": "", "media_ref": m.group(1)}]
    if _HEADING_RE.match(stripped):
        # only the FIRST line is the heading — markdown does not require
        # a blank line before the next block; the remainder re-classifies
        # (a second heading stays a heading, an image stays an image).
        # Peel heading lines iteratively: a generated TOC with thousands
        # of consecutive heading lines must not recurse per line.
        out: list[dict] = []
        while _HEADING_RE.match(stripped):
            head, _, rest = stripped.partition("\n")
            out.append(
                {"kind": "heading", "text": head.strip(), "media_ref": None}
            )
            stripped = rest.strip()
            if not stripped:
                return out
        return out + _classify_block(stripped)
    lines = block.split("\n")
    if stripped.startswith("```"):
        # strip the closing fence only if it is actually there — an
        # unclosed fence at EOF must not eat the last code line
        closed = len(lines) >= 2 and lines[-1].lstrip().startswith("```")
        inner = lines[1:-1] if closed else lines[1:]
        return [{"kind": "code", "text": "\n".join(inner), "media_ref": None}]
    if (
        len(lines) >= 2
        and lines[0].lstrip().startswith("|")
        and set(lines[1].replace(" ", "")) <= set("|-:")
    ):
        return [{"kind": "table", "text": stripped, "media_ref": None}]
    if all(ln.lstrip().startswith(("- ", "* ")) for ln in lines):
        return [{"kind": "list", "text": stripped, "media_ref": None}]
    if _CAPTION_RE.match(stripped) and stripped.endswith("**"):
        return [{"kind": "caption", "text": stripped, "media_ref": None}]
    # paragraph: unwrap hard line breaks
    return [{
        "kind": "para",
        "text": " ".join(ln.strip() for ln in lines if ln.strip()),
        "media_ref": None,
    }]


def markdown_to_spans(text: str) -> list[dict]:
    """One markdown document → output-span dicts (kind, text, media_ref);
    offsets are assigned downstream by the dispatcher."""
    out: list[dict] = []
    for block in _split_blocks(text):
        out.extend(_classify_block(block))
    return out
