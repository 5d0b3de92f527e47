"""Bounded zip-member reads shared by the zip-container kernels
(docx/epub/odt and the docx media bridge).

A zip bomb is a tiny member whose DEFLATE stream inflates to GBs:
``zf.read()`` would happily materialize it and OOM the executor task
instead of raising the ``ValueError`` the keep-with-status contract
requires (same failure class as the PNG/TIFF pixel-area caps, ADVICE
r4).  :func:`bounded_read` enforces a decompressed-size cap twice —
cheaply against the declared ``ZipInfo.file_size``, then for real
while stream-decompressing (a crafted header can lie about the size).
"""

from __future__ import annotations

import zipfile

# Generous for document-container members (content XML, spine XHTML,
# embedded media parts); a legitimate member above this is vanishingly
# rare while a bomb is typically 3-6 orders of magnitude larger.
MAX_MEMBER_BYTES = 64 * 1024 * 1024

_CHUNK = 1 << 16


def bounded_read(zf: zipfile.ZipFile, member, cap: int = MAX_MEMBER_BYTES
                 ) -> bytes:
    """``zf.read(member)`` with a decompressed-size bound.

    ``member`` is a name or a ``ZipInfo``.  Raises ``ValueError`` when
    the member would inflate past ``cap``; missing members raise
    ``KeyError`` exactly like ``zf.read`` so callers' handlers hold.
    """
    info = zf.getinfo(member) if isinstance(member, str) else member
    if info.file_size > cap:
        raise ValueError(
            f"zip member {info.filename!r} declares "
            f"{info.file_size} bytes > cap {cap}")
    chunks: list[bytes] = []
    total = 0
    with zf.open(info) as fh:
        while True:
            chunk = fh.read(_CHUNK)
            if not chunk:
                break
            total += len(chunk)
            if total > cap:
                raise ValueError(
                    f"zip member {info.filename!r} inflates past "
                    f"cap {cap}")
            chunks.append(chunk)
    return b"".join(chunks)
