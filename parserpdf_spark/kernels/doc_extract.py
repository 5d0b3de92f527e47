"""Legacy binary ``.doc`` (Word 97+, OLE2/CFB) → HTML shim kernel
(pure python, stdlib only).

The reference accepts ``.doc`` uploads (``globals.py:16``) and delegates
them to Marker; this container ships no OLE library, so the subset that
carries digital text is parsed from scratch per the public [MS-CFB] and
[MS-DOC] specifications:

- CFB container: 512-byte header (magic D0CF11E0…), DIFAT → FAT sector
  chains, directory entries (64-byte UTF-16 names), and the mini-stream
  (streams smaller than the cutoff live in the root entry's mini
  sectors, chained through the miniFAT)
- WordDocument stream: FIB sanity (wIdent 0xA5EC), encryption flag
  rejected, ``ccpText`` main-document length, ``fcClx/lcbClx`` pointing
  into the 0Table/1Table stream (picked by the FIB's fWhichTblStm bit)
- CLX piece table: Pcdt → PlcPcd (CP array + 8-byte PCDs); each piece
  is either compressed (cp1252, fc bit 30) or UTF-16LE

Output is the same normalized HTML dialect the docx shim emits
(``<body><article>…``) so documents flow through the one extraction
kernel.  Scope (honest): text only — no style decoding (every paragraph
is a ``<p>``; .doc headings need stylesheet (STSH) interpretation),
no tables, no embedded objects.  Anything outside the subset raises
ValueError → the dispatcher's ``status="error"`` contract.
"""

from __future__ import annotations

import struct

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_MAX_CHAIN = 1 << 20  # cycle guard


class _Cfb:
    """Minimal read-only CFB (OLE2 compound file) accessor."""

    def __init__(self, data: bytes):
        if data[:8] != CFB_MAGIC:
            raise ValueError("not an OLE2 compound file (bad magic)")
        if len(data) < 512:
            raise ValueError("truncated OLE2 header")
        (self.sector_shift,) = struct.unpack_from("<H", data, 0x1E)
        (self.mini_shift,) = struct.unpack_from("<H", data, 0x20)
        (self.first_dir,) = struct.unpack_from("<I", data, 0x30)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 0x38)
        (self.first_minifat,) = struct.unpack_from("<I", data, 0x3C)
        (self.n_minifat,) = struct.unpack_from("<I", data, 0x40)
        self.ssz = 1 << self.sector_shift
        self.mssz = 1 << self.mini_shift
        self.data = data

        # FAT sectors from the header DIFAT (109 entries covers any file
        # small enough to be a document upload; DIFAT chaining is out of
        # scope and raises rather than misparses)
        (n_fat,) = struct.unpack_from("<I", data, 0x2C)
        (first_difat,) = struct.unpack_from("<I", data, 0x44)
        if first_difat not in (_ENDOFCHAIN, _FREESECT) or n_fat > 109:
            raise ValueError("OLE2 DIFAT chaining not supported")
        fat_sectors = [
            s for (s,) in struct.iter_unpack("<I", data[0x4C:0x4C + 109 * 4])
            if s not in (_FREESECT, _ENDOFCHAIN)
        ][:n_fat]
        fat = bytearray()
        for s in fat_sectors:
            fat += self._sector(s)
        self.fat = [v for (v,) in struct.iter_unpack("<I", bytes(fat))]

        # miniFAT
        minifat = bytearray()
        for s in self._chain(self.first_minifat):
            minifat += self._sector(s)
        self.minifat = [v for (v,) in struct.iter_unpack("<I", bytes(minifat))]

        # directory
        dirdata = bytearray()
        for s in self._chain(self.first_dir):
            dirdata += self._sector(s)
        self.entries: list[tuple[str, int, int, int]] = []  # name, type, start, size
        for off in range(0, len(dirdata) - 127, 128):
            (name_len,) = struct.unpack_from("<H", dirdata, off + 64)
            if name_len < 2 or name_len > 64:
                continue
            name = dirdata[off : off + name_len - 2].decode("utf-16-le", "replace")
            otype = dirdata[off + 66]
            (start,) = struct.unpack_from("<I", dirdata, off + 116)
            (size,) = struct.unpack_from("<Q", dirdata, off + 120)
            self.entries.append((name, otype, start, size))
        roots = [e for e in self.entries if e[1] == 5]
        if not roots:
            raise ValueError("OLE2 file without a root directory entry")
        self.root = roots[0]
        # the mini-stream lives in the root entry's (regular) chain
        self.mini_container = self._read_chain(self.root[2], self.root[3])

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        if off + self.ssz > len(self.data):
            raise ValueError(f"OLE2 sector {n} out of range")
        return self.data[off : off + self.ssz]

    def _chain(self, start: int) -> list[int]:
        chain: list[int] = []
        cur = start
        while cur not in (_ENDOFCHAIN, _FREESECT):
            chain.append(cur)
            if len(chain) > _MAX_CHAIN:
                raise ValueError("FAT chain cycle")
            if cur >= len(self.fat):
                raise ValueError("broken FAT chain")
            cur = self.fat[cur]
        return chain

    def _read_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        for s in self._chain(start):
            out += self._sector(s)
        return bytes(out[:size])

    def _read_mini(self, start: int, size: int) -> bytes:
        out = bytearray()
        cur = start
        steps = 0
        while cur not in (_ENDOFCHAIN, _FREESECT):
            # a valid chain can't have more links than the miniFAT has
            # entries; an empty mini-container makes the size guard alone
            # insufficient (slices append nothing, so a cycle spins forever)
            steps += 1
            if steps > len(self.minifat):
                raise ValueError("miniFAT chain cycle")
            off = cur * self.mssz
            out += self.mini_container[off : off + self.mssz]
            if cur >= len(self.minifat) or len(out) > size + self.mssz * 2:
                raise ValueError("broken miniFAT chain")
            cur = self.minifat[cur]
        return bytes(out[:size])

    def stream(self, name: str) -> bytes | None:
        for ename, otype, start, size in self.entries:
            if ename == name and otype == 2:
                if size < self.mini_cutoff:
                    return self._read_mini(start, size)
                return self._read_chain(start, size)
        return None


def _clx_pieces(clx: bytes) -> list[tuple[int, int, int, bool]]:
    """CLX bytes → [(cp_start, cp_end, byte_offset, compressed)]."""
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc entries: skip
        (cb,) = struct.unpack_from("<h", clx, pos + 1)
        if cb < 0:  # cbGrpprl is non-negative per [MS-DOC]; a negative
            # value (e.g. 0xFFFD → -3) would leave pos unchanged forever
            raise ValueError("bad Prc length in CLX")
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        raise ValueError("CLX without a Pcdt piece table")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    if len(plc) < lcb:
        raise ValueError("truncated PlcPcd")
    n = (lcb - 4) // 12
    cps = [struct.unpack_from("<I", plc, i * 4)[0] for i in range(n + 1)]
    pieces = []
    for i in range(n):
        fc_field = struct.unpack_from("<I", plc, (n + 1) * 4 + i * 8 + 2)[0]
        compressed = bool(fc_field & 0x40000000)
        fc = fc_field & 0x3FFFFFFF
        if compressed:
            fc //= 2
        pieces.append((cps[i], cps[i + 1], fc, compressed))
    return pieces


def doc_to_text(data: bytes) -> str:
    """.doc bytes → the main-document text (paragraph marks as \\r).

    All malformed-input failures surface as ValueError (the dispatcher's
    keep-with-status contract): struct.error from truncated/misaligned
    buffers is translated at this boundary.
    """
    try:
        return _doc_to_text(bytes(data))
    except struct.error as exc:
        raise ValueError(f"malformed .doc structure: {exc}") from exc


def _doc_to_text(data: bytes) -> str:
    cfb = _Cfb(data)
    word = cfb.stream("WordDocument")
    if word is None or len(word) < 0x200:
        raise ValueError("no WordDocument stream (not a Word binary file)")
    (w_ident,) = struct.unpack_from("<H", word, 0)
    if w_ident != 0xA5EC:
        raise ValueError(f"bad FIB wIdent 0x{w_ident:04X}")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    if flags & 0x0100:
        raise ValueError("encrypted .doc — external pre-chunker required")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    (ccp_text,) = struct.unpack_from("<I", word, 0x4C)
    (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
    table = cfb.stream(table_name)
    if table is None or lcb_clx == 0:
        raise ValueError(f"no {table_name} stream / empty CLX")
    pieces = _clx_pieces(table[fc_clx : fc_clx + lcb_clx])

    out: list[str] = []
    remaining = ccp_text
    for cp_start, cp_end, fc, compressed in pieces:
        if remaining <= 0:
            break
        n_cp = min(cp_end - cp_start, remaining)
        if compressed:
            raw = word[fc : fc + n_cp]
            out.append(raw.decode("cp1252", "replace"))
        else:
            raw = word[fc : fc + 2 * n_cp]
            out.append(raw.decode("utf-16-le", "replace"))
        remaining -= n_cp
    return "".join(out)


def doc_to_html(data: bytes) -> str:
    """.doc bytes → normalized HTML (every paragraph a ``<p>``; style
    decoding is out of scope, see module docstring)."""
    from html import escape

    text = doc_to_text(data)
    parts = ["<body><article>"]
    for para in text.split("\r"):
        # strip Word control marks (cell/row 0x07, page break 0x0C,
        # line break 0x0B → space)
        para = para.replace("\x0b", " ").replace("\x0c", "").replace("\x07", "")
        if para.strip():
            parts.append(f"<p>{escape(para.strip())}</p>")
    parts.append("</article></body>")
    return "".join(parts)
