"""Baseline TIFF codec from scratch (stdlib + numpy, public TIFF 6.0).

Scanned-document corpora carry TIFFs; the reference hands them to PIL
(``utils/file_utils.py:562-626``).  The baseline subset that carries
RGB/gray/palette raster data is implementable in-container — the
compression schemes it uses are either trivial (none, PackBits RLE,
Deflate) or already implemented here (the PDF kernel's MSB-first
EarlyChange LZW, reused):

- **decode_tiff**: II/MM byte orders, first IFD, strip-based images
  (RowsPerStrip), compressions 1 (none), 5 (LZW), 8/32946 (Deflate),
  32773 (PackBits); photometric 0/1 (gray ± inversion), 2 (RGB, alpha
  extra sample composited over white), 3 (palette via 16-bit ColorMap);
  8- and 16-bit samples (16-bit keeps the high byte); horizontal
  differencing predictor (tag 317 = 2).  Tiled, planar-separate, and
  CCITT/JPEG-in-TIFF variants raise (honest subset — CCITT needs the
  T.4 code tables, see kernels/gif.py's note on why only algorithmic
  formats are implemented from scratch here).
- **encode_tiff**: matching writer (none/PackBits/Deflate/LZW strips)
  for round-trip testing with known pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from parserpdf_spark.kernels.pdf_binary import _lzw_decode


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expect:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                raise ValueError("truncated PackBits repeat")
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 128: no-op
    if len(out) < expect:
        raise ValueError("PackBits data shorter than the strip")
    return bytes(out[:expect])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 1 < n and data[i + 1] == data[i]
                        and i + 2 < n and data[i + 2] == data[i])):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-flavor LZW writer (MSB-first, EarlyChange) matching the PDF
    kernel's decoder."""
    CLEAR, EOI = 256, 257
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(CLEAR)
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        table[cand] = next_code
        next_code += 1
        # EarlyChange: width grows one code EARLY
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code >= 4094:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([byte])
    if seq:
        emit(table[seq])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _ifd_values(data: bytes, bo: str, entry: bytes) -> list[int]:
    tag, typ, count = struct.unpack(bo + "HHI", entry[:8])
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    if typ not in sizes:
        raise ValueError(f"unsupported IFD type {typ} for tag {tag}")
    total = sizes[typ] * count
    if total <= 4:
        raw = entry[8 : 8 + total]
    else:
        (off,) = struct.unpack(bo + "I", entry[8:12])
        if off + total > len(data):
            raise ValueError(f"IFD value for tag {tag} out of range")
        raw = data[off : off + total]
    fmt = {1: "B", 2: "B", 3: "H", 4: "I"}[typ]
    return [v for (v,) in struct.iter_unpack(bo + fmt, raw)]


def decode_tiff(payload: bytes):
    """TIFF bytes → (width, height, HxWx3 uint8 RGB array) of the first
    image (IFD)."""
    data = bytes(payload)
    if len(data) < 8:
        raise ValueError("not a TIFF (too short)")
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF (missing II*/MM* magic)")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    if ifd_off + 2 > len(data):
        raise ValueError("IFD offset out of range")
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + 2 + 12 * i
        entry = data[at : at + 12]
        if len(entry) < 12:
            raise ValueError("truncated IFD")
        (tag,) = struct.unpack(bo + "H", entry[:2])
        if tag in (256, 257, 258, 259, 262, 273, 277, 278, 279, 317,
                   320, 338, 284):
            tags[tag] = _ifd_values(data, bo, entry)
        elif tag in (322, 323, 324, 325):
            raise ValueError("tiled TIFF outside the strip subset")

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w, h = one(256), one(257)
    if w == 0 or h == 0 or w > 1 << 16 or h > 1 << 16 or w * h > 1 << 26:
        raise ValueError("degenerate or implausible TIFF dimensions")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if any(b not in (8, 16) for b in bits) or len(set(bits)) != 1:
        raise ValueError(f"TIFF bits-per-sample {bits} outside 8/16 subset")
    depth = bits[0]
    if one(284, 1) != 1:
        raise ValueError("planar-separate TIFF outside the subset")
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF without consistent strip offsets/counts")

    bpp = spp * (depth // 8)
    raw = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise ValueError("TIFF strip out of range")
        strip = data[off : off + cnt]
        nrows = min(rows_per_strip, remaining_rows)
        expect = nrows * w * bpp
        if comp == 1:
            dec = strip[:expect]
            if len(dec) < expect:
                raise ValueError("uncompressed strip shorter than rows")
        elif comp == 5:
            dec = _lzw_decode(strip)[:expect]
            if len(dec) < expect:
                raise ValueError("LZW strip shorter than rows")
        elif comp in (8, 32946):
            try:  # bounded inflate: never allocate past the strip size
                dec = zlib.decompressobj().decompress(strip, expect)
            except zlib.error as exc:
                raise ValueError(f"broken Deflate strip: {exc}") from exc
            if len(dec) < expect:
                raise ValueError("Deflate strip shorter than rows")
        elif comp == 32773:
            dec = _packbits_decode(strip, expect)
        elif comp in (2, 3, 4):
            raise ValueError(
                "CCITT-compressed TIFF outside the subset (the T.4/T.6 "
                "code tables are not reproducible from scratch here)"
            )
        elif comp in (6, 7):
            raise ValueError("JPEG-in-TIFF outside the subset")
        else:
            raise ValueError(f"unknown TIFF compression {comp}")
        if one(317, 1) == 2:  # horizontal differencing per row
            if depth == 16:
                raise ValueError("predictor on 16-bit samples unsupported")
            arr = np.frombuffer(dec, dtype=np.uint8).reshape(nrows, w, spp)
            cum = np.cumsum(arr.astype(np.uint32), axis=1)
            dec = (cum & 0xFF).astype(np.uint8).tobytes()
        raw += dec
        remaining_rows -= nrows
    if remaining_rows > 0:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")

    if depth == 16:
        a16 = np.frombuffer(bytes(raw), dtype=(bo + "u2"),
                            count=h * w * spp)
        samples = (a16 >> 8).astype(np.uint8).reshape(h, w, spp)
    else:
        samples = np.frombuffer(bytes(raw), dtype=np.uint8,
                                count=h * w * spp).reshape(h, w, spp)

    if photo in (0, 1):
        g = samples[..., 0]
        if photo == 0:  # white-is-zero
            g = 255 - g
        rgb = np.stack([g, g, g], axis=-1)
    elif photo == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        rgb = samples[..., :3]
        if spp >= 4:  # alpha extra sample over white
            a = samples[..., 3:4].astype(np.float64) / 255.0
            rgb = np.clip((rgb * a + 255.0 * (1 - a)).round(),
                          0, 255).astype(np.uint8)
    elif photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) % 3 != 0 or len(cmap) < 3 * 2:
            raise ValueError("palette TIFF without a usable ColorMap")
        third = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, third).T
               >> 8).astype(np.uint8)
        idx = samples[..., 0]
        if int(idx.max(initial=0)) >= third:
            raise ValueError("TIFF palette index out of range")
        rgb = pal[idx]
    else:
        raise ValueError(f"TIFF photometric {photo} outside the subset")
    return w, h, np.ascontiguousarray(rgb)


def encode_tiff(pixels, compression: int = 1, rows_per_strip: int = 0,
                big_endian: bool = False) -> bytes:
    """HxWx3 RGB (or HxW gray) uint8 → TIFF bytes with the requested
    strip compression (1 none, 5 LZW, 8 Deflate, 32773 PackBits)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_tiff expects HxWx3 RGB or HxW gray")
    h, w = arr.shape[:2]
    spp = 1 if gray else 3
    bo = ">" if big_endian else "<"
    rows_per_strip = rows_per_strip or h
    flat = arr.reshape(h, w * spp)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = flat[y0 : y0 + rows_per_strip].tobytes()
        if compression == 1:
            strips.append(chunk)
        elif compression == 5:
            strips.append(_lzw_encode_tiff(chunk))
        elif compression == 8:
            strips.append(zlib.compress(chunk))
        elif compression == 32773:
            strips.append(_packbits_encode(chunk))
        else:
            raise ValueError(f"unsupported encode compression {compression}")

    entries: list[tuple[int, int, int, int]] = []  # tag, type, count, value
    n_strips = len(strips)
    header = 8
    # layout: header, IFD, [strip offset/count arrays], strip data
    ifd_size = 2 + 12 * 10 + 4
    extra = bytearray()
    extra_base = header + ifd_size

    def arr_value(values: list[int]) -> int:
        if len(values) == 1:
            return values[0]
        off = extra_base + len(extra)
        for v in values:
            extra.extend(struct.pack(bo + "I", v))
        return off

    strip_offsets: list[int] = []
    strip_counts = [len(s) for s in strips]
    # compute final positions after we know the extra block size: strip
    # offset array itself may live in extra, so fill placeholders first
    so_slot = arr_value([0] * n_strips) if n_strips > 1 else 0
    sc_slot = arr_value(strip_counts) if n_strips > 1 else strip_counts[0]
    data_base = extra_base + len(extra)
    at = data_base
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    if n_strips > 1:
        # patch the placeholder offset array
        pos = so_slot - extra_base
        for i, v in enumerate(strip_offsets):
            extra[pos + 4 * i : pos + 4 * i + 4] = struct.pack(bo + "I", v)
        so_value = so_slot
        sc_value = sc_slot
    else:
        so_value = strip_offsets[0]
        sc_value = strip_counts[0]

    entries = [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, compression),
        (262, 3, 1, 1 if gray else 2),
        (273, 4, n_strips, so_value),
        (277, 3, 1, spp),
        (278, 4, 1, rows_per_strip),
        (279, 4, n_strips, sc_value),
        (284, 3, 1, 1),
    ]
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(bo + "I", header)
    out += struct.pack(bo + "H", len(entries))
    for tag, typ, count, value in entries:
        out += struct.pack(bo + "HHI", tag, typ, count)
        if typ == 3 and count == 1:
            out += struct.pack(bo + "H", value) + b"\x00\x00"
        else:
            out += struct.pack(bo + "I", value)
    out += struct.pack(bo + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
