"""Baseline TIFF codec — pure numpy/stdlib.

The scanner/GIS sibling of the other image front doors (satellite
chips and scanned corpora arrive as .tif): :func:`decode_tiff`
handles baseline TIFF 6.0 rasters — both byte orders, 8-bit
grayscale (BlackIsZero AND the inverted WhiteIsZero), 8-bit RGB,
palette-color (16-bit colormaps), strip layout with any RowsPerStrip,
uncompressed and PackBits. :func:`encode_tiff` writes the matching
baseline form for golden round-trips. Tiled TIFF, LZW/JPEG/deflate
codecs, and >8-bit samples are refused loudly (ValueError), never
misdecoded.

The IFD walk is the same structure ``operators/exif.py`` parses out
of JPEG APP1 (TIFF 6.0 §2) — this module re-implements it with
image-file bounds (offsets/counts validated against the WHOLE file,
dimensions against the shared ``png_codec.MAX_PIXELS`` cap before
any allocation) rather than exif's 64 KB APP1 bound.

Safety contract, shared with every codec in this package: corrupt,
truncated, or unsupported input raises ``ValueError`` — the caller's
quarantine path.

Reference anchor: the reference accepts whatever torchvision's
read_image loads (/root/reference/src/loc2vec/data_loading.py:124);
this repo implements the decoders from scratch.
"""
from __future__ import annotations

import struct

import numpy as np

from .. import png_codec as _png

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 11: 4, 12: 8}


class _Reader:
    """Bounded little/big-endian TIFF structure reader."""

    def __init__(self, buf: bytes):
        if len(buf) < 8:
            raise ValueError("TIFF header truncated")
        order = buf[:2]
        if order == b"II":
            self.e = "<"
        elif order == b"MM":
            self.e = ">"
        else:
            raise ValueError(f"not a TIFF (byte order {order!r})")
        magic, self.ifd0 = struct.unpack(self.e + "HI", buf[2:8])
        if magic != 42:
            raise ValueError(f"bad TIFF magic {magic}")
        self.buf = buf

    def read(self, off: int, n: int) -> bytes:
        if off < 0 or n < 0 or off + n > len(self.buf):
            raise ValueError("TIFF offset overruns the file")
        return self.buf[off:off + n]

    def ifd(self, off: int) -> dict[int, tuple[int, int, bytes]]:
        (n,) = struct.unpack(self.e + "H", self.read(off, 2))
        if n > 4096:
            raise ValueError(f"IFD entry count {n} implausible")
        out = {}
        for i in range(n):
            ent = self.read(off + 2 + 12 * i, 12)
            tag, typ, cnt = struct.unpack(self.e + "HHI", ent[:8])
            size = _TYPE_SIZE.get(typ, 1) * cnt
            if size > len(self.buf):
                raise ValueError("IFD value size exceeds the file")
            if size <= 4:
                val = ent[8:8 + max(size, 1)]
            else:
                (voff,) = struct.unpack(self.e + "I", ent[8:12])
                val = self.read(voff, size)
            out[tag] = (typ, cnt, val)
        return out

    def ints(self, entry: tuple[int, int, bytes]) -> list[int]:
        typ, cnt, val = entry
        if typ == 3:
            return list(struct.unpack(self.e + "H" * cnt,
                                      val[:2 * cnt]))
        if typ == 4:
            return list(struct.unpack(self.e + "I" * cnt,
                                      val[:4 * cnt]))
        raise ValueError(f"expected SHORT/LONG tag, got type {typ}")


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits (TIFF 6.0 §9) -> exactly ``expect`` bytes; over- or
    under-runs raise (a crafted run count must not balloon output)."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n == 128:  # noop
            continue
        if n < 128:   # literal run of n+1
            if pos + n + 1 > len(data):
                raise ValueError("PackBits literal truncated")
            out += data[pos:pos + n + 1]
            pos += n + 1
        else:         # repeat next byte 257-n times
            if pos >= len(data):
                raise ValueError("PackBits repeat truncated")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
    if len(out) != expect:
        raise ValueError(f"PackBits yielded {len(out)} of {expect} "
                         f"bytes")
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while j + 1 < n and data[j + 1] == data[j] and j - i < 126:
            j += 1
        if j > i:  # run of j-i+1 >= 2 equal bytes
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        j = i
        while (j + 1 < n and (j + 2 >= n or data[j + 1] != data[j + 2])
               and j - i < 126):
            j += 1
        out += bytes([j - i]) + data[i:j + 1]
        i = j + 1
    return bytes(out)


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> uint8 (H, W) gray or (H, W, 3) RGB."""
    try:
        return _decode_tiff(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt or truncated TIFF: {e!r}") from e


def _decode_tiff(data: bytes) -> np.ndarray:
    t = _Reader(data)
    ifd = t.ifd(t.ifd0)
    need = {256: "ImageWidth", 257: "ImageLength", 273: "StripOffsets",
            279: "StripByteCounts"}
    for tag, name in need.items():
        if tag not in ifd:
            raise ValueError(f"missing required tag {name}")
    w = t.ints(ifd[256])[0]
    h = t.ints(ifd[257])[0]
    if w == 0 or h == 0 or w * h > _png.MAX_PIXELS:
        raise ValueError(f"refusing {w}x{h} frame (decode cap "
                         f"{_png.MAX_PIXELS} px)")
    comp = t.ints(ifd[259])[0] if 259 in ifd else 1
    if comp not in (1, 32773):
        raise ValueError(f"unsupported compression {comp} (baseline "
                         f"none/PackBits only)")
    photo = t.ints(ifd[262])[0] if 262 in ifd else 1
    if photo not in (0, 1, 2, 3):
        raise ValueError(f"unsupported photometric {photo}")
    spp = t.ints(ifd[277])[0] if 277 in ifd else 1
    expect_spp = 3 if photo == 2 else 1
    if spp != expect_spp:
        raise ValueError(f"photometric {photo} with {spp} samples")
    bits = t.ints(ifd[258]) if 258 in ifd else [8] * spp
    if any(b != 8 for b in bits) or len(bits) != spp:
        raise ValueError(f"unsupported bits per sample {bits}")
    if 284 in ifd and t.ints(ifd[284])[0] != 1:
        raise ValueError("planar (non-chunky) configuration")
    rps = t.ints(ifd[278])[0] if 278 in ifd else h
    if rps == 0:
        raise ValueError("RowsPerStrip of zero")
    offs = t.ints(ifd[273])
    cnts = t.ints(ifd[279])
    n_strips = (h + rps - 1) // rps
    if len(offs) != n_strips or len(cnts) != n_strips:
        raise ValueError(f"strip table length {len(offs)}/{len(cnts)}"
                         f" != {n_strips}")
    parts = []
    for k in range(n_strips):
        rows = min(rps, h - k * rps)
        want = rows * w * spp
        raw = t.read(offs[k], cnts[k])
        if comp == 1:
            if len(raw) < want:
                raise ValueError(f"strip {k} holds {len(raw)} of "
                                 f"{want} bytes")
            parts.append(raw[:want])
        else:
            parts.append(_packbits_decode(raw, want))
    px = np.frombuffer(b"".join(parts), dtype=np.uint8)
    if photo == 2:
        return px.reshape(h, w, 3).copy()
    idx = px.reshape(h, w)
    if photo == 3:
        if 320 not in ifd:
            raise ValueError("palette image without ColorMap")
        cmap = t.ints(ifd[320])
        n = len(cmap) // 3
        if n < 256 and int(idx.max(initial=0)) >= n:
            raise ValueError("palette index beyond ColorMap")
        cm = (np.array(cmap, dtype=np.uint16).reshape(3, n).T
              >> 8).astype(np.uint8)
        return cm[idx]
    if photo == 0:  # WhiteIsZero
        return (255 - idx).copy()
    return idx.copy()


def encode_tiff(arr: np.ndarray, *, packbits: bool = False,
                rows_per_strip: int = 0) -> bytes:
    """uint8 (H, W) gray or (H, W, 3) RGB -> baseline TIFF bytes
    (little-endian, chunky, BlackIsZero/RGB, strip layout)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        spp, photo = 1, 1
    elif a.ndim == 3 and a.shape[2] == 3:
        spp, photo = 3, 2
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    h, w = a.shape[:2]
    rps = rows_per_strip or h
    n_strips = (h + rps - 1) // rps
    strips = []
    for k in range(n_strips):
        raw = a[k * rps:(k + 1) * rps].tobytes()
        strips.append(_packbits_encode(raw) if packbits else raw)

    tags = []  # (tag, type, count, int-values or offset placeholder)

    def short(tag, *vals):
        tags.append((tag, 3, len(vals), list(vals)))

    def long_(tag, *vals):
        tags.append((tag, 4, len(vals), list(vals)))

    short(256, w)
    short(257, h)
    short(258, *([8] * spp))
    short(259, 32773 if packbits else 1)
    short(262, photo)
    long_(273, *([0] * n_strips))  # patched below
    short(277, spp)
    short(278, rps)
    long_(279, *[len(s) for s in strips])
    tags.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + out-of-line values + strip data
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    # out-of-line region
    extra = bytearray()
    ext_base = ifd_off + ifd_size
    entries = []
    for tag, typ, cnt, vals in tags:
        size = _TYPE_SIZE[typ] * cnt
        fmt = "H" if typ == 3 else "I"
        packed = struct.pack("<" + fmt * cnt, *vals)
        if size <= 4:
            entries.append([tag, typ, cnt, packed.ljust(4, b"\0"),
                            None])
        else:
            entries.append([tag, typ, cnt, ext_base + len(extra),
                            (fmt, vals)])
            extra += packed
    data_base = ext_base + len(extra)
    # patch strip offsets now that layout is known
    strip_offs = []
    pos = data_base
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val, ext in entries:
        if tag == 273:
            if ext is None:  # single strip: inline LONG
                val = struct.pack("<I", strip_offs[0])
            else:
                off = val
                packed = struct.pack("<" + "I" * cnt, *strip_offs)
                extra[off - ext_base:off - ext_base + len(packed)] = \
                    packed
                val = struct.pack("<I", off)
        elif ext is not None:
            val = struct.pack("<I", val)
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
