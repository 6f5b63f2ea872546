"""BMP (Windows bitmap) codec — pure numpy/stdlib.

The uncompressed sibling of the GIF/PNG/JPEG front doors (crawls and
desktop exports still carry .bmp): :func:`decode_bmp` handles the
formats real files use — BITMAPINFOHEADER/V4/V5, bottom-up and
top-down rows, bit depths 1/4/8 (palette), 24 and 32 (BGR/BGRA), and
the RLE8/RLE4 compressions with their escape codes (end-of-line,
end-of-bitmap, delta). :func:`encode_bmp` writes the plain 24-bit
BI_RGB form for golden round-trips.

Safety contract, shared with every codec in this package: corrupt,
truncated, or unsupported input raises ``ValueError`` (the caller's
quarantine path — one bad image of 10^12 must never abort the job);
dimensions are validated against ``png_codec.MAX_PIXELS`` BEFORE any
allocation, and every RLE run writes through bounds-checked cursors
so a crafted run count cannot write past the declared frame.

Reference anchor: the reference accepts whatever torchvision's
read_image loads (/root/reference/src/loc2vec/data_loading.py:124);
this repo implements the decoders from scratch.
"""
from __future__ import annotations

import struct

import numpy as np

from .. import png_codec as _png


def _palette(data: bytes, off: int, n: int) -> np.ndarray:
    if off + 4 * n > len(data):
        raise ValueError("BMP palette truncated")
    raw = np.frombuffer(data[off:off + 4 * n],
                        dtype=np.uint8).reshape(n, 4)
    return raw[:, [2, 1, 0]].copy()  # BGRX -> RGB


def _unpack_bits(row: np.ndarray, bpp: int, w: int) -> np.ndarray:
    """One padded row of 1/4-bit palette indexes -> w uint8 indexes."""
    if bpp == 1:
        bits = np.unpackbits(row)
        return bits[:w]
    hi = row >> 4
    lo = row & 0x0F
    out = np.empty(row.size * 2, dtype=np.uint8)
    out[0::2] = hi
    out[1::2] = lo
    return out[:w]


def _decode_rle(data: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """RLE8/RLE4 -> (h, w) palette indexes, rows in file (bottom-up)
    order. Escapes: 00 00 end-of-line, 00 01 end-of-bitmap, 00 02 dx
    dy delta; 00 n>=3 absolute run (word-aligned)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = pos = 0
    while pos + 1 < len(data) + 1:
        if pos + 2 > len(data):
            raise ValueError("RLE stream truncated")
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if y >= h or x + n > w:
                raise ValueError("RLE run outside the frame")
            if bpp == 8:
                out[y, x:x + n] = v
            else:
                pix = np.empty(n, dtype=np.uint8)
                pix[0::2] = v >> 4
                pix[1::2] = v & 0x0F
                out[y, x:x + n] = pix
            x += n
            continue
        if v == 0:      # end of line
            x, y = 0, y + 1
            continue
        if v == 1:      # end of bitmap
            return out
        if v == 2:      # delta
            if pos + 2 > len(data):
                raise ValueError("RLE delta truncated")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError("RLE delta outside the frame")
            continue
        # absolute mode: v literal pixels, word-aligned
        count = v
        nbytes = count if bpp == 8 else (count + 1) // 2
        pad = (nbytes & 1)
        if pos + nbytes + pad > len(data):
            raise ValueError("RLE absolute run truncated")
        if y >= h or x + count > w:
            raise ValueError("RLE absolute run outside the frame")
        chunk = np.frombuffer(data[pos:pos + nbytes], dtype=np.uint8)
        if bpp == 8:
            out[y, x:x + count] = chunk
        else:
            pix = np.empty(nbytes * 2, dtype=np.uint8)
            pix[0::2] = chunk >> 4
            pix[1::2] = chunk & 0x0F
            out[y, x:x + count] = pix[:count]
        x += count
        pos += nbytes + pad
    raise ValueError("RLE stream ended without end-of-bitmap")


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes -> uint8 (H, W, 3) RGB.

    ValueError on corrupt/truncated/unsupported input (BI_BITFIELDS
    and the OS/2 BITMAPCOREHEADER are refused loudly, not
    misdecoded)."""
    try:
        return _decode_bmp(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt or truncated BMP: {e!r}") from e


def _decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size} "
                         f"(OS/2 core headers not supported)")
    w, h_raw = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    comp = struct.unpack("<I", data[30:34])[0]
    n_colors = struct.unpack("<I", data[46:50])[0]
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    if w <= 0 or h <= 0 or w * h > _png.MAX_PIXELS:
        raise ValueError(f"refusing {w}x{h} frame (decode cap "
                         f"{_png.MAX_PIXELS} px)")
    if planes != 1:
        raise ValueError(f"bad plane count {planes}")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    if comp not in (0, 1, 2):
        raise ValueError(f"unsupported compression {comp} "
                         f"(BI_BITFIELDS/PNG/JPEG embeds refused)")
    if (comp == 1 and bpp != 8) or (comp == 2 and bpp != 4):
        raise ValueError(f"compression {comp} with bit depth {bpp}")
    if pix_off > len(data):
        raise ValueError("pixel offset past the file")

    if bpp <= 8:
        n_pal = n_colors or (1 << bpp)
        if n_pal > 1 << bpp:
            raise ValueError(f"palette size {n_pal} > 2^{bpp}")
        pal = _palette(data, 14 + hdr_size, n_pal)
        if comp:  # RLE — rows arrive bottom-up in the stream
            idx = _decode_rle(data[pix_off:], w, h, bpp)
            if int(idx.max(initial=0)) >= n_pal:
                raise ValueError("palette index beyond color table")
            rgb = pal[idx]
            return rgb if top_down else rgb[::-1].copy()
        stride = ((w * bpp + 31) // 32) * 4
        need = stride * h
        if pix_off + need > len(data):
            raise ValueError("pixel data truncated")
        rows = np.frombuffer(data[pix_off:pix_off + need],
                             dtype=np.uint8).reshape(h, stride)
        if bpp == 8:
            idx = rows[:, :w]
        else:
            idx = np.stack([_unpack_bits(rows[r], bpp, w)
                            for r in range(h)])
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("palette index beyond color table")
        rgb = pal[idx]
        return rgb if top_down else rgb[::-1].copy()

    nch = bpp // 8
    stride = ((w * nch + 3) // 4) * 4
    need = stride * h
    if pix_off + need > len(data):
        raise ValueError("pixel data truncated")
    rows = np.frombuffer(data[pix_off:pix_off + need],
                         dtype=np.uint8).reshape(h, stride)
    px = rows[:, :w * nch].reshape(h, w, nch)
    rgb = px[:, :, [2, 1, 0]].copy()  # BGR(A) -> RGB, alpha dropped
    return rgb if top_down else rgb[::-1].copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W) | (H, W, 3) -> 24-bit BI_RGB BMP bytes
    (bottom-up, the universally readable form)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[..., None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (H,W) or (H,W,3), got {a.shape}")
    h, w, _ = a.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    pix = rows.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
    return hdr + dib + pix
