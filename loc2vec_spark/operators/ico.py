"""ICO (favicon) codec — the crawl's most-fetched image container.

Every site fetch drags an ``/favicon.ico`` along, so a crawl-scale
image ingest sees ICO as often as any real format. An ICO is a tiny
directory over embedded images, each either a PNG (modern, usually
the 256px entry) or a headerless BMP DIB whose declared height covers
the XOR pixel block AND a 1-bit transparency mask. This module
composes the repo's existing decoders:

- :func:`decode_ico` — picks the best entry (largest area, then
  deepest bpp), routes PNG entries to ``png_codec`` and DIB entries
  through :mod:`.bmp`'s machinery (a synthesized file header + the
  halved height), then applies the AND mask by zeroing masked-out
  pixels (no alpha channel in the pipeline's (H, W, 3) contract —
  documented, deterministic);
- :func:`encode_ico` — wraps PNG or 24-bit DIB entries for golden
  round-trips.

Safety contract as everywhere: ValueError on corrupt/truncated/
unsupported input, every entry offset/size validated against the
file, dimensions capped by the underlying decoders' shared
``png_codec.MAX_PIXELS``.

Reference anchor: the reference accepts whatever torchvision's
read_image loads (/root/reference/src/loc2vec/data_loading.py:124);
this repo implements the decoders from scratch.
"""
from __future__ import annotations

import struct

import numpy as np

from ..png_codec import decode_png, encode_png
from .bmp import decode_bmp

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _entries(data: bytes):
    if len(data) < 6:
        raise ValueError("truncated ICO header")
    reserved, typ, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or typ not in (1, 2):
        raise ValueError(f"not an ICO/CUR (reserved={reserved}, "
                         f"type={typ})")
    if count == 0:
        raise ValueError("ICO holds no images")
    if 6 + 16 * count > len(data):
        raise ValueError("ICO directory truncated")
    out = []
    for i in range(count):
        w, h, _pal, _res, _p1, bpp, size, off = struct.unpack(
            "<BBBBHHII", data[6 + 16 * i:6 + 16 * (i + 1)])
        if off + size > len(data):
            raise ValueError(f"entry {i} overruns the file")
        out.append({"w": w or 256, "h": h or 256, "bpp": bpp,
                    "data": data[off:off + size]})
    return out


def _decode_dib_entry(blob: bytes) -> np.ndarray:
    """Headerless BMP DIB (XOR block + AND mask) -> (H, W, 3)."""
    if len(blob) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size = struct.unpack("<I", blob[:4])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported ICO DIB header {hdr_size}")
    w, h2 = struct.unpack("<ii", blob[4:12])
    bpp = struct.unpack("<H", blob[14:16])[0]
    comp = struct.unpack("<I", blob[16:20])[0]
    if comp != 0:
        raise ValueError(f"compressed ICO DIB (compression {comp})")
    if h2 % 2 != 0 or h2 <= 0 or w <= 0:
        raise ValueError(f"bad ICO DIB geometry {w}x{h2}")
    h = h2 // 2
    n_colors = struct.unpack("<I", blob[32:36])[0]
    n_pal = (n_colors or (1 << bpp)) if bpp <= 8 else 0
    # synthesize a BM file around the DIB with the height halved so
    # the BMP decoder sees exactly the XOR block
    pix_off = 14 + hdr_size + 4 * n_pal
    patched = bytearray(blob)
    patched[8:12] = struct.pack("<i", h)
    bm = (b"BM" + struct.pack("<IHHI", 14 + len(blob), 0, 0, pix_off)
          + bytes(patched))
    rgb = decode_bmp(bm)

    # AND mask: 1-bit rows, 4-byte aligned, bottom-up, AFTER the XOR
    # block; 1 = transparent. Missing/truncated masks (some real
    # writers omit them for 32-bit entries) mean fully opaque.
    xor_stride = ((w * bpp + 31) // 32) * 4
    mask_off = hdr_size + 4 * n_pal + xor_stride * h
    mask_stride = ((w + 31) // 32) * 4
    mask_end = mask_off + mask_stride * h
    if mask_end <= len(blob):
        rows = np.frombuffer(blob[mask_off:mask_end],
                             dtype=np.uint8).reshape(h, mask_stride)
        bits = np.unpackbits(rows, axis=1)[:, :w][::-1]
        rgb = rgb.copy()
        rgb[bits.astype(bool)] = 0
    return rgb


def decode_ico(data: bytes) -> np.ndarray:
    """ICO/CUR bytes -> uint8 (H, W, 3) of the best DECODABLE entry
    (largest area, then deepest bpp, falling back down the ranking).
    PNG entries route to the PNG decoder, DIB entries to the BMP
    decoder with the AND mask applied as zeroed pixels.

    The fallback matters on real favicons (review r5): the common
    layout is small BMP DIBs plus a 256px RGBA PNG, and the PNG
    decoder's color-type scope (gray/RGB) rejects the RGBA entry —
    the 32px DIB must still serve rather than quarantining the
    file."""
    try:
        ents = _entries(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt or truncated ICO: {e!r}") from e
    ranked = sorted(ents, key=lambda e: (e["w"] * e["h"], e["bpp"]),
                    reverse=True)
    first: Exception | None = None
    for ent in ranked:
        blob = ent["data"]
        try:
            if blob[:8] == _PNG_SIG:
                arr = decode_png(blob)
                if arr.ndim == 2:
                    arr = np.repeat(arr[..., None], 3, axis=2)
                return arr
            return _decode_dib_entry(blob)
        except (ValueError, struct.error, IndexError) as e:
            # keep the BEST-ranked entry's failure for the message —
            # it is the one a triager should look at first
            if first is None:
                first = e
    raise ValueError(f"no decodable ICO entry "
                     f"(best entry's failure: {first!r})")


def encode_ico(images: list[np.ndarray], *, as_png: bool = False) -> bytes:
    """List of uint8 (H, W, 3) frames (each <= 256x256) -> ICO bytes.

    ``as_png=True`` embeds PNG entries (the modern favicon form);
    otherwise 24-bit DIB entries with an all-opaque AND mask."""
    if not images:
        raise ValueError("need at least one image")
    blobs = []
    dims = []
    for arr in images:
        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim != 3 or a.shape[2] != 3:
            raise ValueError(f"expected (H,W,3), got {a.shape}")
        h, w = a.shape[:2]
        if h > 256 or w > 256:
            raise ValueError(f"ICO entries cap at 256px, got {w}x{h}")
        dims.append((w, h))
        if as_png:
            blobs.append(encode_png(a))
            continue
        xor_stride = ((w * 3 + 3) // 4) * 4
        rows = np.zeros((h, xor_stride), dtype=np.uint8)
        rows[:, :w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
        mask_stride = ((w + 31) // 32) * 4
        mask = np.zeros((h, mask_stride), dtype=np.uint8)
        dib = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 24, 0,
                          xor_stride * h + mask_stride * h,
                          0, 0, 0, 0)
        blobs.append(dib + rows.tobytes() + mask.tobytes())
    out = bytearray(struct.pack("<HHH", 0, 1, len(blobs)))
    off = 6 + 16 * len(blobs)
    for (w, h), blob in zip(dims, blobs):
        out += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 24,
                           len(blob), off)
        off += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
