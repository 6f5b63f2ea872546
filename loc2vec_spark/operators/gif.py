"""GIF87a/89a codec — pure numpy/stdlib, no external image libs.

Crawl-reality front door: after JPEG and PNG, GIF is the third image
format a WARC/HTML ingest actually meets (the reference's loader takes
whatever torchvision reads, /root/reference/src/loc2vec/
data_loading.py:124 — this repo decodes from scratch instead). Both
GIF faces are REAL pixel decodes:

- :func:`decode_gif` — first composed frame as RGB, routed from
  ``images.decode_image``'s magic sniff so GIF tiles flow the whole
  image pipeline (stats, quality, phash, resize, augmentation);
- :func:`gif_frames` — ALL composed frames (animation), routed from
  ``video.decode_video`` so animated GIFs flow the video pipeline
  (frame_sample, phash sequences, dedup_video) next to Y4M and
  MP4/MJPEG.

Format scope (decode): 87a + 89a, global/local color tables, LZW
(variable 3..12-bit codes, clear/EOI, deferred-clear streams),
interlace (4-pass), frame composition with disposal methods 0/1
(leave), 2 (restore background), 3 (restore previous) and GCE
transparency. :func:`encode_gif` writes 89a with a global palette
(<= 256 colors — callers quantize first; the repo's tests ride
small-palette fixtures) for golden round-trips.

Safety contract, identical to ``png_codec``/``operators.jpeg``:
every corrupt, truncated, or unsupported input raises ``ValueError``
(callers quarantine uniformly, never abort a 10^12-row ingest), all
sizes are validated BEFORE allocation against the ONE shared
``png_codec.MAX_PIXELS`` cap (a crafted 2-byte dimension or a
sub-block bomb must not OOM an executor), and the LZW output buffer
is bounded by the declared frame size.
"""
from __future__ import annotations

import struct

import numpy as np

from .. import png_codec as _png

_LUMA = np.array([0.299, 0.587, 0.114])  # BT.601, same as mp4/jpeg


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, variable code width 3..12)
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, max_out: int) -> bytes:
    """GIF-LZW decode of concatenated sub-block payloads.

    ``max_out`` bounds the emitted byte count (= the frame's declared
    w*h, itself capped) — a code stream that tries to emit more is
    corrupt-or-bomb and raises; a stream that ends early (no EOI,
    truncated file) raises too. Extra codes after the output is full
    are tolerated (real encoders pad the last sub-block)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # table as (prefix_code, last_byte) pairs; materialize lazily
    prefix = [-1] * 4096
    suffix = bytearray(4096)
    for i in range(clear):
        suffix[i] = i
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = n_acc = 0
    prev = -1
    stack = bytearray()

    def expand(code: int) -> bytes:
        stack.clear()
        c = code
        while c >= 0:
            stack.append(suffix[c])
            c = prefix[c]
        stack.reverse()
        return bytes(stack)

    for byte in data:
        acc |= byte << n_acc
        n_acc += 8
        while n_acc >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n_acc -= width
            if code == clear:
                next_code = eoi + 1
                width = min_code_size + 1
                prev = -1
                continue
            if code == eoi:
                if len(out) < max_out:
                    raise ValueError(
                        f"LZW EOI after {len(out)}/{max_out} pixels")
                return bytes(out[:max_out])
            if len(out) >= max_out:
                continue  # trailing pad codes — ignore
            if prev < 0:
                if code >= next_code:
                    raise ValueError("LZW first code not a literal")
                out.extend(expand(code))
                prev = code
                continue
            if code < next_code:
                entry = expand(code)
            elif code == next_code:
                entry = expand(prev)
                entry += entry[:1]
            else:
                raise ValueError(f"LZW code {code} beyond table "
                                 f"({next_code})")
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = entry[0]
                next_code += 1
                if next_code < 4096 and next_code == (1 << width):
                    width += 1
            out.extend(entry)
            prev = code
    if len(out) < max_out:
        raise ValueError(f"LZW stream ended at {len(out)}/{max_out} "
                         f"pixels (truncated)")
    return bytes(out[:max_out])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-LZW encode (emits a leading clear code, resets the table at
    4096 like every mainstream encoder)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    out = bytearray()
    acc = n_acc = 0

    def emit(code: int) -> None:
        nonlocal acc, n_acc
        acc |= code << n_acc
        n_acc += width
        while n_acc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8

    emit(clear)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the encoder's table is ONE entry ahead of the decoder's
            # (the decoder learns entry k only from the code emitted
            # after it), so widen one assignment later than the
            # decoder's next_code == 2^width point: codes stay
            # readable because the largest emittable value is
            # next_code - 1 = the decoder's own next slot
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run])
    emit(eoi)
    if n_acc:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container walk
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = np.empty(h, dtype=np.int64)
    k = 0
    for start, step in _INTERLACE_PASSES:
        idx = np.arange(start, h, step)
        order[idx] = np.arange(k, k + len(idx))
        k += len(idx)
    return rows[order]


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (payload, position after the 0x00 terminator). Bounded by
    len(data) — a declared length past the buffer raises."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("sub-block chain runs past the file")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        if pos + n > len(data):
            raise ValueError("sub-block payload truncated")
        parts.append(data[pos:pos + n])
        pos += n


def _walk(data: bytes, max_frames: int | None = None):
    """Compose frames. Internal; callers wrap for the ValueError
    contract. Returns (frames RGB uint8 (n,h,w,3), delays_cs list).

    ``max_frames`` stops the walk as soon as that many frames are
    composed (the static decode_gif face wants exactly one): later
    frames are neither LZW-decoded nor held, the trailer is not
    required past the stop point, and the composed-stream pixel cap
    applies only to the frames actually materialized — a long but
    valid animation must not quarantine the first-frame face."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    sw, sh, packed, bg_idx, _aspect = struct.unpack(
        "<HHBBB", data[6:13])
    if sw == 0 or sh == 0 or sw * sh > _png.MAX_PIXELS:
        raise ValueError(f"refusing {sw}x{sh} canvas (decode cap "
                         f"{_png.MAX_PIXELS} px)")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("global color table truncated")
        gct = np.frombuffer(
            data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n

    bg_rgb = (gct[bg_idx] if gct is not None and bg_idx < len(gct)
              else np.zeros(3, dtype=np.uint8))
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image descriptor
    transparent = -1
    disposal = 0
    delay_cs = 0

    while True:
        if pos >= len(data):
            raise ValueError("GIF ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("extension label truncated")
            label = data[pos]
            pos += 1
            payload, pos = _subblocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(payload) < 4:
                    raise ValueError("short graphic control extension")
                flags = payload[0]
                delay_cs = struct.unpack("<H", payload[1:3])[0]
                transparent = payload[3] if flags & 1 else -1
                disposal = (flags >> 2) & 0x07
            continue  # comment/app/plain-text: skipped, chain walked
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("image descriptor truncated")
        ix, iy, iw, ih, ipacked = struct.unpack(
            "<HHHHB", data[pos:pos + 9])
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > sw or iy + ih > sh:
            raise ValueError(
                f"frame rect {iw}x{ih}@({ix},{iy}) outside the "
                f"{sw}x{sh} canvas")
        if (len(frames) + 1) * sw * sh > _png.MAX_PIXELS:
            raise ValueError(
                f"refusing frame {len(frames) + 1}: composed stream "
                f"exceeds the {_png.MAX_PIXELS}-px decode cap")
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise ValueError("local color table truncated")
            lct = np.frombuffer(
                data[pos:pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("no color table for image data")
        if pos >= len(data):
            raise ValueError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        payload, pos = _subblocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(payload, mcs, iw * ih), dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("palette index beyond color table")
        rows = idx.reshape(ih, iw)
        if ipacked & 0x40:
            rows = _deinterlace(rows)

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[iy:iy + ih, ix:ix + iw]
        px = lct[rows]
        if transparent >= 0:
            mask = rows != transparent
            region[mask] = px[mask]
        else:
            region[:] = px
        frames.append(canvas.copy())
        delays.append(delay_cs)
        if max_frames is not None and len(frames) >= max_frames:
            break
        if disposal == 2:
            canvas[iy:iy + ih, ix:ix + iw] = bg_rgb
        elif disposal == 3:
            canvas = prev_canvas
        transparent, disposal, delay_cs = -1, 0, 0

    if not frames:
        raise ValueError("GIF holds no image data")
    return np.stack(frames), delays


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> first composed frame, uint8 (H, W, 3).

    The static-image face (``images.decode_image`` routes here on the
    ``GIF8`` magic): ONLY the first frame is LZW-decoded and composed
    — later frames of an animation are never touched, so the work and
    the pixel cap are per-frame, not per-animation. ValueError on
    every corrupt/truncated/unsupported input — the shared quarantine
    contract."""
    try:
        frames, _ = _walk(data, max_frames=1)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt or truncated GIF: {e!r}") from e
    return frames[0]


def gif_frames(data: bytes) -> tuple[float, np.ndarray]:
    """GIF bytes -> (fps, (n, h, w) uint8 luma frames) — the video
    face (``video.decode_video`` routes here), matching the Y4M/MJPEG
    luma contract so animated GIFs flow frame_sample/dedup_video
    unchanged. fps derives from the median GCE delay (centiseconds;
    0 or absent -> the renderers' de-facto 10 fps)."""
    try:
        frames, delays = _walk(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt or truncated GIF: {e!r}") from e
    pos_delays = sorted(d for d in delays if d > 0)
    cs = pos_delays[len(pos_delays) // 2] if pos_delays else 10
    luma = (frames.astype(np.float64) @ _LUMA)
    return 100.0 / cs, np.clip(np.rint(luma), 0, 255).astype(np.uint8)


def encode_gif(frames: np.ndarray, *, delay_cs: int = 10,
               interlace: bool = False, loop: int = 0) -> bytes:
    """uint8 frames -> GIF89a bytes. Accepts (H, W) | (H, W, 3) |
    (N, H, W, 3); builds ONE global palette from the union of colors
    (> 256 distinct colors raises — quantize upstream; the engine's
    tile fixtures are palette-bounded by construction). Multi-frame
    input writes a looping animation with a per-frame GCE delay."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    if arr.ndim == 3:
        if arr.shape[-1] == 3:   # single RGB frame (wins the W=3
            arr = arr[None]      # gray-stack ambiguity, documented)
        else:                    # (N, H, W) luma stack — the video
            arr = np.repeat(arr[..., None], 3, axis=3)  # operators'
    if arr.ndim != 4 or arr.shape[-1] != 3:              # frame shape
        raise ValueError(f"expected (H,W[,3]), (N,H,W) or (N,H,W,3), "
                         f"got {arr.shape}")
    n, h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors > 256 "
                         f"(quantize before encode_gif)")
    bits = max(2, int(len(palette) - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[:len(palette)] = palette
    idx = inverse.astype(np.uint8).reshape(n, h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7), 0, 0)
    out += pal.tobytes()
    if n > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01"
        out += struct.pack("<H", loop) + b"\x00"
    for k in range(n):
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs)
        out += b"\x00\x00"  # no transparency; terminator
        ip = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ip)
        rows = idx[k]
        if interlace:
            order = np.concatenate(
                [np.arange(s, h, t) for s, t in _INTERLACE_PASSES])
            rows = rows[order]
        mcs = max(2, bits)
        out.append(mcs)
        lzw = _lzw_encode(rows.tobytes(), mcs)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
