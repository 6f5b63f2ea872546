"""BMP + baseline-TIFF codecs: round-trips across bit depths and
layouts, RLE/PackBits compression, palette and photometric variants,
both TIFF byte orders, decode-bomb caps, and quarantine-on-corrupt
through the image pipeline router."""

import struct

import numpy as np
import pytest

from loc2vec_spark.operators.bmp import decode_bmp, encode_bmp
from loc2vec_spark.operators.tiff import (_packbits_decode,
                                          _packbits_encode,
                                          decode_tiff, encode_tiff)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_24bit_round_trip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (23, 37, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    # odd width exercises the 4-byte row padding
    img2 = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(img2)), img2)


def test_bmp_gray_input_expands():
    rng = np.random.default_rng(8)
    g = rng.integers(0, 256, (10, 11), dtype=np.uint8)
    out = decode_bmp(encode_bmp(g))
    assert np.array_equal(out, np.repeat(g[..., None], 3, axis=2))


def _bmp_paletted(idx, pal, bpp, comp=0, payload=None):
    """Hand-assemble a palette BMP (bottom-up) around index rows."""
    h, w = idx.shape
    palraw = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    if payload is None:
        stride = ((w * bpp + 31) // 32) * 4
        rows = np.zeros((h, stride), dtype=np.uint8)
        flip = idx[::-1]
        if bpp == 8:
            rows[:, :w] = flip
        elif bpp == 4:
            for r in range(h):
                for c in range(w):
                    rows[r, c // 2] |= flip[r, c] << \
                        (4 if c % 2 == 0 else 0)
        else:  # 1-bit
            packed = np.packbits(flip, axis=1)
            rows[:, :packed.shape[1]] = packed
        payload = rows.tobytes()
    pix_off = 54 + len(palraw)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(payload), 0, 0,
                              pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, comp,
                      len(payload), 0, 0, len(pal), 0)
    return hdr + dib + palraw + payload


_PAL4 = np.array([[10, 20, 30], [200, 100, 50], [0, 0, 255],
                  [255, 255, 0]], dtype=np.uint8)


def test_bmp_palette_depths():
    rng = np.random.default_rng(9)
    idx8 = rng.integers(0, 4, (5, 6)).astype(np.uint8)
    assert np.array_equal(decode_bmp(_bmp_paletted(idx8, _PAL4, 8)),
                          _PAL4[idx8])
    idx4 = rng.integers(0, 4, (4, 5)).astype(np.uint8)
    assert np.array_equal(decode_bmp(_bmp_paletted(idx4, _PAL4, 4)),
                          _PAL4[idx4])
    idx1 = rng.integers(0, 2, (3, 10)).astype(np.uint8)
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    assert np.array_equal(decode_bmp(_bmp_paletted(idx1, pal2, 1)),
                          pal2[idx1])


def test_bmp_rle8_and_rle4():
    rng = np.random.default_rng(10)
    idx = rng.integers(0, 4, (5, 6)).astype(np.uint8)

    def rle8(ix):
        out = bytearray()
        for row in ix[::-1]:
            c = 0
            while c < len(row):
                n = 1
                while c + n < len(row) and row[c + n] == row[c] \
                        and n < 255:
                    n += 1
                out += bytes([n, row[c]])
                c += n
            out += b"\x00\x00"
        out[-2:] = b"\x00\x01"
        return bytes(out)

    data = _bmp_paletted(idx, _PAL4, 8, comp=1, payload=rle8(idx))
    assert np.array_equal(decode_bmp(data), _PAL4[idx])

    # RLE4: runs of a single repeated nibble pair + absolute mode
    row = np.array([[1, 1, 1, 2, 3, 0]], dtype=np.uint8)
    payload = bytes([3, 0x11,            # 1,1,1
                     0, 3, 0x23, 0x00,   # absolute 2,3,0 (2 bytes,
                     0, 1])              # word-aligned); end of bitmap
    data4 = _bmp_paletted(row, _PAL4, 4, comp=2, payload=payload)
    assert np.array_equal(decode_bmp(data4), _PAL4[row])


def test_bmp_32bit_topdown():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (4, 3, 3), dtype=np.uint8)
    rows = np.zeros((4, 12), dtype=np.uint8)
    rows[:, 0::4] = a[:, :, 2]
    rows[:, 1::4] = a[:, :, 1]
    rows[:, 2::4] = a[:, :, 0]
    rows[:, 3::4] = 255
    hdr = b"BM" + struct.pack("<IHHI", 54 + rows.size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, -4, 1, 32, 0,
                      rows.size, 0, 0, 0, 0)
    assert np.array_equal(decode_bmp(hdr + dib + rows.tobytes()), a)


def test_bmp_bomb_cap_and_quarantine():
    good = encode_bmp(np.zeros((4, 4), dtype=np.uint8))
    bomb = bytearray(good)
    bomb[18:26] = struct.pack("<ii", 60000, 60000)
    with pytest.raises(ValueError, match="decode cap"):
        decode_bmp(bytes(bomb))
    for bad in [b"", b"XX" + good[2:], good[:40], good[:-5],
                good[:30] + struct.pack("<I", 99) + good[34:]]:
        with pytest.raises(ValueError):
            decode_bmp(bad)
    # RLE run past the frame edge must raise, not write out of range
    idx = np.zeros((2, 3), dtype=np.uint8)
    data = _bmp_paletted(idx, _PAL4, 8, comp=1,
                         payload=bytes([200, 1, 0, 1]))
    with pytest.raises(ValueError, match="outside"):
        decode_bmp(data)


# ---------------------------------------------------------------------------
# TIFF
# ---------------------------------------------------------------------------

def test_tiff_round_trips():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (19, 23), dtype=np.uint8)
    c = rng.integers(0, 256, (17, 13, 3), dtype=np.uint8)
    assert np.array_equal(decode_tiff(encode_tiff(g)), g)
    assert np.array_equal(decode_tiff(encode_tiff(c)), c)
    # multi-strip + PackBits in every combination
    assert np.array_equal(
        decode_tiff(encode_tiff(c, rows_per_strip=5)), c)
    assert np.array_equal(
        decode_tiff(encode_tiff(g, packbits=True)), g)
    assert np.array_equal(
        decode_tiff(encode_tiff(c, packbits=True, rows_per_strip=4)),
        c)


def test_tiff_packbits_primitives():
    rng = np.random.default_rng(4)
    cases = [b"", b"a", b"aaaa", b"abc", b"aabbbbc" * 17,
             bytes(rng.integers(0, 3, 777, dtype=np.uint8))]
    for s in cases:
        assert _packbits_decode(_packbits_encode(s), len(s)) == s
    with pytest.raises(ValueError):
        _packbits_decode(b"\x05ab", 6)      # literal truncated
    with pytest.raises(ValueError):
        _packbits_decode(b"\xfe", 3)        # repeat truncated
    with pytest.raises(ValueError):
        _packbits_decode(b"\xfdaa", 2)      # wrong final size


def _mm_gray_2x2(photometric=None):
    """Minimal big-endian 2x2 grayscale TIFF, optional photometric."""
    px = bytes([10, 20, 30, 40])
    tags = [(256, 3, 1, struct.pack(">H", 2) + b"\0\0"),
            (257, 3, 1, struct.pack(">H", 2) + b"\0\0")]
    if photometric is not None:
        tags.append((262, 3, 1, struct.pack(">H", photometric)
                     + b"\0\0"))
    tags += [(273, 4, 1, None), (279, 4, 1, struct.pack(">I", 4))]
    tags.sort(key=lambda e: e[0])
    data_off = 8 + 2 + 12 * len(tags) + 4
    out = struct.pack(">2sHI", b"MM", 42, 8)
    out += struct.pack(">H", len(tags))
    for tag, typ, cnt, val in tags:
        if val is None:
            val = struct.pack(">I", data_off)
        out += struct.pack(">HHI", tag, typ, cnt) + val
    out += struct.pack(">I", 0)
    return out + px


def test_tiff_big_endian_and_white_is_zero():
    exp = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    assert np.array_equal(decode_tiff(_mm_gray_2x2()), exp)
    assert np.array_equal(decode_tiff(_mm_gray_2x2(photometric=1)),
                          exp)
    # WhiteIsZero inverts
    assert np.array_equal(decode_tiff(_mm_gray_2x2(photometric=0)),
                          255 - exp)


def test_tiff_palette_color():
    """Palette TIFF: 16-bit ColorMap entries downscale to 8-bit."""
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    n = 4
    cmap = []
    rgb8 = np.array([[5, 6, 7], [99, 98, 97], [0, 255, 128],
                     [255, 0, 10]], dtype=np.uint8)
    for ch in range(3):
        cmap += [int(v) << 8 for v in rgb8[:, ch]]
    cm_raw = struct.pack("<" + "H" * (3 * n), *cmap)
    tags = [(256, 3, 1, struct.pack("<H", 2) + b"\0\0"),
            (257, 3, 1, struct.pack("<H", 2) + b"\0\0"),
            (262, 3, 1, struct.pack("<H", 3) + b"\0\0"),
            (273, 4, 1, "data"), (279, 4, 1, struct.pack("<I", 4)),
            (320, 3, 3 * n, "cmap")]
    tags.sort(key=lambda e: e[0])
    ifd_size = 2 + 12 * len(tags) + 4
    cmap_off = 8 + ifd_size
    data_off = cmap_off + len(cm_raw)
    out = struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        if val == "data":
            val = struct.pack("<I", data_off)
        elif val == "cmap":
            val = struct.pack("<I", cmap_off)
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0) + cm_raw + idx.tobytes()
    assert np.array_equal(decode_tiff(out), rgb8[idx])


def test_tiff_bomb_cap_unsupported_and_quarantine():
    g = np.zeros((4, 4), dtype=np.uint8)
    good = encode_tiff(g)
    bomb = bytearray(good)
    # ImageWidth/Length are the first two sorted SHORT tags
    w_at = good.index(struct.pack("<HHI", 256, 3, 1))
    bomb[w_at + 8:w_at + 10] = struct.pack("<H", 60000)
    h_at = good.index(struct.pack("<HHI", 257, 3, 1))
    bomb[h_at + 8:h_at + 10] = struct.pack("<H", 60000)
    with pytest.raises(ValueError, match="decode cap"):
        decode_tiff(bytes(bomb))
    # LZW compression refused loudly
    lzw = bytearray(good)
    c_at = good.index(struct.pack("<HHI", 259, 3, 1))
    lzw[c_at + 8:c_at + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(lzw))
    for bad in [b"", b"II", b"II*\x00", good[:30], good[:-3],
                struct.pack("<2sHI", b"II", 41, 8)]:
        with pytest.raises(ValueError):
            decode_tiff(bad)


def test_bmp_tiff_flow_image_pipeline(spark):
    """Both formats ride decode_stats via decode_image's sniff."""
    from loc2vec_spark.operators.images import decode_stats
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    rows = [("bmp0", bytearray(encode_bmp(img))),
            ("tif0", bytearray(encode_tiff(img))),
            ("badb", bytearray(b"BM" + b"\x01" * 20)),
            ("badt", bytearray(b"II*\x00" + b"\x01" * 4))]
    df = spark.createDataFrame(rows, "image_id STRING, bytes BINARY")
    out = {r["image_id"]: r for r in decode_stats(df).collect()}
    for k in ("bmp0", "tif0"):
        assert out[k]["ok"] and out[k]["h"] == 9
        assert out[k]["mean_px"] == pytest.approx(float(img.mean()))
    assert not out["badb"]["ok"] and not out["badt"]["ok"]


def test_bmp_v5_header_palette_offset():
    """BITMAPV5HEADER (124 bytes): the palette sits at 14 + header
    size, not at the V1 offset — a decoder pinning 54 reads garbage."""
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    palraw = b"".join(bytes([b, g, r, 0]) for r, g, b in
                      [(11, 22, 33), (200, 150, 100)])
    hdr_size = 124
    stride = 4
    rows = np.zeros((2, stride), dtype=np.uint8)
    rows[:, :2] = idx[::-1]
    pix_off = 14 + hdr_size + len(palraw)
    hdr = b"BM" + struct.pack("<IHHI", pix_off + rows.size, 0, 0,
                              pix_off)
    dib = struct.pack("<IiiHHIIiiII", hdr_size, 2, 2, 1, 8, 0,
                      rows.size, 0, 0, 2, 0)
    dib += b"\x00" * (hdr_size - 40)  # V5 extension fields, unused
    data = hdr + dib + palraw + rows.tobytes()
    exp = np.array([[11, 22, 33], [200, 150, 100]],
                   dtype=np.uint8)[idx]
    assert np.array_equal(decode_bmp(data), exp)


# ---------------------------------------------------------------------------
# ICO (favicons — composes the BMP/PNG decoders)
# ---------------------------------------------------------------------------

def test_ico_round_trips_and_entry_pick():
    from loc2vec_spark.operators.ico import decode_ico, encode_ico
    rng = np.random.default_rng(21)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    # largest entry wins, for both DIB and PNG payloads
    assert np.array_equal(decode_ico(encode_ico([small, big])), big)
    assert np.array_equal(
        decode_ico(encode_ico([small, big], as_png=True)), big)
    # 256px entries store their dimension as 0 in the directory
    full = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
    assert np.array_equal(decode_ico(encode_ico([full])), full)


def test_ico_and_mask_zeroes_pixels():
    from loc2vec_spark.operators.ico import decode_ico, encode_ico
    rng = np.random.default_rng(22)
    img = rng.integers(1, 256, (16, 16, 3), dtype=np.uint8)
    data = bytearray(encode_ico([img]))
    # the AND mask sits after dir(6+16) + DIB header(40) + XOR rows
    # (16 rows x 48-byte stride); masks are bottom-up, so setting the
    # first mask bit hides the BOTTOM-left pixel
    moff = 6 + 16 + 40 + 16 * 48
    data[moff] = 0x80
    exp = img.copy()
    exp[15, 0] = 0
    assert np.array_equal(decode_ico(bytes(data)), exp)


def test_ico_corrupt_and_router(spark):
    from loc2vec_spark.operators.ico import decode_ico, encode_ico
    from loc2vec_spark.operators.images import decode_stats
    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    good = encode_ico([img])
    for bad in [b"", b"\x00\x00\x03\x00\x01\x00", good[:20],
                good[:6 + 16]]:
        with pytest.raises(ValueError):
            decode_ico(bad)
    rows = [("ico", bytearray(good)),
            ("bad", bytearray(b"\x00\x00\x01\x00\x01\x00" + b"\x00" * 4))]
    df = spark.createDataFrame(rows, "image_id STRING, bytes BINARY")
    out = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert out["ico"]["ok"] and out["ico"]["h"] == 9
    assert not out["bad"]["ok"]


def test_ico_falls_back_past_undecodable_best_entry():
    """The common modern favicon layout: a small DIB plus a larger
    PNG whose color type the PNG decoder does not cover (RGBA). The
    ranking prefers the PNG; decode must fall back to the DIB rather
    than quarantining the file."""
    import struct as _s
    import zlib as _z

    from loc2vec_spark.operators.ico import decode_ico, encode_ico
    rng = np.random.default_rng(24)
    small = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # hand-build a minimal RGBA (color type 6) PNG — decode_png
    # supports types 0/2 only, so this entry raises
    def chunk(tag, payload):
        return (_s.pack(">I", len(payload)) + tag + payload
                + _s.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF))
    ihdr = _s.pack(">IIBBBBB", 32, 32, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(32 * 4) for _ in range(32))
    rgba_png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _z.compress(raw))
                + chunk(b"IEND", b""))
    base = encode_ico([small])
    dib_blob = base[6 + 16:]
    # directory: PNG entry (32px, ranked first) + DIB entry (16px)
    hdr = _s.pack("<HHH", 0, 1, 2)
    off0 = 6 + 32
    e0 = _s.pack("<BBBBHHII", 32, 32, 0, 0, 1, 32, len(rgba_png), off0)
    e1 = _s.pack("<BBBBHHII", 16, 16, 0, 0, 1, 24, len(dib_blob),
                 off0 + len(rgba_png))
    ico = hdr + e0 + e1 + rgba_png + dib_blob
    assert np.array_equal(decode_ico(ico), small)
