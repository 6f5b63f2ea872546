"""GIF codec: LZW round-trips (width growth, table resets, deferred
clears), interlace, palette edge cases, frame composition (disposal +
transparency), the video face's luma/fps contract, decode-bomb caps,
and quarantine-on-corrupt through the image/video pipeline routers."""

import struct

import numpy as np
import pytest

from loc2vec_spark.operators.gif import (_lzw_decode, _lzw_encode,
                                         decode_gif, encode_gif,
                                         gif_frames)

_LUMA = np.array([0.299, 0.587, 0.114])


def _pal(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, 3), dtype=np.uint8)


def test_static_round_trip():
    rng = np.random.default_rng(42)
    img = _pal(7)[rng.integers(0, 7, (37, 53))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_interlaced_round_trip():
    rng = np.random.default_rng(1)
    img = _pal(5)[rng.integers(0, 5, (29, 31))]
    data = encode_gif(img, interlace=True)
    assert np.array_equal(decode_gif(data), img)
    # interlace really changes the stream (flag + row order)
    assert data != encode_gif(img)


def test_grayscale_input_expands():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 100, (16, 16), dtype=np.uint8)
    out = decode_gif(encode_gif(g))
    assert np.array_equal(out, np.repeat(g[..., None], 3, axis=2))


def test_full_256_color_palette():
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256]
                    for i in range(256)], dtype=np.uint8)
    rng = np.random.default_rng(3)
    img = pal[rng.integers(0, 256, (64, 64))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_over_256_colors_refused():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(img)


def test_lzw_table_reset_round_trip():
    """A 256-color noise frame forces the 4096-entry table to fill and
    the encoder to emit mid-stream clear codes; the decoder must
    resynchronize width + table at each."""
    pal = np.array([[i, i, i] for i in range(256)], dtype=np.uint8)
    rng = np.random.default_rng(5)
    img = pal[rng.integers(0, 256, (256, 256))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_lzw_primitive_contracts():
    rng = np.random.default_rng(6)
    raw = bytes(rng.integers(0, 4, 5000, dtype=np.uint8))
    enc = _lzw_encode(raw, 2)
    assert _lzw_decode(enc, 2, len(raw)) == raw
    # truncated stream: fewer pixels than declared -> error
    with pytest.raises(ValueError, match="truncated|ended"):
        _lzw_decode(enc[: len(enc) // 2], 2, len(raw))
    # over-long declaration -> error, not a bigger buffer
    with pytest.raises(ValueError):
        _lzw_decode(enc, 2, len(raw) + 100)
    with pytest.raises(ValueError, match="min code size"):
        _lzw_decode(enc, 1, 10)


def test_animation_composition_and_fps():
    rng = np.random.default_rng(7)
    frames = _pal(6)[rng.integers(0, 6, (5, 21, 33))]
    fps, luma = gif_frames(encode_gif(frames, delay_cs=5))
    assert fps == pytest.approx(20.0)
    exp = np.clip(np.rint(frames.astype(np.float64) @ _LUMA),
                  0, 255).astype(np.uint8)
    assert luma.shape == (5, 21, 33)
    assert np.array_equal(luma, exp)


def test_zero_delay_defaults_to_10fps():
    img = _pal(3)[np.zeros((4, 4), dtype=np.int64)]
    fps, luma = gif_frames(encode_gif(img, delay_cs=0))
    assert fps == pytest.approx(10.0)
    assert luma.shape[0] == 1


def _tiny_gif(disposal=0, transparent=None, second_rect=(0, 0, 2, 2)):
    """Hand-built 2-frame 2x2 GIF: frame 1 all-index-1, frame 2 a
    sub-rect of index 0 with the given GCE settings on frame 2."""
    pal = b"\x00\x00\x00" + b"\xff\x00\x00" + b"\x00\xff\x00" \
        + b"\x00\x00\xff"
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 2, 0)  # GCT, 4 colors,
    out += pal                                       # bg index 2
    for k, (ix, iy, iw, ih) in enumerate([(0, 0, 2, 2), second_rect]):
        flags = 0
        tr = 0
        if k == 1:
            flags = (disposal << 2)
            if transparent is not None:
                flags |= 1
                tr = transparent
        out += b"\x21\xf9\x04" + bytes([flags]) + b"\x0a\x00" \
            + bytes([tr]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", ix, iy, iw, ih, 0)
        idx = bytes([1] * 4 if k == 0 else [0] * (iw * ih))
        lzw = _lzw_encode(idx, 2)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_disposal_restore_background():
    # disposal applies AFTER its frame is composed: frame 1 all red
    # (idx 1), frame 2 paints idx 0 (black) — both frames intact even
    # with the restore-background flag set on frame 2's GCE
    _, luma = gif_frames(_tiny_gif(disposal=2))
    assert luma.shape[0] == 2
    assert luma[0].max() == int(np.rint(0.299 * 255))
    assert luma[1].max() == 0


def test_transparency_preserves_underlying():
    """Frame 2 is all transparent-index pixels -> composed frame 2
    equals frame 1 (red), not black."""
    data = _tiny_gif(transparent=0)
    first = decode_gif(data)
    assert np.array_equal(first, np.tile([255, 0, 0], (2, 2, 1)))
    _, luma = gif_frames(data)
    assert np.array_equal(luma[1], luma[0])


def test_frame_rect_composition():
    """Frame 2 covers only the top-left pixel; the rest stays red."""
    _, luma = gif_frames(_tiny_gif(second_rect=(0, 0, 1, 1)))
    red = int(np.rint(0.299 * 255))
    assert luma[1][0, 0] == 0
    assert luma[1][0, 1] == red and luma[1][1, 1] == red


def test_decode_bomb_caps():
    # canvas dimensions validated before any allocation
    bomb = bytearray(encode_gif(np.zeros((4, 4), dtype=np.uint8)))
    bomb[6:10] = struct.pack("<HH", 60000, 60000)
    with pytest.raises(ValueError, match="decode cap"):
        decode_gif(bytes(bomb))


def test_long_animation_static_face_still_decodes():
    """The composed-stream cap guards gif_frames' materialized stack;
    decode_gif stops at frame 1, so an animation whose FULL
    composition would exceed the cap still serves its first frame
    (review r5: a valid web 'GIF video' must not quarantine from the
    image pipeline)."""
    from loc2vec_spark.operators import gif as G
    frames = np.zeros((4, 8, 8), dtype=np.uint8)
    data = encode_gif(frames, delay_cs=2)
    old = G._png.MAX_PIXELS
    G._png.MAX_PIXELS = 8 * 8 * 2  # full stack (4 frames) over cap
    try:
        assert decode_gif(data).shape == (8, 8, 3)
        with pytest.raises(ValueError, match="decode cap"):
            G.gif_frames(data)
    finally:
        G._png.MAX_PIXELS = old


def test_corrupt_inputs_quarantine():
    good = encode_gif(np.full((6, 6), 3, dtype=np.uint8))
    bad_cases = [
        b"",
        b"GIF8",
        b"JIF89a" + good[6:],          # bad signature
        good[:10],                      # truncated descriptor
        good[:20],                      # mid-palette cut
    ]
    for bad in bad_cases:
        with pytest.raises(ValueError):
            decode_gif(bad)
    # a missing trailer truncates the FULL walk (animation face)...
    with pytest.raises(ValueError):
        gif_frames(good[:-1])
    # ...but the static face stops at frame 1 and never needs the
    # bytes past it (review r5: first-frame decode is per-frame work)
    assert decode_gif(good[:-1]).shape == (6, 6, 3)
    # frame rect outside canvas
    img = encode_gif(np.zeros((4, 4), dtype=np.uint8))
    pos = img.index(b"\x2c")
    broken = bytearray(img)
    broken[pos + 1:pos + 3] = struct.pack("<H", 3)  # left=3, w=4 > 4
    with pytest.raises(ValueError, match="outside"):
        decode_gif(bytes(broken))


def test_gif_flows_image_pipeline(spark):
    """GIF tiles ride decode_stats unchanged via the magic sniff."""
    from loc2vec_spark.operators.images import decode_stats
    rng = np.random.default_rng(8)
    img = _pal(9)[rng.integers(0, 9, (12, 12))]
    rows = [("g0", bytearray(encode_gif(img))),
            ("bad", bytearray(b"GIF89a" + b"\x00" * 5))]
    df = spark.createDataFrame(rows, "image_id STRING, bytes BINARY")
    out = {r["image_id"]: r for r in decode_stats(df).collect()}
    assert out["g0"]["ok"] and out["g0"]["h"] == 12
    assert out["g0"]["mean_px"] == pytest.approx(float(img.mean()))
    assert not out["bad"]["ok"]


def test_animated_gif_flows_video_pipeline(spark):
    """Animated GIFs ride video_stats via decode_video's sniff."""
    from loc2vec_spark.operators.video import video_stats
    rng = np.random.default_rng(9)
    frames = _pal(5)[rng.integers(0, 5, (6, 10, 14))]
    rows = [("v0", bytearray(encode_gif(frames, delay_cs=4)))]
    df = spark.createDataFrame(rows, "video_id STRING, bytes BINARY")
    r = video_stats(df).collect()[0]
    assert r["ok"] and r["n_frames"] == 6
    assert (r["h"], r["w"]) == (10, 14)
    assert r["fps"] == pytest.approx(25.0)


def _gif3(disposal2=3):
    """Hand-built 3-frame 2x2 GIF: frame 1 red (idx 1), frame 2 green
    (idx 2) with disposal ``disposal2``, frame 3 all-transparent.
    With disposal 3 (restore previous) the composed frame 3 must show
    frame 1's canvas again; with disposal 0 it shows frame 2's."""
    pal = (b"\x00\x00\x00" b"\xff\x00\x00" b"\x00\xff\x00"
           b"\x00\x00\xff")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)
    out += pal
    specs = [(1, 0, None), (2, disposal2, None), (0, 0, 0)]
    for idx_val, disp, transparent in specs:
        flags = disp << 2
        tr = 0
        if transparent is not None:
            flags |= 1
            tr = transparent
        out += b"\x21\xf9\x04" + bytes([flags]) + b"\x0a\x00" \
            + bytes([tr]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
        lzw = _lzw_encode(bytes([idx_val] * 4), 2)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_disposal_restore_previous():
    _, luma = gif_frames(_gif3(disposal2=3))
    red = int(np.rint(0.299 * 255))
    green = int(np.rint(0.587 * 255))
    assert luma[0].max() == red and luma[0].min() == red
    assert luma[1].max() == green
    # frame 3 painted nothing (all transparent) over the RESTORED
    # frame-1 canvas
    assert np.array_equal(luma[2], luma[0])
    # control: without restore-previous, frame 3 shows frame 2
    _, luma0 = gif_frames(_gif3(disposal2=0))
    assert np.array_equal(luma0[2], luma0[1])


def test_local_color_table_overrides_global():
    """Frame 2 carries its own LCT where index 1 is blue, not red."""
    gct = (b"\x00\x00\x00" b"\xff\x00\x00" b"\x00\xff\x00"
           b"\x00\x00\xff")
    lct = (b"\x00\x00\x00" b"\x00\x00\xff" b"\x00\xff\x00"
           b"\xff\x00\x00")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0) + gct
    for k in range(2):
        ipacked = 0x81 if k == 1 else 0  # frame 2: LCT, 4 colors
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, ipacked)
        if k == 1:
            out += lct
        lzw = _lzw_encode(bytes([1] * 4), 2)
        out += bytes([2, len(lzw)]) + lzw + b"\x00"
    out += b"\x3b"
    fps, luma = gif_frames(bytes(out))
    red = int(np.rint(0.299 * 255))
    blue = int(np.rint(0.114 * 255))
    assert luma[0].max() == red
    assert luma[1].max() == blue
