"""MP4 / ISO-BMFF operators: writer↔parser round-trip, sample-table
resolution (stsc runs, co64), Motion-JPEG pixel decode through the repo
JPEG codec, codec-stub refusal, the container probe, and MP4 flowing
the whole video pipeline via decode_video's magic sniff."""

import struct

import numpy as np
import pandas as pd
import pytest

from loc2vec_spark.operators import mp4 as M
from loc2vec_spark.operators import video as V


def _frames(n=4, h=24, w=32, seed=7):
    """Smooth gradient frames (JPEG-friendly) with per-frame motion."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((xx * 200) // max(w - 1, 1)).astype(np.uint8)
    fr = np.repeat(base[None], n, axis=0).copy()
    for i in range(n):
        fr[i, 4:12, (2 + 3 * i) % (w - 8):(2 + 3 * i) % (w - 8) + 8] = 240
    return np.clip(fr.astype(np.int16)
                   + rng.integers(-2, 3, fr.shape), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def test_mjpeg_roundtrip():
    fr = _frames(5)
    data = M.encode_mjpeg_mp4(fr, fps=10, quality=92)
    fps, back = M.decode_mp4(data)
    assert fps == 10.0
    assert back.shape == fr.shape
    assert _psnr(back, fr) >= 35.0


def test_parse_metadata_exact():
    fr = _frames(6, h=16, w=20)
    meta = M.parse_mp4(M.encode_mjpeg_mp4(fr, fps=25))
    assert meta["brand"] == "isom"
    (trk,) = meta["tracks"]
    assert (trk["handler"], trk["codec"]) == ("vide", "jpeg")
    assert (trk["w"], trk["h"], trk["n_samples"]) == (20, 16, 6)
    assert trk["fps"] == 25.0
    assert trk["duration_s"] == pytest.approx(6 / 25)
    # demuxed ranges really are complete JFIF images
    off, sz = trk["samples"][3]
    data = M.encode_mjpeg_mp4(fr, fps=25)
    assert data[off:off + 2] == b"\xff\xd8"
    assert data[off + sz - 2:off + sz] == b"\xff\xd9"


def test_co64_offsets_parse():
    fr = _frames(3)
    d32 = M.encode_mjpeg_mp4(fr, fps=8)
    d64 = M.encode_mjpeg_mp4(fr, fps=8, use_co64=True)
    _, b32 = M.decode_mp4(d32)
    _, b64 = M.decode_mp4(d64)
    assert np.array_equal(b32, b64)


def test_compressed_codec_demuxes_but_refuses_pixels():
    fr = _frames(3)
    data = M.encode_mjpeg_mp4(fr, fps=8, codec="avc1")
    trk = M.parse_mp4(data)["tracks"][0]  # demux works regardless
    assert trk["codec"] == "avc1"
    assert trk["n_samples"] == 3
    with pytest.raises(ValueError, match="external decoder"):
        M.decode_mp4(data)


def test_corrupt_containers_raise():
    fr = _frames(2)
    good = M.encode_mjpeg_mp4(fr, fps=8)
    with pytest.raises(ValueError):
        M.parse_mp4(b"\x00\x00\x00\x08free" + good[8:])  # no ftyp
    with pytest.raises(ValueError):
        M.parse_mp4(good[:len(good) // 2])  # truncated moov
    # stsz/stts mismatch: patch the single stts entry's sample count
    idx = good.rindex(b"stts")  # moov trails mdat; rindex dodges any
    # coincidental 'stts' byte run inside the entropy-coded samples
    bad = bytearray(good)
    bad[idx + 12:idx + 16] = struct.pack(">I", 99)
    with pytest.raises(ValueError):
        M.parse_mp4(bytes(bad))
    # sample range beyond EOF: drop trailing mdat bytes, keep moov
    # (writer layout is ftyp+mdat+moov, so cut inside mdat instead:
    # shrink a sample size table entry's source bytes)
    mdat_at = good.index(b"mdat") - 4
    cut = good[:mdat_at + 16] + good[mdat_at + 24:]
    with pytest.raises(ValueError):
        M.parse_mp4(cut)


def test_stts_sample_count_bomb_quarantines():
    """Decode-bomb cap (ADVICE r4): an stts count sum near 2^31 with a
    matching uniform stsz must raise BEFORE materializing the
    n_samples-long size list (~34 GB at the 32-bit limit). n_samples
    beyond len(data) is structurally impossible (every sample occupies
    >=1 byte), so the cap costs no legal file."""
    good = M.encode_mjpeg_mp4(_frames(2), fps=8)
    bad = bytearray(good)
    sidx = good.rindex(b"stts")  # fourcc; count field of entry 0
    bad[sidx + 12:sidx + 16] = struct.pack(">I", 0x7FFFFFFF)
    zidx = good.rindex(b"stsz")  # uniform=1 so the fast path triggers
    bad[zidx + 8:zidx + 12] = struct.pack(">I", 1)
    bad[zidx + 12:zidx + 16] = struct.pack(">I", 0x7FFFFFFF)
    with pytest.raises(ValueError, match="samples in a"):
        M.parse_mp4(bytes(bad))


def test_stsc_first_chunk_bomb_quarantines():
    """stsc run expansion is bounded by validated first_chunk fields
    (ADVICE r4): a raw ~4e9 first_chunk must raise before
    `[spc] * (last - first)` allocates billions of slots."""
    good = M.encode_mjpeg_mp4(_frames(2), fps=8)
    bad = bytearray(good)
    cidx = good.rindex(b"stsc")  # entry 0 first_chunk at fourcc+12
    bad[cidx + 12:cidx + 16] = struct.pack(">I", 0xF0000000)
    with pytest.raises(ValueError, match="first_chunk"):
        M.parse_mp4(bytes(bad))
    # non-increasing (first_chunk=0) rejected explicitly too
    bad[cidx + 12:cidx + 16] = struct.pack(">I", 0)
    with pytest.raises(ValueError, match="first_chunk"):
        M.parse_mp4(bytes(bad))


def test_table_bounded_by_own_box():
    """A declared table that spills past its own box payload must
    quarantine, not silently parse sibling-box bytes as entries
    (ADVICE r4): bump the stsc entry count without growing the box."""
    good = M.encode_mjpeg_mp4(_frames(2), fps=8)
    bad = bytearray(good)
    cidx = good.rindex(b"stsc")  # entry_count at fourcc+8
    bad[cidx + 8:cidx + 12] = struct.pack(">I", 4)
    with pytest.raises(ValueError, match="overruns its box"):
        M.parse_mp4(bytes(bad))


def test_zero_media_bytes_probe_value():
    """All-zero stsz sizes are legal: the probe must report a MEASURED
    0.0 bitrate, not NULL (review r4: falsy-zero check)."""
    fr = _frames(2)
    good = M.encode_mjpeg_mp4(fr, fps=8)
    idx = good.rindex(b"stsz")
    bad = bytearray(good)
    # stsz payload: verflags(4) uniform(4) count(4) then the table —
    # zero the two table entries
    bad[idx + 16:idx + 24] = b"\x00" * 8
    trk = M.parse_mp4(bytes(bad))["tracks"][0]
    assert trk["media_bytes"] == 0 and trk["n_samples"] == 2
    assert trk["duration_s"] > 0


def test_decode_video_sniffs_both_containers():
    fr = _frames(4, h=16, w=16)
    fps_y, y = V.decode_video(V.encode_y4m(fr, fps=5))
    fps_m, m = V.decode_video(M.encode_mjpeg_mp4(fr, fps=5, quality=95))
    assert fps_y == fps_m == 5.0
    assert y.shape == m.shape == fr.shape
    with pytest.raises(ValueError):
        V.decode_video(b"neither container at all....")


def _mp4_df(spark):
    rows = []
    for i in range(8):
        fr = _frames(3 + i % 3, seed=i)
        codec = "avc1" if i % 4 == 3 else "jpeg"
        data = M.encode_mjpeg_mp4(fr, fps=10, codec=codec)
        if i == 5:
            data = data[: len(data) - 40]  # corrupt: truncated moov
        if i == 7:                         # zero-byte samples (legal)
            b = bytearray(data)
            idx = data.rindex(b"stsz")
            b[idx + 16:idx + 16 + 4 * (3 + 7 % 3)] = \
                b"\x00" * (4 * (3 + 7 % 3))
            data = bytes(b)
        rows.append({"video_id": f"mp4_{i:03d}", "bytes": data})
    return spark.createDataFrame(pd.DataFrame(rows))


def test_mp4_probe_routes_by_codec(spark):
    got = {r["video_id"]: r for r in M.mp4_probe(_mp4_df(spark)).collect()}
    assert len(got) == 8
    assert got["mp4_005"]["ok"] is False          # corrupt quarantines
    # zero media bytes is a MEASURED 0.0 bitrate, not NULL (review r4)
    assert got["mp4_007"]["ok"] is True
    assert got["mp4_007"]["bitrate_kbps"] == 0.0
    avc = got["mp4_003"]
    assert avc["ok"] is True and avc["codec"] == "avc1"
    assert avc["decodable"] is False              # routes to transcode
    jpg = got["mp4_000"]
    assert jpg["ok"] is True and jpg["codec"] == "jpeg"
    assert jpg["decodable"] is True
    assert jpg["fps"] == 10.0 and jpg["n_samples"] == 3
    assert jpg["bitrate_kbps"] > 0


def test_video_pipeline_over_mp4(spark):
    """MP4-MJPEG clips flow video_stats / frame_sample end to end;
    avc1 + corrupt rows quarantine instead of aborting."""
    df = _mp4_df(spark)
    stats = {r["video_id"]: r for r in V.video_stats(df).collect()}
    assert stats["mp4_000"]["ok"] is True
    assert stats["mp4_000"]["n_frames"] == 3
    assert stats["mp4_000"]["motion"] > 0          # the square moves
    assert stats["mp4_003"]["ok"] is False         # avc1 -> quarantine
    assert stats["mp4_005"]["ok"] is False         # corrupt -> quarantine
    frames = V.frame_sample(df, every_s=0.1, max_frames=2).collect()
    ids = {r["video_id"] for r in frames}
    assert "mp4_000" in ids and "mp4_003" not in ids
    from loc2vec_spark.png_codec import decode_png
    any_frame = next(r for r in frames if r["video_id"] == "mp4_000")
    assert decode_png(bytes(any_frame["bytes"])).shape == (24, 32)
