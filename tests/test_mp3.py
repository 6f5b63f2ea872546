"""MP3 frame-walk probe: exact frame counts / duration / bitrate from
synthetic CBR + VBR streams, ID3 tag handling, Xing cross-check, the
decode stub contract, and quarantine-on-corrupt through mp3_probe."""

import pandas as pd
import pytest

from loc2vec_spark.operators import mp3 as M


def test_cbr_walk_exact():
    data = M.synth_mp3_bytes(10, bitrate_kbps=128, rate=44100)
    m = M.parse_mp3(data)
    assert (m["version"], m["layer"], m["rate"]) == (1, 3, 44100)
    assert m["n_frames"] == 10 and m["vbr"] is False
    assert m["duration_s"] == pytest.approx(10 * 1152 / 44100)
    # CBR: mean bitrate recovers the header rate (padding-free frames:
    # 144*128000/44100 = 417.9 -> floor 417 bytes, so within ~1%)
    assert m["bitrate_kbps"] == pytest.approx(128.0, rel=0.01)
    assert m["channels"] == 2


def test_vbr_classified_and_averaged():
    pattern = (64, 128, 192, 128, 64, 256)
    m = M.parse_mp3(M.synth_mp3_bytes(vbr_pattern=pattern))
    assert m["vbr"] is True
    assert m["n_frames"] == len(pattern)
    lo, hi = min(pattern), max(pattern)
    assert lo < m["bitrate_kbps"] < hi


def test_mpeg2_mono_frame_geometry():
    m = M.parse_mp3(M.synth_mp3_bytes(4, bitrate_kbps=64, rate=16000,
                                      version=2, channels=1))
    assert (m["version"], m["channels"], m["rate"]) == (2, 1, 16000)
    # MPEG-2 Layer III: 576 samples/frame
    assert m["duration_s"] == pytest.approx(4 * 576 / 16000)


def test_id3v2_skip_and_xing():
    data = M.synth_mp3_bytes(8, id3v2=True, xing=True)
    m = M.parse_mp3(data)
    assert m["n_frames"] == 8
    assert m["vbr"] is True                      # Xing tag => VBR intent
    # duration excludes the tag frame
    assert m["duration_s"] == pytest.approx(7 * 1152 / 44100)
    # ...and so do the bitrate numerator's bytes (review r4: including
    # the tag frame's bytes overstated mean bitrate by n/(n-1) = 145.95)
    assert m["bitrate_kbps"] == pytest.approx(128.0, rel=0.01)
    # a LYING Xing count must fail the cross-check, not be trusted
    idx = data.index(b"Xing")
    bad = data[:idx + 8] + (42).to_bytes(4, "big") + data[idx + 12:]
    with pytest.raises(ValueError):
        M.parse_mp3(bad)


def test_corrupt_streams_raise():
    good = M.synth_mp3_bytes(5)
    with pytest.raises(ValueError):
        M.parse_mp3(good[:-10])                  # truncated final frame
    with pytest.raises(ValueError):
        M.parse_mp3(b"\x00\x01" + good)          # no sync at start
    with pytest.raises(ValueError):
        M.parse_mp3(good + b"\xffgarbage")       # desync after stream
    with pytest.raises(ValueError):
        M.parse_mp3(b"")


def test_decode_stub_refuses():
    with pytest.raises(ValueError, match="external codec"):
        M.decode_mp3_samples(M.synth_mp3_bytes(2))


def test_mp3_probe_distributed(spark):
    rows = []
    for i in range(9):
        data = M.synth_mp3_bytes(4 + i, bitrate_kbps=128,
                                 xing=(i % 3 == 1))
        if i == 6:
            data = data[:-7]                     # corrupt row
        rows.append({"audio_id": f"mp3_{i:03d}", "bytes": data})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["audio_id"]: r for r in M.mp3_probe(df).collect()}
    assert len(got) == 9
    assert got["mp3_006"]["ok"] is False         # quarantined
    ok0 = got["mp3_000"]
    assert ok0["ok"] is True and ok0["n_frames"] == 4
    assert ok0["rate"] == 44100 and ok0["vbr"] is False
    assert got["mp3_001"]["vbr"] is True         # Xing-tagged
    assert got["mp3_001"]["n_frames"] == 5
