"""ADTS/AAC frame-walk probe: exact counts/duration/bitrate from
synthetic streams, header-field geometry, decode-stub contract, and
quarantine-on-corrupt through aac_probe."""

import pandas as pd
import pytest

from loc2vec_spark.operators import aac as A


def test_adts_walk_exact():
    m = A.parse_adts(A.synth_adts_bytes(10, rate=44100, channels=2,
                                        payload_len=300))
    assert (m["profile"], m["rate"], m["channels"]) == ("LC", 44100, 2)
    assert m["n_frames"] == 10
    assert m["duration_s"] == pytest.approx(10 * 1024 / 44100)
    # 10 frames x 307 bytes over 10240 samples
    assert m["bitrate_kbps"] == pytest.approx(
        10 * 307 * 8 / (10 * 1024 / 44100) / 1000, rel=1e-6)


def test_adts_variants():
    m = A.parse_adts(A.synth_adts_bytes(4, rate=16000, channels=1,
                                        profile=0, crc=True))
    assert (m["profile"], m["channels"]) == ("Main", 1)
    # multi-block frames count every raw data block's 1024 samples
    m2 = A.parse_adts(A.synth_adts_bytes(4, blocks=2))
    assert m2["duration_s"] == pytest.approx(4 * 2 * 1024 / 44100)


def test_adts_corrupt_raises():
    good = A.synth_adts_bytes(5)
    for bad in (good[:-9], b"\x00\x01" + good, good + b"\xff\xf1junk",
                b""):
        with pytest.raises(ValueError):
            A.parse_adts(bad)
    # PCE channel config 0 refused, not misreported
    pce = bytearray(A.synth_adts_bytes(1))
    pce[2] &= 0xFE
    pce[3] &= 0x3F
    with pytest.raises(ValueError, match="PCE"):
        A.parse_adts(bytes(pce))


def test_decode_stub_refuses():
    with pytest.raises(ValueError, match="external codec"):
        A.decode_aac_samples(A.synth_adts_bytes(2))


def test_aac_probe_distributed(spark):
    rows = []
    for i in range(6):
        data = A.synth_adts_bytes(3 + i, rate=(44100 if i % 2 else 48000))
        if i == 4:
            data = data[:-5]
        rows.append({"audio_id": f"aac_{i:03d}", "bytes": data})
    df = spark.createDataFrame(pd.DataFrame(rows))
    got = {r["audio_id"]: r for r in A.aac_probe(df).collect()}
    assert len(got) == 6
    assert got["aac_004"]["ok"] is False
    ok = got["aac_001"]
    assert ok["ok"] is True and ok["rate"] == 44100
    assert ok["n_frames"] == 4 and ok["profile"] == "LC"


def test_adts_channel_config_7_is_eight_channels():
    """13818-7: channel configuration 7 = the 7.1 layout = 8 channels
    (1-6 map 1:1; only 7 differs — review r4)."""
    m = A.parse_adts(A.synth_adts_bytes(2, channels=7))
    assert m["channels"] == 8


def test_adts_id3_tags_skipped():
    """HLS .aac segments lead with ID3v2 timed-metadata; files may end
    with ID3v1 — both must skip, as in the MP3 walker (review r4)."""
    body = A.synth_adts_bytes(4)
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 30]) + b"\x00" * 30
    m = A.parse_adts(id3v2 + body + b"TAG" + b"\x00" * 125)
    assert m["n_frames"] == 4


def test_adts_midstream_profile_change_quarantines():
    spliced = (A.synth_adts_bytes(2, profile=1)
               + A.synth_adts_bytes(2, profile=0))
    with pytest.raises(ValueError, match="changed mid-stream"):
        A.parse_adts(spliced)
