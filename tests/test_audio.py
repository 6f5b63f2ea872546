"""Audio binary-column operators: WAV codec round-trip, distributed
stats/features vs a local numpy oracle, quarantine-on-corrupt."""

import numpy as np
import pytest

from loc2vec_spark.operators import audio as A
from loc2vec_spark.operators import images as img_ops


@pytest.fixture(scope="module")
def audio_df(spark):
    return spark.createDataFrame(A.synth_audio_pdf(40)).cache()


def test_wav_roundtrip_bit_exact():
    rng = np.random.default_rng(2)
    x = (rng.uniform(-1, 1, 4000) * 32767).astype(np.int16)
    rate, back = A.decode_wav(A.encode_wav(x, rate=16_000))
    assert rate == 16_000
    assert np.array_equal((back * 32768.0).astype(np.int16), x)


def test_audio_stats_match_local_decode(spark, audio_df):
    got = {r["audio_id"]: r for r in A.audio_stats(audio_df).collect()}
    pdf = A.synth_audio_pdf(40)
    n_bad = 0
    for row in pdf.itertuples():
        g = got[row.audio_id]
        try:
            rate, x = A.decode_wav(bytes(row.bytes))
        except Exception:
            assert g["ok"] is False  # quarantined, not dropped
            n_bad += 1
            continue
        assert g["ok"] and g["rate"] == rate and g["n_samples"] == len(x)
        assert g["rms"] == pytest.approx(float(np.sqrt(np.mean(x * x))),
                                         abs=1e-6)
    assert n_bad >= 1  # the fixture really contains corrupt clips
    assert len(got) == 40


def test_audio_features_fixed_dim_deterministic(spark, audio_df):
    out1 = {r["audio_id"]: r["embedding"]
            for r in A.audio_features(audio_df).collect()}
    out2 = {r["audio_id"]: r["embedding"]
            for r in A.audio_features(audio_df).collect()}
    assert out1 == out2
    assert all(len(v) == A.FEATURE_DIM for v in out1.values())
    # corrupt clips are absent (quarantined), good ones all present
    assert len(out1) == 40 - 3


def test_decode_av_dispatches_audio(spark, audio_df):
    out = img_ops.decode_av(audio_df, kind="audio")
    assert out.filter("ok").count() == 40 - 3


def test_different_tones_get_different_spectra(spark):
    pdf = A.synth_audio_pdf(13)  # 13 clips -> 12 distinct tone freqs
    df = spark.createDataFrame(pdf)
    embs = {r["audio_id"]: np.array(r["embedding"][:12])
            for r in A.audio_features(df).collect()}
    a = embs["aud_00000"]  # 110 Hz
    b = embs["aud_00005"]  # 660 Hz
    assert int(np.argmax(a)) != int(np.argmax(b))


def test_zero_rate_wav_rejected_at_decode():
    """stdlib wave accepts a 0 fmt-chunk sample rate; it must raise at
    the decode boundary, not ZeroDivisionError in audio_features
    (review finding r2)."""
    import struct

    good = A.encode_wav(np.zeros(16, dtype=np.int16), rate=8000)
    i = good.index(struct.pack("<I", 8000))
    bad = good[:i] + struct.pack("<I", 0) + good[i + 4:]
    with pytest.raises(ValueError):
        A.decode_wav(bad)


def _riff_wav(fmt_tag, ch, rate, bits, payload):
    import struct
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                      rate * ch * bits // 8, ch * bits // 8, bits)
    chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_g711_known_vectors():
    """ITU-T G.711 spot values: mu-law 0xFF/0x7F decode to +-0; the
    A-law sign convention is INVERTED relative to mu-law (after the
    0x55 XOR a SET sign bit is POSITIVE — the reference alaw2linear),
    so 0xD5 is the +8 quantization floor and 0x55 the -8 one; both
    code spaces cover a symmetric [-1, 1) range."""
    from loc2vec_spark.operators.audio import _g711_alaw, _g711_ulaw
    assert _g711_ulaw(np.array([0xFF], np.uint8))[0] == 0.0
    assert _g711_ulaw(np.array([0x7F], np.uint8))[0] == 0.0
    assert _g711_alaw(np.array([0xD5], np.uint8))[0] == 8 / 32768.0
    assert _g711_alaw(np.array([0x55], np.uint8))[0] == -8 / 32768.0

    # ALL 256 codes vs straight-line transcriptions of the canonical
    # alaw2linear/ulaw2linear reference (the review-r5 sign inversion
    # passed the old spot checks because the test encoded the same
    # wrong convention — an independent full-table oracle cannot)
    def ref_alaw(c):
        a = c ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    def ref_ulaw(c):
        u = ~c & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        _g711_alaw(codes) * 32768.0,
        np.array([ref_alaw(int(c)) for c in codes], dtype=np.float64))
    assert np.array_equal(
        _g711_ulaw(codes) * 32768.0,
        np.array([ref_ulaw(int(c)) for c in codes], dtype=np.float64))
    full = np.arange(256, dtype=np.uint8)
    for dec in (_g711_ulaw, _g711_alaw):
        x = dec(full)
        assert -1.0 < x.min() < -0.9 and 0.9 < x.max() < 1.0
        # flipping the (encoded) sign bit exactly negates the sample
        assert np.array_equal(dec(full ^ 0x80), -x)


def test_wav_g711_and_float_fallback_paths():
    """Formats stdlib wave refuses ride the bounded RIFF fallback."""
    from loc2vec_spark.operators.audio import decode_wav
    pay = bytes(range(256))
    r, x = decode_wav(_riff_wav(7, 1, 8000, 8, pay))     # mu-law
    assert (r, len(x)) == (8000, 256) and abs(x).max() < 1.0
    r, x = decode_wav(_riff_wav(6, 1, 8000, 8, pay))     # A-law
    assert (r, len(x)) == (8000, 256)
    f32 = np.linspace(-1, 1, 100, dtype=np.float32).tobytes()
    r, x = decode_wav(_riff_wav(3, 2, 16000, 32, f32))   # float stereo
    assert (r, len(x)) == (16000, 50)                    # downmixed
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(_riff_wav(2, 1, 8000, 4, b"\x00" * 8))  # ADPCM
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + b"\x00" * 40)
    # corrupt declared chunk size: bounded, quarantines cleanly
    import struct as _s
    good = _riff_wav(7, 1, 8000, 8, pay)
    bad = good[:16] + _s.pack("<I", 1 << 30) + good[20:]
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_wav_24_and_32_bit_pcm():
    import io
    import wave as _w

    from loc2vec_spark.operators.audio import decode_wav
    buf = io.BytesIO()
    with _w.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(44100)
        vals = [0, 1 << 22, -(1 << 22), (1 << 23) - 1]
        w.writeframes(b"".join(
            int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals))
    r, x = decode_wav(buf.getvalue())
    assert r == 44100
    assert np.allclose(x, [0.0, 0.5, -0.5, (2**23 - 1) / 2**23])
    buf = io.BytesIO()
    with _w.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(np.array([0, 1 << 30, -(1 << 30)],
                               dtype="<i4").tobytes())
    r, x = decode_wav(buf.getvalue())
    assert np.allclose(x, [0.0, 0.5, -0.5])
