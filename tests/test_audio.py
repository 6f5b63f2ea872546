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
