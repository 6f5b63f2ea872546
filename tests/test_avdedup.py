"""AV near-dup operators: construction guarantees (SECDED distance,
aligned-frame margins), video pair detection through the real decode
chain (including a cross-container Y4M-vs-MP4 re-encode match), audio
constellation fingerprints and pair detection, corrupt-payload skip."""

import numpy as np
import pandas as pd
import pytest

from loc2vec_spark.operators import avdedup as AV


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (1 << 64) - 1).count("1")


def test_secded_min_distance():
    vals = [AV._secded16(v) for v in range(0, 2039, 37)] \
        + [AV._secded16(v) for v in range(64)]
    for i, a in enumerate(vals):
        for b in vals[i + 1:]:
            if a != b:
                assert bin(a ^ b).count("1") >= 4


def test_frame_code_margins():
    # within group, aligned frames: exactly 2 bits apart
    for g in (0, 7, 123, 498):
        for f in range(4):
            codes = [AV.neardup_frame_code(g * 4 + m, f) for m in range(4)]
            for i in range(4):
                for j in range(i + 1, 4):
                    assert _hamming(codes[i], codes[j]) == 2
    # across groups, aligned frames: >= 14 bits apart (SECDED 4x4 - 2)
    rng = np.random.default_rng(5)
    gs = rng.integers(0, 500, 40)
    for f in range(4):
        codes = [AV.neardup_frame_code(int(g) * 4 + int(g) % 4, f)
                 for g in gs]
        for i, a in enumerate(codes):
            for j in range(i + 1, len(codes)):
                if gs[i] != gs[j]:
                    assert _hamming(a, codes[j]) >= 14


def test_video_pairs_end_to_end(spark):
    from loc2vec_spark.operators.video import encode_y4m
    rows = [(str(v), AV.neardup_video_bytes(v)) for v in range(8)]
    # an unrelated clip (random blocks) and a corrupt payload
    rng = np.random.default_rng(9)
    noise = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 8, 8), dtype=np.uint8), 4, 1), 4, 2)
    rows.append(("noise", encode_y4m(noise, fps=1)))
    rows.append(("corrupt", b"YUV4MPEG2 garbage"))
    clips = spark.createDataFrame(
        pd.DataFrame(rows, columns=["video_id", "bytes"]))
    got = AV.dedup_video_pairs(clips).toPandas()
    pairs = {tuple(sorted((r.vid_a, r.vid_b))) for r in got.itertuples()}
    want = {tuple(sorted((str(a), str(b))))
            for g in (0, 1) for a in range(g * 4, g * 4 + 4)
            for b in range(g * 4, g * 4 + 4) if a < b}
    assert pairs == want
    assert (got["matched_frames"] == 4).all()


def test_video_reencode_cross_container_match(spark):
    """The operator's real job: a lossy MP4 re-encode of a Y4M clip is
    detected as a near-dup of the original through two different
    container decode paths."""
    from loc2vec_spark.operators.mp4 import encode_mjpeg_mp4
    from loc2vec_spark.operators.video import decode_y4m
    src = AV.neardup_video_bytes(40)
    _, frames = decode_y4m(src)
    clips = spark.createDataFrame(pd.DataFrame(
        [("orig", src),
         ("reenc", encode_mjpeg_mp4(frames, fps=1, quality=90))],
        columns=["video_id", "bytes"]))
    got = AV.dedup_video_pairs(clips, min_frames=3).toPandas()
    assert len(got) == 1
    assert got["matched_frames"][0] >= 3


def test_audio_fingerprints_match_planted_bins(spark):
    clips = spark.createDataFrame(pd.DataFrame(
        [(str(v), AV.neardup_audio_bytes(v)) for v in (0, 5, 11)],
        columns=["audio_id", "bytes"]))
    fp = AV.audio_fingerprints(clips).toPandas()
    # 7 frames, fanout 2 -> 11 landmarks per clip
    assert (fp.groupby("audio_id").size() == 11).all()
    # decode landmark of clip 0 at t=0, dt=1 against planted bins
    lh = fp[(fp.audio_id == "0") & (fp.t == 0)]["lh"].min()
    b1, b2, dt = lh // 3 // 257, (lh // 3) % 257, lh % 3  # bases: fanout+1=3, rfft bins=257
    assert dt in (1, 2)
    assert b1 == AV.neardup_audio_bin(0, 0)
    assert b2 == AV.neardup_audio_bin(0, dt)


def test_audio_pairs_end_to_end(spark):
    from loc2vec_spark.operators.audio import encode_wav
    rows = [(str(v), AV.neardup_audio_bytes(v)) for v in range(8)]
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal(AV.AUDIO_FRAME * AV.AUDIO_NFRAMES)
             * 3000).astype(np.int16)
    rows.append(("noise", encode_wav(noise, rate=AV.AUDIO_RATE)))
    rows.append(("corrupt", b"RIFFgarbage"))
    clips = spark.createDataFrame(
        pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    got = AV.dedup_audio_pairs(clips).toPandas()
    pairs = {tuple(sorted((r.aid_a, r.aid_b))) for r in got.itertuples()}
    want = {tuple(sorted((str(a), str(b))))
            for g in (0, 1) for a in range(g * 4, g * 4 + 4)
            for b in range(g * 4, g * 4 + 4) if a < b}
    assert pairs == want
    assert (got["n_matches"] == 11).all()


def test_audio_level_jitter_still_matches(spark):
    """A re-levelled copy (x0.5 gain) of a clip still matches — the
    constellation is amplitude-invariant."""
    from loc2vec_spark.operators.audio import decode_wav, encode_wav
    src = AV.neardup_audio_bytes(100)
    _, x = decode_wav(src)
    quiet = encode_wav((x * 0.5 * 32767.0).astype(np.int16),
                       rate=AV.AUDIO_RATE)
    clips = spark.createDataFrame(pd.DataFrame(
        [("orig", src), ("quiet", quiet)],
        columns=["audio_id", "bytes"]))
    got = AV.dedup_audio_pairs(clips).toPandas()
    assert len(got) == 1 and got["n_matches"][0] == 11


def test_caller_owned_fingerprints_lifecycle(spark):
    """``sequences=`` / ``fingerprints=`` move cache ownership to the
    caller: the operator uses the provided frame as-is (no internal
    cache entry is created), results are identical, and the caller can
    unpersist deterministically (review r5)."""
    vrows = [(str(v), AV.neardup_video_bytes(v)) for v in range(4)]
    clips = spark.createDataFrame(
        pd.DataFrame(vrows, columns=["video_id", "bytes"]))
    seq = AV.video_phash_sequences(clips).persist()
    try:
        owned = AV.dedup_video_pairs(sequences=seq).toPandas()
        internal = AV.dedup_video_pairs(clips).toPandas()
        key = ["vid_a", "vid_b"]
        assert sorted(map(tuple, owned[key].values.tolist())) == \
            sorted(map(tuple, internal[key].values.tolist()))
    finally:
        seq.unpersist()

    arows = [(str(v), AV.neardup_audio_bytes(v)) for v in range(4)]
    aclips = spark.createDataFrame(
        pd.DataFrame(arows, columns=["audio_id", "bytes"]))
    fp = AV.audio_fingerprints(aclips).persist()
    try:
        owned = AV.dedup_audio_pairs(fingerprints=fp).toPandas()
        assert len(owned) == 6  # C(4,2) within the planted group
    finally:
        fp.unpersist()


def test_video_gif_cross_container_match(spark):
    """An animated-GIF re-encode of a Y4M clip near-dups with the
    original through decode_video's GIF route — the third container
    the aligned-frame pipeline covers (Y4M, MP4/MJPEG, GIF)."""
    from loc2vec_spark.operators.gif import encode_gif
    from loc2vec_spark.operators.video import decode_y4m
    src = AV.neardup_video_bytes(41)
    _, frames = decode_y4m(src)
    # GIF is lossless on 8-bit luma: gray frames round-trip exactly,
    # so the aligned hashes match frame for frame
    clips = spark.createDataFrame(pd.DataFrame(
        [("orig", src),
         ("gif", encode_gif(frames, delay_cs=100))],  # 1 fps
        columns=["video_id", "bytes"]))
    got = AV.dedup_video_pairs(clips, min_frames=3).toPandas()
    assert len(got) == 1
    assert got["matched_frames"][0] >= 3
