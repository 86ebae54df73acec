"""Dependency-free image codecs (pipeline/imaging.py) + their wiring
into the multimodal operators: real decode → features/resize for
netpbm/BMP, stub fallback elsewhere."""

import numpy as np
import pytest

from materialize_spark.pipeline.imaging import (
    decode_bmp, decode_image, decode_ppm, encode_bmp, encode_ppm,
    image_features, resize_nearest,
)


def _img(h=6, w=8, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_round_trip():
    arr = _img()
    assert np.array_equal(decode_ppm(encode_ppm(arr)), arr)


def test_ppm_header_comment_and_pgm():
    arr = _img(2, 2)
    raw = encode_ppm(arr)
    commented = b"P6\n# a comment\n2 2\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), arr)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3)
    pgm = b"P5\n3 2\n255\n" + gray.tobytes()
    out = decode_ppm(pgm)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[:, :, 0], gray)
    assert np.array_equal(out[:, :, 1], gray)


def test_bmp_round_trip_includes_row_padding():
    # width 3 → 9-byte rows padded to 12: exercises the stride logic
    arr = _img(4, 3, seed=7)
    assert np.array_equal(decode_bmp(encode_bmp(arr)), arr)


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX123456")


def test_resize_nearest_shapes_and_identity():
    arr = _img(8, 8)
    assert resize_nearest(arr, 4, 2).shape == (2, 4, 3)
    assert np.array_equal(resize_nearest(arr, 8, 8), arr)
    up = resize_nearest(arr, 16, 16)
    assert np.array_equal(up[::2, ::2], arr)  # NN upsample replicates


def test_image_features_values():
    arr = np.zeros((4, 4, 3), np.uint8)
    arr[:, :, 0] = 255  # pure red
    f = image_features(arr)
    assert f[0] == 4.0 and f[1] == 4.0
    assert f[2] == 255.0 and f[3] == 0.0 and f[4] == 0.0
    assert f[6] == 0.0  # constant image: no edges
    assert f[7] == 0.0  # gray = 85 > 32: no dark pixels


def test_extract_features_real_vs_stub_paths(spark):
    from materialize_spark.pipeline.multimodal import extract_features
    arr = _img(4, 4, seed=1)
    rows = [
        (1, "image", bytearray(encode_ppm(arr)), "ppm"),
        (2, "image", bytearray(encode_bmp(arr)), "bmp"),
        (3, "image", bytearray(b"not-an-image"), "fake/raw"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta_format string")
    out = {r.media_id: r.feature for r in extract_features(df).collect()}
    # same pixels through two containers → identical real features
    assert out[1] == pytest.approx(out[2])
    assert out[1][0] == 4.0 and out[1][1] == 4.0  # h, w
    # stub path: normalized byte-fold sums to 1
    assert sum(out[3]) == pytest.approx(1.0)


def test_resize_media_real_path(spark):
    from materialize_spark.pipeline.multimodal import resize_media
    arr = _img(8, 8, seed=2)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(arr)), "ppm"),
         (2, "image", bytearray(b"xyz"), "fake/raw")],
        "media_id long, kind string, payload binary, meta_format string")
    out = {r.media_id: r for r in
           resize_media(df, width=4, height=4).collect()}
    real = decode_ppm(bytes(out[1].payload))
    assert real.shape == (4, 4, 3)
    assert np.array_equal(real, resize_nearest(arr, 4, 4))
    assert out[1].meta_format == "ppm;4x4"
    assert out[2].meta_format == "fake/raw;4x4" and len(out[2].payload) == 16


def test_wav_round_trip_and_chunk_walk():
    from materialize_spark.pipeline.imaging import decode_wav, encode_wav
    rng = np.random.RandomState(5)
    samples = (rng.rand(64, 2).astype(np.float32) - 0.5)
    buf = encode_wav(samples, 16000)
    # splice an ignorable LIST chunk between fmt and data
    fmt_end = buf.index(b"data")
    spliced = buf[:fmt_end] + b"LIST" + (7).to_bytes(4, "little") \
        + b"INFOxyz" + b"\x00" + buf[fmt_end:]
    out, rate = decode_wav(spliced)
    assert rate == 16000 and out.shape == (64, 2)
    # 16-bit quantization error bound
    assert np.abs(out - samples).max() <= 1.0 / 32768 + 1e-7


def test_wav_8bit_and_rejects():
    from materialize_spark.pipeline.imaging import decode_wav
    import struct as st
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    pcm = bytes([128, 255, 0, 128])
    body = (b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", len(pcm)) + pcm)
    buf = b"RIFF" + st.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav(buf)
    assert rate == 8000
    assert out[:, 0] == pytest.approx([0.0, 127 / 128, -1.0, 0.0])
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"nope")


def test_audio_features_constant_signal():
    from materialize_spark.pipeline.imaging import audio_features
    samples = np.full((16, 1), 0.25, np.float32)
    f = audio_features(samples, 8000)
    assert f[0] == pytest.approx(16 / 8000)
    assert f[1] == 8000.0 and f[2] == 1.0
    assert f[3] == pytest.approx(0.25) and f[4] == pytest.approx(0.25)
    assert f[5] == 0.0 and f[7] == 0.0


def test_avi_round_trip():
    from materialize_spark.pipeline.imaging import decode_avi, encode_avi
    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, size=(5, 4, 6, 3), dtype=np.uint8)
    out, fps = decode_avi(encode_avi(frames, fps=10.0))
    assert fps == pytest.approx(10.0)
    assert np.array_equal(out, frames)


def test_avi_rejects_non_avi():
    from materialize_spark.pipeline.imaging import decode_avi
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFFxxxxWAVE")


def test_video_features_values():
    from materialize_spark.pipeline.imaging import video_features
    frames = np.zeros((3, 2, 2, 3), np.uint8)
    frames[1] = 90  # middle frame brighter
    f = video_features(frames, 10.0)
    assert f[0] == 3.0 and f[1] == 10.0 and f[2] == 2.0 and f[3] == 2.0
    assert f[4] == pytest.approx(30.0)   # mean brightness
    assert f[6] == pytest.approx(90.0)   # |0-90|, |90-0| mean
    assert f[7] == pytest.approx(2 / 3)  # two dark frames


def test_sample_frames_real_avi(spark):
    from materialize_spark.pipeline.imaging import (
        decode_ppm, encode_avi,
    )
    from materialize_spark.pipeline.multimodal import sample_frames
    rng = np.random.RandomState(13)
    video = rng.randint(0, 256, size=(10, 3, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "video", bytearray(encode_avi(video, fps=5.0)), "avi"),
         (2, "video", bytearray(b"ABCDEFGH"), "fake/raw")],
        "media_id long, kind string, payload binary, meta_format string")
    rows = sample_frames(df, frame_bytes=4, max_frames=4).collect()
    real = sorted((r.frame_idx, bytes(r.frame)) for r in rows
                  if r.media_id == 1)
    # 4 evenly-strided frames: indexes 0, 3, 6, 9 of the source video
    assert len(real) == 4
    assert np.array_equal(decode_ppm(real[0][1]), video[0])
    assert np.array_equal(decode_ppm(real[3][1]), video[9])
    fake = [bytes(r.frame) for r in rows if r.media_id == 2]
    assert fake == [b"ABCD", b"EFGH"]


def test_extract_features_video_path(spark):
    from materialize_spark.pipeline.imaging import encode_avi
    from materialize_spark.pipeline.multimodal import extract_features
    video = np.full((4, 2, 2, 3), 50, np.uint8)
    df = spark.createDataFrame(
        [(1, "video", bytearray(encode_avi(video, fps=8.0)), "avi")],
        "media_id long, kind string, payload binary, meta_format string")
    f = extract_features(df).collect()[0].feature
    assert f[0] == 4.0 and f[1] == pytest.approx(8.0)
    assert f[4] == pytest.approx(50.0)
