"""Real library-free multimodal decoders: Netpbm P5/P6, 24-bit BMP,
RIFF/WAV PCM16 — synthesized payloads pushed through the Spark
mapInPandas path and cross-checked against direct numpy decodes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from lucene_solr_spark.pipeline.multimodal import (audio_features,
                                                   decode_bmp24,
                                                   decode_image_raw,
                                                   decode_netpbm,
                                                   decode_wav_pcm16,
                                                   image_features,
                                                   resize_nearest)


def _ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    magic = b"P6" if img.ndim == 3 else b"P5"
    return (magic + b"\n# a comment\n" + f"{w} {h}\n255\n".encode()
            + img.tobytes())


def _bmp24(img: np.ndarray) -> bytes:
    """Bottom-up BI_RGB 24-bit BMP from an (h, w, 3) RGB array."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:                      # bottom-up
        line = row[:, ::-1].tobytes()          # RGB → BGR
        raster += line + b"\0" * (stride - len(line))
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(raster), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    return header + bytes(raster)


def _wav(samples: np.ndarray, rate: int) -> bytes:
    data = samples.astype("<i2").tobytes()
    ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _img(h, w, c, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


def test_netpbm_roundtrip():
    rgb, gray = _img(13, 17, 3, 1), _img(9, 5, 1, 2)
    assert np.array_equal(decode_netpbm(_ppm(rgb)), rgb)
    assert np.array_equal(decode_netpbm(_ppm(gray)), gray)
    with pytest.raises(ValueError):
        decode_netpbm(b"JUNK")


def test_bmp_roundtrip_incl_row_padding():
    for w in (5, 6, 7, 8):                     # hits every padding case
        img = _img(4, w, 3, w)
        assert np.array_equal(decode_bmp24(_bmp24(img)), img)
    with pytest.raises(ValueError):
        decode_bmp24(b"BM" + b"\0" * 60)       # bpp 0 ≠ 24


def test_wav_roundtrip():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32767, size=(400, 2), dtype=np.int16)
    got, rate = decode_wav_pcm16(_wav(s, 16000))
    assert rate == 16000 and np.array_equal(got, s)
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFF\0\0\0\0JUNK")


def test_resize_and_features_deterministic():
    img = _img(30, 50, 3, 4)
    small = resize_nearest(img, 10, 6)
    assert small.shape == (6, 10, 3)
    # corner pixels are preserved by nearest-neighbor floor indexing
    assert np.array_equal(small[0, 0], img[0, 0])
    f1, f2 = image_features(img), image_features(img)
    assert np.array_equal(f1, f2) and f1.shape == (3 + 3 + 64,)
    assert f1[:3] == pytest.approx(img.mean(axis=(0, 1)), rel=1e-5)
    g = image_features(_img(12, 12, 1, 5))
    assert g.shape == (1 + 1 + 64,)


def test_decode_image_raw_spark(spark):
    rgb, gray, bmp = _img(8, 12, 3, 6), _img(7, 7, 1, 7), _img(6, 5, 3, 8)
    rows = [(0, bytearray(_ppm(rgb))), (1, bytearray(_ppm(gray))),
            (2, bytearray(_bmp24(bmp))), (3, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_raw(df).collect()}
    assert set(got) == {0, 1, 2}               # junk row dropped
    assert (got[0]["fmt"], got[0]["width"], got[0]["height"],
            got[0]["channels"]) == ("netpbm", 12, 8, 3)
    assert (got[1]["fmt"], got[1]["channels"]) == ("netpbm", 1)
    assert (got[2]["fmt"], got[2]["width"], got[2]["height"]) == ("bmp", 5, 6)
    # features through Spark == features computed directly
    assert got[0]["features"] == pytest.approx(
        image_features(rgb).tolist(), rel=1e-6)
    assert got[2]["features"] == pytest.approx(
        image_features(bmp).tolist(), rel=1e-6)


def test_audio_features_spark(spark):
    rate = 8000
    t = np.arange(rate)                        # 1 second
    sine = (10000 * np.sin(2 * np.pi * 440 * t / rate)).astype(np.int16)
    stereo = np.stack([sine, sine], axis=1)
    silent = np.zeros((rate // 2, 1), dtype=np.int16)
    rows = [(0, bytearray(_wav(stereo, rate))),
            (1, bytearray(_wav(silent, rate))),
            (2, bytearray(b"mp3 junk payload"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert set(got) == {0, 1}
    a = got[0]
    assert (a["sample_rate"], a["channels"], a["n_samples"]) == (rate, 2, rate)
    assert a["duration_sec"] == pytest.approx(1.0)
    # 440 Hz sine: RMS ≈ amplitude/√2, ZCR ≈ 2·f/rate
    assert a["rms"] == pytest.approx(10000 / np.sqrt(2), rel=0.01)
    assert a["zero_cross_rate"] == pytest.approx(880 / rate, rel=0.01)
    assert got[1]["rms"] == 0.0 and got[1]["duration_sec"] == pytest.approx(0.5)


def test_malformed_payloads_drop_not_crash(spark):
    """Truncated/garbage payloads with valid magic bytes must DROP, not
    fail the task (review finding: struct.error escaped the except)."""
    rows = [(0, bytearray(b"BM")),                 # 2-byte 'BMP'
            (1, bytearray(b"BM" + b"\0" * 12)),    # truncated header
            (2, bytearray(b"P6\n5 5 255\n")),      # raster missing
            (3, bytearray(_ppm(_img(4, 4, 3, 9))))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = decode_image_raw(df).collect()
    assert [r["doc_id"] for r in got] == [3]
    # WAV: truncated fmt chunk + declared zero sample rate both drop
    import struct
    zero_rate = _wav(np.zeros((10, 1), dtype=np.int16), 1)
    zero_rate = zero_rate.replace(struct.pack("<I", 1),
                                  struct.pack("<I", 0), 1)
    rows = [(0, bytearray(b"RIFF\x10\0\0\0WAVEfmt \x20\0\0\0\x01\x00")),
            (1, bytearray(zero_rate)),
            (2, bytearray(_wav(np.ones((10, 1), dtype=np.int16), 8000)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = audio_features(df).collect()
    assert [r["doc_id"] for r in got] == [2]


# ------------------------------------------------------------- raw video

def _video(seed, n_frames, w=8, h=6):
    import numpy as np
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for _ in range(n_frames)]


def test_rvid_round_trip():
    import numpy as np

    from lucene_solr_spark.pipeline.multimodal import (decode_rvid,
                                                       encode_rvid)
    frames = _video(1, 5)
    arr, fps = decode_rvid(encode_rvid(frames, fps=30.0))
    assert fps == 30.0 and arr.shape == (5, 6, 8, 3)
    assert all(np.array_equal(arr[i], frames[i]) for i in range(5))
    with pytest.raises(ValueError):
        decode_rvid(b"JUNK" + b"\x00" * 40)
    with pytest.raises(ValueError):
        decode_rvid(encode_rvid(frames)[:-10])   # truncated


def test_frame_sample_spark_vs_numpy(spark):
    import numpy as np

    from lucene_solr_spark.pipeline.multimodal import (encode_rvid,
                                                       frame_sample,
                                                       image_features)
    vids = {0: _video(0, 25), 1: _video(1, 3), 2: _video(2, 10)}
    rows = [(k, bytearray(encode_rvid(v, fps=12.0)))
            for k, v in vids.items()]
    rows.append((9, bytearray(b"not a video at all")))   # dropped
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = frame_sample(df, every_k=10).collect()
    # doc 0: frames 0,10,20 · doc 1: frame 0 · doc 2: frame 0 — doc 9 gone
    want_idx = {(0, 0), (0, 10), (0, 20), (1, 0), (2, 0)}
    assert {(r["doc_id"], r["frame_idx"]) for r in got} == want_idx
    for r in got:
        ref = image_features(vids[r["doc_id"]][r["frame_idx"]])
        assert np.allclose(np.array(r["features"], dtype=np.float32), ref)
        assert r["fps"] == 12.0


def test_frame_sample_cap(spark):
    from lucene_solr_spark.pipeline.multimodal import (encode_rvid,
                                                       frame_sample)
    df = spark.createDataFrame(
        [(0, bytearray(encode_rvid(_video(3, 40), fps=24.0)))],
        "doc_id long, payload binary")
    got = frame_sample(df, every_k=5, max_frames=3).collect()
    assert sorted(r["frame_idx"] for r in got) == [0, 5, 10]
    with pytest.raises(ValueError):
        frame_sample(df, every_k=0)
