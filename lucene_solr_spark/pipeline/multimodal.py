"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched pandas UDFs.

The sandbox has no image/audio libraries, so the *decode* step is a
clearly-marked stub: ``decode_image`` raises NotImplementedError unless
PIL is importable; ``extract_binary_meta`` runs a deterministic fake
decode (md5-derived dimensions) so the Spark-side plumbing — schema,
mapInPandas batching, partitioning — is real and testable end-to-end
(and oracle-checkable, since the fake rule is pure arithmetic on md5).

Scale notes: payloads stay opaque binary columns (Parquet keeps them
out of scans that don't reference them — column pruning); decode is a
narrow mapInPandas with Arrow transfer, batch-sized via
spark.sql.execution.arrow.maxRecordsPerBatch to bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

BIN_META_SCHEMA = ("doc_id long, n_bytes long, prefix_hex string, "
                   "fake_width long, fake_height long, fake_channels long")

IMAGE_FEAT_SCHEMA = ("doc_id long, width int, height int, channels int, "
                     "features array<float>")


def attach_binary(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """(doc_id, payload) — deterministic binary column (UTF-8 of text;
    stands in for the html:binary column of the input_hint schema)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.encode(F.col(text_col), "UTF-8").alias("payload"))


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image-header parse: dimensions
    derived from md5 of the payload. Pure arithmetic → SQL-expressible."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    width = 16 + h % 1024
    height = 16 + (h // 1024) % 1024
    channels = 1 + h % 3
    return width, height, channels


def extract_binary_meta(binary_df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload): byte length, 8-byte hex
    prefix, fake-decoded dimensions. Real Arrow plumbing, stubbed codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [fake_decode(bytes(p)) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": payloads.map(len).astype("int64"),
                "prefix_hex": payloads.map(
                    lambda b: bytes(b)[:8].hex().upper()),
                "fake_width": pd.Series([d[0] for d in dims], dtype="int64"),
                "fake_height": pd.Series([d[1] for d in dims], dtype="int64"),
                "fake_channels": pd.Series([d[2] for d in dims], dtype="int64"),
            })

    return binary_df.mapInPandas(batches, schema=BIN_META_SCHEMA)


def decode_image(binary_df: DataFrame) -> DataFrame:
    """Real image decode + 8-bin intensity histogram features. Requires
    PIL (absent in this container) — the Spark plumbing is identical to
    extract_binary_meta; only the per-batch codec differs."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; container ships none — use "
            "extract_binary_meta for the plumbing-verified fake path"
        ) from e

    import io

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(bytes(payload)))
                arr = np.asarray(img)
                hist = np.histogram(arr, bins=8, range=(0, 255))[0]
                rows.append((int(did), img.width, img.height,
                             len(img.getbands()),
                             (hist / max(1, arr.size)).astype("float32")
                             .tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height",
                                              "channels", "features"])

    return binary_df.mapInPandas(batches, schema=IMAGE_FEAT_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decoders for library-free formats. The container ships no image/
# audio codecs, but Netpbm (P5/P6), uncompressed 24-bit BMP and RIFF/WAV
# PCM16 are simple public byte layouts decodable with numpy alone — so
# for these formats the decode step is NOT a stub: bytes in, pixel/
# sample arrays out, features computed executor-side. Compressed
# formats (JPEG/PNG/MP3/...) remain behind the PIL-gated decode_image.
# ---------------------------------------------------------------------------

def decode_netpbm(payload: bytes):
    """Binary Netpbm: P5 (grayscale) / P6 (RGB), maxval ≤ 255 →
    uint8 ndarray (h, w) or (h, w, 3). Public spec: magic, whitespace/
    comment-separated width height maxval, single whitespace, raster."""
    import numpy as np
    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary Netpbm payload")
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3:
        while i < n and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":           # comment to end of line
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j:j + 1].isspace():
            j += 1
        toks.append(int(payload[i:j]))
        i = j
    i += 1                                      # the single ws after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit Netpbm not supported")
    c = 1 if payload[:2] == b"P5" else 3
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * c,
                           offset=i)
    return raster.reshape((h, w) if c == 1 else (h, w, 3))


def decode_bmp24(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): bottom-up
    BGR rows padded to 4 bytes → uint8 ndarray (h, w, 3) in RGB."""
    import struct

    import numpy as np
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)[:, :w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]     # BGR → RGB
    return img[::-1] if flip else img


def decode_wav_pcm16(payload: bytes):
    """RIFF/WAVE PCM 16-bit → (samples int16 ndarray [n, channels],
    sample_rate). Walks the chunk list (public RIFF layout); rejects
    compressed codecs."""
    import struct

    import numpy as np
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = data = None
    while i + 8 <= n:
        cid, sz = payload[i:i + 4], struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8:i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)                   # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 supported")
    samples = np.frombuffer(data, dtype="<i2")
    samples = samples[:len(samples) - len(samples) % channels]
    return samples.reshape(-1, channels), rate


def resize_nearest(img, out_w: int, out_h: int):
    """Nearest-neighbor resize (pure index arithmetic — deterministic
    on every platform, no interpolation library)."""
    import numpy as np
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def image_features(img, pool: int = 8):
    """Deterministic feature vector: per-channel mean + std, then an
    ``pool``×``pool`` average-pooled grayscale fingerprint (nearest-
    resized first so any input size yields the same length)."""
    import numpy as np
    a = img.astype(np.float32)
    if a.ndim == 2:
        a = a[:, :, None]
    feats = [a.mean(axis=(0, 1)), a.std(axis=(0, 1))]
    gray = a.mean(axis=2)
    tile = resize_nearest(gray, pool * 4, pool * 4)
    fp = tile.reshape(pool, 4, pool, 4).mean(axis=(1, 3))
    feats.append(fp.ravel())
    return np.concatenate(feats).astype(np.float32)


IMAGE_RAW_SCHEMA = ("doc_id long, fmt string, width int, height int, "
                    "channels int, features array<float>")

AUDIO_FEAT_SCHEMA = ("doc_id long, sample_rate int, n_samples long, "
                     "channels int, duration_sec double, rms double, "
                     "zero_cross_rate double")


def decode_image_raw(binary_df: DataFrame) -> DataFrame:
    """REAL image decode for the library-free formats: Netpbm P5/P6 and
    uncompressed 24-bit BMP, auto-detected by magic bytes; rows whose
    payload is neither are dropped (fmt routing belongs upstream).
    → (doc_id, fmt, width, height, channels, features) with the
    deterministic ``image_features`` vector.

    Scale: narrow Arrow-batched mapInPandas, no shuffle; payload column
    pruned out of any plan that doesn't call this."""
    import numpy as np

    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    if b[:2] in (b"P5", b"P6"):
                        img, fmt = decode_netpbm(b), "netpbm"
                    elif b[:2] == b"BM":
                        img, fmt = decode_bmp24(b), "bmp"
                    else:
                        continue
                except (ValueError, struct.error):
                    # malformed/truncated payloads drop, never fail the
                    # task — one bad row must not kill a 100-TB job
                    continue
                ch = 1 if img.ndim == 2 else img.shape[2]
                rows.append((int(did), fmt, img.shape[1], img.shape[0],
                             ch, image_features(img).tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "fmt", "width",
                                              "height", "channels",
                                              "features"])

    _ = np  # decoders import numpy lazily; keep the dep explicit
    return binary_df.mapInPandas(batches, schema=IMAGE_RAW_SCHEMA)


def audio_features(binary_df: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/WAV PCM16: per-payload duration, RMS
    amplitude (channel-mixed) and zero-crossing rate — the standard
    cheap audio-quality signals. Non-WAV rows are dropped."""
    import numpy as np

    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    samples, rate = decode_wav_pcm16(bytes(payload))
                except (ValueError, struct.error):
                    continue
                if rate <= 0:          # declared-zero-rate fmt chunk
                    continue
                mono = samples.astype(np.float64).mean(axis=1)
                n = len(mono)
                rms = float(np.sqrt((mono ** 2).mean())) if n else 0.0
                zcr = (float(np.count_nonzero(
                    np.signbit(mono[1:]) != np.signbit(mono[:-1])) / (n - 1))
                    if n > 1 else 0.0)
                rows.append((int(did), int(rate), int(n),
                             int(samples.shape[1]), n / rate, rms, zcr))
            yield pd.DataFrame(rows, columns=["doc_id", "sample_rate",
                                              "n_samples", "channels",
                                              "duration_sec", "rms",
                                              "zero_cross_rate"])

    return binary_df.mapInPandas(batches, schema=AUDIO_FEAT_SCHEMA)


# --------------------------------------------------------------- raw video

RVID_MAGIC = b"RVID"

VIDEO_FRAME_SCHEMA = ("doc_id long, frame_idx int, n_frames int, "
                      "width int, height int, fps double, "
                      "features array<float>")


def encode_rvid(frames, fps: float = 24.0) -> bytes:
    """Minimal uncompressed video container for the library-free path
    (the video analog of the Netpbm/BMP/WAV trio): magic 'RVID' +
    <u32 n_frames, u32 width, u32 height, f64 fps> + n_frames packed
    RGB24 frames. Deterministic, no codec dependency — real payloads
    (mp4/webm) remain library-gated exactly like compressed images."""
    import struct

    import numpy as np
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    out = [RVID_MAGIC, struct.pack("<IIId", len(frames), w, h, float(fps))]
    for f in frames:
        a = np.asarray(f, dtype=np.uint8)
        if a.shape[:2] != (h, w) or a.ndim != 3 or a.shape[2] != 3:
            raise ValueError("all frames must be (h, w, 3) uint8")
        out.append(a.tobytes())
    return b"".join(out)


def decode_rvid(payload: bytes):
    """→ (frames ndarray (n, h, w, 3) uint8, fps). Raises ValueError on
    bad magic / truncation."""
    import struct

    import numpy as np
    if payload[:4] != RVID_MAGIC:
        raise ValueError("not an RVID payload")
    n, w, h, fps = struct.unpack_from("<IIId", payload, 4)
    need = 4 + 20 + n * w * h * 3
    if len(payload) < need:
        raise ValueError("truncated RVID payload")
    arr = np.frombuffer(payload, dtype=np.uint8, count=n * w * h * 3,
                        offset=24).reshape(n, h, w, 3)
    return arr, fps


def frame_sample(binary_df: DataFrame, every_k: int = 10,
                 max_frames: int = 0) -> DataFrame:
    """Frame sampling over (doc_id, payload) RVID videos: decode, keep
    frames 0, k, 2k, … (plus ``max_frames`` cap when > 0), emit one row
    per SAMPLED frame with the deterministic ``image_features`` vector
    — the standard video→training-example expansion.

    Scale: narrow Arrow-batched mapInPandas, no shuffle; the row-count
    expansion is the operator's OUTPUT (n_frames/k rows per video), and
    the payload column prunes out of plans that don't call this.
    Malformed/non-RVID payloads drop, never fail the task."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    frames, fps = decode_rvid(bytes(payload))
                except ValueError:
                    continue
                idxs = range(0, len(frames), every_k)
                if max_frames > 0:
                    idxs = list(idxs)[:max_frames]
                n, h, w = (len(frames), frames.shape[1], frames.shape[2])
                for i in idxs:
                    rows.append((int(did), int(i), n, w, h, float(fps),
                                 image_features(frames[i]).tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "n_frames", "width", "height",
                                              "fps", "features"])

    return binary_df.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)
