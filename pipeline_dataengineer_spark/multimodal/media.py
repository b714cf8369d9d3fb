"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

North-star component (not in the reference). Design contract:

- media payloads are ``binary`` columns; metadata (mime, width,
  height, duration_ms, ...) is a typed struct column beside them —
  filters/joins prune on metadata without touching bytes (column
  pruning keeps payload I/O out of metadata-only queries);
- all byte-level work (decode, resize, feature extraction, frame
  sampling) runs inside ``mapInPandas``: one Python worker per
  partition, Arrow record batches in/out, so the per-row overhead is
  amortized and memory is bounded by the Arrow batch size;
- codec calls sit behind ``_decode_image_bytes``. REAL decodes, no
  imaging/audio/video library needed: PNG pixels (stdlib zlib IDAT
  inflate + full scanline defilter), JPEG pixels — baseline AND
  progressive (``multimodal/jpeg.py``: Huffman entropy decode with
  T.81 Annex G multi-scan successive approximation + numpy IDCT +
  chroma upsample), JPEG dimensions (marker walk to SOF), WAV
  metadata (RIFF chunk walk), WAV PCM SAMPLES
  (``_wav_pcm_samples``: numpy frombuffer, all uncompressed sample
  formats incl. 24-bit and IEEE float), and AVI VIDEO FRAMES
  (``_avi_mjpeg_frames``: RIFF tree walk to the ##dc frame chunks;
  Motion-JPEG frames then decode through the in-repo JPEG decoder —
  container and codec end-to-end). Remaining fakes are only formats
  whose codecs genuinely aren't reimplementable here
  (arithmetic-coded/12-bit JPEG pixels fall back to real dims,
  mp4/h264 frames to a deterministic stub) — swap behind the same
  seams in a real deployment without touching any Spark plumbing. The pure-Python
  paths are fine for the metadata/feature shapes tested here; a
  production deployment replaces them with PIL/ffmpeg for
  throughput.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata sniffing from magic bytes — JVM-side (no Python):
    enough to route rows to the right decoder without decoding."""
    p = F.col(payload_col)
    riff_type = F.substring(p, 9, 4)  # RIFF is a family: WAVE vs AVI
    mime = (
        F.when(F.startswith(p, F.lit(b"\x89PNG")), "image/png")
        .when(F.startswith(p, F.lit(b"\xff\xd8\xff")), "image/jpeg")
        .when(
            F.startswith(p, F.lit(b"RIFF")) & (riff_type == F.lit(b"AVI ")),
            "video/x-msvideo",
        )
        .when(F.startswith(p, F.lit(b"RIFF")), "audio/wav")
        .when(F.startswith(p, F.lit(b"GIF8")), "image/gif")
        .when(F.startswith(p, F.lit(b"BM")), "image/bmp")
        .when(F.startswith(p, F.lit(b"\x00\x00\x00\x18ftyp")), "video/mp4")
        .otherwise("application/octet-stream")
    )
    return df.withColumn("sniffed_mime", mime).withColumn(
        "payload_bytes", F.length(p).cast("long")
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+A, RGBA


def _decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, defiltered pixel bytes) from a real
    PNG — stdlib only. Supports 8-bit non-interlaced gray/RGB/alpha
    (palette and 16-bit variants raise; the caller treats any raise as
    an undecodable blob)."""
    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = color_type = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError("unsupported PNG variant")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if w is None or not idat:
        raise ValueError("truncated PNG")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(idat)
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    i = 0
    for _ in range(h):
        f = raw[i]
        i += 1
        line = bytearray(raw[i : i + stride])
        i += stride
        if f == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = line
    return w, h, ch, bytes(out)


# SOF markers carrying frame dimensions: C0-CF minus DHT(C4),
# JPG-extension(C8), DAC(CC).
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}


def _jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from a real JPEG by walking the marker stream
    to the SOF segment — stdlib only. This is exactly how production
    metadata extraction reads dimensions WITHOUT entropy-decoding the
    image (the expensive part that genuinely needs libjpeg)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # spec allows any number of 0xFF fill bytes before a marker
        while payload[pos + 1] == 0xFF and pos + 4 <= len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers have no length field
            continue
        (length,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if marker in _JPEG_SOF:
            # segment: precision(1) height(2) width(2) ...
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            return w, h
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: dims must precede
            break
        pos += 2 + length
    raise ValueError("no SOF segment found")


def _wav_chunks(payload: bytes):
    """RIFF/WAVE chunk walk → (fmt_code, sample_rate, channels, bits,
    data_offset, data_size). Shared by the metadata and sample paths."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    fmt_code = sample_rate = channels = bits = None
    data_off = data_size = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
        if cid == b"fmt ":
            fmt_code, channels, sample_rate = struct.unpack(
                "<HHI", payload[pos + 8 : pos + 16]
            )
            (bits,) = struct.unpack("<H", payload[pos + 22 : pos + 24])
        elif cid == b"data":
            data_off, data_size = pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if not sample_rate or not channels or not bits or data_off is None:
        raise ValueError("truncated WAV")
    return fmt_code, sample_rate, channels, bits, data_off, data_size


def _wav_metadata(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, duration_ms) from a real RIFF/WAVE
    header — stdlib only, no audio codec needed (PCM duration is
    data_bytes / byte_rate)."""
    _fmt, sample_rate, channels, bits, _off, data_size = _wav_chunks(payload)
    byte_rate = sample_rate * channels * (bits // 8)
    return sample_rate, channels, data_size * 1000 // byte_rate


def _wav_pcm_samples(payload: bytes):
    """REAL audio-sample decode for RIFF/WAVE — numpy only, no codec
    library. Returns (sample_rate, float32 array of shape
    (n_frames, channels), samples normalized to [-1, 1]).

    Covers the formats WAV actually carries uncompressed: PCM
    (format code 1) at 8/16/24/32 bits and IEEE float (code 3) at
    32/64 bits. Anything else (ADPCM, mp3-in-wav) raises and the
    caller NULLs the row — same corrupt-blob tolerance as images."""
    import numpy as np

    fmt, rate, ch, bits, off, size = _wav_chunks(payload)
    raw = payload[off : off + size]
    if fmt == 1 and bits == 8:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif fmt == 1 and bits == 16:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif fmt == 1 and bits == 24:
        n = len(raw) // 3
        b = np.frombuffer(raw[: n * 3], dtype=np.uint8).reshape(n, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float32) / float(1 << 23)
    elif fmt == 1 and bits == 32:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / float(1 << 31)
    elif fmt == 3 and bits == 32:
        x = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    elif fmt == 3 and bits == 64:
        x = np.frombuffer(raw, dtype="<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format code={fmt} bits={bits}")
    n_frames = len(x) // ch
    return rate, x[: n_frames * ch].reshape(n_frames, ch)


def _waveform_envelope(mono, points: int):
    """Fixed-length mean-|amplitude| envelope — the bounded feature a
    variable-length signal reduces to (plug into operators/similarity
    like any other embedding)."""
    import numpy as np

    n = len(mono)
    if n == 0:
        return [0.0] * points
    edges = np.linspace(0, n, points + 1, dtype=np.int64)
    out = []
    a = np.abs(mono)
    for i in range(points):
        seg = a[edges[i] : edges[i + 1]]
        out.append(float(seg.mean()) if len(seg) else 0.0)
    return out


def _mean_intensity_features(pixels: bytes) -> list[float]:
    """8 mean-intensity buckets over a raw pixel buffer — the feature
    vector real decodes produce (plug into operators/similarity)."""
    n = len(pixels)
    step = max(1, n // 8)
    feats = [
        (sum(chunk) / len(chunk)) / 255.0
        for chunk in (pixels[k : k + step] for k in range(0, n, step))
        if chunk
    ][:8]
    return feats + [0.0] * (8 - len(feats))


def _decode_image_bytes(payload: bytes) -> tuple[int, int, list[float]]:
    """Image decode: REAL pixels for PNG (``_decode_png``: full
    scanline defilter) AND for JPEG (``jpeg.decode_jpeg``: Huffman
    entropy decode + numpy IDCT + chroma upsample, baseline AND
    progressive — no libjpeg needed). JPEGs the decoder can't handle
    (arithmetic coding, 12-bit) fall back to real DIMENSIONS via the
    marker walk with hash-derived features. Unknown formats get a
    deterministic fake. Features are 8 mean-intensity buckets over
    the decoded pixel buffer for real decodes, hash-derived
    otherwise."""
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    if payload[:8] == _PNG_MAGIC:
        w, h, _ch, pixels = _decode_png(payload)
        return w, h, _mean_intensity_features(pixels)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, _ch, pixels = _decode_gif(payload)
        return w, h, _mean_intensity_features(pixels)
    if payload[:2] == b"BM":
        w, h, _ch, pixels = _decode_bmp(payload)
        return w, h, _mean_intensity_features(pixels)
    hsh = int.from_bytes(payload[:8].ljust(8, b"\0"), "little", signed=False)
    feats = [((hsh >> (8 * i)) & 0xFF) / 255.0 for i in range(8)]
    if payload[:3] == b"\xff\xd8\xff":
        try:
            from pipeline_dataengineer_spark.multimodal.jpeg import decode_jpeg

            w, h, rgb = decode_jpeg(payload)
            return w, h, _mean_intensity_features(rgb.tobytes())
        except Exception:
            # arithmetic-coded/12-bit: dims still real via the marker
            # walk; features stay hash-derived.
            w, h = _jpeg_dimensions(payload)
            return w, h, feats
    width = 16 + (hsh % 1024)
    height = 16 + ((hsh >> 10) % 1024)
    return width, height, feats


def decode_images(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload → (width, height) via mapInPandas. Undecodable rows get
    NULL dims instead of failing the task (at 100 TB some corrupt
    blobs are a certainty; a job that dies at 99% is wrong)."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights = [], []
            for payload in pdf[payload_col]:
                try:
                    w, h, _ = _decode_image_bytes(payload)
                    widths.append(w)
                    heights.append(h)
                except Exception:
                    widths.append(None)
                    heights.append(None)
            yield pdf.assign(width=widths, height=heights)

    return df.mapInPandas(op, out_schema)


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", dim: int = 8
) -> DataFrame:
    """payload → array<float> feature vector (the embedding-extraction
    shape: plug the output straight into operators/similarity)."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                try:
                    _, _, fv = _decode_image_bytes(payload)
                    feats.append(fv[:dim])
                except Exception:
                    feats.append(None)
            yield pdf.assign(features=feats)

    return df.mapInPandas(op, out_schema)


def audio_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """WAV payload → (sample_rate, channels, duration_ms) via
    mapInPandas — REAL RIFF header parsing (``_wav_metadata``), no
    audio codec involved; undecodable rows get NULLs (same corrupt-
    blob tolerance as decode_images)."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sr, ch, dur = [], [], []
            for payload in pdf[payload_col]:
                try:
                    s, c, d = _wav_metadata(payload)
                    sr.append(s)
                    ch.append(c)
                    dur.append(d)
                except Exception:
                    sr.append(None)
                    ch.append(None)
                    dur.append(None)
            yield pdf.assign(sample_rate=sr, channels=ch, duration_ms=dur)

    return df.mapInPandas(op, out_schema)


def _avi_mjpeg_frames(payload: bytes) -> tuple[int, list[bytes]]:
    """REAL video-frame extraction for RIFF/AVI — stdlib only.
    Returns (frame_duration_ms, [frame_bytes, ...]).

    Walks the RIFF chunk tree: ``avih`` (inside LIST hdrl) carries
    dwMicroSecPerFrame; the LIST ``movi`` body carries one ``##dc`` /
    ``##db`` chunk per video frame. For Motion-JPEG AVIs each frame
    chunk IS a complete JPEG, which ``jpeg.decode_baseline_jpeg``
    turns into pixels — a full container→codec path with no ffmpeg."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    usec_per_frame = 0
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal usec_per_frame
        while pos + 8 <= end:
            cid, size = struct.unpack("<4sI", payload[pos : pos + 8])
            body = pos + 8
            if cid == b"LIST":
                if payload[body : body + 4] in (b"hdrl", b"movi", b"rec "):
                    walk(body + 4, min(body + size, end))
            elif cid == b"avih" and size >= 4:
                (usec_per_frame,) = struct.unpack("<I", payload[body : body + 4])
            elif cid[2:4] in (b"dc", b"db") and size:
                frames.append(payload[body : body + size])
            pos = body + size + (size & 1)  # word-aligned chunks

    walk(12, len(payload))
    if not frames:
        raise ValueError("no video frames in AVI")
    return max(1, usec_per_frame // 1000) if usec_per_frame else 33, frames


def decode_audio_samples(
    df: DataFrame, payload_col: str = "payload", waveform_points: int = 64
) -> DataFrame:
    """WAV payload → REAL decoded PCM samples via mapInPandas
    (``_wav_pcm_samples``: numpy frombuffer over the data chunk, all
    uncompressed WAV sample formats). Emits bounded per-row features —
    n_samples, rms, peak, and a fixed-length mean-|amplitude| envelope
    (``array<float>``) — NOT the raw sample array, so output row width
    is constant regardless of clip length (a 10-hour clip and a 1-s
    clip cost the same downstream). Undecodable rows get NULLs."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("rms", T.FloatType(), True),
            T.StructField("peak", T.FloatType(), True),
            T.StructField("waveform", T.ArrayType(T.FloatType()), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ns, rms, peak, wf = [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    _rate, frames = _wav_pcm_samples(payload)
                    mono = frames.mean(axis=1)
                    ns.append(len(frames))
                    rms.append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
                    peak.append(float(np.max(np.abs(mono))) if len(mono) else 0.0)
                    wf.append(_waveform_envelope(mono, waveform_points))
                except Exception:
                    ns.append(None)
                    rms.append(None)
                    peak.append(None)
                    wf.append(None)
            yield pdf.assign(n_samples=ns, rms=rms, peak=peak, waveform=wf)

    return df.mapInPandas(op, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_ms: int = 1000,
    max_frames: int = 8,
) -> DataFrame:
    """video payload → exploded (frame_idx, frame_ts_ms, frame) rows.
    One input row fans out to ≤ max_frames rows — size Arrow batches
    accordingly (spark.sql.execution.arrow.maxRecordsPerBatch).

    REAL for RIFF/AVI: ``_avi_mjpeg_frames`` walks the container to
    the per-frame ``##dc``/``##db`` chunks, picks frames at ~every_ms
    spacing using the avih frame rate, and emits the actual frame
    bytes (for Motion-JPEG each one is a complete JPEG the in-repo
    ``jpeg.decode_baseline_jpeg`` turns into pixels — container AND
    codec with no ffmpeg). Non-AVI containers (mp4/h264 genuinely
    need a codec library) fall back to a deterministic fake
    (frame = first 16 payload bytes tagged with the index)."""
    import pandas as pd

    out_schema = T.StructType(
        [
            f
            for f in df.schema.fields
            if f.name != payload_col  # drop the big payload from fan-out rows
        ]
        + [
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )
    keep_cols = [f.name for f in df.schema.fields if f.name != payload_col]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                if payload is None:
                    continue
                try:
                    frame_ms, all_frames = _avi_mjpeg_frames(payload)
                    step = max(1, round(every_ms / frame_ms))
                    picks = list(range(0, len(all_frames), step))[:max_frames]
                    for j, src_idx in enumerate(picks):
                        out = {c: row[c] for c in keep_cols}
                        out["frame_idx"] = j
                        out["frame_ts_ms"] = src_idx * frame_ms
                        out["frame"] = all_frames[src_idx]
                        rows.append(out)
                    continue
                except Exception:
                    pass  # not an AVI (or corrupt) → deterministic fake
                n = min(max_frames, 1 + len(payload) // 64)
                for i in range(n):
                    out = {c: row[c] for c in keep_cols}
                    out["frame_idx"] = i
                    out["frame_ts_ms"] = i * every_ms
                    out["frame"] = bytes(payload[:16]) + bytes([i])
                    rows.append(out)
            yield pd.DataFrame(
                rows, columns=keep_cols + ["frame_idx", "frame_ts_ms", "frame"]
            )

    return df.mapInPandas(op, out_schema)


# ------------------------------------------------------------------
# Perceptual image hashing (dHash) → near-duplicate image detection.
# ------------------------------------------------------------------


def _gray_pixels(payload: bytes):
    """Decode to a float64 grayscale matrix (h, w), real pixels only
    (PNG scanline decode or the pure-Python JPEG decoder); raises on
    anything the decoders can't produce pixels for."""
    import numpy as np

    if payload[:8] == _PNG_MAGIC:
        w, h, ch, pixels = _decode_png(payload)
        a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, ch)
        if ch == 2:  # gray + alpha
            a = a[:, :, :1]
        elif ch == 4:
            a = a[:, :, :3]
        return a.mean(axis=2, dtype=np.float64)
    if payload[:3] == b"\xff\xd8\xff":
        from pipeline_dataengineer_spark.multimodal.jpeg import decode_jpeg

        _w, _h, rgb = decode_jpeg(payload)
        return rgb.astype(np.float64).mean(axis=2)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h, _ch, pixels = _decode_gif(payload)
        a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
        return a.mean(axis=2, dtype=np.float64)
    if payload[:2] == b"BM":
        w, h, _ch, pixels = _decode_bmp(payload)
        a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, 3)
        return a.mean(axis=2, dtype=np.float64)
    raise ValueError("no pixel decoder for payload")


def _dhash64(gray) -> int:
    """Classic difference hash: block-mean resize to 9 x 8, then one
    bit per horizontal gradient sign — 64 bits packed little-endian
    (row-major), returned as a signed int64."""
    import numpy as np

    h, w = gray.shape
    # block-mean resample to 8 rows x 9 cols via index-sliced means
    ys = (np.arange(9) * h / 8).astype(np.int64)  # 8 row strips
    xs = (np.arange(10) * w / 9).astype(np.int64)  # 9 col strips
    ys[-1], xs[-1] = h, w
    small = np.empty((8, 9))
    for i in range(8):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(9):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            small[i, j] = gray[y0:y1, x0:x1].mean()
    bits = (small[:, 1:] > small[:, :-1]).ravel()  # 8 x 8 gradients
    acc = 0
    for k, b in enumerate(bits):
        if b:
            acc |= 1 << k
    if acc >= 1 << 63:
        acc -= 1 << 64
    return acc


def image_dhash(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """payload → ``dhash`` (nullable long): the 64-bit perceptual
    difference hash of the decoded pixels. Rows whose payload can't
    be pixel-decoded get NULL (same corrupt-blob tolerance as
    decode_images). Feed the output to
    ``operators.dedup.hamming_near_duplicates`` for near-duplicate
    image pairs — the image twin of simhash-over-text: brightness
    shifts, recompression and small blurs move few gradient signs,
    so perceptual duplicates land within a small Hamming radius."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("dhash", T.LongType(), True)]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload in pdf[payload_col]:
                try:
                    hashes.append(_dhash64(_gray_pixels(bytes(payload))))
                except Exception:
                    hashes.append(None)
            yield pdf.assign(dhash=pd.array(hashes, dtype="Int64"))

    return df.mapInPandas(op, out_schema)


# ------------------------------------------------------------------
# GIF (LZW) and BMP — two more REAL pure-Python pixel decoders.
# ------------------------------------------------------------------


def _gif_lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """LZW decompression per GIF89a appendix F: variable-width codes
    LSB-first, clear/end codes, dictionary capped at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if (
                len(table) == (1 << width)
                and width < 12
            ):
                width += 1
    return out


def _decode_gif(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, RGB bytes) of the FIRST frame of a real
    GIF87a/89a — full LZW decode, global/local palettes, interlace
    deinterlacing. Later animation frames are out of scope (frame
    sampling belongs to sample_video_frames semantics)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x21:  # extension: introducer, label, sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1 : pos + 10]
            )
            pos += 10
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = payload[pos : pos + 3 * n]
                pos += 3 * n
            if not palette:
                raise ValueError("GIF without a color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _gif_lzw_decode(min_code, bytes(lzw))
            if len(idx) < w * h:
                raise ValueError("truncated GIF image data")
            idx = idx[: w * h]
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                rows = [idx[r * w : (r + 1) * w] for r in range(h)]
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                un = [None] * h
                for src_i, dst_r in enumerate(order):
                    un[dst_r] = rows[src_i]
                idx = [p for row in un for p in row]
            out = bytearray()
            npal = len(palette) // 3
            for p in idx:
                if p >= npal:
                    raise ValueError("GIF pixel index outside palette")
                out += palette[3 * p : 3 * p + 3]
            return w, h, 3, bytes(out)
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image block")


def _decode_bmp(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 3, RGB bytes top-down) from an uncompressed
    24/32-bit BMP (BITMAPINFOHEADER family, the overwhelmingly common
    on-disk shape)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    comp = struct.unpack("<I", payload[30:34])[0]
    if comp not in (0, 3) or bpp not in (24, 32) or planes != 1 or w <= 0:
        raise ValueError("unsupported BMP variant")
    top_down = h_raw < 0
    h = abs(h_raw)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    out = bytearray()
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        base = pix_off + src_row * stride
        line = payload[base : base + w * nch]
        if len(line) < w * nch:
            raise ValueError("truncated BMP")
        for x in range(w):
            b, g, r = line[x * nch], line[x * nch + 1], line[x * nch + 2]
            out += bytes((r, g, b))
    return w, h, 3, bytes(out)


# --------------------------------------------------------------- EXIF

_EXIF_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
    0x9003: "datetime_original",  # lives in the Exif sub-IFD
}


def _parse_exif(payload: bytes) -> dict:
    """Parse the Exif APP1 segment of a JPEG — REAL TIFF structure
    walking (byte-order header, IFD0 entries, the 0x8769 Exif
    sub-IFD), no imaging library. Returns whichever of make / model /
    orientation / datetime / datetime_original are present. Raises on
    non-JPEG or missing/undecodable APP1 (callers NULL the row).

    Only inline-or-offset ASCII (type 2) and SHORT/LONG (3/4) values
    are read — the tags above never use RATIONAL."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    # walk markers for APP1/Exif
    pos, tiff = 2, None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            tiff = body[6:]
            break
        if marker == 0xDA:  # scan data: no APP1 before it -> give up
            break
        pos += 2 + seg_len
    if tiff is None:
        raise ValueError("no Exif APP1 segment")
    if tiff[:2] == b"II":
        bo = "little"
    elif tiff[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("bad TIFF byte order")

    def u16(off):
        return int.from_bytes(tiff[off : off + 2], bo)

    def u32(off):
        return int.from_bytes(tiff[off : off + 4], bo)

    if u16(2) != 42:
        raise ValueError("bad TIFF magic")

    def read_ifd(ifd_off: int, out: dict) -> None:
        n = u16(ifd_off)
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            tag, typ, cnt = u16(e), u16(e + 2), u32(e + 4)
            size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
            if size is None:
                continue
            total = size * cnt
            voff = e + 8 if total <= 4 else u32(e + 8)
            if tag == 0x8769 and typ == 4:  # Exif sub-IFD pointer
                read_ifd(u32(e + 8), out)
                continue
            name = _EXIF_TAGS.get(tag)
            if name is None:
                continue
            if typ == 2:  # ASCII, null-terminated
                raw = tiff[voff : voff + cnt]
                out[name] = raw.split(b"\x00", 1)[0].decode(
                    "ascii", "replace"
                )
            elif typ == 3:
                out[name] = u16(voff)
            elif typ == 4:
                out[name] = u32(voff)

    out: dict = {}
    read_ifd(u32(4), out)
    return out


def exif_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JPEG payload → (make, model, orientation, taken_at) from the
    Exif APP1 segment via mapInPandas — real TIFF/IFD parsing
    (``_parse_exif``), no imaging library. ``taken_at`` prefers
    DateTimeOriginal over DateTime. Rows without Exif get NULLs (the
    same corrupt-blob tolerance as every media op here); at 100 TB
    this is a pure map-side pass over the binary column, no shuffle."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("make", T.StringType(), True),
            T.StructField("model", T.StringType(), True),
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("taken_at", T.StringType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mk, md, orient, ts = [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    tags = _parse_exif(payload)
                    mk.append(tags.get("make"))
                    md.append(tags.get("model"))
                    o = tags.get("orientation")
                    orient.append(int(o) if o is not None else None)
                    ts.append(
                        tags.get("datetime_original") or tags.get("datetime")
                    )
                except Exception:
                    mk.append(None)
                    md.append(None)
                    orient.append(None)
                    ts.append(None)
            yield pdf.assign(
                make=mk, model=md, orientation=orient, taken_at=ts
            )

    return df.mapInPandas(op, out_schema)


# --------------------------------------------------------- spectrogram


def _spectrogram(mono, rate: int, frame: int, hop: int, bands: int,
                 max_cols: int, max_frames: int = 4096):
    """Hann-windowed STFT magnitude → ``bands`` equal FFT-bin bands,
    mean-pooled along time to at most ``max_cols`` columns. Returns
    (matrix bands x <=max_cols, centroid_hz, rolloff_hz). Pure numpy
    (rfft); deterministic.

    ``max_frames`` bounds the per-row working set: past it the hop is
    widened (uniform frame subsampling) so a 10-hour clip analyzes
    the same number of windows as a 2-minute one instead of
    materializing an unbounded frames x frame matrix — the output is
    pooled to max_cols columns anyway, so the extra frames only ever
    fed averages."""
    import numpy as np

    if len(mono) < frame:
        mono = np.pad(mono, (0, frame - len(mono)))
    n_frames = 1 + (len(mono) - frame) // hop
    if n_frames > max_frames:
        hop = (len(mono) - frame) // (max_frames - 1)
        n_frames = 1 + (len(mono) - frame) // hop
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(frame)
    spec = np.abs(np.fft.rfft(mono[idx] * win, axis=1))  # (t, frame/2+1)
    spec = spec[:, 1:]  # drop DC so band edges divide evenly
    nb = spec.shape[1] // bands * bands
    banded = spec[:, :nb].reshape(n_frames, bands, -1).mean(axis=2)  # (t, b)
    # pool time down to max_cols by averaging contiguous groups
    if n_frames > max_cols:
        g = -(-n_frames // max_cols)  # ceil
        pad = (-n_frames) % g
        if pad:
            banded = np.vstack(
                [banded, np.repeat(banded[-1:], pad, axis=0)]
            )
        banded = banded.reshape(-1, g, bands).mean(axis=1)
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)[1:]
    power = spec.mean(axis=0)
    tot = power.sum()
    if tot > 0:
        centroid = float((freqs * power).sum() / tot)
        cum = np.cumsum(power)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
    else:
        centroid = rolloff = 0.0
    return banded.T.astype("float32"), centroid, rolloff


def audio_spectrogram(
    df: DataFrame,
    payload_col: str = "payload",
    frame: int = 256,
    hop: int = 128,
    bands: int = 16,
    max_cols: int = 32,
) -> DataFrame:
    """WAV payload → bounded mel-style spectrogram features via
    mapInPandas: a ``bands x <=max_cols`` magnitude matrix
    (array<array<float>>, time mean-pooled so a 10-hour clip and a
    1-s clip emit the same row width) plus spectral centroid and 85%
    rolloff in Hz — the standard cheap audio-quality / content
    signals for corpus filtering. REAL DSP: numpy rfft over
    Hann-windowed frames of the decoded PCM (``_wav_pcm_samples``),
    no audio library. Undecodable rows get NULLs."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField(
                "spectrogram", T.ArrayType(T.ArrayType(T.FloatType())), True
            ),
            T.StructField("spectral_centroid_hz", T.FloatType(), True),
            T.StructField("spectral_rolloff_hz", T.FloatType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            specs, cents, rolls = [], [], []
            for payload in pdf[payload_col]:
                try:
                    rate, frames = _wav_pcm_samples(payload)
                    mono = frames.mean(axis=1)
                    m, c, r = _spectrogram(
                        mono, rate, frame, hop, bands, max_cols
                    )
                    specs.append([row.tolist() for row in m])
                    cents.append(c)
                    rolls.append(r)
                except Exception:
                    specs.append(None)
                    cents.append(None)
                    rolls.append(None)
            yield pdf.assign(
                spectrogram=specs,
                spectral_centroid_hz=cents,
                spectral_rolloff_hz=rolls,
            )

    return df.mapInPandas(op, out_schema)


# ------------------------------------------------------------- netpbm


def _decode_pnm(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode netpbm images — P2/P5 (grayscale) and P3/P6 (RGB),
    maxval <= 255 — to (width, height, channels, raw pixel bytes).
    REAL parsing: token scanner that honors '#' comments in the
    header, binary payload sliced after the single whitespace that
    terminates maxval, ASCII variants parsed as integer tokens."""
    if len(payload) < 2 or payload[0:1] != b"P":
        raise ValueError("not a netpbm payload")
    kind = payload[1:2]
    if kind not in (b"2", b"3", b"5", b"6"):
        raise ValueError("unsupported netpbm variant")
    ascii_form = kind in (b"2", b"3")
    channels = 3 if kind in (b"3", b"6") else 1

    pos = 2
    tokens: list[int] = []

    def next_token() -> int:
        nonlocal pos
        while pos < len(payload):
            c = payload[pos]
            if c in b" \t\r\n":
                pos += 1
            elif c == ord("#"):
                while pos < len(payload) and payload[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        start = pos
        while pos < len(payload) and payload[pos] not in b" \t\r\n#":
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        return int(payload[start:pos])

    w, h, maxval = next_token(), next_token(), next_token()
    if not (0 < maxval <= 255):
        raise ValueError("only 8-bit netpbm supported")
    n = w * h * channels
    if ascii_form:
        vals = bytes(next_token() for _ in range(n))
        return w, h, channels, vals
    pos += 1  # exactly ONE whitespace byte after maxval (spec)
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated netpbm raster")
    return w, h, channels, raster


def pnm_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """netpbm payload → (width, height, channels, mean_intensity) via
    mapInPandas — real P2/P3/P5/P6 decoding (``_decode_pnm``), no
    imaging library; undecodable rows get NULLs. Map-side pass over
    the binary column, no shuffle."""
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("mean_intensity", T.DoubleType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, cs, ms = [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    w, h, c, px = _decode_pnm(payload)
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    arr = np.frombuffer(px, dtype=np.uint8)
                    ms.append(float(arr.mean()) if arr.size else None)
                except Exception:
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    ms.append(None)
            yield pdf.assign(
                width=ws, height=hs, channels=cs, mean_intensity=ms
            )

    return df.mapInPandas(op, out_schema)


# ---------------------------------------------------------------- ID3


def _syncsafe(b: bytes) -> int:
    """ID3v2 28-bit syncsafe integer (7 bits per byte)."""
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


_ID3_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
               "TYER": "year", "TDRC": "year"}


def _parse_id3(payload: bytes) -> dict:
    """Parse ID3v2.3/2.4 text frames (title/artist/album/year) from
    the front of an MP3/AIFF payload, falling back to the 128-byte
    ID3v1 trailer. REAL binary parsing: syncsafe sizes, frame walk,
    text-encoding byte (latin-1 / utf-16 w/ BOM / utf-16be / utf-8).
    Raises when neither tag form is present."""
    out: dict = {}
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = _syncsafe(payload[6:10])
        body = payload[10 : 10 + size]
        pos = 0
        while pos + 10 <= len(body):
            fid = body[pos : pos + 4]
            if fid == b"\x00\x00\x00\x00":
                break
            if payload[3] >= 4:  # v2.4: syncsafe frame sizes
                flen = _syncsafe(body[pos + 4 : pos + 8])
            else:
                flen = int.from_bytes(body[pos + 4 : pos + 8], "big")
            data = body[pos + 10 : pos + 10 + flen]
            name = _ID3_FRAMES.get(fid.decode("latin-1", "replace"))
            if name and data:
                enc, text = data[0], data[1:]
                if enc == 0:
                    val = text.decode("latin-1", "replace")
                elif enc == 1:
                    val = text.decode("utf-16", "replace")
                elif enc == 2:
                    val = text.decode("utf-16-be", "replace")
                else:
                    val = text.decode("utf-8", "replace")
                out.setdefault(name, val.rstrip("\x00"))
            pos += 10 + flen
    elif len(payload) >= 128 and payload[-128:-125] == b"TAG":
        t = payload[-128:]
        out["title"] = t[3:33].rstrip(b"\x00 ").decode("latin-1", "replace")
        out["artist"] = t[33:63].rstrip(b"\x00 ").decode("latin-1", "replace")
        out["album"] = t[63:93].rstrip(b"\x00 ").decode("latin-1", "replace")
        out["year"] = t[93:97].rstrip(b"\x00 ").decode("latin-1", "replace")
    if not out:
        raise ValueError("no ID3 tag")
    return out


def id3_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio payload → (title, artist, album, year) from ID3v2 text
    frames (v1 trailer fallback) via mapInPandas — the audio twin of
    exif_metadata: real binary tag parsing, map-side, no codec, no
    shuffle; untagged rows get NULLs."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("title", T.StringType(), True),
            T.StructField("artist", T.StringType(), True),
            T.StructField("album", T.StringType(), True),
            T.StructField("year", T.StringType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("title", "artist", "album", "year")}
            for payload in pdf[payload_col]:
                try:
                    tags = _parse_id3(payload)
                except Exception:
                    tags = {}
                for k in cols:
                    cols[k].append(tags.get(k) if tags else None)
            yield pdf.assign(**cols)

    return df.mapInPandas(op, out_schema)


_TIFF_TAGS = {
    256: ("width", "int"),
    257: ("height", "int"),
    271: ("make", "str"),
    272: ("model", "str"),
    274: ("orientation", "int"),
    306: ("datetime", "str"),
}


def _parse_tiff(payload: bytes) -> dict:
    """Parse a STANDALONE TIFF file's IFD0 (the same TIFF structure
    _parse_exif walks inside a JPEG's APP1, but the file IS the TIFF
    stream): byte order, magic 42, first IFD; inline-or-offset ASCII
    and SHORT/LONG values for the classic dimension/camera tags.
    Raises on non-TIFF."""
    if payload[:2] == b"II":
        bo = "little"
    elif payload[:2] == b"MM":
        bo = "big"
    else:
        raise ValueError("not a TIFF")

    def u16(off):
        return int.from_bytes(payload[off : off + 2], bo)

    def u32(off):
        return int.from_bytes(payload[off : off + 4], bo)

    if u16(2) != 42:
        raise ValueError("bad TIFF magic")
    out: dict = {}
    ifd = u32(4)
    n = u16(ifd)
    for i in range(n):
        e = ifd + 2 + 12 * i
        tag, typ, cnt = u16(e), u16(e + 2), u32(e + 4)
        spec = _TIFF_TAGS.get(tag)
        if spec is None:
            continue
        name, kind = spec
        size = {1: 1, 2: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        voff = e + 8 if size * cnt <= 4 else u32(e + 8)
        if typ == 2 and kind == "str":
            raw = payload[voff : voff + cnt]
            out[name] = raw.split(b"\x00", 1)[0].decode("ascii", "replace")
        elif typ == 3:
            out[name] = u16(voff)
        elif typ == 4:
            out[name] = u32(voff)
    if not out:
        raise ValueError("no known TIFF tags")
    return out


def tiff_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Standalone-TIFF payload → (width, height, make, model,
    orientation, taken_at) via mapInPandas — the .tif sibling of
    exif_metadata (scanner/geo exports ship as bare TIFF, no JPEG
    wrapper). Map-side, no imaging lib; non-TIFF rows get NULLs."""
    import pandas as pd

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("make", T.StringType(), True),
            T.StructField("model", T.StringType(), True),
            T.StructField("orientation", T.IntegerType(), True),
            T.StructField("taken_at", T.StringType(), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {
                k: []
                for k in ("width", "height", "make", "model",
                          "orientation", "taken_at")
            }
            for payload in pdf[payload_col]:
                try:
                    t = _parse_tiff(payload)
                except Exception:
                    t = {}
                cols["width"].append(t.get("width"))
                cols["height"].append(t.get("height"))
                cols["make"].append(t.get("make"))
                cols["model"].append(t.get("model"))
                cols["orientation"].append(t.get("orientation"))
                cols["taken_at"].append(t.get("datetime"))
            yield pdf.assign(**cols)

    return df.mapInPandas(op, out_schema)
