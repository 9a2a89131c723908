"""Pure-Python media codecs for the multimodal pipeline.

PIL/ffmpeg are not installable in this container, which gates JPEG/
PNG/MP4 decoding — but nothing gates the UNCOMPRESSED formats: PPM
(P6) and 24-bit BMP are a fixed header plus raw pixels, and WAV/PCM
ships in the standard library (``wave``). These codecs make the
multimodal decode stage REAL for those formats (``multimodal.py``
routes by ``media_format``), so the pipeline demonstrates true
bytes→pixels→features work end-to-end instead of fingerprint
stand-ins; compressed formats remain clearly-marked plug-in points.

All decoders take/return plain ``bytes`` and numpy arrays — no Spark
dependency — so they run inside Arrow-batched ``mapInPandas`` workers
unchanged.
"""

from __future__ import annotations

import io
import struct


def encode_ppm(arr) -> bytes:
    """RGB uint8 array (h, w, 3) → binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"PPM wants (h, w, 3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(data: bytes):
    """Binary PPM (P6) → RGB uint8 array (h, w, 3). Handles comment
    lines and any whitespace split in the header, per the spec."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval tokens; '#' starts comments
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


def encode_bmp(arr) -> bytes:
    """RGB uint8 array (h, w, 3) → 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding, BGR order —
    the classic Windows layout)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"BMP wants (h, w, 3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    row = w * 3
    pad = (4 - row % 4) % 4
    body = io.BytesIO()
    for y in range(h - 1, -1, -1):  # bottom-up
        body.write(a[y, :, ::-1].tobytes())  # RGB -> BGR
        body.write(b"\x00" * pad)
    pixels = body.getvalue()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixels), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    return header + info + pixels


def decode_bmp(data: bytes):
    """24-bit uncompressed BMP → RGB uint8 array (h, w, 3). Supports
    the BITMAPINFOHEADER layout with positive (bottom-up) or negative
    (top-down) heights."""
    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    size, w, h = struct.unpack_from("<Iii", data, 14)
    if size < 40:
        raise ValueError(f"unsupported BMP header size {size}")
    planes, bpp = struct.unpack_from("<HH", data, 26)
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    row = w * 3
    stride = row + (4 - row % 4) % 4
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = i if top_down else h - 1 - i
        line = np.frombuffer(data, dtype=np.uint8, count=row,
                             offset=off + i * stride)
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


def encode_wav_pcm16(samples, sample_rate: int = 16000,
                     channels: int = 1) -> bytes:
    """int16 sample array → WAV (PCM 16-bit) bytes, via stdlib wave."""
    import wave

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes):
    """WAV (PCM 16-bit) bytes → ``(sample_rate, channels, int16 array
    of shape (n_frames, channels))``."""
    import wave

    import numpy as np

    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"only PCM 16-bit WAV supported, got sampwidth "
                f"{wf.getsampwidth()}"
            )
        rate, ch = wf.getframerate(), wf.getnchannels()
        n = wf.getnframes()
        raw = wf.readframes(n)
    a = np.frombuffer(raw, dtype=np.int16).reshape(n, ch)
    return rate, ch, a


#: image formats with a pure-Python decoder here
IMAGE_FORMATS = ("ppm", "bmp")


def decode_image(fmt: str, data: bytes):
    """The one decode dispatch for :data:`IMAGE_FORMATS` — every
    consumer (feature decode, resize, embeddings) routes through here
    so adding a format or changing error handling happens once."""
    if fmt == "ppm":
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    raise ValueError(f"no pure-Python image decoder for {fmt!r}")


def encode_image(fmt: str, arr) -> bytes:
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    raise ValueError(f"no pure-Python image encoder for {fmt!r}")


def resize_nearest(arr, new_w: int, new_h: int):
    """Nearest-neighbor resample of an (h, w, 3) array — index maps
    ``src = floor(dst * src_size / dst_size)``, pure numpy fancy
    indexing (what PIL's NEAREST does)."""
    import numpy as np

    a = np.asarray(arr)
    h, w = a.shape[:2]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return a[ys][:, xs]


def image_features(arr) -> dict:
    """Content features of a decoded image: per-channel means and a
    luminance mean/std (ITU-R 601 weights) — the real counterpart of
    the fingerprint stand-ins."""
    import numpy as np

    a = np.asarray(arr, dtype=np.float64)
    lum = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    return {
        "mean_r": float(a[..., 0].mean()),
        "mean_g": float(a[..., 1].mean()),
        "mean_b": float(a[..., 2].mean()),
        "luma_mean": float(lum.mean()),
        "luma_std": float(lum.std()),
    }


def audio_features(samples) -> dict:
    """Content features of decoded PCM: RMS level (in [-1, 1] units)
    and the zero-crossing count of the first channel."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64) / 32768.0
    first = a[:, 0] if a.ndim == 2 else a
    crossings = int(((first[:-1] * first[1:]) < 0).sum()) if len(first) > 1 else 0
    return {
        "rms": float(np.sqrt((a * a).mean())) if a.size else 0.0,
        "zero_crossings": crossings,
    }
