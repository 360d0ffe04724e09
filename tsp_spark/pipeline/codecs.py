"""Real media codecs in pure stdlib + numpy — no Pillow/libsndfile.

The container has no codec libraries, but the dominant interchange
formats are fully decodable with what IS here: PNG is zlib (stdlib)
plus five scanline filters, baseline JPEG is a real Huffman→IDCT
pipeline (pipeline/jpeg.py), BMP and PPM/PGM are plain struct parses,
and WAV is the stdlib ``wave`` module. These are REAL decoders — PNG/
BMP/PPM/WAV bit-exactly recover pixel/sample data, JPEG within codec
tolerance — and MP3 gets a real frame-HEADER parse (rate/duration/
bitrate per ISO/IEC 11172-3; synthesis stays stubbed), so the
multimodal pipeline (pipeline/multimodal.py) only falls back to its
declared deterministic stub for what genuinely needs an external codec
(MP3 sample synthesis, non-MJPEG video codecs; progressive JPEG
decodes for real as of r6 — pipeline/jpeg.py).

Everything returns numpy arrays and plain ints; nothing here touches
Spark. Raises ``UnsupportedMediaError`` for unknown magic bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class UnsupportedMediaError(ValueError):
    """Payload is not in a format this pure-python codec set decodes."""


_MAX_PIXELS = 1 << 26  # 67M px — a corrupt header must not OOM an executor


def _check_dims(width: int, height: int) -> None:
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise UnsupportedMediaError(f"implausible dimensions {width}x{height}")


# --------------------------------------------------------------- images

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Undo per-scanline filtering (PNG spec §9: None/Sub/Up/Average/
    Paeth). 8-bit depth only; returns (height, width, channels) uint8."""
    stride = width * channels
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(
            np.int16
        )
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub — per-channel prefix sum (mod 256):
            # cumsum in int64 then mod equals the sequential byte adds
            # (review-caught: the per-byte Python loop was the decode
            # hot spot on large images)
            cur = (
                np.cumsum(
                    line.reshape(-1, channels).astype(np.int64), axis=0
                )
                & 0xFF
            ).reshape(stride).astype(np.int16)
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average — left-dependency is sequential, but
            # iterate PIXELS (channels at a time, numpy ops per pixel)
            # instead of bytes
            cur = np.empty(stride, dtype=np.int16)
            left = np.zeros(channels, dtype=np.int16)
            for x in range(0, stride, channels):
                px = (line[x : x + channels] + ((left + prev[x : x + channels]) >> 1)) & 0xFF
                cur[x : x + channels] = px
                left = px
        elif ftype == 4:  # Paeth — same pixel-wise walk
            cur = np.empty(stride, dtype=np.int16)
            left = np.zeros(channels, dtype=np.int16)
            upleft = np.zeros(channels, dtype=np.int16)
            for x in range(0, stride, channels):
                up = prev[x : x + channels]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                px = (line[x : x + channels] + pred) & 0xFF
                cur[x : x + channels] = px
                left, upleft = px, up
        else:
            raise UnsupportedMediaError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (h, w, channels) uint8. Supports 8-bit gray / RGB / RGBA /
    gray+alpha / palette, non-interlaced."""
    if not payload.startswith(_PNG_SIG):
        raise UnsupportedMediaError("not a PNG")
    pos, width, height, color_type, idat, plte = len(_PNG_SIG), 0, 0, 0, b"", b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or interlace != 0:
                raise UnsupportedMediaError("PNG: only 8-bit non-interlaced")
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise UnsupportedMediaError(f"PNG color type {color_type}")
    _check_dims(width, height)
    # bounded inflate (review-caught): a 1×1 header with a zip-bomb
    # IDAT used to fully materialize before the size check — the OOM
    # the _MAX_PIXELS guard exists to prevent. Decompress at most the
    # expected stream length + 1 byte; any remainder means the stream
    # is overlong for the declared dimensions.
    expected = height * (width * channels + 1)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(idat, expected + 1)
    except zlib.error as e:
        raise UnsupportedMediaError(f"PNG: bad IDAT stream ({e})") from e
    if len(raw) > expected:
        raise UnsupportedMediaError("PNG: IDAT longer than declared dims")
    if len(raw) < expected:
        raise UnsupportedMediaError("PNG: truncated IDAT stream")
    img = _png_unfilter(raw, width, height, channels)
    if color_type == 3:  # palette lookup → RGB
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        img = pal[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 → PNG bytes (filter 0, one IDAT).
    A real, spec-conformant encoder — decode_png round-trips it."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → (h, w, 3) uint8 (BGR → RGB)."""
    if payload[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BMP: core header unsupported")
    width, height = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp not in (24, 32) or comp != 0:
        raise UnsupportedMediaError(f"BMP: bpp={bpp} compression={comp}")
    flip = height > 0
    height = abs(height)
    _check_dims(width, height)
    nch = bpp // 8
    stride = (width * nch + 3) & ~3
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(payload, np.uint8, width * nch, data_off + y * stride)
        row = row.reshape(width, nch)
        img[height - 1 - y if flip else y] = row[:, 2::-1]  # BGR(A)→RGB
    return img


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) / PGM (P5) → (h, w, {3|1}) uint8."""
    if payload[:2] not in (b"P6", b"P5"):
        raise UnsupportedMediaError("not a binary PPM/PGM")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, pos = [], 2
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    _check_dims(w, h)
    if maxval > 255:
        raise UnsupportedMediaError("PPM: 16-bit samples unsupported")
    c = 3 if payload[:2] == b"P6" else 1
    return np.frombuffer(payload, np.uint8, w * h * c, pos).reshape(h, w, c)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JPEG → (h, w, c) uint8 via the pure
    stdlib+numpy codec in pipeline/jpeg.py (Huffman → dequant → IDCT →
    YCbCr). Progressive/arithmetic JPEGs surface as unsupported so the
    stub fallback engages."""
    from tsp_spark.pipeline.jpeg import UnsupportedJpegError
    from tsp_spark.pipeline.jpeg import decode_jpeg as _decode

    if payload[:2] != b"\xff\xd8":
        raise UnsupportedMediaError("not a JPEG")
    try:
        return _decode(payload)
    except UnsupportedJpegError as e:
        raise UnsupportedMediaError(str(e)) from e


_IMAGE_DECODERS = (
    ("png", decode_png),
    ("jpeg", decode_jpeg),
    ("bmp", decode_bmp),
    ("ppm", decode_ppm),
)


def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Sniff + decode → (format, (h, w, c) uint8). Raises
    UnsupportedMediaError when no real decoder matches (e.g. JPEG) OR
    when a payload matches a magic prefix but is corrupt mid-stream —
    truncated PNG IDAT (zlib.error), short buffers (ValueError from
    np.frombuffer / int()), undersized headers (struct.error), bad
    palette indices (IndexError). Decode failures must degrade to the
    caller's fallback, never kill a whole Spark task."""
    for name, dec in _IMAGE_DECODERS:
        try:
            return name, dec(payload)
        except UnsupportedMediaError:
            continue
        except (ValueError, struct.error, zlib.error, IndexError) as e:
            raise UnsupportedMediaError(f"corrupt {name} payload: {e}") from e
    raise UnsupportedMediaError("no pure-python decoder for payload")


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample via index maps — O(out pixels)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def image_features(img: np.ndarray) -> list[float]:
    """8 real statistics on the gray plane: mean, std, min, max,
    |∂x| mean, |∂y| mean, aspect, fill ratio of the dynamic range."""
    gray = img.astype(np.float32).mean(axis=2) if img.ndim == 3 else img.astype(
        np.float32
    )
    gx = np.abs(np.diff(gray, axis=1)).mean() if gray.shape[1] > 1 else 0.0
    gy = np.abs(np.diff(gray, axis=0)).mean() if gray.shape[0] > 1 else 0.0
    rng = float(gray.max() - gray.min())
    return [
        float(gray.mean()),
        float(gray.std()),
        float(gray.min()),
        float(gray.max()),
        float(gx),
        float(gy),
        float(gray.shape[1] / gray.shape[0]),
        rng / 255.0,
    ]


# ---------------------------------------------------------------- audio


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """WAV (PCM 8/16/32-bit) → (sample_rate, mono float32 in [-1, 1])
    via the stdlib wave module — a real decode."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            sr = wf.getframerate()
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, ValueError, struct.error) as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise UnsupportedMediaError(f"WAV sample width {sw}")
    try:
        x = np.frombuffer(frames, dtype=dtype).astype(np.float32)
    except ValueError as e:  # truncated frame payload (odd byte count)
        raise UnsupportedMediaError(f"corrupt WAV frames: {e}") from e
    if sw == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(1 << (8 * sw - 1))
    if nch > 1:
        if len(x) % nch:
            # a truncated multi-channel payload parses per-sample but
            # not per-frame — degrade, don't kill the Spark task
            # (review-caught: the reshape ValueError escaped)
            raise UnsupportedMediaError(
                f"corrupt WAV frames: {len(x)} samples not divisible "
                f"by {nch} channels"
            )
        x = x.reshape(-1, nch).mean(axis=1)
    return sr, x


# MPEG audio (ISO/IEC 11172-3 / 13818-3) frame-header tables.
# Indexed by (version, layer); version: 1, 2 (2 also covers MPEG-2.5).
_MP3_BITRATES = {
    (1, 1): (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (1, 2): (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (1, 3): (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (2, 1): (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (2, 2): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (2, 3): (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_MP3_RATES = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}


def parse_mp3_headers(payload: bytes) -> tuple[int, int, int, int]:
    """MPEG audio frame-HEADER parse (no synthesis — the filterbank/
    Huffman stages stay behind the declared stub): walk the frame chain
    and return (sample_rate, duration_ms, avg_bitrate_kbps, n_frames).

    Real per the public spec: 11-bit sync, version/layer/bitrate/rate
    fields, padding, per-layer frame sizing (Layer I: 4·(12·br/sr+pad);
    II/III: (144 or 72)·br/sr+pad), samples-per-frame for duration, and
    an ID3v2 skip (syncsafe size). VBR streams average naturally over
    the walked frames. Raises UnsupportedMediaError when no coherent
    frame chain exists (free-format bitrate included)."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise UnsupportedMediaError("corrupt ID3v2 syncsafe size")
            size = (size << 7) | b
        pos = 10 + size
        if payload[5] & 0x10:
            # ID3v2.4 footer flag: a 10-byte footer follows the tag
            # (review-caught: without the skip the frame scan landed
            # on '3DI' and rejected valid files to the stub)
            pos += 10
    n_frames = 0
    sr_out = 0
    total_samples = 0
    total_bits = 0
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        ver_bits = (h >> 19) & 0x3
        layer_bits = (h >> 17) & 0x3
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
            # reserved version/layer, free-format or bad bitrate, bad rate
            if n_frames:
                break  # trailing junk after a valid chain (e.g. ID3v1)
            raise UnsupportedMediaError("not a supported MPEG audio frame")
        version = {0: "2.5", 2: "2", 3: "1"}[ver_bits]
        layer = 4 - layer_bits  # 3→I, 2→II, 1→III
        vkey = 1 if version == "1" else 2
        bitrate = _MP3_BITRATES[(vkey, layer)][br_idx] * 1000
        sr = _MP3_RATES[version][sr_idx]
        if layer == 1:
            frame_len = (12 * bitrate // sr + padding) * 4
            samples = 384
        else:
            factor = 144 if (layer == 2 or vkey == 1) else 72
            frame_len = factor * bitrate // sr + padding
            samples = 1152 if (layer == 2 or vkey == 1) else 576
        if frame_len <= 4:
            raise UnsupportedMediaError("implausible MPEG frame length")
        if sr_out and sr != sr_out:
            break  # rate change = end of coherent chain
        sr_out = sr
        n_frames += 1
        total_samples += samples
        total_bits += bitrate
        pos += frame_len
    if not n_frames:
        raise UnsupportedMediaError("no MPEG audio frames")
    duration_ms = total_samples * 1000 // sr_out
    avg_kbps = total_bits // n_frames // 1000  # frames share a duration
    return sr_out, duration_ms, avg_kbps, n_frames


def mfcc_like(x: np.ndarray, sr: int, n_coef: int = 13, n_mels: int = 24) -> list[float]:
    """Real MFCC-shaped features in pure numpy: power spectrum → mel
    triangle filterbank → log → DCT-II. One frame over the whole clip
    (feature-extraction granularity, not ASR granularity)."""
    if x.size == 0:
        return [0.0] * n_coef
    spec = np.abs(np.fft.rfft(x * np.hanning(x.size))) ** 2
    freqs = np.fft.rfftfreq(x.size, 1.0 / sr)
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    mel_pts = np.linspace(0.0, mel(sr / 2.0), n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    fb = np.zeros(n_mels)
    for m in range(n_mels):
        lo, ctr, hi = hz_pts[m : m + 3]
        up = (freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - freqs) / max(hi - ctr, 1e-9)
        weights = np.clip(np.minimum(up, down), 0.0, None)
        fb[m] = float((weights * spec).sum())
    logmel = np.log(fb + 1e-10)
    n = np.arange(n_mels)
    dct = np.cos(np.pi * np.outer(np.arange(n_coef), (2 * n + 1)) / (2.0 * n_mels))
    return [float(v) for v in dct @ logmel]


# ---------------------------------------------------------------------------
# AVI (RIFF) video container — real parse/write per the public RIFF/AVI
# spec (msdn AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER layouts).
# MJPEG payload frames decode FOR REAL through pipeline/jpeg.py; any
# other fourcc parses (dims/fps/frame count are container metadata) but
# frame DECODE raises UnsupportedMediaError toward the caller's stub
# fallback — the honest boundary, same policy as the other stubs.
# ---------------------------------------------------------------------------


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF chunk
    run; chunks are word-aligned (odd sizes padded by one byte)."""
    while pos + 8 <= end:
        fcc = buf[pos : pos + 4]
        (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise UnsupportedMediaError(
                f"RIFF chunk {fcc!r} overruns its parent ({size} bytes)"
            )
        yield fcc, body, size
        pos = body + size + (size & 1)


def parse_avi_headers(payload: bytes) -> dict:
    """AVI container metadata: {'width', 'height', 'n_frames',
    'fps_milli' (fps × 1000, exact dwRate/dwScale ratio), 'fourcc'}.
    Raises UnsupportedMediaError on anything that is not a well-formed
    AVI with one video stream."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UnsupportedMediaError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))
    meta: dict = {}
    try:
        for fcc, body, size in _riff_chunks(payload, 12, end):
            if fcc != b"LIST" or payload[body : body + 4] != b"hdrl":
                continue
            for f2, b2, s2 in _riff_chunks(payload, body + 4, body + size):
                if f2 == b"avih" and s2 >= 40:
                    (usec_pf, _mbps, _pad, _flags, total, _init, _nstr,
                     _bufsz, w, h) = struct.unpack(
                        "<10I", payload[b2 : b2 + 40]
                    )
                    # clamp to int32: dwTotalFrames is uint32 and the
                    # downstream schema is IntegerType — a hostile
                    # 0xFFFFFFFF must degrade, not overflow the Arrow
                    # cast or a frame-index sequence (review-caught)
                    meta.update(width=w, height=h,
                                n_frames=min(total, (1 << 31) - 1),
                                usec_per_frame=usec_pf)
                elif f2 == b"LIST" and payload[b2 : b2 + 4] == b"strl":
                    for f3, b3, s3 in _riff_chunks(payload, b2 + 4, b2 + s2):
                        if f3 == b"strh" and s3 >= 40:
                            fcc_type = payload[b3 : b3 + 4]
                            if fcc_type != b"vids":
                                break  # audio/other stream: skip strl
                            handler = payload[b3 + 4 : b3 + 8]
                            scale, rate = struct.unpack(
                                "<II", payload[b3 + 20 : b3 + 28]
                            )
                            meta["fourcc"] = handler.decode(
                                "ascii", "replace"
                            ).strip("\0 ")
                            meta["fps_milli"] = min(
                                rate * 1000 // scale if scale else 0,
                                (1 << 31) - 1,
                            )
    except struct.error as e:
        raise UnsupportedMediaError(f"corrupt AVI header: {e}") from e
    if "width" not in meta or "fourcc" not in meta:
        raise UnsupportedMediaError("AVI missing avih/vids strh headers")
    _check_dims(meta["width"], meta["height"])
    return meta


def avi_frame_payloads(payload: bytes):
    """Yield raw frame chunk payloads ('00dc'/'00db') from the movi
    list, in stream order."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise UnsupportedMediaError("not a RIFF/AVI payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))
    def walk(start: int, stop: int):
        for f2, b2, s2 in _riff_chunks(payload, start, stop):
            if f2 == b"LIST" and payload[b2 : b2 + 4] == b"rec ":
                # interleaved AVIs group frames in 'rec ' sub-lists
                # (review-caught: without the recursion conformant
                # files yielded zero frames and got stub features)
                yield from walk(b2 + 4, b2 + s2)
            elif f2[2:4] in (b"dc", b"db"):
                yield payload[b2 : b2 + s2]

    for fcc, body, size in _riff_chunks(payload, 12, end):
        if fcc == b"LIST" and payload[body : body + 4] == b"movi":
            yield from walk(body + 4, body + size)


def decode_avi_frames(payload: bytes, max_frames: int | None = None):
    """Decode an MJPEG AVI's frames to RGB float arrays (real JPEG
    decode per frame). Non-MJPEG fourccs raise UnsupportedMediaError —
    metadata-only callers should use parse_avi_headers instead."""
    meta = parse_avi_headers(payload)
    if meta["fourcc"].upper() not in ("MJPG", "MJPEG"):
        raise UnsupportedMediaError(
            f"AVI codec {meta['fourcc']!r} needs an external decoder "
            f"(only MJPEG decodes in-container)"
        )
    out = []
    for i, frame in enumerate(avi_frame_payloads(payload)):
        if max_frames is not None and i >= max_frames:
            break
        try:
            out.append(decode_jpeg(frame))
        except UnsupportedMediaError:
            raise
        except (struct.error, IndexError, ValueError) as e:
            # a corrupt frame must degrade the payload to the stub
            # route, not kill the Spark task (review-caught: raw
            # jpeg.py struct/index errors escaped the conversion that
            # decode_image applies on the still-image path)
            raise UnsupportedMediaError(
                f"corrupt MJPEG frame {i}: {type(e).__name__}: {e}"
            ) from e
    return meta, out


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 25, quality: int = 85
) -> bytes:
    """Minimal MJPEG AVI writer (RIFF hdrl/avih/strl/strh/strf + movi +
    idx1), frames JPEG-encoded via pipeline/jpeg.py. Round-trips
    through parse_avi_headers/decode_avi_frames."""
    from tsp_spark.pipeline.jpeg import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]

    def chunk(fcc: bytes, body: bytes) -> bytes:
        pad = b"\0" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    bodies = [encode_jpeg(f, quality=quality) for f in frames]
    jpegs = [chunk(b"00dc", b) for b in bodies]
    avih = struct.pack(
        "<10I16x",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0, w, h,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame chunk, offsets relative to 'movi'
    # fourcc. dwChunkLength is the UNPADDED body size — len(chunk)-8
    # would include the RIFF pad byte on odd-sized JPEGs, making
    # idx1-driven players read one trailing garbage byte per frame
    # (review-caught; the in-repo decoder walks movi, so only external
    # players see idx1)
    idx = b""
    off = 4
    for j, b in zip(jpegs, bodies):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(b))
        off += len(j)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
