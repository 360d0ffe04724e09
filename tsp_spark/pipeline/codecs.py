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


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer II (ISO/IEC 11172-3) — REAL sample decode (r8).
#
# The BITSTREAM layer is ISO-exact: frame sync/header fields, the
# B.2a-d allocation tables (sblimit 27/30/8/12 with their per-subband
# quantization menus and nbal widths), scfsi-driven scale factor
# transmission, the 63-step scale factor ladder 2·2^(-idx/3), grouped
# 3/5/9-level codes (5/7/10-bit triplets), and the closed-form
# requantization s''' = C·(s'' + D) with C = 2^nb/n, D = 1 − (n−1)/2^nb
# (these reproduce table B.4 exactly for every Layer II nlevels).
#
# The SYNTHESIS filterbank is the standard 32-band cosine-modulated
# pseudo-QMF over a 512-tap prototype. The prototype is a CLOSED-FORM
# near-perfect-reconstruction design (root-raised-cosine, rolloff 1,
# period 64 — power-complementary at the band spacing by the Nyquist
# criterion; ~59 dB measured reconstruction), NOT the table-B.3
# constants — a deliberate, documented deviation: the table is 512
# opaque constants with no closed form, and embedding an unverifiable
# transcription would be worse than a designed window whose
# reconstruction quality the round-trip test MEASURES (the full
# encode→bitstream→decode path; ISO streams decode with slightly
# different — inaudible-class — aliasing behavior).
#
# encode_mp2 exists to generate conformant fixtures (mono, MPEG-1,
# fixed allocation) so the decoder is exercised through a real
# bitstream rather than hand-built structures.
# ---------------------------------------------------------------------------

_L2_STEPS_HI = (3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
                16383, 32767, 65535)
_L2_STEPS_MID = (3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                 8191, 65535)
_L2_STEPS_C7 = (3, 5, 7, 9, 15, 31, 65535)
_L2_STEPS_D3 = (3, 5, 65535)
_L2_STEPS_LOW = (3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
                 8191, 16383, 32767)

# B.2a (sblimit 27) / B.2b (30) / B.2c (8) / B.2d (12): per-subband
# menu of nlevels; allocation code 0 = silent, code i>0 = menu[i-1]
_L2_TABLE_A = ([_L2_STEPS_HI] * 3 + [_L2_STEPS_MID] * 8
               + [_L2_STEPS_C7] * 12 + [_L2_STEPS_D3] * 4)
_L2_TABLE_B = _L2_TABLE_A + [_L2_STEPS_D3] * 3
_L2_TABLE_C = [_L2_STEPS_LOW] * 8
_L2_TABLE_D = [_L2_STEPS_LOW] * 12


def _l2_alloc_table(sr: int, kbps_per_ch: int) -> list[tuple[int, ...]]:
    """ISO 11172-3 2.4.2.3 table selection by rate and per-channel
    bitrate: low rates use the 8/12-band tables, 48 kHz and moderate
    rates the 27-band table, high rates at 44.1/32 kHz the 30-band."""
    if kbps_per_ch <= 48:
        return _L2_TABLE_D if sr == 32000 else _L2_TABLE_C
    if sr == 48000 or kbps_per_ch <= 80:
        return _L2_TABLE_A
    return _L2_TABLE_B


_L2_SF = tuple(2.0 * 2.0 ** (-idx / 3.0) for idx in range(63))


def _l2_requant_consts(n: int) -> tuple[int, float, float]:
    """(nb, C, D) for an nlevels menu entry — closed forms matching
    table B.4 (nb = code width after degrouping)."""
    nb = n.bit_length()
    return nb, float(1 << nb) / n, 1.0 - (n - 1) / float(1 << nb)


class _BitReader:
    def __init__(self, buf: bytes, pos_bits: int = 0, end_bits: int | None = None):
        self.buf = buf
        self.pos = pos_bits
        # hostile-payload bound: a frame whose allocation codes demand
        # more bits than the frame holds must degrade to the declared
        # UnsupportedMediaError (caught by the multimodal fallback),
        # not escape as IndexError and kill the Spark task
        self.end = len(buf) * 8 if end_bits is None else min(end_bits, len(buf) * 8)

    def read(self, n: int) -> int:
        if self.pos + n > self.end:
            raise UnsupportedMediaError(
                "bitstream exhausted: frame body shorter than its "
                "allocation codes demand (truncated/hostile frame)"
            )
        v = 0
        for _ in range(n):
            byte = self.buf[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def tobytes(self, total_bytes: int) -> bytes:
        out = bytearray(total_bytes)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (7 - (i & 7))
        return bytes(out)


_L2_BANK: dict = {}


def _l2_bank() -> dict:
    """Cached filterbank operators: Φ (512×32 cosine modulation), the
    designed prototype window, and the empirically calibrated composite
    gain/delay of analysis∘synthesis (deterministic — fixed seed)."""
    if _L2_BANK:
        return _L2_BANK
    m = np.arange(512, dtype=np.float64)
    k = np.arange(32, dtype=np.float64)
    # near-perfect-reconstruction pseudo-QMF: (−1)^k·π/4 aliasing-
    # cancellation phases around the window center. This
    # implementation CORRELATES the analysis window (s[n] =
    # Σ x[32n+m]·A(m)) and PLACES the synthesis contribution forward
    # (y[32n+m] += s[n]·G(m)); under the symmetric prototype those
    # conventions time-reverse the analysis filter, so BOTH matrices
    # carry the same −θ_k offset here — opposite literal signs would
    # double the phase instead of cancelling it (measured 2.6 dB vs
    # 58.8 dB reconstruction).
    theta = (np.pi / 4.0) * ((-1.0) ** k)
    arg = (np.pi / 32.0) * (k[None, :] + 0.5) * (m[:, None] - 255.5)
    phi_a = np.cos(arg - theta[None, :])
    phi_s = phi_a
    # prototype: root-raised-cosine, rolloff 1, period 64 samples —
    # power-complementary at the π/32 band spacing BY CONSTRUCTION
    # (the Nyquist criterion), which is the property the table-B.3
    # constants encode numerically; a plain Kaiser-sinc lowpass lacks
    # it and reconstructs at only ~14 dB (measured). β=1 closed form
    # 4t·cos(2πt)/(πt(1−16t²)); the removable t=0 and |t|=1/4
    # singularities take their limits.
    t = (m - 255.5) / 64.0
    den = np.pi * t * (1.0 - 16.0 * t * t)
    safe = np.abs(den) > 1e-9
    h = np.zeros(512)
    h[safe] = 4.0 * t[safe] * np.cos(2.0 * np.pi * t[safe]) / den[safe]
    for i in np.flatnonzero(~safe):
        tt = t[i] + 1e-6
        h[i] = 4.0 * tt * np.cos(2.0 * np.pi * tt) / (
            np.pi * tt * (1.0 - 16.0 * tt * tt)
        )
    h /= h.sum()
    analysis = h[:, None] * phi_a  # s[n] = x[32n:32n+512] @ analysis
    rng = np.random.default_rng(20260814)
    x = rng.standard_normal(32 * 400)
    s = _l2_analyze_raw(x, analysis)
    y = _l2_synth_raw(s, phi_s * h[:, None], 1.0)
    # composite delay: argmax cross-correlation; gain: lstsq on the
    # aligned overlap (mid region, edge effects trimmed)
    corr = np.correlate(y, x, "full")
    delay = int(np.argmax(np.abs(corr))) - (len(x) - 1)
    lo, hi = 2048, len(x) - 2048
    xa = x[lo:hi]
    ya = y[lo + delay:hi + delay]
    gain = float((xa @ ya) / (ya @ ya))
    _L2_BANK.update(
        {"h": h, "analysis": analysis,
         "synthesis": phi_s * h[:, None] * gain, "delay": delay}
    )
    return _L2_BANK


def _l2_analyze_raw(x: np.ndarray, analysis: np.ndarray) -> np.ndarray:
    n_slots = max((len(x) - 512) // 32 + 1, 0)
    if n_slots == 0:
        return np.zeros((0, 32))
    idx = (32 * np.arange(n_slots))[:, None] + np.arange(512)[None, :]
    return x[idx] @ analysis


def _l2_synth_raw(s: np.ndarray, synthesis: np.ndarray, gain: float) -> np.ndarray:
    out = np.zeros(32 * len(s) + 512)
    contrib = s @ synthesis.T * gain  # (slots, 512)
    for n in range(len(s)):
        out[32 * n:32 * n + 512] += contrib[n]
    return out


def decode_mp2(payload: bytes) -> tuple[int, np.ndarray]:
    """MPEG-1 Layer II → (sample_rate, mono float64) — a real decode
    (see the section comment for the one documented deviation). Walks
    the frame chain after an ID3v2 skip; mono and (dual/standard)
    stereo supported, stereo averaged to mono like decode_wav; joint
    (intensity) stereo and MPEG-2/2.5 raise UnsupportedMediaError."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise UnsupportedMediaError("corrupt ID3v2 syncsafe size")
            size = (size << 7) | b
        pos = 10 + size
        if payload[5] & 0x10:
            pos += 10
    bank = _l2_bank()
    sr_out = 0
    subband_slots: list[np.ndarray] = []
    n_frames = 0
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos:pos + 4], "big")
        if (h >> 21) & 0x7FF != 0x7FF:
            break
        ver_bits = (h >> 19) & 0x3
        layer_bits = (h >> 17) & 0x3
        protection = not ((h >> 16) & 0x1)
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 0x3
        padding = (h >> 9) & 0x1
        mode = (h >> 6) & 0x3
        if ver_bits != 3 or layer_bits != 2:
            if n_frames:
                break
            raise UnsupportedMediaError("not an MPEG-1 Layer II frame")
        if br_idx in (0, 15) or sr_idx == 3:
            if n_frames:
                break
            raise UnsupportedMediaError("free-format/reserved Layer II frame")
        if mode == 1:
            raise UnsupportedMediaError("joint-stereo Layer II not supported")
        nch = 1 if mode == 3 else 2
        bitrate = _MP3_BITRATES[(1, 2)][br_idx] * 1000
        sr = _MP3_RATES["1"][sr_idx]
        frame_len = 144 * bitrate // sr + padding
        if pos + frame_len > len(payload):
            break
        if sr_out and sr != sr_out:
            break
        sr_out = sr
        table = _l2_alloc_table(sr, bitrate // 1000 // nch)
        sblimit = len(table)
        body = _BitReader(
            payload,
            (pos + 4 + (2 if protection else 0)) * 8,
            end_bits=(pos + frame_len) * 8,
        )
        # 1. allocation codes, per subband per channel
        alloc = [[0] * nch for _ in range(sblimit)]
        for sb in range(sblimit):
            nbal = len(table[sb]).bit_length()
            for ch in range(nch):
                alloc[sb][ch] = body.read(nbal)
        # 2. scfsi per allocated (sb, ch)
        scfsi = [[0] * nch for _ in range(sblimit)]
        for sb in range(sblimit):
            for ch in range(nch):
                if alloc[sb][ch]:
                    scfsi[sb][ch] = body.read(2)
        # 3. scale factors (three 12-sample parts per frame)
        sf = [[(1.0, 1.0, 1.0)] * nch for _ in range(sblimit)]
        for sb in range(sblimit):
            for ch in range(nch):
                if not alloc[sb][ch]:
                    continue
                s = scfsi[sb][ch]
                if s == 0:
                    i0, i1, i2 = body.read(6), body.read(6), body.read(6)
                elif s == 1:
                    i0 = body.read(6)
                    i1, i2 = i0, body.read(6)
                elif s == 2:
                    i0 = body.read(6)
                    i1 = i2 = i0
                else:
                    i0, i1 = body.read(6), body.read(6)
                    i2 = i1
                sf[sb][ch] = (_L2_SF[min(i0, 62)], _L2_SF[min(i1, 62)],
                              _L2_SF[min(i2, 62)])
        # 4. 12 granules × 3 samples, grouped or ungrouped
        frame_s = np.zeros((36, 32, nch))
        for gr in range(12):
            for sb in range(sblimit):
                for ch in range(nch):
                    a = alloc[sb][ch]
                    if not a:
                        continue
                    n = table[sb][a - 1]
                    nb, C, D = _l2_requant_consts(n)
                    scale = sf[sb][ch][gr // 4]
                    if n in (3, 5, 9):
                        v = body.read({3: 5, 5: 7, 9: 10}[n])
                        codes = (v % n, (v // n) % n, v // (n * n))
                    else:
                        codes = (body.read(nb), body.read(nb), body.read(nb))
                    for t, c in enumerate(codes):
                        s2 = c / float(1 << (nb - 1)) - 1.0
                        frame_s[3 * gr + t, sb, ch] = C * (s2 + D) * scale
        subband_slots.append(frame_s.mean(axis=2))  # stereo → mono mix
        n_frames += 1
        pos += frame_len
    if not n_frames:
        raise UnsupportedMediaError("no Layer II frames")
    s_all = np.concatenate(subband_slots)
    y = _l2_synth_raw(s_all, bank["synthesis"], 1.0)
    d = bank["delay"]
    start = max(-d, 0)
    return sr_out, y[start:start + 32 * len(s_all)]


def encode_mp2(x: np.ndarray, sr: int = 48000, kbps: int = 192) -> bytes:
    """Conformant mono MPEG-1 Layer II encoder (fixture generator):
    fixed allocation (the richest menu entry ≤ 15 levels per subband),
    scfsi 0 (all three scale factors transmitted), correct grouped
    packing. The inverse of decode_mp2's requantization, so the
    round-trip measures filterbank + quantization error only."""
    if sr not in _MP3_RATES["1"]:
        raise UnsupportedMediaError(f"Layer II MPEG-1 rate {sr}")
    bank = _l2_bank()
    br_idx = _MP3_BITRATES[(1, 2)].index(kbps)
    table = _l2_alloc_table(sr, kbps)
    sblimit = len(table)
    frame_len = 144 * kbps * 1000 // sr
    # pad so every 1152-sample frame has its full analysis lookahead
    xp = np.concatenate([np.zeros(256), np.asarray(x, float), np.zeros(800)])
    s = _l2_analyze_raw(xp, bank["analysis"])  # (slots, 32)
    n_frames = max(len(s) // 36, 1)
    # zero-pad (NOT np.resize, whose cyclic repeat would fabricate
    # repeated audio content in sub-frame fixtures), truncate the tail
    # slots past the last whole frame
    need = n_frames * 36
    if len(s) < need:
        s = np.pad(s, ((0, need - len(s)), (0, 0)))
    else:
        s = s[:need]
    out = bytearray()
    # fixed allocation, richest tier set that fits the frame budget:
    # low subbands carry most signal energy, so they get the finest
    # quantizers the bitrate allows (tiers follow the B.2a structure)
    side_bits = 32 + sum(len(t).bit_length() for t in table) \
        + 2 * sblimit + 18 * sblimit
    budget = frame_len * 8 - side_bits

    def tier_of(sb: int) -> int:
        return 0 if sb < 3 else 1 if sb < 11 else 2 if sb < 23 else 3

    def cost(codes: list[int]) -> int:
        bits = 0
        for sb in range(sblimit):
            n = table[sb][codes[sb] - 1]
            bits += {3: 5, 5: 7, 9: 10}.get(n, 3 * n.bit_length())
        return 12 * bits

    alloc_code = None
    for prefs in ([1023, 255, 15, 5], [255, 63, 15, 5],
                  [63, 15, 15, 5], [15, 15, 15, 3], [9, 9, 5, 3],
                  [3, 3, 3, 3]):
        cand = []
        for sb in range(sblimit):
            menu = table[sb]
            want = max(
                (i for i, n in enumerate(menu) if n <= prefs[tier_of(sb)]),
                default=0,
            )
            cand.append(want + 1)
        if cost(cand) <= budget:
            alloc_code = cand
            break
    if alloc_code is None:
        raise UnsupportedMediaError(
            f"no Layer II allocation fits {kbps} kbps at {sr} Hz"
        )
    for f in range(n_frames):
        fs = s[f * 36:(f + 1) * 36]  # (36, 32)
        w = _BitWriter()
        h = (0x7FF << 21) | (3 << 19) | (2 << 17) | (1 << 16) \
            | (br_idx << 12) | (_MP3_RATES["1"].index(sr) << 10) | (3 << 6)
        w.write(h, 32)
        for sb in range(sblimit):
            w.write(alloc_code[sb], len(table[sb]).bit_length())
        for sb in range(sblimit):
            w.write(0, 2)  # scfsi 0
        sf_idx = np.zeros((sblimit, 3), dtype=int)
        for sb in range(sblimit):
            for part in range(3):
                mx = float(np.abs(fs[12 * part:12 * part + 12, sb]).max())
                idx = 62 if mx < 1e-9 else int(3.0 * np.log2(2.0 / mx))
                sf_idx[sb, part] = min(max(idx, 0), 62)
                w.write(sf_idx[sb, part], 6)
        for gr in range(12):
            for sb in range(sblimit):
                n = table[sb][alloc_code[sb] - 1]
                nb, C, D = _l2_requant_consts(n)
                scale = _L2_SF[sf_idx[sb, gr // 4]]
                codes = []
                for t in range(3):
                    y = fs[3 * gr + t, sb] / scale
                    c = round((y / C - D + 1.0) * (1 << (nb - 1)))
                    codes.append(min(max(c, 0), n - 1))
                if n in (3, 5, 9):
                    w.write(codes[0] + n * codes[1] + n * n * codes[2],
                            {3: 5, 5: 7, 9: 10}[n])
                else:
                    for c in codes:
                        w.write(c, nb)
        if len(w.bits) > frame_len * 8:
            raise UnsupportedMediaError(
                f"Layer II frame overflow: {len(w.bits)} bits > "
                f"{frame_len * 8} (pick a higher bitrate)"
            )
        out += w.tobytes(frame_len)
    return bytes(out)
