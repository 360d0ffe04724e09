"""Real-codec tests: PNG/BMP/PPM pixel recovery, WAV sample recovery,
resize, and the Spark pipeline running on genuine media payloads."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from tsp_spark.pipeline.codecs import (
    UnsupportedMediaError,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_png,
    image_features,
    mfcc_like,
    resize_nearest,
)

RNG = np.random.default_rng(20260813)


@pytest.mark.parametrize("shape", [(5, 7), (6, 4, 3), (3, 3, 4), (2, 2, 2)])
def test_png_roundtrip(shape):
    img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
    out = decode_png(encode_png(img))
    want = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, want)


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG forward filtering (the encoder side of spec §9) so the
    decoder's Sub/Up/Average/Paeth un-filtering is exercised for real."""
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int16)
    out = b""
    prev = np.zeros(stride, dtype=np.int16)
    for y, ft in zip(range(h), ftypes):
        cur = flat[y]
        if ft == 0:
            enc = cur
        elif ft == 1:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = (cur - left) & 0xFF
        elif ft == 2:
            enc = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate([np.zeros(c, np.int16), cur[:-c]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = cur.copy()
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (cur[i] - pred) & 0xFF
        out += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = cur
    return out


def test_png_all_filter_types():
    img = RNG.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    raw = _forward_filter(img, [0, 1, 2, 3, 4])

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(png), img)


def test_bmp_decode():
    img = RNG.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    stride = (3 * 3 + 3) & ~3  # 12 bytes: 9 data + 3 pad
    pixel_data = b""
    for y in range(1, -1, -1):  # bottom-up
        row = b"".join(bytes(img[y, x, ::-1]) for x in range(3))
        pixel_data += row.ljust(stride, b"\x00")
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    )
    assert np.array_equal(decode_bmp(header + pixel_data), img)


def test_ppm_decode():
    img = RNG.integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    payload = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)
    gray = RNG.integers(0, 256, size=(3, 2, 1), dtype=np.uint8)
    assert np.array_equal(decode_ppm(b"P5\n2 3\n255\n" + gray.tobytes()), gray)


def test_wav_roundtrip():
    sr = 8000
    t = np.arange(sr) / sr  # 1 second
    x = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    got_sr, got = decode_wav(buf.getvalue())
    assert got_sr == sr and got.size == sr
    assert np.allclose(got, x / 32768.0, atol=1e-4)
    coefs = mfcc_like(got, sr)
    assert len(coefs) == 13 and all(np.isfinite(coefs))


def test_unsupported_raises():
    with pytest.raises(UnsupportedMediaError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"not audio at all")


def test_resize_nearest_exact():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = resize_nearest(img, 2, 2)
    assert out[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_spark_pipeline_on_real_media(spark):
    """The mapInPandas pipeline extracts TRUE dimensions/rates from
    genuine payloads and re-encodes real resized PNGs."""
    from tsp_spark.pipeline.multimodal import (
        extract_audio_features,
        extract_image_features,
        resize_images,
    )

    img = RNG.integers(0, 256, size=(10, 20, 3), dtype=np.uint8)
    png = encode_png(img)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x01" * 2 * 4000)  # 4000 stereo frames
    wav = buf.getvalue()

    media = spark.createDataFrame(
        [(1, png), (2, wav), (3, b"opaque-jpeg-ish")], "media_id long, payload binary"
    )
    feats = {r["media_id"]: r for r in extract_image_features(media).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (20, 10)
    gray = img.astype(np.float32).mean(axis=2)
    assert feats[1]["features"][0] == pytest.approx(float(gray.mean()), rel=1e-5)

    audio = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    assert audio[2]["sample_rate"] == 16000
    assert audio[2]["duration_ms"] == 250  # 4000 frames @ 16 kHz

    resized = {r["media_id"]: r for r in resize_images(media, 8, 4).collect()}
    back = decode_png(bytes(resized[1]["payload"]))
    assert back.shape == (4, 8, 3)


def _truncate(payload: bytes, frac: float) -> bytes:
    return payload[: int(len(payload) * frac)]


def test_corrupt_payloads_degrade_not_crash():
    """A payload that matches a magic prefix but is corrupt mid-stream
    must surface as UnsupportedMediaError (so the pipeline's stub
    fallback engages), never as zlib/struct/Index/ValueError that would
    kill a whole Spark task."""
    img = RNG.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    png = encode_png(img)
    corrupt = [
        _truncate(png, 0.6),                      # truncated IDAT → zlib tail
        png[:20],                                 # header only
        b"P6\n5 5\n255\n\x00\x01",                # PPM body too short
        b"P6\n",                                  # PPM header cut mid-token
        b"P6\n999999 999999\n255\n" + b"\x00" * 10,  # implausible dims
        b"BM" + b"\x00" * 12,                     # BMP header too short
        b"BM" + b"\x00" * 60,                     # BMP zero dims
        _PNG_SIG_BAD_DIMS(),
    ]
    for payload in corrupt:
        with pytest.raises(UnsupportedMediaError):
            decode_image(payload)
    # corrupt WAV: RIFF header promising frames it doesn't have
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(np.zeros(64, dtype=np.int16).tobytes())
    wav = buf.getvalue()
    with pytest.raises(UnsupportedMediaError):
        decode_wav(wav[: len(wav) - 65])  # odd frame byte count


def _PNG_SIG_BAD_DIMS() -> bytes:
    """Valid PNG signature + IHDR claiming a 2-gigapixel image."""
    ihdr = struct.pack(">IIBBBBB", 50_000, 50_000, 8, 2, 0, 0, 0)
    body = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def test_corrupt_media_through_spark_pipeline(spark):
    """End-to-end: corrupt payloads flow through the mapInPandas feature
    extractor without failing the task — they take the deterministic
    stub path exactly like genuinely unsupported formats."""
    from tsp_spark.pipeline.multimodal import extract_image_features

    img = RNG.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    good = encode_png(img)
    rows = [
        (1, good),
        (2, _truncate(good, 0.5)),
        (3, b"P6\n4 4\n255\n\x00"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert len(out) == 4
    # row 1 really decoded: true 6x6 dimensions
    assert (out[1]["width"], out[1]["height"]) == (6, 6)
    # corrupt rows took the deterministic stub path (its dims start at
    # 16) instead of failing the task
    for mid in (2, 3, 4):
        assert out[mid]["width"] >= 16 and len(out[mid]["features"]) == 8


# ------------------------------------------------------------------ JPEG


def _smooth_rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(yy / 9.0) + 50 * np.cos(xx / 11.0)).clip(0, 255)
    img = np.stack([base, np.roll(base, 5, 0), np.roll(base, 9, 1)], axis=2)
    return (img + rng.normal(0, 2, img.shape)).clip(0, 255).astype(np.uint8)


def test_jpeg_roundtrip_real():
    """A REAL baseline JPEG round trip: our encoder's output is a
    spec-conformant JPEG (SOI/JFIF/DQT/SOF0/DHT/SOS/EOI), and the
    decoder recovers the image within normal codec tolerance."""
    from tsp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(40, 56)
    data = encode_jpeg(img, quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF" in data[:32]
    out = decode_jpeg(data)
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 4.0 and diff.max() <= 40

    # higher quality → closer reconstruction
    hi = decode_jpeg(encode_jpeg(img, quality=97))
    assert np.abs(hi.astype(int) - img.astype(int)).mean() <= diff.mean()


def test_jpeg_odd_dims_and_gray():
    from tsp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(23, 35, seed=11)  # non-multiple-of-8 dims
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (23, 35, 3)
    g = img[:, :, 0]
    out_g = decode_jpeg(encode_jpeg(g, quality=92))
    assert out_g.shape == (23, 35, 3)
    assert np.abs(out_g[:, :, 0].astype(int) - g.astype(int)).mean() < 4.0


def test_jpeg_through_decode_image_and_corrupt():
    from tsp_spark.pipeline.codecs import decode_image

    img = _smooth_rgb(16, 24, seed=3)
    from tsp_spark.pipeline.jpeg import encode_jpeg

    data = encode_jpeg(img, quality=90)
    fmt, out = decode_image(data)
    assert fmt == "jpeg" and out.shape == (16, 24, 3)
    # truncated scan → UnsupportedMediaError, not a raw crash
    with pytest.raises(UnsupportedMediaError):
        decode_image(data[: len(data) - 40])
    # SOF0 byte-flipped to SOF2: the scan header is then malformed
    # FOR a progressive frame (DC scan with Se=63) — rejected cleanly,
    # not a crash (real SOF2 decodes; see the progressive tests)
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(UnsupportedMediaError):
        decode_image(prog)


def test_jpeg_spark_pipeline(spark):
    """Real JPEG payloads through the Arrow mapInPandas extractor get
    REAL dimensions (not the stub's)."""
    from tsp_spark.pipeline.jpeg import encode_jpeg
    from tsp_spark.pipeline.multimodal import extract_image_features

    img = _smooth_rgb(12, 20, seed=5)
    rows = [(1, encode_jpeg(img, quality=90))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = extract_image_features(df).collect()[0]
    assert (out["width"], out["height"]) == (20, 12)


def _mp3_frame(bitrate_idx: int = 9, sr_idx: int = 0, padding: int = 0) -> bytes:
    """One MPEG-1 Layer III frame: real header + filler body sized per
    the spec (144·bitrate/samplerate + padding)."""
    h = (
        (0x7FF << 21) | (3 << 19) | (1 << 17)  # sync, MPEG-1, Layer III
        | (bitrate_idx << 12) | (sr_idx << 10) | (padding << 9)
    )
    bitrates = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    rates = (44100, 48000, 32000)
    n = 144 * bitrates[bitrate_idx] * 1000 // rates[sr_idx] + padding
    return h.to_bytes(4, "big") + b"\x55" * (n - 4)


def test_mp3_header_parse_real():
    """MP3 frame-header decode (r4 verdict item 8): CBR and VBR chains,
    ID3v2 skip, trailing-junk tolerance — rate/duration/bitrate real
    from headers alone."""
    from tsp_spark.pipeline.codecs import parse_mp3_headers

    # 10 CBR frames @128 kbps 44.1 kHz → 10×1152 samples ≈ 261 ms
    cbr = b"".join(_mp3_frame() for _ in range(10))
    sr, dur, kbps, n = parse_mp3_headers(cbr)
    assert (sr, n) == (44100, 10)
    assert dur == 10 * 1152 * 1000 // 44100
    assert kbps == 128

    # VBR: alternating 128/320 → average strictly between
    vbr = b"".join(_mp3_frame(9 if i % 2 else 14) for i in range(10))
    sr, _dur, kbps, n = parse_mp3_headers(vbr)
    assert (sr, n) == (44100, 10) and 128 < kbps < 320

    # ID3v2 prefix (syncsafe size) + chain + ID3v1 trailer ('TAG'…)
    id3 = b"ID3\x04\x00\x00\x00\x00\x01\x10" + b"\x00" * 0x90
    tagged = id3 + cbr + b"TAG" + b"\x00" * 125
    sr, dur2, _k, n = parse_mp3_headers(tagged)
    assert (sr, n) == (44100, 10) and dur2 == dur

    # padding bit changes frame length, chain still walks
    padded = b"".join(_mp3_frame(padding=i % 2) for i in range(6))
    assert parse_mp3_headers(padded)[3] == 6


def test_mp3_corrupt_degrades_and_feature_path(spark):
    """Corrupt MPEG payloads raise UnsupportedMediaError (stub path);
    the Spark audio feature extractor reports REAL rate/duration for
    MP3 while keeping the declared stub for spectral features."""
    import pytest as _pytest

    from tsp_spark.pipeline.codecs import UnsupportedMediaError, parse_mp3_headers
    from tsp_spark.pipeline.multimodal import extract_audio_features

    for bad in (
        b"",
        b"\xff\xfb",                      # truncated header
        b"\xff\xf9\x00\x00" + b"x" * 40,  # free-format bitrate
        b"\xff\xfb\xfc\x00" + b"x" * 40,  # bitrate index 15
        b"ID3\x04\x00\x00\x00\x00\xff\x10",  # corrupt syncsafe size
        b"not audio at all",
    ):
        with _pytest.raises(UnsupportedMediaError):
            parse_mp3_headers(bad)

    cbr = b"".join(_mp3_frame() for _ in range(10))
    df = spark.createDataFrame([(1, bytearray(cbr))], "media_id long, payload binary")
    out = extract_audio_features(df).collect()[0]
    assert out["sample_rate"] == 44100
    assert out["duration_ms"] == 10 * 1152 * 1000 // 44100
    assert len(out["mfcc"]) == 13


def test_jpeg_hostile_headers_degrade_not_crash():
    """r4 ADVICE: corrupt/crafted JPEG headers must degrade to
    UnsupportedMediaError like the other codecs — a 65535×65535 SOF0
    must not allocate 34 GB planes, and scans referencing unknown
    components or missing DQT/DHT tables must not escape as
    StopIteration/KeyError and kill the task."""
    from tsp_spark.pipeline.codecs import decode_image
    from tsp_spark.pipeline.jpeg import encode_jpeg

    data = bytearray(encode_jpeg(_smooth_rgb(16, 16, seed=7), quality=90))
    sof = data.index(b"\xff\xc0")  # …len(2) depth(1) h(2) w(2) nc(1) comps…
    sos = data.index(b"\xff\xda")  # …len(2) ns(1) (cs, tables)…

    def patched(offset: int, value: bytes) -> bytes:
        out = bytearray(data)
        out[offset : offset + len(value)] = value
        return bytes(out)

    hostile = [
        patched(sof + 5, b"\xff\xff\xff\xff"),  # 65535×65535 dims
        patched(sof + 5, b"\x00\x00"),          # zero height
        patched(sof + 11, b"\x55"),             # sampling factors 5×5
        patched(sof + 12, b"\x07"),             # comp 0 → missing DQT 7
        patched(sos + 5, b"\x09"),              # scan → unknown comp id 9
        patched(sos + 6, b"\x77"),              # scan → missing DHT 7/7
    ]
    for payload in hostile:
        with pytest.raises(UnsupportedMediaError):
            decode_image(payload)


def test_jpeg_restart_markers():
    """DRI/RSTn round trip: restart markers every 4 MCUs with DC
    predictor resets — the decoder's restart path produces the same
    image as the unrestarted encoding."""
    from tsp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(32, 48, seed=13)
    plain = encode_jpeg(img, quality=90)
    with_rst = encode_jpeg(img, quality=90, restart_interval=4)
    assert b"\xff\xdd" in with_rst and b"\xff\xd0" in with_rst
    assert np.array_equal(decode_jpeg(with_rst), decode_jpeg(plain))


def test_jpeg_420_subsampling():
    """4:2:0 chroma subsampling (the real-world default): 16x16 MCUs,
    four Y blocks per MCU, 2x2 chroma upsampling in the decoder."""
    from tsp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    img = _smooth_rgb(40, 56, seed=21)
    data = encode_jpeg(img, quality=92, subsampling="420")
    out = decode_jpeg(data)
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    # chroma is pooled 2x2 so tolerance is wider than 4:4:4, but luma
    # structure must survive
    assert diff.mean() < 6.0 and diff.max() <= 60
    # odd dims exercise the partial-MCU crop
    odd = _smooth_rgb(19, 27, seed=22)
    out_odd = decode_jpeg(encode_jpeg(odd, quality=92, subsampling="420"))
    assert out_odd.shape == (19, 27, 3)
    # restarts compose with subsampling
    both = encode_jpeg(img, quality=92, subsampling="420", restart_interval=2)
    assert np.array_equal(decode_jpeg(both), out)


def test_jpeg_property_roundtrip():
    """Property sweep: random smooth images of random shapes round-trip
    within codec tolerance at several qualities and subsamplings."""
    from tsp_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(20260813)
    for _ in range(6):
        h = int(rng.integers(8, 49))
        w = int(rng.integers(8, 49))
        img = _smooth_rgb(h, w, seed=int(rng.integers(0, 1 << 30)))
        quality = int(rng.choice([75, 85, 95]))
        sub = str(rng.choice(["444", "420"]))
        out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
        assert out.shape == (h, w, 3)
        diff = np.abs(out.astype(int) - img.astype(int))
        assert diff.mean() < 8.0, (h, w, quality, sub, diff.mean())


def test_avi_mjpeg_roundtrip():
    """Real RIFF/AVI container: write MJPEG AVI, parse headers back,
    decode frames within JPEG tolerance."""
    from tsp_spark.pipeline.codecs import (
        UnsupportedMediaError,
        decode_avi_frames,
        encode_avi_mjpeg,
        parse_avi_headers,
    )

    frames = [_smooth_rgb(16, 24, seed=s) for s in (1, 2, 3)]
    avi = encode_avi_mjpeg(frames, fps=12, quality=92)
    meta = parse_avi_headers(avi)
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["n_frames"] == 3
    assert meta["fourcc"] == "MJPG"
    assert meta["fps_milli"] == 12_000
    m2, dec = decode_avi_frames(avi)
    assert len(dec) == 3
    for orig, got in zip(frames, dec):
        assert got.shape == orig.shape
        assert np.abs(got.astype(int) - orig.astype(int)).mean() < 8.0
    # max_frames caps the decode work
    _, first = decode_avi_frames(avi, max_frames=1)
    assert len(first) == 1
    import pytest

    # corrupt/truncated payloads degrade, never crash
    with pytest.raises(UnsupportedMediaError):
        parse_avi_headers(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(UnsupportedMediaError):
        parse_avi_headers(avi[:30])
    # a chunk size overrunning its parent must be caught
    bad = bytearray(avi)
    bad[16:20] = (0x7FFFFFFF).to_bytes(4, "little")
    with pytest.raises(UnsupportedMediaError):
        parse_avi_headers(bytes(bad))
    # non-MJPEG fourcc: metadata parses, frame decode refuses
    other = avi.replace(b"MJPG", b"H264")
    assert parse_avi_headers(other)["fourcc"] == "H264"
    with pytest.raises(UnsupportedMediaError):
        decode_avi_frames(other)


def test_avi_property_roundtrip():
    """Property sweep: random frame counts, shapes, fps and qualities
    round-trip through the AVI writer/parser with per-frame JPEG
    tolerance."""
    from tsp_spark.pipeline.codecs import (
        decode_avi_frames,
        encode_avi_mjpeg,
        parse_avi_headers,
    )

    rng = np.random.default_rng(20260814)
    for _ in range(4):
        n = int(rng.integers(1, 6))
        h = int(rng.integers(8, 33))
        w = int(rng.integers(8, 33))
        fps = int(rng.choice([5, 12, 24, 30]))
        q = int(rng.choice([80, 90, 95]))
        frames = [
            _smooth_rgb(h, w, seed=int(rng.integers(0, 1 << 30)))
            for _ in range(n)
        ]
        avi = encode_avi_mjpeg(frames, fps=fps, quality=q)
        meta = parse_avi_headers(avi)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (w, h, n)
        assert meta["fps_milli"] == fps * 1000
        _, dec = decode_avi_frames(avi)
        assert len(dec) == n
        for orig, got in zip(frames, dec):
            assert got.shape == orig.shape
            assert np.abs(got.astype(int) - orig.astype(int)).mean() < 9.0


def test_jpeg_progressive_matches_baseline_exactly():
    """r6: progressive (SOF2) decode for real. The progressive encoder
    carries EXACTLY the quantized coefficients the baseline encoder
    does (shared _quantize_comps), so after the full 10-scan script —
    spectral selection + successive approximation + EOB runs — the
    decoded pixels must be BIT-IDENTICAL to the baseline decode."""
    import numpy as np

    from tsp_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for seed, (h, w), sub, q in [
        (5, (40, 56), "444", 90),
        (11, (23, 35), "444", 92),  # odd dims
        (3, (34, 50), "420", 85),   # subsampled, multi-block MCUs
        (7, (64, 64), "444", 97),
    ]:
        img = _smooth_rgb(h, w, seed=seed)
        base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
        prog_bytes = encode_jpeg_progressive(img, quality=q, subsampling=sub)
        assert b"\xff\xc2" in prog_bytes[:1000]  # SOF2
        prog = decode_jpeg(prog_bytes)
        assert prog.shape == base.shape
        assert np.array_equal(prog, base), (
            f"seed={seed} {h}x{w} {sub} q{q}: "
            f"{np.abs(prog.astype(int) - base.astype(int)).max()} max diff"
        )


def test_jpeg_progressive_noise_stress():
    """High-frequency noise exercises every refinement path: dense AC
    bands, long zero runs, ZRL-in-refinement, EOB runs with buffered
    correction bits."""
    import numpy as np

    from tsp_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (48, 40, 3), dtype=np.uint8)
    for q in (50, 90):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert np.array_equal(prog, base)


def test_jpeg_progressive_through_decode_image():
    """codecs.decode_image must route SOF2 through the real decoder
    (not the stub fallback)."""
    from tsp_spark.pipeline.codecs import decode_image
    from tsp_spark.pipeline.jpeg import encode_jpeg_progressive

    img = _smooth_rgb(16, 24, seed=9)
    fmt, arr = decode_image(encode_jpeg_progressive(img, quality=90))
    assert fmt == "jpeg"
    assert arr.shape == (16, 24, 3)


def test_jpeg_progressive_noninterleaved_dc_scans():
    """Per-component (non-interleaved) DC scans walk the component's
    own ceil(dim/8) grid, NOT the padded MCU grid (T.81 A.2.2/A.2.3 —
    review-caught: the padded-grid walk desyncs on conformant files
    where the two differ, e.g. 4:2:0 luma with height 24 → nb 3 rows
    vs padded 4)."""
    import numpy as np

    from tsp_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    scans = [
        ((0,), 0, 0, 0, 1),  # per-component DC scans
        ((1,), 0, 0, 0, 1),
        ((2,), 0, 0, 0, 1),
        ((0,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
        ((0,), 0, 0, 1, 0),  # per-component DC refinement
        ((1,), 0, 0, 1, 0),
        ((2,), 0, 0, 1, 0),
    ]
    for (h, w), sub in [((24, 40), "420"), ((23, 35), "444"), ((34, 50), "420")]:
        img = _smooth_rgb(h, w, seed=13)
        base = decode_jpeg(encode_jpeg(img, quality=88, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=88, subsampling=sub, scans=scans)
        )
        assert np.array_equal(prog, base), (h, w, sub)


def test_jpeg_fill_bytes_before_markers():
    """Review-caught: T.81 B.1.1.2 allows any number of 0xFF fill
    bytes before a marker code; conformant files using them desynced
    the marker walk and fell to the stub. Insert fill bytes before the
    EOI, before a mid-stream SOS (progressive), and before the SOF of
    a baseline file — the decode must stay bit-identical."""
    import numpy as np

    from tsp_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    img = _smooth_rgb(24, 32, seed=9)

    for enc in (
        lambda: encode_jpeg(img, quality=90),
        lambda: encode_jpeg_progressive(img, quality=90),
    ):
        data = enc()
        ref = decode_jpeg(data)

        # fill byte before EOI
        assert data.endswith(b"\xff\xd9")
        v1 = data[:-2] + b"\xff\xff\xd9"
        assert np.array_equal(decode_jpeg(v1), ref)

        # fill bytes before the LAST SOS in the stream (for the
        # progressive file that's a mid-stream scan header reached by
        # _next_marker after entropy data)
        sos = data.rfind(b"\xff\xda")
        assert sos > 0
        v2 = data[:sos] + b"\xff\xff" + data[sos:]
        assert np.array_equal(decode_jpeg(v2), ref)

        # fill byte before an early header marker (walked by the main
        # marker loop before any entropy data)
        sof = max(data.find(b"\xff\xc0"), data.find(b"\xff\xc2"))
        assert sof > 0
        v3 = data[:sof] + b"\xff" + data[sof:]
        assert np.array_equal(decode_jpeg(v3), ref)


def test_png_zip_bomb_rejected_bounded():
    """r6d (review-caught): a 1×1 header with an oversized IDAT must be
    rejected WITHOUT materializing the full inflate output."""
    import struct
    import zlib

    import pytest

    from tsp_spark.pipeline.codecs import (
        UnsupportedMediaError,
        _PNG_SIG,
        decode_png,
    )

    def chunk(ctype, data):
        body = ctype + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)  # 1x1 gray
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 MB declared, tiny wire
    png = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedMediaError, match="longer than declared"):
        decode_png(png)


def test_avi_rec_list_and_corrupt_frame():
    """r6d (review-caught): frames inside LIST 'rec ' groupings decode
    (conformant interleaved AVIs); a corrupt MJPEG frame degrades to
    UnsupportedMediaError instead of killing the task."""
    import struct

    import numpy as np
    import pytest

    from tsp_spark.pipeline.codecs import (
        UnsupportedMediaError,
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    frame = (np.arange(64, dtype=np.uint8).reshape(8, 8) % 256)
    avi = encode_avi_mjpeg([np.stack([frame] * 3, axis=-1)] * 2, fps=10)
    # rewrap the movi frames inside a LIST 'rec ' grouping
    i = avi.index(b"movi") - 8  # the movi LIST header
    (movi_size,) = struct.unpack("<I", avi[i + 4 : i + 8])
    assert avi[i + 8 : i + 12] == b"movi"
    inner = avi[i + 12 : i + 8 + movi_size]
    rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    new_movi_body = b"movi" + rec
    rebuilt = (
        avi[: i + 4]
        + struct.pack("<I", len(new_movi_body))
        + new_movi_body
        + avi[i + 8 + movi_size :]
    )
    rebuilt = rebuilt[:4] + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    meta, frames = decode_avi_frames(rebuilt)
    assert len(frames) == 2  # rec-wrapped frames found
    # corrupt one frame: truncated SOF segment -> struct.error inside
    # jpeg.py must surface as UnsupportedMediaError
    j = avi.index(b"\xff\xd8")
    corrupt = avi[:j] + b"\xff\xd8\xff\xc0\x00\x05\x08" + avi[j + 7 :]
    with pytest.raises(UnsupportedMediaError):
        decode_avi_frames(corrupt)


def test_mp3_id3v24_footer_skipped():
    """r6d (review-caught): an ID3v2.4 tag with the footer flag adds 10
    bytes — the frame scan must not land on the footer."""
    from tsp_spark.pipeline.codecs import parse_mp3_headers

    # one MPEG-1 Layer III frame @ 128 kbps, 44100 Hz
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    frame = hdr + b"\x00" * (144 * 128000 // 44100 - 4)
    tag_body = b"\x00" * 20
    # ID3v2.4, footer flag (0x10) set, syncsafe size 20
    tag = (
        b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, 20])
        + tag_body + b"3DI" + b"\x00" * 7
    )
    sr, dur, kbps, n = parse_mp3_headers(tag + frame)
    assert (sr, n) == (44100, 1) and kbps == 128


# ------------------------------------------------------- MPEG-1 Layer II


def _align_snr(x, y, max_lag=600):
    """Best SNR(dB) of y against x over integer lags (the codec's
    filterbank has a fixed group delay the tests don't hardcode)."""
    import numpy as np

    n = min(len(x), len(y))
    best = -1e9
    for lag in range(-max_lag, max_lag + 1):
        xs = x[max(0, -lag):n - max(0, lag)]
        ys = y[max(0, lag):n - max(0, -lag)]
        m = min(len(xs), len(ys))
        if m < 6000:
            continue
        xs, ys = xs[2000:m - 2000], ys[2000:m - 2000]
        e = xs - ys
        best = max(
            best,
            10 * np.log10(float(xs @ xs) / max(float(e @ e), 1e-12)),
        )
    return best


def test_mp2_roundtrip_tones():
    """Full encode→bitstream→decode: a three-tone mix must survive the
    Layer II path well above the quantizer floor (35 dB at 192 kbps,
    53 dB measured at 320), and the existing header walker must agree
    with the encoder's framing."""
    import numpy as np

    from tsp_spark.pipeline.codecs import (
        decode_mp2, encode_mp2, parse_mp3_headers,
    )

    sr = 48000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1870 * t)
         + 0.1 * np.sin(2 * np.pi * 6500 * t))
    buf = encode_mp2(x, sr, 192)
    assert buf[0] == 0xFF and (buf[1] & 0xFE) == 0xFC  # MPEG-1 L2 sync
    hsr, dur_ms, kbps, n_frames = parse_mp3_headers(buf)
    assert (hsr, kbps) == (48000, 192)
    assert n_frames == len(buf) // (144 * 192000 // sr)
    sr2, y = decode_mp2(buf)
    assert sr2 == sr
    assert _align_snr(x, y) > 30.0
    # richer allocation at 320 kbps must measurably improve fidelity
    buf320 = encode_mp2(x, sr, 320)
    _, y320 = decode_mp2(buf320)
    assert _align_snr(x, y320) > 45.0


def test_mp2_sf_parts_and_grouped_codes():
    """An amplitude-modulated band-limited signal exercises per-part
    scale factors (three parts per frame) and the grouped 3/5/9-level
    codes in the high subbands; the decode must track the envelope."""
    import numpy as np

    from tsp_spark.pipeline.codecs import decode_mp2, encode_mp2

    sr = 32000
    t = np.arange(2 * sr) / sr
    env = 0.1 + 0.8 * (0.5 + 0.5 * np.sin(2 * np.pi * 2.0 * t))
    x = env * np.sin(2 * np.pi * 700 * t)
    buf = encode_mp2(x, sr, 192)
    sr2, y = decode_mp2(buf)
    assert sr2 == sr
    assert _align_snr(x, y) > 25.0


def test_mp2_id3_skip_and_honest_failures():
    """ID3v2-prefixed Layer II decodes; joint stereo / MPEG-2 / junk
    raise UnsupportedMediaError (the stub fallback boundary)."""
    import numpy as np
    import pytest

    from tsp_spark.pipeline.codecs import (
        UnsupportedMediaError, decode_mp2, encode_mp2,
    )

    sr = 48000
    t = np.arange(sr // 2) / sr
    x = 0.4 * np.sin(2 * np.pi * 440 * t)
    buf = encode_mp2(x, sr, 192)
    id3 = b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, 10]) + b"\x00" * 10
    sr2, y = decode_mp2(id3 + buf)
    assert sr2 == sr and len(y) > 0
    with pytest.raises(UnsupportedMediaError):
        decode_mp2(b"not audio at all")
    # flip the mode bits of the first frame to joint stereo (01)
    joint = bytearray(buf)
    joint[3] = (joint[3] & 0x3F) | 0x40
    with pytest.raises(UnsupportedMediaError):
        decode_mp2(bytes(joint))
    # MPEG-2 version bits → not MPEG-1 Layer II
    v2 = bytearray(buf)
    v2[1] = v2[1] & ~0x08
    with pytest.raises(UnsupportedMediaError):
        decode_mp2(bytes(v2))


def test_mp2_multimodal_audio_path():
    """_decode_audio_any must route a Layer II payload through the
    REAL synthesis (duration from decoded samples, MFCC from real
    spectra — NOT the byte-arithmetic stub)."""
    import numpy as np

    from tsp_spark.pipeline.codecs import encode_mp2, mfcc_like, decode_mp2
    from tsp_spark.pipeline.multimodal import (
        _decode_audio_any, _fake_decode_audio,
    )

    sr = 48000
    t = np.arange(sr) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    buf = encode_mp2(x, sr, 192)
    got_sr, got_dur, got_mfcc = _decode_audio_any(buf)
    assert got_sr == sr
    assert abs(got_dur - 1000) < 100
    want = mfcc_like(decode_mp2(buf)[1], sr)
    assert np.allclose(got_mfcc, want)
    assert got_mfcc != _fake_decode_audio(buf)[2]


def test_mp2_overallocating_frame_degrades_not_crashes():
    """Hostile Layer II frame: the header passes the frame-length
    check but the 4-bit allocation codes demand more bits than the
    96-byte frame holds. Must raise UnsupportedMediaError (the
    multimodal fallback contract), never IndexError (which would kill
    the Spark task)."""
    import pytest

    from tsp_spark.pipeline.codecs import UnsupportedMediaError, decode_mp2

    payload = bytes([0xFF, 0xFD, 0x14, 0xC0]) + b"\xFF" * 92
    with pytest.raises(UnsupportedMediaError):
        decode_mp2(payload)
