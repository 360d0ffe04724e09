"""Baseline-sequential + progressive JPEG codec in pure stdlib + numpy.

A REAL decoder for the dominant interchange format: marker parse → DQT/
DHT/SOF0/SOS → Huffman-decoded MCUs (with restart-marker support) →
dequantize → zigzag → 8×8 IDCT → chroma upsample → YCbCr→RGB. Follows
ITU-T T.81 (the public JPEG spec); the Huffman/quantization tables the
encoder emits are the spec's own Annex K examples.

Progressive DCT (SOF2, r6) decodes for real too: multi-scan
coefficient accumulation with spectral selection (Ss/Se bands),
successive approximation (Ah/Al bit-plane refinement for DC and AC,
T.81 G.1.2 / the libjpeg reference algorithms), and EOB-run codes
(EOBn) spanning blocks. Reconstruction is shared with the baseline
path, so a progressive and a baseline encoding of the same quantized
coefficients decode to IDENTICAL pixels — pinned by test_codecs.

Scope (raised as ``UnsupportedMediaError`` otherwise, so the multimodal
pipeline's declared stub fallback engages): Huffman 8-bit DCT only —
no arithmetic coding, hierarchical (SOF5-7/13-15), or 12-bit depth.
That covers the overwhelming majority of real-world JPEGs.

The encoders exist so tests can round-trip on genuine JPEGs without
shipping binary fixtures: baseline (4:4:4 or 4:2:0, quality-scaled
Annex K tables) and progressive (libjpeg's standard 10-scan script,
incl. AC successive approximation with buffered correction bits) —
any conformant decoder reads their output.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from tsp_spark.pipeline.codecs import _MAX_PIXELS


class UnsupportedJpegError(ValueError):
    """Not a baseline JPEG this codec decodes (re-raised by codecs.py
    as UnsupportedMediaError)."""


# zigzag scan order: index i of the scan → position in the 8×8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (luminance, chrominance), zigzag order
_STD_LUMA_Q = np.array(
    [
        16, 11, 12, 14, 12, 10, 16, 14, 13, 14, 18, 17, 16, 19, 24, 40,
        26, 24, 22, 22, 24, 49, 35, 37, 29, 40, 58, 51, 61, 60, 57, 51,
        56, 55, 64, 72, 92, 78, 64, 68, 87, 69, 55, 56, 80, 109, 81, 87,
        95, 98, 103, 104, 103, 62, 77, 113, 121, 112, 100, 120, 92, 101,
        103, 99,
    ],
    dtype=np.int64,
)
_STD_CHROMA_Q = np.array(
    [
        17, 18, 18, 24, 21, 24, 47, 26, 26, 47, 99, 66, 56, 66, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K Huffman table specs: (bits[1..16], values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _idct_basis() -> np.ndarray:
    t = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            t[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16)
    return t


_T = _idct_basis()  # spatial = T.T @ coefs @ T; coefs = T @ spatial @ T.T


def _build_huff(bits, values):
    """(code_length → {code: symbol}) per the spec's canonical ordering."""
    table: dict[int, dict[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        table[length] = {}
        for _ in range(bits[length - 1]):
            table[length][code] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_sizes_codes(bits, values):
    """symbol → (size, code) for the encoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers;
    ``restart()`` consumes an RSTn marker and realigns."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise UnsupportedJpegError("truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise UnsupportedJpegError("hit restart marker mid-symbol")
            else:
                # EOI or other marker: pad with 1-bits per the spec
                self.buf = (self.buf << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self):
        """Byte-align and consume an RSTn marker."""
        self.buf, self.n = 0, 0
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):  # fill bytes are legal before RSTn too (T.81 B.1.1.2)
            self.pos += 1
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise UnsupportedJpegError("expected restart marker")

    def decode_symbol(self, table) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table[length].get(code)
            if sym is not None:
                return sym
        raise UnsupportedJpegError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Sign-extend a magnitude-category value (spec F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (or (h, w, 1) grayscale)."""
    if payload[:2] != b"\xff\xd8":
        raise UnsupportedJpegError("not a JPEG (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    prog_state = None  # per-component coefficient planes across scans
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise UnsupportedJpegError("marker expected")
        # Any number of 0xFF fill bytes may precede the marker code
        # (T.81 B.1.1.2) — conformant encoders pad with them.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if prog_state is not None:
                return _reconstruct_progressive(frame, qt, prog_state)
            break
        if pos + 2 > len(payload):
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise UnsupportedJpegError("16-bit quant tables")
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                values = list(seg[p + 17 : p + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, values)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            depth, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if depth != 8:
                raise UnsupportedJpegError("only 8-bit depth")
            # a corrupt header must not OOM an executor (same rule as
            # codecs._check_dims): bound the pixel count BEFORE any
            # plane allocation, and the sampling factors to T.81's 1..4
            # so the MCU grid stays within a constant factor of w×h
            if h <= 0 or w <= 0 or h * w > _MAX_PIXELS:
                raise UnsupportedJpegError(f"implausible dimensions {w}x{h}")
            if nc not in (1, 3):
                raise UnsupportedJpegError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0xF
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise UnsupportedJpegError(
                        f"sampling factors {ch}x{cv} out of range"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedJpegError(
                "only baseline (SOF0) / progressive (SOF2) Huffman DCT"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise UnsupportedJpegError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise UnsupportedJpegError(
                        f"scan references unknown component id {cs}"
                    )
                scan.append((comp, tables >> 4, tables & 0xF))
            data_pos = pos + seglen
            if not frame["progressive"]:
                return _decode_scan(
                    payload, data_pos, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if prog_state is None:
                prog_state = _init_progressive(frame)
            pos = _decode_progressive_scan(
                payload, data_pos, frame, scan, huff_dc, huff_ac,
                restart_interval, prog_state, ss, se, ahal >> 4, ahal & 0xF,
            )
            continue
        pos += seglen
    raise UnsupportedJpegError("no scan data")


def _decode_scan(payload, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    h, w = frame["h"], frame["w"]
    # validate table references once up front: a KeyError mid-MCU would
    # escape decode_image's corrupt-payload handler and kill the task
    for comp, td, ta in scan:
        if comp["tq"] not in qt:
            raise UnsupportedJpegError(f"missing quant table {comp['tq']}")
        if td not in huff_dc or ta not in huff_ac:
            raise UnsupportedJpegError(f"missing Huffman table {td}/{ta}")
    comps = [c for c, _, _ in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcy * c["v"] * 8, mcx * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    reader = _BitReader(payload, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.restart()
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, (comp, td, ta) in enumerate(scan):
                q = qt[comp["tq"]]
                for v in range(comp["v"]):
                    for hh in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(huff_dc[td])
                        diff = _extend(reader.bits(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ta])
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise UnsupportedJpegError("AC index overflow")
                            zz[k] = _extend(reader.bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = (zz * q).astype(np.float64)
                        spatial = _T.T @ block.reshape(8, 8) @ _T + 128.0
                        y0 = (my * comp["v"] + v) * 8
                        x0 = (mx * comp["h"] + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
    return _finish_planes(frame, comps, planes)


def _finish_planes(frame, comps, planes):
    """Spatial planes → upsample to full resolution, crop, YCbCr→RGB."""
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# --------------------------------------------------- progressive (SOF2)


def _grids(frame):
    """(mcx, mcy, per-comp full padded block grid, per-comp
    non-interleaved block grid). Interleaved scans cover the padded
    MCU grid; single-component scans cover only ceil(comp_dim/8)
    blocks (T.81 A.2.2/A.2.3)."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    full = [(mcy * c["v"], mcx * c["h"]) for c in comps]
    nb = [
        (
            -(-(-(-h * c["v"] // vmax)) // 8),
            -(-(-(-w * c["h"] // hmax)) // 8),
        )
        for c in comps
    ]
    return mcx, mcy, full, nb


def _init_progressive(frame):
    """Per-component coefficient store (padded grid, natural block
    order, zigzag index within block) accumulated across scans."""
    _, _, full, _ = _grids(frame)
    return {
        "coef": [
            np.zeros((bh, bw, 64), dtype=np.int64) for bh, bw in full
        ],
    }


def _decode_progressive_scan(
    payload, pos, frame, scan, huff_dc, huff_ac, dri, state, ss, se, ah, al
):
    """One progressive SOS: mutate ``state['coef']`` per T.81 G.1.2
    (the libjpeg decode_mcu_{DC,AC}_{first,refine} algorithms), return
    the byte offset of the next marker."""
    comps = frame["comps"]
    cidx = {id(c): i for i, c in enumerate(comps)}
    mcx, mcy, full, nb = _grids(frame)
    reader = _BitReader(payload, pos)
    coef = state["coef"]

    if ss == 0:
        # DC scan (se must be 0). Interleaved over the MCU grid when
        # ns > 1; a SINGLE-component DC scan is non-interleaved and
        # covers only the component's own ceil(dim/8) grid (T.81
        # A.2.2/A.2.3 — same rule as AC scans; padded MCU-grid blocks
        # exist only in interleaved scans).
        if se != 0:
            raise UnsupportedJpegError("DC scan with Se != 0")
        for comp, td, _ta in scan:
            if ah == 0 and td not in huff_dc:
                raise UnsupportedJpegError(f"missing DC table {td}")
        pred = [0] * len(scan)

        def dc_block(si, ci, by, bx):
            c = coef[ci][by, bx]
            if ah == 0:
                s = reader.decode_symbol(huff_dc[scan[si][1]])
                pred[si] += _extend(reader.bits(s), s)
                c[0] = pred[si] << al
            elif reader.bit():
                c[0] |= 1 << al

        n_unit = 0
        if len(scan) > 1:
            for my in range(mcy):
                for mx in range(mcx):
                    if dri and n_unit and n_unit % dri == 0:
                        reader.restart()
                        pred = [0] * len(scan)
                    n_unit += 1
                    for si, (comp, _td, _ta) in enumerate(scan):
                        ci = cidx[id(comp)]
                        for v in range(comp["v"]):
                            for hh in range(comp["h"]):
                                dc_block(
                                    si, ci,
                                    my * comp["v"] + v, mx * comp["h"] + hh,
                                )
        else:
            comp = scan[0][0]
            ci = cidx[id(comp)]
            bh, bw = nb[ci]
            for by in range(bh):
                for bx in range(bw):
                    if dri and n_unit and n_unit % dri == 0:
                        reader.restart()
                        pred = [0]
                    n_unit += 1
                    dc_block(0, ci, by, bx)
        return _next_marker(payload, reader.pos)

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise UnsupportedJpegError("interleaved AC progressive scan")
    comp, _td, ta = scan[0]
    if ta not in huff_ac:
        raise UnsupportedJpegError(f"missing AC table {ta}")
    table = huff_ac[ta]
    ci = cidx[id(comp)]
    bh, bw = nb[ci]
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    n_unit = 0
    for by in range(bh):
        for bx in range(bw):
            if dri and n_unit and n_unit % dri == 0:
                reader.restart()
                eobrun = 0
            n_unit += 1
            c = coef[ci][by, bx]
            if ah == 0:
                # first pass over this band (G.1.2.2)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(table)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise UnsupportedJpegError("AC index overflow")
                    c[k] = _extend(reader.bits(s), s) << al
                    k += 1
            else:
                # refinement pass (G.1.2.3): correction bits for
                # already-nonzero coefficients, ±1<<al for newly
                # significant ones, EOB runs count the current block
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_symbol(table)
                        r, s = rs >> 4, rs & 0xF
                        val = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            # ZRL: advance over 16 zero-history coefs
                        else:
                            if s != 1:
                                raise UnsupportedJpegError(
                                    "refinement size != 1"
                                )
                            val = p1 if reader.bit() else m1
                        while k <= se:
                            if c[k] != 0:
                                if reader.bit() and not (c[k] & p1):
                                    c[k] += p1 if c[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            c[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if c[k] != 0 and reader.bit() and not (c[k] & p1):
                            c[k] += p1 if c[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return _next_marker(payload, reader.pos)


def _next_marker(payload, pos):
    """Skip to the next non-RST, non-stuffed marker after entropy
    data (the scan decoder may stop with buffered pad bits)."""
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0xFF:  # T.81 B.1.1.2 fill byte before a marker
                pos += 1
                continue
            if nxt != 0x00 and not (0xD0 <= nxt <= 0xD7):
                return pos
        pos += 1
    return len(payload)


def _reconstruct_progressive(frame, qt, state):
    """All scans consumed: dequantize, de-zigzag, IDCT per block."""
    comps = frame["comps"]
    _, _, full, _ = _grids(frame)
    planes = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise UnsupportedJpegError(f"missing quant table {c['tq']}")
        q = qt[c["tq"]]
        bh, bw = full[ci]
        coefs = state["coef"][ci] * q  # (bh, bw, 64) zigzag
        blocks = np.zeros((bh, bw, 64), dtype=np.float64)
        blocks[:, :, _ZIGZAG] = coefs.astype(np.float64)
        # batched IDCT: (bh, bw, 8, 8) = T.T @ B @ T per block
        b8 = blocks.reshape(bh, bw, 8, 8)
        spatial = np.einsum("ij,xyjk,kl->xyil", _T.T, b8, _T) + 128.0
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        planes.append(plane)
    return _finish_planes(frame, comps, planes)


# -------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.buf = (self.buf << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        """Pad the final partial byte with 1-bits (spec F.1.2.3)."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)


def _scale_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _quantize_comps(img, quality, subsampling):
    """Shared front half of both encoders: color convert, pad to the
    MCU grid, subsample chroma, forward-DCT and quantize every block.
    Returns (h, w, hv, (qly, qlc), coefs) with coefs[ci] of shape
    (bh, bw, 64) in zigzag order over the PADDED block grid — so a
    baseline and a progressive encoding of the same image carry
    IDENTICAL coefficients and decode to identical pixels."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    x = img.astype(np.float64)
    y = 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]
    cb = -0.168736 * x[:, :, 0] - 0.331264 * x[:, :, 1] + 0.5 * x[:, :, 2] + 128
    cr = 0.5 * x[:, :, 0] - 0.418688 * x[:, :, 1] - 0.081312 * x[:, :, 2] + 128
    planes = [y, cb, cr]
    qly = _scale_q(_STD_LUMA_Q, quality)
    qlc = _scale_q(_STD_CHROMA_Q, quality)
    qtabs = [qly, qlc, qlc]
    hv = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [(1, 1)] * 3
    hmax = max(h_ for h_, _ in hv)
    vmax = max(v_ for _, v_ in hv)
    mw, mh = 8 * hmax, 8 * vmax
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw
    padded_full = [
        np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") for p in planes
    ]
    coefs = []
    for ci, ((hi, vi), p) in enumerate(zip(hv, padded_full)):
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:  # chroma: 2×2 average pooling
            p = p.reshape(ph // ry, ry, pw // rx, rx).mean(axis=(1, 3))
        bh, bw = p.shape[0] // 8, p.shape[1] // 8
        qm = np.zeros(64, dtype=np.int64)
        qm[_ZIGZAG] = qtabs[ci]
        qm8 = qm.reshape(8, 8)
        b8 = p.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
        dct = np.einsum("ij,xyjk,kl->xyil", _T, b8, _T.T)
        qz = np.round(dct / qm8).astype(np.int64).reshape(bh, bw, 64)
        coefs.append(qz[:, :, _ZIGZAG])
    return h, w, hv, (qly, qlc), coefs


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → baseline JPEG (Annex K Huffman
    tables, quality-scaled Annex K quant tables).
    ``subsampling`` '444' (no chroma subsampling) or '420' (2×2-pooled
    chroma, 16×16 MCUs — the real-world default, and the decoder's
    multi-block-MCU + upsampling path). ``restart_interval`` > 0 emits
    a DRI segment and RSTn markers every N MCUs with DC-predictor
    resets — the error-resilience feature real encoders use."""
    h, w, hv, (qly, qlc), coefs = _quantize_comps(img, quality, subsampling)
    dc_enc = [_huff_sizes_codes(*_DC_LUMA), _huff_sizes_codes(*_DC_CHROMA)]
    ac_enc = [_huff_sizes_codes(*_AC_LUMA), _huff_sizes_codes(*_AC_CHROMA)]
    hmax = max(h_ for h_, _ in hv)
    vmax = max(v_ for _, v_ in hv)
    writer = _BitWriter()
    pred = [0, 0, 0]

    def write_block(ci: int, zz: np.ndarray) -> None:
        ti = 0 if ci == 0 else 1
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        length, code = dc_enc[ti][s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = last_nz[-1] + 1 if len(last_nz) else 0
        for k in range(1, 64):
            v = int(zz[k])
            if k > last:
                length, code = ac_enc[ti][0x00]  # EOB
                writer.write(code, length)
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                length, code = ac_enc[ti][0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            s = _category(v)
            length, code = ac_enc[ti][(run << 4) | s]
            writer.write(code, length)
            writer.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0

    n_mcu = 0
    rst = 0
    mcy = coefs[0].shape[0] // hv[0][1]
    mcx = coefs[0].shape[1] // hv[0][0]
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0, 0, 0]
            n_mcu += 1
            for ci in range(3):
                hi, vi = hv[ci]
                for v_ in range(vi):
                    for h_ in range(hi):
                        write_block(
                            ci, coefs[ci][my * vi + v_, mx * hi + h_]
                        )
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qly), (1, qlc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in q
        )
    out += b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x03"
    for (hi, vi), cid, tq in zip(hv, (1, 2, 3), (0, 1, 1)):
        out += bytes([cid, (hi << 4) | vi, tq])
    for tc, th, (bits, values) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(values)
        ) + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">H", 12) + b"\x03"
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder

# One flat AC table for progressive scans: every (run, size) symbol the
# scans can emit — EOBn (n ≤ 14), ZRL, and sizes 1..14 — at a fixed
# code length of 8 (240 codes < 255, so the all-ones code stays
# unused as the spec requires). Annex K's AC tables lack the EOBn
# symbols, so progressive needs its own.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(15)],
)

# libjpeg's standard 10-scan progressive script: DC first (Al=1), luma
# low band, chroma full bands, luma high band, luma AC refinement,
# DC refinement, then final AC refinements to full precision.
_PROG_SCANS = [
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
]


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    scans: list | None = None,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 → progressive JPEG (SOF2) carrying
    EXACTLY the coefficients `encode_jpeg` would — spectral selection
    + successive approximation over libjpeg's standard scan script
    (T.81 G.1.2 encoder procedures, incl. EOB-run accumulation and
    buffered correction bits in refinement scans). Any conformant
    decoder reconstructs the identical image."""
    h, w, hv, (qly, qlc), coefs = _quantize_comps(img, quality, subsampling)
    frame = {
        "h": h, "w": w,
        "comps": [{"h": hi, "v": vi} for hi, vi in hv],
    }
    mcx, mcy, full, nb = _grids(frame)
    dc_enc = [_huff_sizes_codes(*_DC_LUMA), _huff_sizes_codes(*_DC_CHROMA)]
    ac_enc = _huff_sizes_codes(*_AC_PROG)

    def scan_bytes(comp_ids, ss, se, ah, al) -> bytes:
        wtr = _BitWriter()
        if ss == 0:
            pred = {ci: 0 for ci in comp_ids}

            def dc_unit(ci, by, bx):
                c = int(coefs[ci][by, bx, 0])
                if ah == 0:
                    vd = c >> al  # arithmetic shift (T.81 G.1.2.1)
                    diff = vd - pred[ci]
                    pred[ci] = vd
                    s = _category(diff)
                    ti = 0 if ci == 0 else 1
                    length, code = dc_enc[ti][s]
                    wtr.write(code, length)
                    if s:
                        wtr.write(
                            diff if diff >= 0 else diff + (1 << s) - 1, s
                        )
                else:
                    wtr.write((c >> al) & 1, 1)

            if len(comp_ids) > 1:
                for my in range(mcy):
                    for mx in range(mcx):
                        for ci in comp_ids:
                            hi, vi = hv[ci]
                            for v_ in range(vi):
                                for h_ in range(hi):
                                    dc_unit(
                                        ci, my * vi + v_, mx * hi + h_
                                    )
            else:
                # non-interleaved: the component's own grid, like AC
                # scans (T.81 A.2.2/A.2.3)
                ci = comp_ids[0]
                bh, bw = nb[ci]
                for by in range(bh):
                    for bx in range(bw):
                        dc_unit(ci, by, bx)
            wtr.flush()
            return bytes(wtr.out)

        # AC scan: one component over its non-interleaved grid
        ci = comp_ids[0]
        bh, bw = nb[ci]
        eobrun = 0
        pending: list[int] = []

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                n = eobrun.bit_length() - 1
                length, code = ac_enc[n << 4]
                wtr.write(code, length)
                if n:
                    wtr.write(eobrun - (1 << n), n)
                eobrun = 0
            for b in pending:
                wtr.write(b, 1)
            pending.clear()

        for by in range(bh):
            for bx in range(bw):
                zz = coefs[ci][by, bx]
                if ah == 0:
                    # first pass over this band (G.1.2.2): point
                    # transform is a magnitude shift, sign preserved
                    vals = [
                        (1 if int(zz[k]) >= 0 else -1)
                        * (abs(int(zz[k])) >> al)
                        for k in range(ss, se + 1)
                    ]
                    nz = [i for i, v in enumerate(vals) if v]
                    if not nz:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    for i in range(nz[-1] + 1):
                        v = vals[i]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            length, code = ac_enc[0xF0]
                            wtr.write(code, length)
                            run -= 16
                        s = _category(v)
                        length, code = ac_enc[(run << 4) | s]
                        wtr.write(code, length)
                        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if nz[-1] < se - ss:
                        eobrun += 1
                else:
                    # refinement pass (G.1.2.3): temp = |coef| >> al;
                    # 1 → newly significant (emit run + sign), > 1 →
                    # already significant (buffered correction bit)
                    temps = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
                    new = [i for i, t in enumerate(temps) if t == 1]
                    if not new:
                        pending.extend(t & 1 for t in temps if t > 1)
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
                        continue
                    flush_eob()
                    run = 0
                    br: list[int] = []
                    for i in range(new[-1] + 1):
                        t = temps[i]
                        if t == 0:
                            run += 1
                            continue
                        # ZRL check at EVERY nonzero coefficient (t > 1
                        # included) — a correction bit beyond the ZRL's
                        # 16-zero window belongs to the NEXT symbol's
                        # buffer, not this ZRL's (the libjpeg
                        # encode_mcu_AC_refine loop structure)
                        while run > 15:
                            length, code = ac_enc[0xF0]
                            wtr.write(code, length)
                            for b in br:
                                wtr.write(b, 1)
                            br = []
                            run -= 16
                        if t > 1:
                            br.append(t & 1)
                            continue
                        length, code = ac_enc[(run << 4) | 1]
                        wtr.write(code, length)
                        wtr.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
                        for b in br:
                            wtr.write(b, 1)
                        br = []
                        run = 0
                    if new[-1] < se - ss:
                        eobrun += 1
                        pending.extend(
                            temps[i] & 1
                            for i in range(new[-1] + 1, len(temps))
                            if temps[i] > 1
                        )
        flush_eob()
        wtr.flush()
        return bytes(wtr.out)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, q in ((0, qly), (1, qlc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in q
        )
    out += b"\xff\xc2" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", h, w
    ) + b"\x03"
    for (hi, vi), cid, tq in zip(hv, (1, 2, 3), (0, 1, 1)):
        out += bytes([cid, (hi << 4) | vi, tq])
    for tc, th, (bits, values) in (
        (0, 0, _DC_LUMA), (0, 1, _DC_CHROMA), (1, 0, _AC_PROG)
    ):
        out += b"\xff\xc4" + struct.pack(
            ">H", 19 + len(values)
        ) + bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    for comp_ids, ss, se, ah, al in (scans or _PROG_SCANS):
        out += b"\xff\xda" + struct.pack(">H", 6 + 2 * len(comp_ids))
        out += bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            out += bytes([ci + 1, (td << 4) | 0])
        out += bytes([ss, se, (ah << 4) | al])
        out += scan_bytes(comp_ids, ss, se, ah, al)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
