"""Baseline JPEG decoder (pure Python + NumPy, no dependencies).

Completes the vendored-stb read surface (SURVEY.md §2.2 #12:
stb_image.h decodes JPEG alongside PNG/BMP/TGA/PNM — the reference
enables it via SystemIncludes.h:3-5 even though main.cu only ever
loads PNGs).  Scope mirrors stb's common path: baseline sequential
DCT (SOF0/SOF1), 8-bit samples, grayscale or YCbCr with any h/v
sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0, 4:1:1), restart
markers.  Progressive (SOF2) and arithmetic coding raise
NotImplementedError.

Decoding choices match libjpeg's defaults closely but not bitwise
(the JPEG spec does not mandate an exact IDCT): float orthonormal
IDCT and triangle ("fancy") chroma upsampling — measured within ±2
of PIL/libjpeg-turbo on photographic content (tests/test_jpeg.py).
"""

from __future__ import annotations

import struct

import numpy as np

# natural order index for each zigzag position
_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], np.int32)

# orthonormal 8-point DCT-II basis: B[k, n] = c(k) cos((2n+1)kπ/16)
_B = np.array([[np.cos((2 * n + 1) * k * np.pi / 16)
                * (np.sqrt(0.125) if k == 0 else 0.5)
                for n in range(8)] for k in range(8)])


class _Huff:
    """Canonical JPEG Huffman table → (length, code) → symbol map."""

    def __init__(self, counts, symbols):
        self.map = {}
        code = 0
        it = iter(symbols)
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                self.map[(ln, code)] = next(it)
                code += 1
            code <<= 1
        self.max_len = max((l for l, _ in self.map), default=0)


class _Bits:
    """MSB-first bit reader over a stuffing-stripped entropy segment."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        p = self.pos
        if p + n > len(self.bits):
            raise ValueError("JPEG entropy stream truncated")
        self.pos = p + n
        v = 0
        for b in self.bits[p : p + n]:
            v = (v << 1) | int(b)
        return v

    def huff(self, table: _Huff) -> int:
        code = 0
        p = self.pos
        bits = self.bits
        n = len(bits)
        for ln in range(1, table.max_len + 1):
            if p >= n:
                raise ValueError("JPEG entropy stream truncated")
            code = (code << 1) | int(bits[p])
            p += 1
            sym = table.map.get((ln, code))
            if sym is not None:
                self.pos = p
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if s and v < (1 << (s - 1)) else v


def _upsample_triangle(c: np.ndarray, fh: int, fv: int,
                       h: int, w: int) -> np.ndarray:
    """libjpeg's "fancy" (triangle-filter) upsampling for factor-2 axes
    (out[2i] = (3·c[i] + c[i-1] + 2) >> 2, edges replicated); other
    factors use sample replication like stb."""
    def up2(a, axis):
        a = np.moveaxis(a, axis, 0).astype(np.int32)
        prev = np.concatenate([a[:1], a[:-1]], 0)
        nxt = np.concatenate([a[1:], a[-1:]], 0)
        even = (3 * a + prev + 2) >> 2
        odd = (3 * a + nxt + 1) >> 2
        out = np.empty((2 * a.shape[0],) + a.shape[1:], np.int32)
        out[0::2] = even
        out[1::2] = odd
        return np.moveaxis(out, 0, axis)

    out = c.astype(np.int32)
    f = fv
    while f > 1:
        out = up2(out, 0) if f % 2 == 0 else np.repeat(out, f, 0)
        f = f // 2 if f % 2 == 0 else 1
    f = fh
    while f > 1:
        out = up2(out, 1) if f % 2 == 0 else np.repeat(out, f, 1)
        f = f // 2 if f % 2 == 0 else 1
    return out[:h, :w]


def read_jpeg(path: str) -> np.ndarray:
    """Decode a baseline JPEG → uint8 (H, W) grayscale or (H, W, 3)
    RGB (JFIF YCbCr conversion)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] != b"\xff\xd8":
        raise ValueError(f"{path}: not a JPEG (no SOI marker)")

    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None
    restart = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"{path}: bad JPEG marker sync at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:   # EOI
            break
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:   # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    vals = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                q = np.zeros(64, np.int32)
                q[_ZIGZAG] = vals
                qt[tq] = q.reshape(8, 8)
        elif marker in (0xC0, 0xC1):   # SOF0/1 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{path}: {prec}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError(f"{path}: progressive JPEG")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"{path}: JPEG SOF{marker - 0xC0} coding unsupported")
        elif marker == 0xC4:   # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                table = _Huff(counts, list(seg[p + 17 : p + 17 + n]))
                (huff_ac if tc else huff_dc)[th] = table
                p += 17 + n
        elif marker == 0xDD:   # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:   # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError(f"{path}: JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            ecs_start = pos + seg_len
            return _decode_scan(path, data, ecs_start, frame, scan,
                                qt, huff_dc, huff_ac, restart)
        pos += seg_len
    raise ValueError(f"{path}: JPEG has no scan data")


def _decode_scan(path, data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart):
    H, W, comps = frame
    if H == 0 or W == 0:
        raise ValueError(f"{path}: bad JPEG dimensions {W}x{H}")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy

    # split the entropy stream into restart segments, stripping 0xFF00
    segments = []
    seg = bytearray()
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                seg.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:   # RSTn
                segments.append(bytes(seg))
                seg = bytearray()
                i += 2
                continue
            break                     # EOI or next marker
        seg.append(b)
        i += 1
    segments.append(bytes(seg))

    by_id = {c[0]: c for c in comps}
    scan_comps = []
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"{path}: scan references unknown component {cs}")
        _, fh, fv, tq = by_id[cs]
        if td not in huff_dc or ta not in huff_ac or tq not in qt:
            raise ValueError(f"{path}: missing JPEG table")
        scan_comps.append((cs, fh, fv, qt[tq], huff_dc[td], huff_ac[ta]))

    # coefficient planes per component, in blocks
    planes = {cs: np.zeros((mcuy * fv * 8, mcux * fh * 8), np.float64)
              for cs, fh, fv, _, _, _ in scan_comps}

    interval = restart if restart else n_mcu
    mcu = 0
    for seg_bytes in segments:
        if mcu >= n_mcu:
            break
        bits = _Bits(seg_bytes)
        preds = {cs: 0 for cs, *_ in scan_comps}
        for _ in range(min(interval, n_mcu - mcu)):
            my, mx = divmod(mcu, mcux)
            for cs, fh, fv, q, hdc, hac in scan_comps:
                for by in range(fv):
                    for bx in range(fh):
                        coef = np.zeros(64, np.int32)
                        s = bits.huff(hdc)
                        preds[cs] += _extend(bits.get(s), s)
                        coef[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = bits.huff(hac)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r != 15:
                                    break
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError(
                                    f"{path}: JPEG AC index overflow")
                            coef[_ZIGZAG[k]] = _extend(bits.get(s), s)
                            k += 1
                        block = coef.reshape(8, 8) * q
                        spatial = _B.T @ block @ _B + 128.0
                        y0 = (my * fv + by) * 8
                        x0 = (mx * fh + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu += 1
    if mcu < n_mcu:
        raise ValueError(f"{path}: JPEG truncated at MCU {mcu}/{n_mcu}")

    out = []
    for cs, fh, fv, _, _, _ in scan_comps:
        p = np.clip(np.round(planes[cs]), 0, 255)
        out.append(_upsample_triangle(p, hmax // fh, vmax // fv, H, W))
    if len(out) == 1:
        return out[0].astype(np.uint8)
    if len(out) != 3:
        raise NotImplementedError(
            f"{path}: {len(out)}-component JPEG unsupported")
    y, cb, cr = (o.astype(np.float64) for o in out)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], -1)), 0, 255).astype(np.uint8)
