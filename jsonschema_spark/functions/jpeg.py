"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) encode + decode in pure
numpy + stdlib — no codec library.

Scope: baseline sequential DCT (SOF0, grayscale AND color with any
sampling factors — luma retained) and PROGRESSIVE DCT (SOF2, full
Annex G: spectral selection, successive approximation, EOB runs,
refinement correction bits). Arithmetic-coded and 12-bit streams still
raise ``NotImplementedError`` (decode_image's loud stub path).
Quantization and Huffman tables are the public Annex K examples; the
progressive AC table (EOBn codes) is a flat custom table carried in
DHT like any other.

This is container/codec plumbing, not a performance kernel: decoding is
a per-image Python bit loop, executed inside the usual Arrow-batched
``mapInPandas`` iteration like every other decoder here. The synthetic
ledger corpora use small frames; a production deployment swaps in
libjpeg-turbo behind the same function boundary.

Public-knowledge sources: the T.81 spec's Annex K tables and the
standard JPEG bitstream layout (SOI/DQT/DHT/SOF0/SOS/EOI markers, DC
prediction, zig-zag order, byte stuffing).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Annex K tables (public spec examples)
# ---------------------------------------------------------------------------

# K.1 luminance quantization table (natural row-major order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

# zig-zag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_Z = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]
ZIG_ROWS = np.array([r for r, _ in _Z])
ZIG_COLS = np.array([c for _, c in _Z])

# K.3.1 luminance DC Huffman table: BITS (codes per length 1..16) + values
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# K.3.3 chrominance DC Huffman table — used as DC table 1 (Td=1) by the
# progressive color encoder, mirroring libjpeg's default scan script; a
# decoder that shares one DC table across the interleaved DC scan
# misparses exactly this layout
CHROMA_DC_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
CHROMA_DC_VALS = list(range(12))
# K.3.2 luminance AC Huffman table
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
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
]


def _build_codes(bits, vals):
    """(value -> (code, length)) canonical Huffman assignment."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes

_DC_ENC = _build_codes(DC_BITS, DC_VALS)
_CHROMA_DC_ENC = _build_codes(CHROMA_DC_BITS, CHROMA_DC_VALS)
_AC_ENC = _build_codes(AC_BITS, AC_VALS)


def _build_decoder(bits, vals):
    """(code, length) -> value map for decoding."""
    enc = _build_codes(bits, vals)
    return {(c, ln): v for v, (c, ln) in enc.items()}

_DC_DEC = _build_decoder(DC_BITS, DC_VALS)
_AC_DEC = _build_decoder(AC_BITS, AC_VALS)

# DCT basis (exact same float64 matrix for encode and decode)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16.0)
_ALPHA = np.full(8, np.sqrt(2.0 / 8.0))
_ALPHA[0] = np.sqrt(1.0 / 8.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    # separable 2-D DCT-II: A @ block @ A.T where A[u,x] = alpha_u*cos(...)
    a = _ALPHA[:, None] * _C
    return a @ block @ a.T


def _idct(coef: np.ndarray) -> np.ndarray:
    a = _ALPHA[:, None] * _C
    return a.T @ coef @ a


def scaled_quant(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K table (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (QUANT_LUMA * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)

    def marker(self, m: int) -> None:
        """Byte-align (1-fill, stuffed if it lands on 0xFF) then emit a
        raw marker — the RSTn path."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, m])


def _magnitude(v: int) -> tuple[int, int]:
    """(category, code bits) for a DC/AC value per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_gray(
    px: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """Encode a (h, w) uint8 array as a baseline grayscale JPEG.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (error-resilience structure real encoders produce — exercised
    so the decoder's restart path is tested against our own output)."""
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    h, w = px.shape
    quant = scaled_quant(quality)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]

    bw_writer = _BitWriter()
    prev_dc = 0
    mcu = 0
    n_rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw_writer.marker(0xD0 + (n_rst % 8))
                n_rst += 1
                prev_dc = 0
            mcu += 1
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _fdct(block)
            q = np.round(coef / quant).astype(np.int64)
            zz = q[ZIG_ROWS, ZIG_COLS]
            # DC
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            cat, bits = _magnitude(diff)
            code, ln = _DC_ENC[cat]
            bw_writer.write(code, ln)
            if cat:
                bw_writer.write(bits, cat)
            # AC with run-lengths
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = _AC_ENC[0xF0]  # ZRL
                    bw_writer.write(code, ln)
                    run -= 16
                cat, bits = _magnitude(v)
                code, ln = _AC_ENC[(run << 4) | cat]
                bw_writer.write(code, ln)
                bw_writer.write(bits, cat)
                run = 0
            if last_nz < 63:
                code, ln = _AC_ENC[0x00]  # EOB
                bw_writer.write(code, ln)
    scan = bw_writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_quant = quant[ZIG_ROWS, ZIG_COLS].astype(np.uint8).tobytes()
    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xDB, b"\x00" + zz_quant))  # DQT, table 0, 8-bit
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0])))  # SOF0: 1 component, 1x1, q0
    out.append(seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)))
    out.append(seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))  # DRI
    out.append(seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])))  # SOS
    out.append(scan)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker reached — behave as end of data
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read(1)
            v = table.get((code, ln))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")

    def restart(self) -> None:
        """Consume an RSTn marker at a restart boundary. Any buffered
        bits are the last byte's 1-fill padding plus the 0xFF pads the
        marker guard injected (_fill never crosses a marker), so they
        are discarded wholesale."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return
        raise ValueError("expected restart marker")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _decode_block(reader: "_BitReader", dc_tab, ac_tab, qtab, pred: int):
    """One entropy-coded 8x8 block -> (spatial block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    cat = reader.huff(dc_tab)
    pred += _extend(reader.read(cat), cat)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = reader.huff(ac_tab)
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        run, cat = rs >> 4, rs & 0xF
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.read(cat), cat)
        k += 1
    coef = np.zeros((8, 8), dtype=np.float64)
    coef[ZIG_ROWS, ZIG_COLS] = zz
    return _idct(coef * qtab) + 128.0, pred


def decode_jpeg_gray(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline sequential (SOF0) JPEG -> (width, height, uint8
    LUMA pixels). Grayscale AND color streams are supported (any
    sampling factors, interleaved MCUs, restart intervals); chroma
    blocks are entropy-decoded and discarded — this engine's image
    features are luma-based. Progressive / arithmetic / 12-bit streams
    raise NotImplementedError; malformed data raises ValueError."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    dc_tabs, ac_tabs = {}, {}
    h = w = None
    comps = None  # [(cid, hi, vi, tq)]
    scan = None  # [(comp_index, td, ta)]
    scan_start = None
    restart_interval = 0
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (ln,) = struct.unpack(">H", raw[pos : pos + 2])
        body = raw[pos + 2 : pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                tbl = np.zeros((8, 8), dtype=np.int32)
                tbl[ZIG_ROWS, ZIG_COLS] = t
                quant[tq] = tbl
                i += 65
        elif marker == 0xC2:
            # progressive stream: restart under the Annex G decoder
            return decode_jpeg_progressive(raw)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and progressive (SOF2) JPEG are "
                "supported"
            )
        elif marker == 0xC0:
            prec, hh, ww, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            h, w = hh, ww
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                tq = body[8 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad sampling factors")
                comps.append((cid, hi, vi, tq))
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                tab = _build_decoder(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + nv
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            if ns != len(comps):
                raise NotImplementedError("non-interleaved multi-scan")
            scan = []
            for si in range(ns):
                cs = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                idx = next(
                    (k for k, c in enumerate(comps) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError("scan references unknown component")
                scan.append((idx, tt >> 4, tt & 0xF))
            scan_start = pos + ln
            break
        pos += ln
    if scan_start is None or h is None:
        raise ValueError("missing SOS/SOF0")

    if len(scan) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit and the declared sampling factors only
        # matter relative to other components (there are none)
        ci = scan[0][0]
        cid, _, _, tq = comps[ci]
        comps = [(cid, 1, 1, tq)]
        scan = [(0, scan[0][1], scan[0][2])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # luma = first scan component's underlying SOF component
    luma_idx = scan[0][0]
    _, lh, lv, _ = comps[luma_idx]
    luma = np.zeros((mcuy * lv * 8, mcux * lh * 8), dtype=np.float64)

    reader = _BitReader(raw[scan_start:])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                preds = [0] * len(comps)
            for (ci, td, ta) in scan:
                _, hi, vi, tq = comps[ci]
                for vy in range(vi):
                    for vx in range(hi):
                        block, preds[ci] = _decode_block(
                            reader, dc_tabs[td], ac_tabs[ta],
                            quant[tq], preds[ci],
                        )
                        if ci == luma_idx:
                            y0 = (my * vi + vy) * 8
                            x0 = (mx * hi + vx) * 8
                            luma[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # component-resolution crop, then nearest upsample if luma was
    # subsampled relative to the frame (rare but legal)
    ch = -(-h * lv // vmax)
    cw = -(-w * lh // hmax)
    plane = luma[:ch, :cw]
    if (ch, cw) != (h, w):
        yi = (np.arange(h) * ch // h).clip(0, ch - 1)
        xi = (np.arange(w) * cw // w).clip(0, cw - 1)
        plane = plane[np.ix_(yi, xi)]
    px = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return w, h, px


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> float64 YCbCr (JFIF full-range, Rec.601)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _encode_block(bw_writer: "_BitWriter", block: np.ndarray,
                  quant: np.ndarray, pred: int) -> int:
    """Entropy-encode one 8x8 spatial block; returns the new DC pred."""
    q = np.round(_fdct(block - 128.0) / quant).astype(np.int64)
    zz = q[ZIG_ROWS, ZIG_COLS]
    diff = int(zz[0]) - pred
    cat, bits = _magnitude(diff)
    code, ln = _DC_ENC[cat]
    bw_writer.write(code, ln)
    if cat:
        bw_writer.write(bits, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]
            bw_writer.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = _AC_ENC[(run << 4) | cat]
        bw_writer.write(code, ln)
        bw_writer.write(bits, cat)
        run = 0
    if run:  # trailing zeros -> EOB (replaces any pending ZRLs)
        code, ln = _AC_ENC[0x00]
        bw_writer.write(code, ln)
    return int(zz[0])


def _pad_plane(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    out = np.empty((ph, pw), dtype=np.float64)
    h, w = p.shape
    out[:h, :w] = p
    out[h:, :w] = p[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg_color(
    rgb: np.ndarray, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline COLOR JPEG — YCbCr with
    4:4:4 or 4:2:0 chroma subsampling (the layout virtually every
    real-world color JPEG uses), interleaved MCUs, one quant + one
    Huffman table pair shared by all components (legal and simplest).
    4:2:0 chroma planes are 2x2 box means."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = rgb.shape[:2]
    ycc = rgb_to_ycbcr(rgb)
    quant = scaled_quant(quality)

    if subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        chroma = [ycc[..., 1], ycc[..., 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        # 2x2 box-mean chroma at half resolution (pad odd dims first)
        he, we = h + (h & 1), w + (w & 1)
        full = _pad_plane(ycc[..., 1], he, we), _pad_plane(ycc[..., 2], he, we)
        chroma = [
            (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
            / 4.0
            for p in full
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for ci, (hi, vi) in enumerate(samp):
        src = ycc[..., 0] if ci == 0 else chroma[ci - 1]
        planes.append(_pad_plane(src, mcuy * vi * 8, mcux * hi * 8))

    bw_writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (hi, vi) in enumerate(samp):
                for vy in range(vi):
                    for vx in range(hi):
                        y0 = (my * vi + vy) * 8
                        x0 = (mx * hi + vx) * 8
                        preds[ci] = _encode_block(
                            bw_writer,
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8],
                            quant,
                            preds[ci],
                        )
    scan = bw_writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_quant = quant[ZIG_ROWS, ZIG_COLS].astype(np.uint8).tobytes()
    sof_comps = b"".join(
        bytes([cid, (samp[i][0] << 4) | samp[i][1], 0])
        for i, cid in enumerate((1, 2, 3))
    )
    sos_comps = b"".join(bytes([cid, 0x00]) for cid in (1, 2, 3))
    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + zz_quant))
    out.append(seg(0xC0, struct.pack(">BHHB", 8, h, w, 3) + sof_comps))
    out.append(seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)))
    out.append(seg(0xC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS)))
    out.append(seg(0xDA, bytes([3]) + sos_comps + bytes([0, 63, 0])))
    out.append(scan)
    out.append(b"\xff\xd9")
    return b"".join(out)


# ---------------------------------------------------------------------------
# Progressive DCT (SOF2, T.81 Annex G) — VERDICT r2 item 5
# ---------------------------------------------------------------------------
# Most real web JPEGs are progressive. Spectral selection splits the
# zig-zag band across scans; successive approximation sends high bits
# first (point transform Al) and refines one bit per scan. The encoder
# below produces a libjpeg-shaped scan script over our own quantized
# coefficients (so progressive encode -> decode is bit-identical to the
# baseline decode of the same pixels — the ledger property), and the
# decoder implements the full Annex G coefficient-refinement control
# flow (EOB runs, ZRL-in-refinement, correction bits).
#
# Progressive AC scans need EOBn run codes (RS = n<<4), which the Annex
# K baseline AC table does not contain — a custom table with every
# (run, size) symbol at a flat 8-bit length is emitted in DHT (176
# symbols, Kraft 176/256 < 1, canonical codes; decoders rebuild it from
# the segment like any other table).

PROG_AC_VALS = [(r << 4) | c for r in range(16) for c in range(11)]
PROG_AC_BITS = [0] * 7 + [len(PROG_AC_VALS)] + [0] * 8
_PROG_AC_ENC = _build_codes(PROG_AC_BITS, PROG_AC_VALS)

#: default scan script (grayscale): DC first at Al=1, AC bands at Al=2,
#: two AC refinement passes, DC refinement — the classic libjpeg shape.
PROG_SCANS_GRAY = (
    (0, 0, 0, 1),
    (1, 5, 0, 2),
    (6, 63, 0, 2),
    (1, 63, 2, 1),
    (1, 63, 1, 0),
    (0, 0, 1, 0),
)


def _ac_point(v: int, al: int) -> int:
    """AC point transform: magnitude shift TOWARD ZERO (G.1.2.1; DC
    uses plain arithmetic shift instead)."""
    return -((-v) >> al) if v < 0 else v >> al


class _ProgACWriter:
    """AC-scan emitter with the Annex G EOB-run machinery shared by
    first and refinement scans."""

    def __init__(self, bw: "_BitWriter"):
        self.bw = bw
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eob(self) -> None:
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            code, ln = _PROG_AC_ENC[n << 4]
            self.bw.write(code, ln)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []

    def bump_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _encode_ac_first(zz_blocks, ss, se, al, w: "_ProgACWriter") -> None:
    for zz in zz_blocks:
        band = [_ac_point(int(zz[k]), al) for k in range(ss, se + 1)]
        if not any(band):
            w.bump_eob()
            continue
        w.flush_eob()
        run = 0
        last_nz = max(i for i, v in enumerate(band) if v)
        for i, v in enumerate(band):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = _PROG_AC_ENC[0xF0]
                w.bw.write(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = _PROG_AC_ENC[(run << 4) | cat]
            w.bw.write(code, ln)
            w.bw.write(bits, cat)
            run = 0
        if last_nz < se - ss:
            w.bump_eob()


def _encode_ac_refine(zz_blocks, ss, se, al, w: "_ProgACWriter") -> None:
    """One refinement scan (G.1.2.3): newly-nonzero coefficients carry
    a sign bit; previously-nonzero ones a correction bit, buffered and
    emitted after the next symbol (the standard encode_mcu_AC_refine
    control flow: the ZRL check runs BEFORE buffering each correction
    bit — with the ``i <= eob`` guard — which is what keeps every
    buffered bit's position inside the span its symbol covers)."""
    for zz in zz_blocks:
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        signs = [1 if int(zz[k]) >= 0 else -1 for k in range(ss, se + 1)]
        eob = -1  # index of the LAST newly-nonzero coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, a in enumerate(absv):
            if a == 0:
                run += 1
                continue
            # past-EOB runs fold into the EOB run, never ZRL
            while run > 15 and i <= eob:
                w.flush_eob()
                code, ln = _PROG_AC_ENC[0xF0]
                w.bw.write(code, ln)
                run -= 16
                for b in br:
                    w.bw.write(b, 1)
                br = []
            if a > 1:
                # history coefficient: correction bit, run unbroken
                br.append(a & 1)
                continue
            # newly-nonzero (magnitude exactly 1 at this precision)
            w.flush_eob()
            code, ln = _PROG_AC_ENC[(run << 4) | 1]
            w.bw.write(code, ln)
            w.bw.write(1 if signs[i] > 0 else 0, 1)
            for b in br:
                w.bw.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            w.pending_bits.extend(br)
            w.bump_eob()


def encode_jpeg_progressive_gray(
    px: np.ndarray, quality: int = 85, scans=PROG_SCANS_GRAY
) -> bytes:
    """Encode a (h, w) uint8 array as a PROGRESSIVE grayscale JPEG
    (SOF2) under the given scan script. Quantized coefficients are
    identical to encode_jpeg_gray's, so decoding this stream yields
    bit-identical pixels to decoding the baseline stream."""
    if px.ndim != 2:
        raise ValueError("expected a 2-D grayscale array")
    h, w = px.shape
    quant = scaled_quant(quality)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]
    padded[:, w:] = padded[:, w - 1 : w]
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            q = np.round(_fdct(blk) / quant).astype(np.int64)
            blocks.append(q[ZIG_ROWS, ZIG_COLS])

    # validate the script: every (coefficient, bit) exactly once
    seen_dc_first = False
    for ss, se, ah, al in scans:
        if ss == 0 and se != 0:
            raise ValueError("DC and AC may not share a scan (G.1.1.1)")
        if ss == 0 and ah == 0:
            seen_dc_first = True
    if not seen_dc_first:
        raise ValueError("scan script missing the first DC scan")

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_quant = quant[ZIG_ROWS, ZIG_COLS].astype(np.uint8).tobytes()
    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + zz_quant))
    out.append(seg(0xC2, struct.pack(">BHHB", 8, h, w, 1)
                   + bytes([1, 0x11, 0])))  # SOF2
    out.append(seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)))
    out.append(
        seg(0xC4, b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))
    )
    for ss, se, ah, al in scans:
        bw_writer = _BitWriter()
        if ss == 0:
            if ah == 0:  # DC first
                pred = 0
                for zz in blocks:
                    v = int(zz[0]) >> al
                    cat, bits = _magnitude(v - pred)
                    pred = v
                    code, ln = _DC_ENC[cat]
                    bw_writer.write(code, ln)
                    if cat:
                        bw_writer.write(bits, cat)
            else:  # DC refinement: one raw bit per block
                for zz in blocks:
                    bw_writer.write((int(zz[0]) >> al) & 1, 1)
        else:
            wtr = _ProgACWriter(bw_writer)
            if ah == 0:
                _encode_ac_first(blocks, ss, se, al, wtr)
            else:
                _encode_ac_refine(blocks, ss, se, al, wtr)
            wtr.flush_eob()
        # Cs=1, Td=0 (DC table 0) / Ta=0 (the progressive AC table)
        out.append(
            seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))
        )
        out.append(bw_writer.flush())
    out.append(b"\xff\xd9")
    return b"".join(out)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _entropy_end(raw: bytes, pos: int) -> int:
    """First non-stuffed, non-RST marker position at/after ``pos``."""
    n = len(raw)
    while pos < n - 1:
        if raw[pos] == 0xFF:
            b = raw[pos + 1]
            if b == 0x00 or 0xD0 <= b <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    return n


def _decode_dc_scan(reader, blocks_iter, dc_tab_of, al, first, comp_of):
    """Shared DC scan walk. ``blocks_iter`` yields (ci, zz_view);
    ``dc_tab_of`` maps component index → its DC Huffman table (the scan
    header assigns a Td PER COMPONENT — libjpeg's default progressive
    scan script gives luma Td=0 and chroma Td=1 in the interleaved DC
    scan, so a single shared table misparses real web JPEGs);
    ``comp_of`` is the number of components (for predictor reset)."""
    preds = [0] * comp_of
    for ci, zz in blocks_iter:
        if first:
            cat = reader.huff(dc_tab_of[ci])
            preds[ci] += _extend(reader.read(cat), cat)
            zz[0] = preds[ci] << al
        else:
            if reader.read(1):
                zz[0] |= 1 << al


def _decode_ac_first_scan(reader, blocks, ac_tab, ss, se, al):
    eobrun = 0
    for zz in blocks:
        if eobrun > 0:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            rs = reader.huff(ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.read(r)
                break
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            zz[k] = _extend(reader.read(s), s) << al
            k += 1


def _refine_nonzero(reader, zz, k, se, p1):
    """Correction bits for every already-nonzero coefficient in
    positions k..se (the post-EOB path of G.1.2.3)."""
    while k <= se:
        v = int(zz[k])
        if v != 0 and reader.read(1):
            if (v & p1) == 0:
                zz[k] = v + (p1 if v >= 0 else -p1)
        k += 1


def _decode_ac_refine_scan(reader, blocks, ac_tab, ss, se, al):
    p1 = 1 << al
    eobrun = 0
    for zz in blocks:
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.huff(ac_tab)
                r, s = rs >> 4, rs & 0xF
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("bad refinement magnitude")
                    newval = p1 if reader.read(1) else -p1
                else:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read(r)
                        break
                    # r == 15: ZRL — 16 zero-history positions
                # advance over r zero-history positions, reading
                # correction bits at nonzero-history ones
                while k <= se:
                    v = int(zz[k])
                    if v != 0:
                        if reader.read(1) and (v & p1) == 0:
                            zz[k] = v + (p1 if v >= 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval:
                    if k > se:
                        raise ValueError("refinement position past band")
                    zz[k] = newval
                k += 1
        else:
            eobrun -= 1
        _refine_nonzero(reader, zz, k, se, p1)


def decode_jpeg_progressive(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a PROGRESSIVE (SOF2) JPEG -> (width, height, uint8 LUMA
    pixels). Full Annex G control flow: spectral selection, successive
    approximation (DC arithmetic-shift / AC toward-zero point
    transforms), EOB runs, refinement correction bits, restart
    intervals. Grayscale and color streams are handled; chroma-only AC
    scans are SKIPPED outright (each scan is an independent entropy
    segment and this engine's image features are luma-based)."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    h = w = None
    comps = None
    coefs = None  # per component: np (blocks_y, blocks_x, 64) int32
    restart_interval = 0
    hmax = vmax = mcux = mcuy = 1
    while pos < len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack(">H", raw[pos : pos + 2])
        body = raw[pos + 2 : pos + ln]
        if marker == 0xDB:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                t = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                tbl = np.zeros((8, 8), dtype=np.int32)
                tbl[ZIG_ROWS, ZIG_COLS] = t
                quant[tq] = tbl
                i += 65
        elif marker == 0xC4:
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                tab = _build_decoder(bits, vals)
                (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                i += 17 + nv
        elif marker == 0xC2:
            prec, hh, ww, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(f"{ncomp}-component JPEG")
            h, w = hh, ww
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                tq = body[8 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("bad sampling factors")
                comps.append((cid, hi, vi, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = [
                np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
                for _, hi, vi, _ in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "decode_jpeg_progressive: stream is not SOF2"
            )
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", body[:2])
            if restart_interval:
                # restart markers inside progressive scans would need
                # per-scan-type predictor/EOB-run resets; without them
                # the bit reader would misparse at the first RSTn —
                # reject LOUDLY rather than decode garbage
                raise NotImplementedError(
                    "restart intervals in progressive JPEG scans are "
                    "not supported (DRI > 0 with SOF2)"
                )
        elif marker == 0xDA:
            if comps is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs = body[1 + 2 * si]
                tt = body[2 + 2 * si]
                idx = next(
                    (k for k, c in enumerate(comps) if c[0] == cs), None
                )
                if idx is None:
                    raise ValueError("scan references unknown component")
                scan.append((idx, tt >> 4, tt & 0xF))
            ss = body[1 + 2 * ns]
            se = body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            data_start = pos + ln
            data_end = _entropy_end(raw, data_start)
            # chroma-only AC scan: an independent entropy segment this
            # luma pipeline never needs — skip without decoding
            if ss > 0 and scan[0][0] != 0:
                pos = data_end
                continue
            reader = _BitReader(raw[data_start:data_end])
            if ss == 0:
                # DC scan (interleaved when ns > 1)
                def dc_blocks():
                    if ns > 1:
                        for my in range(mcuy):
                            for mx in range(mcux):
                                for (ci, _td, _ta) in scan:
                                    _, hi, vi, _ = comps[ci]
                                    for vy in range(vi):
                                        for vx in range(hi):
                                            yield ci, coefs[ci][
                                                my * vi + vy,
                                                mx * hi + vx,
                                            ]
                    else:
                        ci = scan[0][0]
                        _, hi, vi, _ = comps[ci]
                        hb = _ceil_div(_ceil_div(h * vi, vmax), 8)
                        wb = _ceil_div(_ceil_div(w * hi, hmax), 8)
                        for by in range(hb):
                            for bx in range(wb):
                                yield ci, coefs[ci][by, bx]

                if ah == 0:
                    for (_ci, s_td, _ta) in scan:
                        if s_td not in dc_tabs:
                            raise ValueError("missing DC table")
                dc_tab_of = {
                    s_ci: dc_tabs.get(s_td) for (s_ci, s_td, _ta) in scan
                }
                _decode_dc_scan(
                    reader, dc_blocks(),
                    dc_tab_of, al, ah == 0, len(comps),
                )
            else:
                if se < ss or se > 63:
                    raise ValueError("bad spectral band")
                if ns != 1:
                    raise ValueError("interleaved AC scan (G.1.1.1)")
                ci, _td, ta = scan[0]
                _, hi, vi, _ = comps[ci]
                hb = _ceil_div(_ceil_div(h * vi, vmax), 8)
                wb = _ceil_div(_ceil_div(w * hi, hmax), 8)
                blocks = [
                    coefs[ci][by, bx]
                    for by in range(hb)
                    for bx in range(wb)
                ]
                if ah == 0:
                    _decode_ac_first_scan(
                        reader, blocks, ac_tabs[ta], ss, se, al
                    )
                else:
                    _decode_ac_refine_scan(
                        reader, blocks, ac_tabs[ta], ss, se, al
                    )
            pos = data_end
            continue
        pos += ln
    if coefs is None or h is None:
        raise ValueError("missing SOS/SOF2")
    # luma reconstruction (component 0)
    _, lh, lv, tq = comps[0]
    qt = quant[tq]
    bh_l, bw_l = coefs[0].shape[:2]
    luma = np.zeros((bh_l * 8, bw_l * 8), dtype=np.float64)
    for by in range(bh_l):
        for bx in range(bw_l):
            coef = np.zeros((8, 8), dtype=np.float64)
            coef[ZIG_ROWS, ZIG_COLS] = coefs[0][by, bx]
            luma[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                _idct(coef * qt) + 128.0
            )
    ch = -(-h * lv // vmax)
    cw = -(-w * lh // hmax)
    plane = luma[:ch, :cw]
    if (ch, cw) != (h, w):
        yi = (np.arange(h) * ch // h).clip(0, ch - 1)
        xi = (np.arange(w) * cw // w).clip(0, cw - 1)
        plane = plane[np.ix_(yi, xi)]
    px = np.clip(np.round(plane), 0, 255).astype(np.uint8)
    return w, h, px


def encode_jpeg_progressive_color(
    rgb: np.ndarray, quality: int = 85, subsample: str = "444"
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a PROGRESSIVE color JPEG: one
    INTERLEAVED DC first scan (successive approximation Al=1) + an
    interleaved DC refinement + one spectral-selection AC scan per
    component (Y, Cb, Cr — AC scans must be single-component,
    G.1.1.1). Same plane prep / quantized coefficients as
    encode_jpeg_color, so the decoded LUMA is bit-identical to the
    baseline color stream's.

    DC tables follow libjpeg's default layout: luma uses DC table 0
    (Td=0, K.3.1), chroma uses DC table 1 (Td=1, K.3.3) in the SAME
    interleaved DC scan — the real-web shape that catches decoders
    sharing one DC table across scan components."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    h, w = rgb.shape[:2]
    ycc = rgb_to_ycbcr(rgb)
    quant = scaled_quant(quality)
    if subsample == "444":
        samp = [(1, 1), (1, 1), (1, 1)]
        chroma = [ycc[..., 1], ycc[..., 2]]
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
        he, we = h + (h & 1), w + (w & 1)
        full = _pad_plane(ycc[..., 1], he, we), _pad_plane(ycc[..., 2], he, we)
        chroma = [
            (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
            / 4.0
            for p in full
        ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    zz_all = []  # per comp: (blocks_y, blocks_x, 64) int64
    for ci, (hi, vi) in enumerate(samp):
        src = ycc[..., 0] if ci == 0 else chroma[ci - 1]
        plane = _pad_plane(src, mcuy * vi * 8, mcux * hi * 8)
        zz = np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
        for by in range(mcuy * vi):
            for bx in range(mcux * hi):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                q = np.round(_fdct(blk) / quant).astype(np.int64)
                zz[by, bx] = q[ZIG_ROWS, ZIG_COLS]
        zz_all.append(zz)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def dc_scan(al: int, first: bool) -> bytes:
        bw_writer = _BitWriter()
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(samp):
                    for vy in range(vi):
                        for vx in range(hi):
                            dc = int(zz_all[ci][my * vi + vy, mx * hi + vx, 0])
                            if first:
                                v = dc >> al
                                cat, bits = _magnitude(v - preds[ci])
                                preds[ci] = v
                                enc = _DC_ENC if ci == 0 else _CHROMA_DC_ENC
                                code, ln = enc[cat]
                                bw_writer.write(code, ln)
                                if cat:
                                    bw_writer.write(bits, cat)
                            else:
                                bw_writer.write((dc >> al) & 1, 1)
        return bw_writer.flush()

    zz_quant = quant[ZIG_ROWS, ZIG_COLS].astype(np.uint8).tobytes()
    sof_comps = b"".join(
        bytes([cid, (samp[i][0] << 4) | samp[i][1], 0])
        for i, cid in enumerate((1, 2, 3))
    )
    out = [b"\xff\xd8"]
    out.append(seg(0xDB, b"\x00" + zz_quant))
    out.append(seg(0xC2, struct.pack(">BHHB", 8, h, w, 3) + sof_comps))
    out.append(seg(0xC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)))
    out.append(
        seg(0xC4, b"\x01" + bytes(CHROMA_DC_BITS) + bytes(CHROMA_DC_VALS))
    )
    out.append(
        seg(0xC4, b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS))
    )
    # scan 1: interleaved DC first at Al=1 — luma Td=0, chroma Td=1
    # (libjpeg's default progressive DC table assignment)
    sos_dc = b"".join(
        bytes([cid, 0x00 if cid == 1 else 0x10]) for cid in (1, 2, 3)
    )
    out.append(seg(0xDA, bytes([3]) + sos_dc + bytes([0, 0, 0x01])))
    out.append(dc_scan(1, True))
    # scans 2-4: one spectral-selection AC scan per component (Al=0)
    for ci, cid in enumerate((1, 2, 3)):
        hi, vi = samp[ci]
        hb = _ceil_div(_ceil_div(h * vi, vmax), 8)
        wb = _ceil_div(_ceil_div(w * hi, hmax), 8)
        blocks = [
            zz_all[ci][by, bx]
            for by in range(hb)
            for bx in range(wb)
        ]
        bw_writer = _BitWriter()
        wtr = _ProgACWriter(bw_writer)
        _encode_ac_first(blocks, 1, 63, 0, wtr)
        wtr.flush_eob()
        out.append(seg(0xDA, bytes([1, cid, 0x00, 1, 63, 0x00])))
        out.append(bw_writer.flush())
    # scan 5: interleaved DC refinement to Al=0
    out.append(seg(0xDA, bytes([3]) + sos_dc + bytes([0, 0, 0x10])))
    out.append(dc_scan(0, False))
    out.append(b"\xff\xd9")
    return b"".join(out)
