"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) encode + decode in pure
numpy + stdlib — no codec library.

Scope: baseline sequential DCT (SOF0), 8-bit, GRAYSCALE (one component,
no chroma subsampling machinery) — the smallest REAL compressed-image
format the multimodal path can exercise end to end. Color/progressive
JPEGs still raise ``NotImplementedError`` (decode_image's loud stub
path). Quantization and Huffman tables are the public Annex K examples.

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


def _magnitude(v: int) -> tuple[int, int]:
    """(category, code bits) for a DC/AC value per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def encode_jpeg_gray(px: np.ndarray, quality: int = 85) -> bytes:
    """Encode a (h, w) uint8 array as a baseline grayscale JPEG."""
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
    for by in range(bh):
        for bx in range(bw):
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


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def decode_jpeg_gray(raw: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline grayscale JPEG -> (width, height, uint8 pixels).
    Raises NotImplementedError for multi-component (color) or
    progressive streams; ValueError for malformed data."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant = {}
    dc_tabs, ac_tabs = {}, {}
    h = w = None
    scan_start = None
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG is supported"
            )
        elif marker == 0xC0:
            prec, hh, ww, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("non-8-bit precision")
            if ncomp != 1:
                raise NotImplementedError(
                    "color JPEG needs a real codec lib; grayscale baseline "
                    "is supported natively"
                )
            h, w = hh, ww
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
        elif marker == 0xDA:
            ns = body[0]
            if ns != 1:
                raise NotImplementedError("multi-component scan")
            td, ta = body[2] >> 4, body[2] & 0xF
            scan_start = pos + ln
            dc_tab, ac_tab = dc_tabs[td], ac_tabs[ta]
            qtab = quant[0]
            break
        pos += ln
    if scan_start is None or h is None:
        raise ValueError("missing SOS/SOF0")

    reader = _BitReader(raw[scan_start:])
    bh, bw = (h + 7) // 8, (w + 7) // 8
    out = np.zeros((bh * 8, bw * 8), dtype=np.float64)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            zz = np.zeros(64, dtype=np.int64)
            cat = reader.huff(dc_tab)
            diff = _extend(reader.read(cat), cat)
            prev_dc += diff
            zz[0] = prev_dc
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
            block = _idct(coef * qtab) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    px = np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
    return w, h, px
