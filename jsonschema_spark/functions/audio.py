"""Audio payload verification — the ONE vectorized Python hot path.

The north rule (BASELINE.json input_hint) requires a per-row invariant:
decoded-PCM allclose (SNR >= 30 dB) against a reference signal plus
transcript equality. The reference signal is regenerated deterministically
from ``clip_id`` (seed = md5(clip_id)), so no golden audio files exist —
any executor can recompute ground truth locally, which is what makes this
check embarrassingly parallel at 10^12 rows.

Codecs (synthetic, deterministic — real codec libs are not in this
container; the Spark-side plumbing, schemas, batch shapes and UDF
signatures are production-shaped):
- ``pcm_s16le`` — raw little-endian int16 PCM.
- ``flac``      — "fLaC0" marker + delta-encoded int16 (lossless).
- ``opus``      — "OpuS" marker + 14-bit quantized int16 (lossy,
                  SQNR ~74 dB, comfortably above the 30 dB gate).
- anything else decodes as raw PCM (the codec *enum* check flags it
  separately; decode failure must not shadow an enum violation).

All functions are Arrow-batched (pandas_udf); no per-row Python.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

SNR_THRESHOLD_DB = 30.0

_FLAC_MAGIC = b"fLaC0"
_OPUS_MAGIC = b"OpuS"


def _seed(clip_id: str) -> int:
    return int.from_bytes(hashlib.md5(clip_id.encode()).digest()[:8], "little")


_RAMP = np.arange(1 << 17, dtype=np.float32)


def _ramp(n: int) -> np.ndarray:
    """Cached float32 time ramp (the arange allocation dominates short clips)."""
    global _RAMP
    if n > len(_RAMP):
        _RAMP = np.arange(max(n, 2 * len(_RAMP)), dtype=np.float32)
    return _RAMP[:n]


def reference_signal(clip_id: str, n_samples: int) -> np.ndarray:
    """Deterministic per-clip ground-truth waveform as float in [-1, 1).

    Two-harmonic sine with freq/phase/amplitude derived arithmetically from
    the clip seed (no RNG stream => stable across library versions). Float32
    throughout: generator and checker share this exact function, so the
    invariant is bit-consistent; float32 sin is ~2x the throughput of
    float64, which matters at 10^12 clips x 10^4 samples.
    """
    h = _seed(clip_id)
    f0 = 80.0 + (h % 4000) * 0.25  # 80..1080 (relative to sample rate ticks)
    phase = ((h >> 16) % 6283) / 1000.0
    amp = 0.5 + ((h >> 32) % 40) / 100.0  # 0.5..0.89
    t = _ramp(n_samples)
    w = np.float32(2.0 * np.pi * f0 / 16000.0)
    x = np.sin(t * w + np.float32(phase))
    x *= np.float32(amp)
    y = np.sin(t * (np.float32(2.0) * w))
    y *= np.float32(0.2 * amp)
    x += y
    x *= np.float32(0.8)
    return x


def pcm16_from_float(x: np.ndarray) -> np.ndarray:
    return np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")


def encode_payload(pcm: np.ndarray, codec: str) -> bytes:
    """Encode int16 PCM into the synthetic container for ``codec``."""
    if codec == "flac":
        deltas = np.diff(pcm.astype(np.int32), prepend=np.int32(0)).astype("<i4")
        return _FLAC_MAGIC + deltas.tobytes()
    if codec == "opus":
        q = (pcm.astype(np.int32) >> 2).astype("<i2")  # 14-bit quantization
        return _OPUS_MAGIC + q.tobytes()
    return pcm.tobytes()


def encode_wav_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Minimal RIFF/WAVE container around mono 16-bit PCM — a REAL format
    (RFC 2361 / MS WAVEFORMAT), decodable by any audio tool."""
    import struct

    data = pcm.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr_hz, sr_hz * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_pcm(samples: np.ndarray, sr_hz: int, bits: int = 16) -> bytes:
    """RIFF/WAVE container around integer PCM at 8/16/24 bits, mono (1-D)
    or stereo ((n, 2), interleaved on write). Samples are given at the
    TARGET depth's own scale — [-128, 127] for 8-bit (stored unsigned as
    v+128 per the WAV convention), int16 for 16-bit, int24 for 24-bit
    (packed little-endian 3-byte) — the encoder packs exactly what it is
    given (no resampling logic hides in the container writer). The
    canonical 44-byte header layout keeps byte offsets fixed for the
    cross-engine SQL re-decoders."""
    import struct

    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 1:
        channels = 1
    elif x.ndim == 2 and x.shape[1] == 2:
        channels = 2
    else:
        raise ValueError("encode_wav_pcm: expected 1-D mono or (n, 2) stereo")
    if bits not in (8, 16, 24):
        raise ValueError("encode_wav_pcm: bits must be 8, 16 or 24")
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if x.size and (x.max() > hi or x.min() < lo):
        raise ValueError(f"encode_wav_pcm: samples exceed {bits}-bit range")
    flat = x.reshape(-1)  # C order == channel-interleaved for stereo
    if bits == 8:
        data = (flat + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = flat.astype("<i2").tobytes()
    else:
        u = (flat & 0xFFFFFF).astype(np.uint32)
        b = np.empty((len(flat), 3), dtype=np.uint8)
        b[:, 0] = u & 0xFF
        b[:, 1] = (u >> 8) & 0xFF
        b[:, 2] = (u >> 16) & 0xFF
        data = b.tobytes()
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sr_hz, sr_hz * block_align, block_align, bits
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# G.711 mu-law (CCITT standard, public spec) — a REAL lossy telephony
# codec implemented in pure numpy: 16-bit PCM <-> 8-bit companded bytes.
# Round-trip SNR on program material is ~38 dB, comfortably above the
# 30 dB content invariant, so the SNR gate exercises a genuine lossy
# codec rather than only the synthetic stand-ins.
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635
_ULAW_SEG = np.array(
    [0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF], dtype=np.int32
)


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> mu-law bytes (vectorized G.711 encoder)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00).astype(np.int32)
    mag = np.minimum(np.abs(x), _ULAW_CLIP) + _ULAW_BIAS
    seg = np.digitize(mag, _ULAW_SEG)  # 1..8 (mag >= 0x100 after bias)
    seg = np.minimum(seg, 7).astype(np.int32)
    man = (mag >> (seg + 3)) & 0x0F
    return (~(sign | (seg << 4) | man) & 0xFF).astype(np.uint8)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int32 PCM samples (vectorized G.711 decoder)."""
    u = (~b.astype(np.int32)) & 0xFF
    sign = u & 0x80
    seg = (u >> 4) & 0x07
    man = u & 0x0F
    mag = (((man << 3) + _ULAW_BIAS) << seg) - _ULAW_BIAS
    return np.where(sign != 0, -mag, mag).astype(np.int32)


def encode_wav_ulaw(pcm: np.ndarray, sr_hz: int) -> bytes:
    """RIFF/WAVE container around mono G.711 mu-law (WAVE_FORMAT_MULAW=7,
    8 bits/sample) — the standard telephony WAV layout."""
    import struct

    data = ulaw_encode(pcm).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sr_hz, sr_hz, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# G.711 A-law (the E1/European telephony companding law, same CCITT
# standard family as mu-law above) — vectorized numpy port of the
# public-domain Sun reference implementation (linear2alaw/alaw2linear).
# 13-bit segmented companding, even bits toggled by 0x55 on the wire.
_ALAW_SEG = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law bytes (vectorized G.711 encoder).

    Mirrors the reference linear2alaw exactly: arithmetic >>3 to 13 bits,
    negatives map through -x-1 (one's complement), segment lookup over
    _ALAW_SEG, mantissa shift is (>>1) in segments 0-1 and (>>seg) above,
    result XOR 0x55 (0xD5 for non-negative inputs carries the sign bit)."""
    x = pcm.astype(np.int32) >> 3
    neg = x < 0
    mag = np.where(neg, -x - 1, x)
    mask = np.where(neg, 0x55, 0xD5).astype(np.int32)
    seg = np.searchsorted(_ALAW_SEG, mag, side="left").astype(np.int32)
    out_of_range = seg >= 8
    seg = np.minimum(seg, 7)
    man = np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = (seg << 4) | man
    aval = np.where(out_of_range, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int32 PCM samples (vectorized G.711 decoder)."""
    a = b.astype(np.int32) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a >> 4) & 0x07
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where((a & 0x80) != 0, t, -t).astype(np.int32)


def encode_wav_alaw(pcm: np.ndarray, sr_hz: int) -> bytes:
    """RIFF/WAVE container around mono G.711 A-law (WAVE_FORMAT_ALAW=6,
    8 bits/sample) — the standard telephony WAV layout."""
    import struct

    data = alaw_encode(pcm).tobytes()
    fmt = struct.pack("<HHIIHH", 6, 1, sr_hz, sr_hz, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# IMA/DVI ADPCM (WAVE_FORMAT_IMA_ADPCM = 0x11) — the REAL 4-bit adaptive
# delta codec from the IMA Digital Audio Focus Group "Recommended
# Practices for Enhancing Digital Audio Compatibility" (rev 3.00, 1992):
# canonical 89-entry step table + 16-entry index-adaptation table, MS mono
# block layout (4-byte block header: int16 predictor = sample 0 verbatim,
# uint8 step index, reserved byte; then 2 samples/byte, low nibble first).
# ~4:1 compression; round-trip SNR on program material ~30-40 dB. The
# recurrence adapts per sample, so encode/decode are sequential Python
# loops — unlike the vectorized G.711 pair above; fine for the ledger
# corpus scale, and the decode path is Arrow-batched like everything else.
_IMA_STEP = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32
)


def _ima_reconstruct(code: int, step: int) -> int:
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    return diffq


def adpcm_encode(pcm: np.ndarray, block_align: int = 256) -> bytes:
    """int16 PCM -> IMA ADPCM block stream (MS mono layout). Sample 0 of
    each block travels verbatim in the header; the step index carries
    across blocks (and is stored per block so any block decodes alone).
    The final block's nibble area is zero-padded to ``block_align`` — the
    WAV ``fact`` chunk records the true sample count for trimming."""
    import struct

    x = np.asarray(pcm, dtype=np.int32).tolist()
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    idx = 0
    for pos in range(0, len(x), spb):
        blk = x[pos : pos + spb]
        pred = max(-32768, min(32767, int(blk[0])))
        out += struct.pack("<hBB", pred, idx, 0)
        nibbles = []
        for s in blk[1:]:
            step = int(_IMA_STEP[idx])
            diff = s - pred
            code = 8 if diff < 0 else 0
            delta = -diff if diff < 0 else diff
            if delta >= step:
                code |= 4
                delta -= step
            if delta >= step >> 1:
                code |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                code |= 1
            diffq = _ima_reconstruct(code, step)
            pred = pred - diffq if code & 8 else pred + diffq
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX[code])))
            nibbles.append(code)
        while len(nibbles) < (block_align - 4) * 2:  # zero-pad final block
            nibbles.append(0)
        out += bytes(
            (nibbles[j] & 0xF) | ((nibbles[j + 1] & 0xF) << 4)
            for j in range(0, len(nibbles), 2)
        )
    return bytes(out)


def adpcm_decode(
    data: bytes, block_align: int = 256, n_samples: int | None = None
) -> np.ndarray:
    """IMA ADPCM block stream -> int32 PCM. A trailing fragment too short
    to hold a block header raises ValueError (torn upload — decode must
    fail LOUDLY, not return partial audio silently); ``n_samples`` (from
    the WAV fact chunk) trims the final block's zero-padding."""
    import struct

    out: list[int] = []
    pos, n = 0, len(data)
    while pos < n:
        if n - pos < 4:
            raise ValueError("malformed ADPCM: truncated block header")
        pred, idx, _res = struct.unpack("<hBB", data[pos : pos + 4])
        if idx > 88:
            raise ValueError("malformed ADPCM: step index out of range")
        body = data[pos + 4 : pos + block_align]
        pos += block_align
        out.append(pred)
        for byte in body:
            for code in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEP[idx])
                diffq = _ima_reconstruct(code, step)
                pred = pred - diffq if code & 8 else pred + diffq
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_INDEX[code])))
                out.append(pred)
    if n_samples is not None:
        if n_samples > len(out):
            raise ValueError("malformed ADPCM: fact count exceeds payload")
        out = out[:n_samples]
    return np.array(out, dtype=np.int32)


def encode_wav_adpcm(
    pcm: np.ndarray, sr_hz: int, block_align: int = 256
) -> bytes:
    """RIFF/WAVE container around mono IMA ADPCM (WAVE_FORMAT_IMA_ADPCM =
    0x11, 4 bits/sample): extended fmt chunk (cbSize=2 carrying
    wSamplesPerBlock) + the mandatory ``fact`` chunk with the true sample
    count — the standard compressed-WAV layout."""
    import struct

    data = adpcm_encode(pcm, block_align)
    spb = (block_align - 4) * 2 + 1
    byte_rate = (sr_hz * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sr_hz, byte_rate, block_align, 4, 2, spb
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<I", 4) + struct.pack("<I", len(pcm))
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# MS ADPCM (WAVE_FORMAT_ADPCM = 0x0002) — Microsoft's other classic 4-bit
# compressed-WAV codec (public spec: RIFF/WAVE "Multimedia Programming
# Interface and Data Specifications" + MSDN WAVEFORMAT docs): 7 fixed
# prediction-coefficient pairs, a 16-entry delta-adaptation table, 7-byte
# mono block header (bPredictor u8, iDelta i16, iSamp1 i16, iSamp2 i16 —
# chronological output starts with iSamp2 then iSamp1), two 4-bit codes
# per byte HIGH nibble first. The per-sample recurrence
#   pred = (s1*coef1 + s2*coef2) >> 8;  s = clamp(pred + signed4 * delta)
#   delta = max(16, (adapt[code] * delta) >> 8)
# adapts sequentially like IMA; the encoder picks the best of the 7
# predictors PER BLOCK by squared reconstruction error.
_MS_COEF1 = (256, 512, 0, 192, 240, 460, 392)
_MS_COEF2 = (0, -256, 0, 64, 0, -208, -232)
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def msadpcm_decode(
    data: bytes, block_align: int, n_samples: int | None = None
) -> np.ndarray:
    """MS ADPCM block stream -> int32 PCM (mono). Torn blocks and
    reserved predictor indices raise ValueError (decode fails loudly);
    ``n_samples`` (the WAV fact count) trims the final block's padding."""
    import struct

    if block_align < 8:
        raise ValueError("malformed MS ADPCM: block_align too small")
    out: list[int] = []
    for pos in range(0, len(data), block_align):
        blk = data[pos : pos + block_align]
        if len(blk) < 7:
            raise ValueError("malformed MS ADPCM: torn block header")
        pred_idx = blk[0]
        if pred_idx > 6:
            raise ValueError("malformed MS ADPCM: reserved predictor index")
        c1, c2 = _MS_COEF1[pred_idx], _MS_COEF2[pred_idx]
        delta, s1, s2 = struct.unpack("<hhh", blk[1:7])
        out.append(s2)
        out.append(s1)
        for byte in blk[7:]:
            for code in (byte >> 4, byte & 0x0F):
                signed = code - 16 if code >= 8 else code
                pred = (s1 * c1 + s2 * c2) >> 8
                smp = max(-32768, min(32767, pred + signed * delta))
                s2, s1 = s1, smp
                delta = max(16, (_MS_ADAPT[code] * delta) >> 8)
                out.append(smp)
    if n_samples is not None:
        if n_samples > len(out):
            raise ValueError("malformed MS ADPCM: fact count exceeds payload")
        out = out[:n_samples]
    return np.array(out, dtype=np.int32)


def _msadpcm_encode_block(
    blk: list[int], pred_idx: int, block_align: int
) -> tuple[bytes, int]:
    """Encode one block with a fixed predictor; returns (bytes, sq_err)."""
    import struct

    s2 = max(-32768, min(32767, int(blk[0])))
    s1 = max(-32768, min(32767, int(blk[min(1, len(blk) - 1)])))
    rest = blk[2:]
    step = 16
    if len(rest) > 1:
        step = max(16, int(np.mean(np.abs(np.diff(rest[:64]))) / 4))
    delta = min(step, 32767)
    head = struct.pack("<Bhhh", pred_idx, delta, s1, s2)
    c1, c2 = _MS_COEF1[pred_idx], _MS_COEF2[pred_idx]
    nibbles: list[int] = []
    err = 0
    for s in rest:
        pred = (s1 * c1 + s2 * c2) >> 8
        diff = int(s) - pred
        code = max(-8, min(7, int(round(diff / delta))))
        code_u = code & 0xF
        smp = max(-32768, min(32767, pred + code * delta))
        err += (int(s) - smp) * (int(s) - smp)
        s2, s1 = s1, smp
        delta = max(16, (_MS_ADAPT[code_u] * delta) >> 8)
        nibbles.append(code_u)
    while len(nibbles) < (block_align - 7) * 2:  # zero-pad final block
        nibbles.append(0)
    body = bytes(
        (nibbles[i] << 4) | nibbles[i + 1] for i in range(0, len(nibbles), 2)
    )
    return head + body, err


def msadpcm_encode(pcm: np.ndarray, block_align: int = 256) -> bytes:
    """int16 PCM -> MS ADPCM block stream (mono): per block, all 7
    predictors are trial-encoded and the one with least squared
    reconstruction error wins — the strategy the format was designed
    for. The WAV ``fact`` chunk records the true sample count."""
    x = np.asarray(pcm, dtype=np.int32).tolist()
    spb = (block_align - 7) * 2 + 2
    out = bytearray()
    for pos in range(0, len(x), spb):
        blk = x[pos : pos + spb]
        best = None
        for pi in range(7):
            enc, err = _msadpcm_encode_block(blk, pi, block_align)
            if best is None or err < best[1]:
                best = (enc, err)
        out += best[0]
    return bytes(out)


def encode_wav_msadpcm(
    pcm: np.ndarray, sr_hz: int, block_align: int = 256
) -> bytes:
    """RIFF/WAVE container around mono MS ADPCM (WAVE_FORMAT_ADPCM = 2):
    extended fmt chunk (cbSize=32: wSamplesPerBlock, wNumCoef=7, the
    seven canonical coefficient pairs) + the mandatory ``fact`` chunk."""
    import struct

    data = msadpcm_encode(pcm, block_align)
    spb = (block_align - 7) * 2 + 2
    byte_rate = (sr_hz * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHHH", 2, 1, sr_hz, byte_rate, block_align, 4, 32, spb, 7
    )
    for c1, c2 in zip(_MS_COEF1, _MS_COEF2):
        fmt += struct.pack("<hh", c1, c2)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<I", 4) + struct.pack("<I", len(pcm))
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_wav(raw: bytes) -> tuple[int, int, int, int, int, int | None, bytes]:
    """Walk RIFF/WAVE chunks (chunks pad to even); return
    (audio_format, channels, sr_hz, bits, block_align, fact_samples,
    data). ``fact_samples`` is None when the optional fact chunk is
    absent. Malformed containers raise ValueError (surfaces as a decode
    failure, not a crash)."""
    import struct

    pos, n = 12, len(raw)
    fmt = None
    data = None
    fact = None
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            if len(body) < 16:  # truncated payload: decode failure, not crash
                raise ValueError("malformed WAV: truncated fmt chunk")
            audio_format, channels, sr, _br, ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            fmt = (audio_format, channels, sr, bits, ba)
        elif cid == b"fact" and size >= 4 and len(body) >= 4:
            (fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    return (*fmt[:4], fmt[4], fact, data)


def _decode_wav_pcm16(raw: bytes) -> np.ndarray:
    """Real RIFF/WAVE decode: accept PCM at 8 (unsigned) / 16 / 24 bits in
    mono or stereo, plus mono G.711 mu-law / A-law / IMA ADPCM; return
    int32 samples at int16 scale (stereo is downmixed with the engine's
    exact (l+r)>>1 convention, 8-bit is re-centered and scaled with
    (u-128)<<8, 24-bit keeps the top 16 bits via arithmetic shift — all
    pure integer arithmetic, so every path is cross-engine checkable).
    Unsupported layouts raise ValueError."""
    audio_format, channels, _sr, bits, block_align, fact, data = _parse_wav(raw)
    pcm_ok = audio_format == 1 and bits in (8, 16, 24) and channels in (1, 2)
    g711_ok = (audio_format, bits, channels) in ((7, 8, 1), (6, 8, 1))
    adpcm_ok = (audio_format, bits, channels) in ((0x11, 4, 1), (0x02, 4, 1))
    if not (pcm_ok or g711_ok or adpcm_ok):
        raise ValueError(
            f"unsupported WAV layout (format={audio_format}, "
            f"channels={channels}, bits={bits}); only PCM 8/16/24-bit "
            "mono/stereo or G.711 mu-law / A-law / IMA / MS ADPCM mono"
        )
    if audio_format == 7:
        return ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    if audio_format == 6:
        return alaw_decode(np.frombuffer(data, dtype=np.uint8))
    if audio_format == 0x02:
        return msadpcm_decode(data, block_align, n_samples=fact)
    if audio_format == 0x11:
        if block_align < 5:
            raise ValueError("malformed ADPCM: block_align too small")
        return adpcm_decode(data, block_align, n_samples=fact)
    frame = (bits // 8) * channels
    data = data[: (len(data) // frame) * frame]
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 8:
        # unsigned 8-bit PCM: re-center at 0 and scale to int16 range
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128) << 8
    else:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v24 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v24 -= (v24 >= (1 << 23)) * (1 << 24)   # sign-extend int24
        x = v24 >> 8                            # floor shift: top 16 bits
    if channels == 2:
        x = (x[0::2] + x[1::2]) >> 1            # exact-integer downmix
    return x


def decode_wav_channels(raw: bytes) -> np.ndarray:
    """RIFF/WAVE -> channel-PRESERVING int32 PCM of shape ``(n, ch)`` at
    int16 scale — the same parse/validation/depth conventions as
    ``_decode_wav_pcm16`` (which this mirrors minus the stereo downmix);
    the G.711 / ADPCM formats are mono by validation, returned as
    ``(n, 1)``. Raises ValueError on unsupported layouts."""
    audio_format, channels, _sr, bits, _ba, _fact, data = _parse_wav(raw)
    if audio_format != 1 or channels == 1:
        return _decode_wav_pcm16(raw).reshape(-1, 1)
    if not (bits in (8, 16, 24) and channels == 2):
        raise ValueError(
            f"unsupported WAV layout for channel decode (format=1, "
            f"channels={channels}, bits={bits})"
        )
    # decode interleaved without the downmix (same arithmetic as
    # _decode_wav_pcm16's PCM branch)
    frame = (bits // 8) * channels
    data = data[: (len(data) // frame) * frame]
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.int32)
    elif bits == 8:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128) << 8
    else:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v24 = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v24 -= (v24 >= (1 << 23)) * (1 << 24)
        x = v24 >> 8
    return x.reshape(-1, channels)


# --- AIFF / AIFF-C (Apple, EA IFF 85) and Sun AU (.snd) containers --------
# Both are REAL interchange formats every audio tool reads; both are
# chunk/header walks around integer PCM (or G.711 for AU), so the decode
# conventions are the exact-integer ones the WAV path already defines:
# 24-bit keeps the top 16 via arithmetic >>8, 8-bit SIGNED scales <<8
# (AIFF/AU 8-bit is signed, unlike WAV's offset-binary), stereo
# downmixes (l+r)>>1. AIFF is big-endian throughout; its sample rate is
# an 80-bit IEEE 754 extended float (the format's one exotic corner).


def _f80_encode(rate: int) -> bytes:
    """Integer -> 80-bit extended float (1+15-bit sign/exponent, explicit
    64-bit mantissa), the AIFF COMM sampleRate encoding."""
    if rate <= 0:
        raise ValueError("AIFF sample rate must be positive")
    e = rate.bit_length() - 1
    mant = rate << (63 - e)
    return struct.pack(">HQ", 16383 + e, mant)


def _f80_decode(b: bytes) -> int:
    """80-bit extended float -> nearest int (sample rates are integral)."""
    se, mant = struct.unpack(">HQ", b[:10])
    if se & 0x8000 or (se == 0 and mant == 0):
        raise ValueError("malformed AIFF: non-positive sample rate")
    return int(round(mant * 2.0 ** ((se & 0x7FFF) - 16383 - 63)))


def encode_aiff(
    samples: np.ndarray, sr_hz: int, bits: int = 16,
    compression: str | None = None,
) -> bytes:
    """AIFF (or AIFF-C) container around signed big-endian integer PCM at
    8/16/24 bits, mono (1-D) or stereo ((n, 2) interleaved). AIFF-C is
    emitted when ``compression`` is ``"NONE"`` (BE PCM) or ``"sowt"``
    (the classic byte-swapped little-endian 16-bit variant); plain AIFF
    when None. Real format: FORM/COMM/SSND per EA IFF 85 + Apple AIFF
    1.3 / AIFF-C spec, F80 sample rate, FVER in AIFF-C."""
    x = np.asarray(samples, dtype=np.int64)
    channels = 1 if x.ndim == 1 else x.shape[1]
    if x.ndim == 2 and channels != 2:
        raise ValueError("encode_aiff: mono (1-D) or stereo (n, 2) only")
    if bits not in (8, 16, 24):
        raise ValueError("encode_aiff: bits must be 8, 16 or 24")
    if compression not in (None, "NONE", "sowt"):
        raise ValueError("encode_aiff: compression must be None/NONE/sowt")
    if compression == "sowt" and bits != 16:
        raise ValueError("encode_aiff: sowt is 16-bit only")
    lim = 1 << (bits - 1)
    if x.max(initial=0) > lim - 1 or x.min(initial=0) < -lim:
        raise ValueError(f"encode_aiff: samples exceed {bits}-bit range")
    flat = x.reshape(-1)  # (n, 2) C-order IS the interleaved stream
    n_frames = len(x)
    if bits == 8:
        data = flat.astype(np.int8).tobytes()
    elif bits == 16:
        data = flat.astype("<i2" if compression == "sowt" else ">i2").tobytes()
    else:
        be = np.frombuffer(flat.astype(">i4").tobytes(), np.uint8)
        data = be.reshape(-1, 4)[:, 1:].tobytes()  # top 3 bytes of >i4
    comm = struct.pack(">hIh", channels, n_frames, bits) + _f80_encode(sr_hz)
    body = b""
    if compression is not None:
        comp = compression.encode("ascii")
        # AIFF-C COMM carries compressionType + a pstring name (padded even)
        name = {b"NONE": b"not compressed", b"sowt": b"little-endian"}[comp]
        pstr = bytes([len(name)]) + name
        if len(pstr) & 1:
            pstr += b"\x00"
        comm += comp + pstr
        body += b"FVER" + struct.pack(">II", 4, 0xA2805140)
    body += b"COMM" + struct.pack(">I", len(comm)) + comm
    if len(comm) & 1:
        body += b"\x00"
    ssnd = struct.pack(">II", 0, 0) + data
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    if len(ssnd) & 1:
        body += b"\x00"
    form = (b"AIFC" if compression is not None else b"AIFF") + body
    return b"FORM" + struct.pack(">I", len(form)) + form


def _decode_aiff(raw: bytes, downmix: bool = True) -> np.ndarray:
    """Real AIFF / AIFF-C decode -> engine int16-scale PCM (int32). PCM
    at 8 (signed) / 16 / 24 bits, mono or stereo; AIFF-C accepted for
    compressionType NONE (big-endian) and sowt (little-endian 16-bit).
    Unsupported layouts and malformed chunk walks raise ValueError.
    ``downmix=False`` keeps stereo as ``(n, 2)`` (same arithmetic up to
    the final mix — the stereo-integrity screen's channel view)."""
    form_type = raw[8:12]
    pos, n = 12, len(raw)
    comm = None
    data = None
    comp = b"NONE"
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack(">I", raw[pos + 4 : pos + 8])
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"COMM":
            if len(body) < 18:
                raise ValueError("malformed AIFF: truncated COMM chunk")
            channels, n_frames, bits = struct.unpack(">hIh", body[:8])
            sr = _f80_decode(body[8:18])
            comm = (channels, n_frames, bits, sr)
            if form_type == b"AIFC":
                if len(body) < 22:
                    raise ValueError("malformed AIFC: COMM lacks compression")
                comp = body[18:22]
        elif cid == b"SSND":
            if len(body) < 8:
                raise ValueError("malformed AIFF: truncated SSND chunk")
            (offset,) = struct.unpack(">I", body[:4])
            data = body[8 + offset :]
        pos += 8 + size + (size & 1)
    if comm is None or data is None:
        raise ValueError("malformed AIFF: missing COMM/SSND chunk")
    channels, n_frames, bits, _sr = comm
    if comp not in (b"NONE", b"sowt"):
        raise ValueError(f"unsupported AIFF-C compression {comp!r}")
    if bits not in (8, 16, 24) or channels not in (1, 2):
        raise ValueError(
            f"unsupported AIFF layout (channels={channels}, bits={bits})"
        )
    frame = (bits // 8) * channels
    want = n_frames * frame
    if len(data) < want:
        raise ValueError("malformed AIFF: SSND shorter than COMM frames")
    data = data[:want]
    if bits == 16:
        dt = "<i2" if comp == b"sowt" else ">i2"
        x = np.frombuffer(data, dtype=dt).astype(np.int32)
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.int8).astype(np.int32) << 8
    else:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v24 = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]  # big-endian
        v24 -= (v24 >= (1 << 23)) * (1 << 24)
        x = v24 >> 8
    if channels == 2:
        if not downmix:
            return x.reshape(-1, 2)
        x = (x[0::2] + x[1::2]) >> 1
    return x


_AU_MAGIC = b".snd"
# Sun/NeXT audio encodings (public header spec): mu-law, signed PCM at
# 8/16/24 bits (big-endian), A-law.
_AU_ULAW, _AU_PCM8, _AU_PCM16, _AU_PCM24, _AU_ALAW = 1, 2, 3, 4, 27
_AU_ENCODINGS = {
    "ulaw": _AU_ULAW, "pcm8": _AU_PCM8, "pcm16": _AU_PCM16,
    "pcm24": _AU_PCM24, "alaw": _AU_ALAW,
}


def encode_au(
    samples: np.ndarray, sr_hz: int, encoding: str = "pcm16"
) -> bytes:
    """Sun AU (.snd) container — the original NeXT/Sun interchange
    format: 24-byte big-endian header (magic, data offset, data size,
    encoding, rate, channels) + payload. Encodings: signed PCM at
    8/16/24 bits (big-endian) and G.711 mu-law / A-law (mono int16
    input, the engine's G.711 kernels). Mono (1-D) or stereo ((n, 2))
    for PCM; G.711 is mono."""
    code = _AU_ENCODINGS.get(encoding)
    if code is None:
        raise ValueError(f"encode_au: unknown encoding {encoding!r}")
    x = np.asarray(samples, dtype=np.int64)
    channels = 1 if x.ndim == 1 else x.shape[1]
    if x.ndim == 2 and channels != 2:
        raise ValueError("encode_au: mono (1-D) or stereo (n, 2) only")
    if code in (_AU_ULAW, _AU_ALAW):
        if channels != 1:
            raise ValueError("encode_au: G.711 payloads are mono")
        pcm16 = x.astype(np.int16)
        enc = ulaw_encode(pcm16) if code == _AU_ULAW else alaw_encode(pcm16)
        data = enc.astype(np.uint8).tobytes()
    else:
        bits = {_AU_PCM8: 8, _AU_PCM16: 16, _AU_PCM24: 24}[code]
        lim = 1 << (bits - 1)
        if x.max(initial=0) > lim - 1 or x.min(initial=0) < -lim:
            raise ValueError(f"encode_au: samples exceed {bits}-bit range")
        flat = x.reshape(-1)
        if bits == 8:
            data = flat.astype(np.int8).tobytes()
        elif bits == 16:
            data = flat.astype(">i2").tobytes()
        else:
            be = np.frombuffer(flat.astype(">i4").tobytes(), np.uint8)
            data = be.reshape(-1, 4)[:, 1:].tobytes()
    hdr = _AU_MAGIC + struct.pack(">IIIII", 24, len(data), code, sr_hz,
                                  channels)
    return hdr + data


def _decode_au(raw: bytes, downmix: bool = True) -> np.ndarray:
    """Real Sun AU decode -> engine int16-scale PCM (int32): signed PCM
    8/16/24-bit big-endian (mono/stereo) and G.711 mu-law / A-law
    (mono). A data size of 0xFFFFFFFF means "to end of file" per the
    header spec. Unsupported encodings raise ValueError.
    ``downmix=False`` keeps stereo as ``(n, 2)``."""
    if len(raw) < 24:
        raise ValueError("malformed AU: truncated header")
    offset, size, code, _sr, channels = struct.unpack(">IIIII", raw[4:24])
    if offset < 24 or offset > len(raw):
        raise ValueError("malformed AU: bad data offset")
    data = raw[offset:]
    if size != 0xFFFFFFFF:
        if len(data) < size:
            raise ValueError("malformed AU: data shorter than header size")
        data = data[:size]
    if code == _AU_ULAW and channels == 1:
        return ulaw_decode(np.frombuffer(data, dtype=np.uint8))
    if code == _AU_ALAW and channels == 1:
        return alaw_decode(np.frombuffer(data, dtype=np.uint8))
    if code not in (_AU_PCM8, _AU_PCM16, _AU_PCM24) or channels not in (1, 2):
        raise ValueError(
            f"unsupported AU layout (encoding={code}, channels={channels})"
        )
    bits = {_AU_PCM8: 8, _AU_PCM16: 16, _AU_PCM24: 24}[code]
    frame = (bits // 8) * channels
    data = data[: (len(data) // frame) * frame]
    if bits == 16:
        x = np.frombuffer(data, dtype=">i2").astype(np.int32)
    elif bits == 8:
        x = np.frombuffer(data, dtype=np.int8).astype(np.int32) << 8
    else:
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v24 = (b[:, 0] << 16) | (b[:, 1] << 8) | b[:, 2]
        v24 -= (v24 >= (1 << 23)) * (1 << 24)
        x = v24 >> 8
    if channels == 2:
        if not downmix:
            return x.reshape(-1, 2)
        x = (x[0::2] + x[1::2]) >> 1
    return x


def decode_payload(raw: bytes) -> np.ndarray:
    """Decode a payload back to int16 PCM (container sniffed from magic).

    ``RIFF/WAVE`` is decoded for real (PCM16 / G.711 / IMA ADPCM mono),
    as are ``FORM/AIFF``+``AIFC`` (big-endian PCM + sowt) and Sun AU
    (``.snd``: BE PCM + G.711), and REAL FLAC streams (``fLaC`` marker)
    decode through the pure-numpy subset codec in functions/flac.py; the
    legacy synthetic flac/opus containers remain for the roster corpora;
    anything else decodes as raw little-endian PCM16."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return _decode_wav_pcm16(raw)
    if raw[:4] == b"FORM" and raw[8:12] in (b"AIFF", b"AIFC"):
        return _decode_aiff(raw)
    if raw[:4] == _AU_MAGIC:
        return _decode_au(raw)
    if raw[:5] == _FLAC_MAGIC:
        # legacy synthetic container ("fLaC0": byte 5 = 0x30, a RESERVED
        # metadata type no conforming real stream carries — unambiguous)
        deltas = np.frombuffer(raw[5:], dtype="<i4")
        return np.cumsum(deltas, dtype=np.int64).astype(np.int32)
    if raw[:4] == b"fLaC":
        # REAL FLAC (functions/flac.py): lossless, CRC+MD5 verified decode
        from jsonschema_spark.functions.flac import _parse_stream, decode_flac

        bits = _parse_stream(bytes(raw))[3]
        _sr, pcm = decode_flac(bytes(raw))
        if pcm.ndim == 2:
            # N channels -> mono with the engine's exact-integer downmix
            # convention floor(sum/n) ((l+r)>>1 for stereo — downmix_batch)
            pcm = np.floor_divide(
                pcm.astype(np.int64).sum(axis=1), pcm.shape[1]
            )
        # engine PCM model is int16: same depth conventions as WAV
        # ingestion — deeper streams keep the top 16 bits (arithmetic
        # right shift), shallower SIGNED streams scale up (plain left
        # shift — unlike WAV's 8-bit offset binary)
        if bits > 16:
            pcm = np.asarray(pcm, dtype=np.int64) >> (bits - 16)
        elif bits < 16:
            pcm = np.asarray(pcm, dtype=np.int64) << (16 - bits)
        return np.asarray(pcm, dtype=np.int32)
    if raw[:4] == _OPUS_MAGIC:
        q = np.frombuffer(raw[4:], dtype="<i2").astype(np.int32)
        return q << 2
    return np.frombuffer(raw, dtype="<i2").astype(np.int32)


def decode_payload_channels(raw: bytes) -> np.ndarray:
    """Channel-PRESERVING decode: payload -> int16-scale int32 PCM of
    shape ``(n, ch)`` (mono arrives as ``(n, 1)``) — the view the
    stereo-integrity screen needs; ``decode_payload`` is this plus the
    engine downmix. Same container sniff, same depth conventions,
    identical per-channel arithmetic: WAV/AIFF/AU keep interleaved
    stereo un-mixed; REAL FLAC returns decode_flac's native (n, ch)
    after the depth shift; every mono-by-construction path (G.711,
    ADPCM, legacy synthetic containers, raw PCM16) reshapes to (n, 1).
    Raises ValueError on malformed/unsupported payloads, exactly like
    decode_payload."""
    if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return decode_wav_channels(raw)
    if raw[:4] == b"FORM" and raw[8:12] in (b"AIFF", b"AIFC"):
        x = _decode_aiff(raw, downmix=False)
        return x if x.ndim == 2 else x.reshape(-1, 1)
    if raw[:4] == _AU_MAGIC:
        x = _decode_au(raw, downmix=False)
        return x if x.ndim == 2 else x.reshape(-1, 1)
    if raw[:5] != _FLAC_MAGIC and raw[:4] == b"fLaC":
        from jsonschema_spark.functions.flac import _parse_stream, decode_flac

        bits = _parse_stream(bytes(raw))[3]
        _sr, pcm = decode_flac(bytes(raw))
        if pcm.ndim == 1:
            pcm = pcm.reshape(-1, 1)
        pcm = pcm.astype(np.int64)
        if bits > 16:
            pcm = pcm >> (bits - 16)
        elif bits < 16:
            pcm = pcm << (16 - bits)
        return pcm.astype(np.int32)
    return decode_payload(raw).reshape(-1, 1)


def snr_db(ref: np.ndarray, dec: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference, in dB."""
    n = min(len(ref), len(dec))
    if n == 0:
        return float("-inf")
    r = ref[:n].astype(np.float64)
    d = dec[:n].astype(np.float64)
    noise = r - d
    p_sig = float(np.dot(r, r))
    p_noise = float(np.dot(noise, noise))
    if len(ref) != len(dec):
        return float("-inf")  # truncated/padded payload is corrupt
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


def decode_pcm_batch(
    payloads: pd.Series, clip_ids: pd.Series, srs: pd.Series, durs: pd.Series
) -> pd.Series:
    """Vectorized batch kernel: SNR (dB) per row. Shared by the pandas UDF
    and unit tests (testable without a SparkSession)."""
    out = np.empty(len(payloads), dtype=np.float64)
    it = zip(payloads.tolist(), clip_ids.tolist(), srs.tolist(), durs.tolist())
    for i, (raw, cid, sr, dur) in enumerate(it):
        if raw is None or cid is None or sr is None or dur is None or (
            isinstance(sr, float) and np.isnan(sr)
        ) or (isinstance(dur, float) and np.isnan(dur)):
            out[i] = float("nan")
            continue
        n_samples = int(sr) * int(dur) // 1000
        ref = pcm16_from_float(reference_signal(cid, n_samples)).astype(np.int32)
        try:
            dec = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            out[i] = float("-inf")
            continue
        out[i] = snr_db(ref, dec)
    return pd.Series(out)


DECODE_PROFILE_TYPE = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("dec_md5", T.StringType()),
        T.StructField("snr", T.DoubleType()),
    ]
)


def decode_profile_batch(
    payloads: pd.Series, clip_ids: pd.Series, srs: pd.Series, durs: pd.Series
) -> pd.DataFrame:
    """Vectorized batch kernel: decode each payload once and emit
    (n_samples, dec_md5, snr) — the decoded-PCM fingerprint plus the SNR
    invariant from a SINGLE decode. ``dec_md5`` is md5 of the UPPERCASE
    hex rendering of the int16-LE samples (values clipped to int16), the
    exact string a SQL engine rebuilds with printf('%02X%02X', lo, hi) —
    which is what makes the decode itself cross-engine checkable (the
    DuckDB oracle re-decodes the same blobs with pure integer SQL).
    Undecodable payloads yield (NULL, NULL, -inf)."""
    n_out: list = []
    md5_out: list = []
    snr_out = np.empty(len(payloads), dtype=np.float64)
    it = zip(payloads.tolist(), clip_ids.tolist(), srs.tolist(), durs.tolist())
    for i, (raw, cid, sr, dur) in enumerate(it):
        if raw is None or cid is None or sr is None or dur is None or (
            isinstance(sr, float) and np.isnan(sr)
        ) or (isinstance(dur, float) and np.isnan(dur)):
            n_out.append(None)
            md5_out.append(None)
            snr_out[i] = float("nan")
            continue
        try:
            dec = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            n_out.append(None)
            md5_out.append(None)
            snr_out[i] = float("-inf")
            continue
        n_samples = int(sr) * int(dur) // 1000
        ref = pcm16_from_float(reference_signal(cid, n_samples)).astype(np.int32)
        d16 = np.clip(dec, -32768, 32767).astype("<i2")
        n_out.append(len(dec))
        md5_out.append(hashlib.md5(d16.tobytes().hex().upper().encode()).hexdigest())
        snr_out[i] = snr_db(ref, dec)
    return pd.DataFrame(
        {"n_samples": pd.array(n_out, dtype="Int64"),
         "dec_md5": md5_out, "snr": snr_out}
    )


@pandas_udf(DECODE_PROFILE_TYPE)
def _decode_profile_udf(
    payload: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, dur_ms: pd.Series
) -> pd.DataFrame:
    return decode_profile_batch(payload, clip_id, sr_hz, dur_ms)


def audio_decode_profile(
    payload: Column | str = "bytes",
    clip_id: Column | str = "clip_id",
    sr_hz: Column | str = "sr_hz",
    dur_ms: Column | str = "dur_ms",
) -> Column:
    """struct(n_samples, dec_md5, snr) — decode fingerprint + SNR invariant
    in ONE Arrow hop. Project the struct once and extract fields above it
    (do not reference the UDF expression from multiple siblings)."""
    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return _decode_profile_udf(c(payload), c(clip_id), c(sr_hz), c(dur_ms))


@pandas_udf(T.DoubleType())
def _audio_snr_udf(
    payload: pd.Series, clip_id: pd.Series, sr_hz: pd.Series, dur_ms: pd.Series
) -> pd.Series:
    return decode_pcm_batch(payload, clip_id, sr_hz, dur_ms)


def audio_snr(
    payload: Column | str = "bytes",
    clip_id: Column | str = "clip_id",
    sr_hz: Column | str = "sr_hz",
    dur_ms: Column | str = "dur_ms",
) -> Column:
    """Decoded-PCM SNR (dB) vs the clip's deterministic reference signal."""
    return _audio_snr_udf(F.col(payload) if isinstance(payload, str) else payload,
                          F.col(clip_id) if isinstance(clip_id, str) else clip_id,
                          F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
                          F.col(dur_ms) if isinstance(dur_ms, str) else dur_ms)


def spectral_fingerprint_batch(
    payloads: pd.Series, n_fft: int = 4096, n_bands: int = 128
) -> pd.Series:
    """Vectorized batch kernel: compact spectral fingerprint per clip.

    Decode -> first ``n_fft`` samples -> Hann window -> |rFFT| magnitude ->
    fold into ``n_bands`` equal bands -> L2 normalize (float32 list). The
    normalization makes the fingerprint invariant to amplitude scaling and
    the magnitude spectrum to phase, so a re-encode of the same recording
    (lossless, lossy-quantized, or gain-adjusted) lands within cosine
    ~1e-7 of its source while distinct recordings stay well separated —
    the audio analogue of the text MinHash/SimHash ladder. Undecodable or
    empty payloads fingerprint as None (excluded from pairing, surfaced by
    the SNR/decode checks instead). Shared by the pandas UDF and unit
    tests (testable without a SparkSession)."""
    fold = (n_fft // 2) // n_bands  # bins per band; nyquist bin dropped
    out = []
    for raw in payloads.tolist():
        if raw is None:
            out.append(None)
            continue
        try:
            dec = decode_payload(bytes(raw)).astype(np.float64)
        except (ValueError, TypeError, struct.error):
            out.append(None)
            continue
        m = min(len(dec), n_fft)
        if m == 0:
            out.append(None)
            continue
        buf = np.zeros(n_fft)
        buf[:m] = dec[:m] * np.hanning(m)
        mag = np.abs(np.fft.rfft(buf))[: n_bands * fold]
        bands = mag.reshape(n_bands, fold).sum(axis=1)
        nrm = np.linalg.norm(bands)
        if nrm == 0.0:
            out.append(None)
            continue
        out.append((bands / nrm).astype(np.float32).tolist())
    return pd.Series(out)


def audio_fingerprint(
    payload: Column | str = "bytes", n_fft: int = 4096, n_bands: int = 128
) -> Column:
    """Spectral fingerprint as array<float> (Arrow-batched pandas UDF).

    One decode+FFT per row, one Arrow hop; the result feeds the embedding
    near-dup machinery (hyperplane LSH + cosine verify). ALWAYS persist
    the projected fingerprint frame before fanning it into plane
    expressions — Catalyst re-expands the UDF per referencing expression
    otherwise (see operators/dedup.audio_near_dup_pairs)."""

    @pandas_udf(T.ArrayType(T.FloatType()))
    def _fp(p: pd.Series) -> pd.Series:
        return spectral_fingerprint_batch(p, n_fft, n_bands)

    return _fp(F.col(payload) if isinstance(payload, str) else payload)


def audio_fingerprint_buckets(
    payload: Column | str = "bytes",
    n_fft: int = 4096,
    n_bands: int = 128,
    n_planes: int = 16,
    n_tables: int = 4,
) -> Column:
    """struct(embedding array<float>, buckets array<long>): spectral
    fingerprint PLUS its hyperplane-LSH bucket ids, in ONE Arrow hop.

    The sign bits come from a vectorized numpy matmul against the same
    deterministic md5-derived planes as operators/similarity (driver-
    computed, shipped in the UDF closure) — computing them JVM-side as
    Column expressions would cost n_planes*n_tables interpreted
    higher-order-function dot products per row (measured ~10 s for 2 000
    rows vs ~0 here; HOFs run outside whole-stage codegen). Bucket id =
    (table << 16) | 16 sign bits, so tables share one join key space.
    Undecodable payloads yield a NULL struct."""
    from jsonschema_spark.operators.similarity import _plane_weights

    planes = np.array(
        [_plane_weights(p, n_bands) for p in range(n_planes * n_tables)]
    )  # (tables*planes, bands), driver-side once
    bit_w = 1 << np.arange(n_planes - 1, -1, -1, dtype=np.int64)

    out_type = T.StructType(
        [
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("buckets", T.ArrayType(T.LongType())),
        ]
    )

    @pandas_udf(out_type)
    def _fpb(p: pd.Series) -> pd.DataFrame:
        fps = spectral_fingerprint_batch(p, n_fft, n_bands)
        ok = [i for i, f in enumerate(fps) if f is not None]
        buckets = [None] * len(fps)
        if ok:
            m = np.array([fps[i] for i in ok], dtype=np.float64)
            signs = (m @ planes.T) > 0  # (k, tables*planes)
            for t in range(n_tables):
                bits = signs[:, t * n_planes : (t + 1) * n_planes]
                ids = (bits @ bit_w) | (t << 16)
                for row, b in zip(ok, ids.tolist()):
                    if buckets[row] is None:
                        buckets[row] = []
                    buckets[row].append(b)
        return pd.DataFrame({"embedding": fps, "buckets": buckets})

    return _fpb(F.col(payload) if isinstance(payload, str) else payload)


SILENCE_FLOOR_DBFS = -40.0  # frame-RMS below this counts as silence


def audio_quality_batch(
    payloads: pd.Series, srs: pd.Series, silence_db: float = SILENCE_FLOOR_DBFS
) -> pd.DataFrame:
    """Vectorized batch kernel: loudness/silence/clipping signals per clip.

    Decode -> normalize to [-1, 1] ->
      rms_dbfs       overall RMS loudness in dBFS
      peak_dbfs      peak sample level in dBFS
      silence_frac   fraction of 20 ms frames (sr/50 samples) whose frame
                     RMS is below ``silence_db`` dBFS
      clipping_frac  fraction of samples pinned at full scale (int16
                     +32767 / -32768)
      n_samples      decoded sample count (-1 on decode failure)

    These are the audio analogues of the text quality signals
    (operators/text.quality_profile): cheap per-clip scalars a curation
    funnel gates on. Undecodable/NULL payloads yield NaN metrics and
    n_samples = -1 (the SNR/decode checks surface those separately).
    Shared by the pandas UDF and unit tests (no SparkSession needed)."""
    n = len(payloads)
    rms = np.full(n, np.nan)
    peak = np.full(n, np.nan)
    silence = np.full(n, np.nan)
    clipping = np.full(n, np.nan)
    nsamp = np.full(n, -1, dtype=np.int64)
    floor = 10.0 ** (silence_db / 20.0)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        nsamp[i] = m
        if m == 0:
            silence[i] = 1.0
            clipping[i] = 0.0
            continue
        x = pcm.astype(np.float64) / 32768.0
        p = float(np.max(np.abs(x)))
        r = float(np.sqrt(np.mean(x * x)))
        rms[i] = 20.0 * np.log10(r) if r > 0.0 else -np.inf
        peak[i] = 20.0 * np.log10(p) if p > 0.0 else -np.inf
        clipping[i] = float(np.mean((pcm >= 32767) | (pcm <= -32768)))
        frame = max(1, int(sr) // 50)
        nf = m // frame
        if nf == 0:
            silence[i] = 1.0 if r < floor else 0.0
        else:
            fr = x[: nf * frame].reshape(nf, frame)
            frms = np.sqrt(np.mean(fr * fr, axis=1))
            silence[i] = float(np.mean(frms < floor))
    return pd.DataFrame(
        {
            "rms_dbfs": rms,
            "peak_dbfs": peak,
            "silence_frac": silence,
            "clipping_frac": clipping,
            "n_samples": nsamp,
        }
    )


AUDIO_QUALITY_TYPE = T.StructType(
    [
        T.StructField("rms_dbfs", T.DoubleType()),
        T.StructField("peak_dbfs", T.DoubleType()),
        T.StructField("silence_frac", T.DoubleType()),
        T.StructField("clipping_frac", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def audio_quality(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
    silence_db: float = SILENCE_FLOOR_DBFS,
) -> Column:
    """struct(rms_dbfs, peak_dbfs, silence_frac, clipping_frac, n_samples)
    — ONE Arrow hop for the whole signal family. Persist the projected
    struct before deriving multiple gate columns from it (Catalyst project
    collapsing re-runs the UDF per referencing expression otherwise)."""

    @pandas_udf(AUDIO_QUALITY_TYPE)
    def _aq(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return audio_quality_batch(p, sr, silence_db)

    return _aq(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


AUDIO_LOUDNESS_TYPE = T.StructType(
    [
        T.StructField("lufs_integrated", T.DoubleType()),
        T.StructField("lufs_momentary_max", T.DoubleType()),
        T.StructField("true_peak_dbtp", T.DoubleType()),
        T.StructField("n_blocks", T.LongType()),
    ]
)


def loudness_profile_batch(
    payloads: pd.Series, srs: pd.Series
) -> pd.DataFrame:
    """Vectorized batch kernel: BS.1770-4 / EBU R128 loudness per clip
    (integrated LUFS with the -70 LUFS absolute + relative -10 LU
    two-stage gate, momentary-max LUFS, 4x-oversampled true peak in
    dBTP, gating-block count). Decode failures yield NULL metrics and
    n_blocks = -1; clips shorter than one 400 ms gating block yield NULL
    loudness with n_blocks = 0 (true peak is still measured).

    The per-sample K-weighting IIR is the one sequential loop — run
    ONCE per distinct sample rate over a (max_len, n_clips) matrix, so
    it advances every clip together; per-clip results are bit-identical
    to single-clip evaluation (pinned), which is what lets driver-side
    ledgers certify executor output exactly. Shared by the pandas UDF
    and unit tests (no SparkSession needed)."""
    from jsonschema_spark.functions.loudness import loudness_batch

    n = len(payloads)
    signals: list = [None] * n
    srs_l = srs.tolist()
    for i, raw in enumerate(payloads.tolist()):
        sr = srs_l[i]
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        try:
            signals[i] = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
    out = {
        "lufs_integrated": np.full(n, np.nan),
        "lufs_momentary_max": np.full(n, np.nan),
        "true_peak_dbtp": np.full(n, np.nan),
        "n_blocks": np.full(n, -1, dtype=np.int64),
    }
    by_sr: dict[int, list[int]] = {}
    for i, s in enumerate(signals):
        if s is not None:
            by_sr.setdefault(int(srs_l[i]), []).append(i)
    # bound the padded working set: ~256 clips per kernel call keeps the
    # (max_len x clips) float64 matrix tens of MB regardless of Arrow
    # batch size; chunking SORTED by length means each chunk's recursion
    # only runs to that chunk's own max (measured 1.6x on mixed-duration
    # corpora). Results are batch-invariant — pinned — so neither
    # chunking nor ordering can change values.
    chunk = 256
    for sr, idxs in by_sr.items():
        idxs = sorted(idxs, key=lambda i: len(signals[i]))
        for c0 in range(0, len(idxs), chunk):
            part = idxs[c0 : c0 + chunk]
            r = loudness_batch([signals[i] for i in part], sr)
            for k in out:
                out[k][part] = r[k]
    df = pd.DataFrame(out)
    df["n_blocks"] = df["n_blocks"].astype(np.int64)
    return df


def audio_loudness(
    payload: Column | str = "bytes", sr_hz: Column | str = "sr_hz"
) -> Column:
    """struct(lufs_integrated, lufs_momentary_max, true_peak_dbtp,
    n_blocks) — BS.1770-4 program loudness + true peak in ONE Arrow hop
    (functions/loudness.py). NaN marks undefined metrics (undecodable /
    sub-block-length / fully-gated clips); persist the projected struct
    before deriving multiple gate columns (project-collapsing re-runs
    the UDF per referencing expression otherwise)."""

    @pandas_udf(AUDIO_LOUDNESS_TYPE)
    def _al(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return loudness_profile_batch(p, sr)

    return _al(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def quality_gates(
    q: Column,
    max_silence_frac: float = 0.2,
    max_clipping_frac: float = 0.005,
    min_rms_dbfs: float = -45.0,
) -> Column:
    """struct(silent, clipped, too_quiet, pass) gate booleans over an
    ``audio_quality`` struct column — pure Column expressions (JVM-side),
    NULL-safe: undecodable clips (NaN metrics) fail every gate loudly."""
    ok = lambda c: F.coalesce(c, F.lit(False))  # noqa: E731
    silent = ~ok(~F.isnan(q["silence_frac"]) & (q["silence_frac"] <= max_silence_frac))
    clipped = ~ok(
        ~F.isnan(q["clipping_frac"]) & (q["clipping_frac"] <= max_clipping_frac)
    )
    quiet = ~ok(~F.isnan(q["rms_dbfs"]) & (q["rms_dbfs"] >= min_rms_dbfs))
    return F.struct(
        silent.alias("silent"),
        clipped.alias("clipped"),
        quiet.alias("too_quiet"),
        (~silent & ~clipped & ~quiet).alias("pass"),
    )


AUDIO_BANDWIDTH_TYPE = T.StructType(
    [
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("est_freq_hz", T.DoubleType()),
    ]
)


def bandwidth_profile_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    """Vectorized batch kernel: zero-crossing bandwidth proxy per clip.

    Decode -> count sign transitions of the int16 waveform (a sample of
    exactly 0 counts as non-negative, so the count is a pure integer
    function of the bytes — no float thresholds, fully deterministic):

      zero_crossings  number of i in [1, n) with sign(x[i]) != sign(x[i-1])
      n_samples       decoded sample count (-1 on decode failure)
      est_freq_hz     zero_crossings * sr / (2 * (n - 1)) — the dominant-
                      frequency estimate (exact for tonal content to within
                      ~sr/n Hz; a band-limited content proxy in general)

    Why it matters at corpus scale: audio whose estimated content
    bandwidth sits far below the claimed sample rate's Nyquist is the
    classic signature of UPSAMPLED material (8 kHz telephony re-encoded
    as "16 kHz"), and content crowding Nyquist signals aliasing-prone or
    mislabeled-rate clips. Both are metadata-vs-payload consistency
    checks the schema keywords alone cannot express.
    Shared by the pandas UDF and unit tests (no SparkSession needed)."""
    n = len(payloads)
    zc = np.full(n, -1, dtype=np.int64)
    nsamp = np.full(n, -1, dtype=np.int64)
    est = np.full(n, np.nan)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        nsamp[i] = m
        if m < 2:
            zc[i] = 0
            continue
        nonneg = pcm >= 0
        c = int(np.count_nonzero(nonneg[1:] != nonneg[:-1]))
        zc[i] = c
        est[i] = c * float(sr) / (2.0 * (m - 1))
    return pd.DataFrame(
        {"zero_crossings": zc, "n_samples": nsamp, "est_freq_hz": est}
    )


def audio_bandwidth(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(zero_crossings, n_samples, est_freq_hz) — ONE Arrow hop.
    Persist the projected struct before deriving multiple gate columns
    from it (Catalyst project collapsing re-runs the UDF otherwise)."""

    @pandas_udf(AUDIO_BANDWIDTH_TYPE)
    def _bw(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return bandwidth_profile_batch(p, sr)

    return _bw(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def bandwidth_gates(
    bw: Column,
    sr_hz: Column | str = "sr_hz",
    upsample_frac: float = 1.0 / 32.0,
    crowd_frac: float = 0.45,
) -> Column:
    """struct(upsample_suspect, nyquist_crowded, bandwidth_ok) over an
    ``audio_bandwidth`` struct — pure Column expressions, NULL-safe
    (undecodable clips fail the ok gate loudly, flag neither suspect).

    upsample_suspect: est_freq < sr * upsample_frac (content band sits at
    <1/16 of Nyquist — the upsampled-telephony signature).
    nyquist_crowded: est_freq > sr * crowd_frac (content rides the rate
    ceiling — mislabeled-rate / aliasing-prone)."""
    sr = (F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz).cast("double")
    e = bw["est_freq_hz"]
    decoded = F.coalesce(~F.isnan(e), F.lit(False))
    up = decoded & (e < sr * F.lit(upsample_frac))
    crowd = decoded & (e > sr * F.lit(crowd_frac))
    return F.struct(
        up.alias("upsample_suspect"),
        crowd.alias("nyquist_crowded"),
        (decoded & ~up & ~crowd).alias("bandwidth_ok"),
    )


AUDIO_HUM_TYPE = T.StructType(
    [
        T.StructField("dc_offset", T.DoubleType()),
        T.StructField("hum_dbr_50", T.DoubleType()),
        T.StructField("hum_dbr_60", T.DoubleType()),
        T.StructField("hum_prom_50", T.DoubleType()),
        T.StructField("hum_prom_60", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)

# 50 Hz hum needs >= ~2 cycles AND enough window to separate the 50 and
# 60 Hz families (1/(60-50) = 100 ms); require 200 ms before estimating.
_HUM_MIN_WINDOW_FRAC = 5  # n_samples >= sr / 5


def hum_profile_batch(payloads: pd.Series, srs: pd.Series) -> pd.DataFrame:
    """Vectorized batch kernel: mains-hum + DC-offset screen per clip.

      dc_offset   mean(x) / 32768 — a nonzero DC bias is the signature of
                  a miswired ADC / bad high-pass stage and silently eats
                  headroom in every downstream augmentation
      hum_dbr_50  10*log10(tone_ms / signal_ms) where tone_ms pools the
                  50/100/150 Hz single-bin DFT power estimates (mains
                  hum carries harmonics) and signal_ms is the DC-removed
                  mean square; NaN when undecodable, shorter than 200 ms
                  (50 vs 60 Hz unresolvable), or digitally silent
      hum_dbr_60  same for the 60/120/180 Hz family
      hum_prom_50 line PROMINENCE: 10*log10(tone_ms / flank_ms) against
                  the same harmonics' bins offset ±7 Hz — a true mains
                  line towers over its local noise floor, while program
                  material has comparable power in neighboring bins, so
                  prominence is what separates hum from low-frequency
                  content that merely OCCUPIES the 50/60 Hz bins
      hum_prom_60 same for the 60 Hz family
      n_samples   decoded count (-1 on decode failure)

    The single-bin DFT amplitude estimate is c = (2/n)|Σ x e^{-2πi f t/sr}|
    (exact for a steady tone, window-leakage-bounded otherwise); each
    family's tone mean square is Σ c²/2 over its in-band harmonics. Pure
    numpy dot products per clip — O(n) per family, no FFT length games.
    Shared by the pandas UDF and unit tests (no SparkSession needed)."""
    n = len(payloads)
    dc = np.full(n, np.nan)
    h50 = np.full(n, np.nan)
    h60 = np.full(n, np.nan)
    p50 = np.full(n, np.nan)
    p60 = np.full(n, np.nan)
    nsamp = np.full(n, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        nsamp[i] = m
        if m == 0:
            continue
        x = pcm.astype(np.float64)
        mean = x.mean()
        dc[i] = mean / 32768.0
        if m * _HUM_MIN_WINDOW_FRAC < sr:
            continue
        xd = x - mean
        sig_ms = float(np.mean(xd * xd))
        if sig_ms <= 0.0:
            continue
        t = np.arange(m, dtype=np.float64) * (2.0 * np.pi / float(sr))

        def _bin_ms(f: float) -> float:
            ph = t * f
            c_re = float(np.dot(xd, np.cos(ph)))
            c_im = float(np.dot(xd, np.sin(ph)))
            amp = 2.0 / m * np.sqrt(c_re * c_re + c_im * c_im)
            return amp * amp / 2.0

        out = ((h50, p50), (h60, p60))
        for k, fam in enumerate((50.0, 60.0)):
            tone_ms = 0.0
            flank_ms = 0.0
            n_flank = 0
            for harm in (1.0, 2.0, 3.0):
                f = fam * harm
                if 2.0 * (f + 7.0) >= float(sr):
                    break
                tone_ms += _bin_ms(f)
                flank_ms += _bin_ms(f - 7.0) + _bin_ms(f + 7.0)
                n_flank += 2
            # zero power (analytically orthogonal content) stays NaN —
            # never emit infinities into cross-engine-compared columns
            if tone_ms > 0.0:
                out[k][0][i] = 10.0 * np.log10(tone_ms / sig_ms)
                # floor the flank denominator (CLAUDE.md: a zero/NULL
                # denominator silently unflags) — prominence caps at
                # 120 dB over the signal floor instead of emitting inf
                floor = sig_ms * 1e-12
                out[k][1][i] = 10.0 * np.log10(
                    tone_ms / max(flank_ms / n_flank, floor)
                )
    return pd.DataFrame(
        {"dc_offset": dc, "hum_dbr_50": h50, "hum_dbr_60": h60,
         "hum_prom_50": p50, "hum_prom_60": p60, "n_samples": nsamp}
    )


def audio_hum(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
) -> Column:
    """struct(dc_offset, hum_dbr_50, hum_dbr_60, n_samples) — ONE Arrow
    hop. Persist the projected struct before deriving multiple gate
    columns (Catalyst project collapsing re-runs the UDF otherwise)."""

    @pandas_udf(AUDIO_HUM_TYPE)
    def _hum(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return hum_profile_batch(p, sr)

    return _hum(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def hum_gates(
    h: Column,
    max_hum_dbr: float = -25.0,
    min_prom_db: float = 10.0,
    max_dc_offset: float = 0.02,
) -> Column:
    """struct(hum_suspect, dc_suspect, hum_ok) over an ``audio_hum``
    struct — pure Column expressions, NULL-safe (undecodable clips fail
    the ok gate loudly, flag neither suspect; clips too short to resolve
    mains frequencies gate on DC alone).

    A family is hum ONLY when both hold: its pooled level exceeds
    ``max_hum_dbr`` relative to the signal (audibility) AND its line
    prominence over the ±7 Hz flanking bins exceeds ``min_prom_db``
    (it's a LINE, not program content occupying low bins)."""
    d = h["dc_offset"]
    # the kernel's NaN sentinels arrive as NULL through Arrow
    # (nan-as-null), and Spark's isnan(NULL) is FALSE — guard with
    # isNotNull, not isnan alone, or torn rows yield NULL gates
    decoded = d.isNotNull() & ~F.isnan(d)

    def _fam(lvl: Column, prom: Column) -> Column:
        return F.coalesce(
            ~F.isnan(lvl) & (lvl > max_hum_dbr)
            & ~F.isnan(prom) & (prom > min_prom_db),
            F.lit(False),
        )

    hum = _fam(h["hum_dbr_50"], h["hum_prom_50"]) | _fam(
        h["hum_dbr_60"], h["hum_prom_60"]
    )
    dc_bad = F.coalesce(
        decoded & (F.abs(d) > max_dc_offset), F.lit(False)
    )
    return F.struct(
        hum.alias("hum_suspect"),
        dc_bad.alias("dc_suspect"),
        (decoded & ~hum & ~dc_bad).alias("hum_ok"),
    )


def reference_transcript(clip_id: str) -> str:
    """Ground-truth transcript regenerated from clip_id alone (the row
    invariant's second half: transcript string equality per input_hint).
    Deterministic word sequence — mirrors sources/clips.transcript_for."""
    h = int.from_bytes(hashlib.md5(("t:" + clip_id).encode()).digest()[:8], "little")
    from jsonschema_spark.sources.clips import _WORDS

    n = 3 + h % 10
    return " ".join(_WORDS[(h >> (4 * k)) % len(_WORDS)] for k in range(n))


@pandas_udf(T.StringType())
def _reference_transcript_udf(clip_id: pd.Series) -> pd.Series:
    return clip_id.map(lambda c: reference_transcript(c) if c is not None else None)


def transcript_ok(
    transcript: Column | str = "transcript", clip_id: Column | str = "clip_id"
) -> Column:
    """Boolean per-row transcript-equality invariant vs the regenerated
    reference; NULL transcript is ABSENT (handled by minLength/required),
    so it passes vacuously here."""
    tc = F.col(transcript) if isinstance(transcript, str) else transcript
    cc = F.col(clip_id) if isinstance(clip_id, str) else clip_id
    return F.when(tc.isNull(), F.lit(True)).otherwise(
        F.coalesce(tc == _reference_transcript_udf(cc), F.lit(False))
    )


def speech_rate_ok(
    min_cps: float = 5.0,
    max_cps: float = 200.0,
    transcript: Column | str = "transcript",
    dur_ms: Column | str = "dur_ms",
) -> Column:
    """Transcript/duration alignment: characters-per-second inside
    [min_cps, max_cps] — the cross-field sanity bound speech pipelines run
    (a 2-word transcript on a 30 s clip, or a paragraph on 200 ms, signals
    a mis-paired row even when both fields individually validate). A pure
    Column expression for CompileOptions.row_checks — JSON Schema itself
    cannot relate two properties arithmetically. NULL/non-positive inputs
    pass vacuously (required/minimum cover those)."""
    t = F.col(transcript) if isinstance(transcript, str) else transcript
    d = F.col(dur_ms) if isinstance(dur_ms, str) else dur_ms
    cps = F.length(t) / (d.cast("double") / 1000.0)
    return F.when(t.isNull() | d.isNull() | (d <= 0), F.lit(True)).otherwise(
        (cps >= min_cps) & (cps <= max_cps)
    )


def audio_snr_ok(threshold_db: float = SNR_THRESHOLD_DB, **cols) -> Column:
    """Boolean content check: decode + SNR >= threshold; NULL payload passes
    vacuously (absent property semantics, see plans/compile.py).
    """
    payload = cols.get("payload", "bytes")
    pc = F.col(payload) if isinstance(payload, str) else payload
    snr = audio_snr(payload, cols.get("clip_id", "clip_id"),
                    cols.get("sr_hz", "sr_hz"), cols.get("dur_ms", "dur_ms"))
    return F.when(pc.isNull(), F.lit(True)).otherwise(
        F.coalesce(snr >= threshold_db, F.lit(False))
    )


# ---------------------------------------------------------------------------
# Speech-span detection (energy VAD) + sample-rate decimation — payload-
# rewriting curation kernels. Both are integer-exact by construction so a
# SQL oracle can recompute them bit-for-bit from the same parquet bytes
# (no float thresholds anywhere in the decision path).
# ---------------------------------------------------------------------------

# |int16| amplitude at/below which a sample counts as silence for span
# detection: 327 =~ -40 dBFS. Integer compare (not frame RMS) keeps the
# voiced/silent decision bit-exact across engines — no float summation
# order to disagree on.
SILENCE_AMP = 327


def speech_span_batch(
    payloads: pd.Series,
    srs: pd.Series,
    silence_amp: int = SILENCE_AMP,
    frame_div: int = 50,
) -> pd.DataFrame:
    """Vectorized batch kernel: leading/trailing-silence span per clip.

    Frames of ``sr // frame_div`` samples (20 ms at frame_div=50; the final
    partial frame is its own shorter frame). A frame is *voiced* iff
    max(|sample|) > ``silence_amp``. The speech span is
    [first_voiced_frame * frame, min((last_voiced_frame + 1) * frame, n)),
    i.e. whole frames — deliberately conservative so trimming never cuts
    into speech mid-frame.

    Returns (n_samples, start_sample, end_sample):
      n_samples = -1 and NULL-like -1 spans on NULL/undecodable input
      (callers surface decode failures separately);
      all-silent clips get start = end = 0 (empty span);
      |int16| is taken in int32 (|-32768| overflows int16).

    Decision path is pure integer arithmetic -> a DuckDB oracle unnesting
    the hex-decoded samples reproduces every span exactly.
    """
    n = len(payloads)
    nsamp = np.full(n, -1, dtype=np.int64)
    start = np.full(n, -1, dtype=np.int64)
    end = np.full(n, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        if int(sr) <= 0:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        nsamp[i] = m
        if m == 0:
            start[i] = 0
            end[i] = 0
            continue
        fr = max(1, int(sr) // frame_div)
        a = np.abs(pcm.astype(np.int32))
        offs = np.arange(0, m, fr)
        fmax = np.maximum.reduceat(a, offs)
        voiced = np.nonzero(fmax > silence_amp)[0]
        if voiced.size == 0:
            start[i] = 0
            end[i] = 0
        else:
            start[i] = int(voiced[0]) * fr
            end[i] = min((int(voiced[-1]) + 1) * fr, m)
    return pd.DataFrame(
        {"n_samples": nsamp, "start_sample": start, "end_sample": end}
    )


SPEECH_SPAN_TYPE = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("start_sample", T.LongType()),
        T.StructField("end_sample", T.LongType()),
    ]
)


def speech_span(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
    silence_amp: int = SILENCE_AMP,
    frame_div: int = 50,
) -> Column:
    """struct(n_samples, start_sample, end_sample) — ONE Arrow hop. Only
    the 24-byte span crosses back from Python; the payload slice itself is
    JVM-side binary ``substring`` (operators/trim.py), so trimmed bytes
    never round-trip through the Python worker."""

    @pandas_udf(SPEECH_SPAN_TYPE)
    def _span(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return speech_span_batch(p, sr, silence_amp, frame_div)

    return _span(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def decimate_batch(
    payloads: pd.Series, srs: pd.Series, target_sr: int
) -> pd.DataFrame:
    """Vectorized batch kernel: integer-factor sample-rate decimation.

    Row is resampled iff it decodes and ``sr % target_sr == 0``; output is
    every ``factor``-th decoded sample re-emitted as raw pcm_s16le (i.e.
    containers are transcoded to PCM on the way through — the decode
    already paid for itself). Rows that don't qualify return NULL bytes +
    n_out = -1 so callers can pass them through unchanged and LOUDLY
    flag non-integer ratios instead of silently approximating.

    Decimation (sample dropping) is exact and oracle-reproducible; it
    assumes content is band-limited below the target Nyquist — true for
    speech at >= 8 kHz targets. A production extension would put a
    polyphase anti-alias FIR in this same Arrow hop; the plumbing
    (schema, batch shape, byte flow) would not change.
    """
    if target_sr <= 0:
        raise ValueError("target_sr must be positive")
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        sr = int(sr)
        if sr <= 0 or sr % target_sr != 0:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        dec = pcm[:: sr // target_sr]
        outb[i] = dec.astype("<i2").tobytes()
        nout[i] = len(dec)
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


DECIMATE_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
    ]
)


def decimate(
    payload: Column | str,
    sr_hz: Column | str,
    target_sr: int,
) -> Column:
    """struct(out_bytes, n_out): payload decimated to ``target_sr`` (see
    decimate_batch). One Arrow hop; n_out = -1 marks not-resampled rows."""

    @pandas_udf(DECIMATE_TYPE)
    def _dec(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return decimate_batch(p, sr, target_sr)

    return _dec(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def interpolate_batch(
    payloads: pd.Series, srs: pd.Series, target_sr: int
) -> pd.DataFrame:
    """Vectorized batch kernel: integer-factor linear-interpolation
    upsampling (8 kHz telephony -> 16 kHz ASR models, 16 -> 32, ...).

    Row is resampled iff it decodes and ``target_sr % sr == 0`` with
    factor L > 1; output sample j (of n*L) is the exact-integer linear
    blend of input q = j//L and q+1 (clamped):

        out[j] = ((L-r)*(x[q]+32768) + r*(x[q+1]+32768)) // L - 32768

    with r = j%L — the +32768 offset-binary trick keeps the numerator
    nonnegative so truncating division IS floor on every engine, and
    r == 0 reproduces the original samples bit-for-bit. Rows that don't
    qualify return NULL bytes + n_out = -1 (pass through unchanged,
    LOUDLY flag non-integer ratios — mirror of decimate_batch).

    Linear interpolation adds no imaging filter; production would put a
    polyphase FIR in this same Arrow hop — plumbing unchanged."""
    if target_sr <= 0:
        raise ValueError("target_sr must be positive")
    n_rows = len(payloads)
    outb: list = [None] * n_rows
    nout = np.full(n_rows, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        sr = int(sr)
        if sr <= 0 or target_sr % sr != 0 or target_sr // sr < 2:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        n = len(pcm)
        if n == 0:
            outb[i] = b""
            nout[i] = 0
            continue
        L = target_sr // sr
        x = pcm.astype(np.int64) + 32768          # offset-binary
        j = np.arange(n * L, dtype=np.int64)
        q, r = j // L, j % L
        xq = x[q]
        xq1 = x[np.minimum(q + 1, n - 1)]
        val = ((L - r) * xq + r * xq1) // L - 32768
        outb[i] = val.astype("<i2").tobytes()
        nout[i] = n * L
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


def upsample(
    payload: Column | str,
    sr_hz: Column | str,
    target_sr: int,
) -> Column:
    """struct(out_bytes, n_out): payload linearly upsampled to
    ``target_sr`` (see interpolate_batch). One Arrow hop; n_out = -1
    marks not-resampled rows."""

    @pandas_udf(DECIMATE_TYPE)
    def _up(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return interpolate_batch(p, sr, target_sr)

    return _up(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def window_pcm_batch(
    payloads: pd.Series,
    srs: pd.Series,
    off_ms: pd.Series,
    win_ms: pd.Series,
) -> pd.DataFrame:
    """Vectorized batch kernel: extract the [off_ms, off_ms+win_ms)
    sample window of each clip as raw mono pcm_s16le — WITHOUT decoding
    the whole clip where the container allows a seek:

    - REAL FLAC: decode_flac_range via the SEEKTABLE — only the frames
      covering the window are parsed (O(window), not O(clip); leading
      corruption cannot fail the read);
    - RIFF/WAVE PCM16 mono: a direct byte slice of the data chunk
      (zero decode);
    - raw pcm_s16le: a direct byte slice;
    - everything else decodes fully, then slices (correct, not seeked).

    Windows clamp at the clip end (n_out < requested near the tail);
    undecodable rows return NULL + n_out = -1."""
    from jsonschema_spark.functions.flac import decode_flac_range

    n_rows = len(payloads)
    outb: list = [None] * n_rows
    nout = np.full(n_rows, -1, dtype=np.int64)
    it = zip(payloads.tolist(), srs.tolist(), off_ms.tolist(), win_ms.tolist())
    for i, (raw, sr, off, win) in enumerate(it):
        if raw is None or sr is None or off is None or win is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            continue
        sr, off, win = int(sr), int(off), int(win)
        if sr <= 0 or off < 0 or win <= 0:
            continue
        start = sr * off // 1000
        cnt = sr * win // 1000
        raw = bytes(raw)
        try:
            if raw[:4] == b"fLaC":
                from jsonschema_spark.functions.flac import _parse_stream

                fbits = _parse_stream(raw)[3]
                _sr2, w = decode_flac_range(raw, start, cnt)
                if w.ndim == 2:
                    w = np.floor_divide(
                        w.astype(np.int64).sum(axis=1), w.shape[1]
                    )
                # engine int16 conventions (see decode_payload)
                if fbits > 16:
                    w = np.asarray(w, dtype=np.int64) >> (fbits - 16)
                elif fbits < 16:
                    w = np.asarray(w, dtype=np.int64) << (16 - fbits)
            elif raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
                fmt, ch, _s, bits, _ba, _fact, data = _parse_wav(raw)
                if (fmt, ch, bits) == (1, 1, 16):
                    w = np.frombuffer(
                        data[2 * start : 2 * (start + cnt)], dtype="<i2"
                    )
                else:
                    w = _decode_wav_pcm16(raw)[start : start + cnt]
            elif raw[:5] == _FLAC_MAGIC or raw[:4] == _OPUS_MAGIC:
                w = decode_payload(raw)[start : start + cnt]
            else:
                sl = raw[2 * start : 2 * (start + cnt)]
                w = np.frombuffer(sl[: (len(sl) // 2) * 2], dtype="<i2")
        except (ValueError, TypeError, struct.error):
            continue
        outb[i] = np.asarray(w).astype("<i2").tobytes()
        nout[i] = len(w)
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


def window_pcm(
    payload: Column | str,
    sr_hz: Column | str,
    off_ms: Column | str,
    win_ms: Column | str,
) -> Column:
    """struct(out_bytes, n_out): the [off, off+win) ms sample window as
    raw mono pcm_s16le (see window_pcm_batch — seeked for FLAC/WAV/raw
    PCM, full-decode fallback otherwise). One Arrow hop."""

    @pandas_udf(DECIMATE_TYPE)
    def _win(
        p: pd.Series, sr: pd.Series, off: pd.Series, win: pd.Series
    ) -> pd.DataFrame:
        return window_pcm_batch(p, sr, off, win)

    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return _win(c(payload), c(sr_hz), c(off_ms), c(win_ms))


def transcode_flac_batch(
    payloads: pd.Series, srs: pd.Series, lpc_max_order: int = 0
) -> pd.DataFrame:
    """Vectorized batch kernel: archival codec normalization — decode any
    supported payload (WAV 8/16/24-bit mono/stereo, G.711, ADPCM, FLAC,
    raw PCM) and re-encode the mono int16 stream as REAL FLAC
    (functions/flac.py). FLAC is lossless, so decode(transcode(x)) must
    equal decode(x) bit-for-bit — the invariant the contract query pins
    against the source-sample ledger. Undecodable or empty rows return
    NULL bytes + n_out = -1 (quarantine upstream, never guess)."""
    from jsonschema_spark.functions.flac import encode_flac

    n_rows = len(payloads)
    outb: list = [None] * n_rows
    nout = np.full(n_rows, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        sr = int(sr)
        if sr <= 0:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        if len(pcm) == 0:
            continue  # encode_flac rejects empty signals
        outb[i] = encode_flac(
            pcm.astype(np.int64), sr, lpc_max_order=lpc_max_order
        )
        nout[i] = len(pcm)
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


def transcode_flac(
    payload: Column | str = "bytes",
    sr_hz: Column | str = "sr_hz",
    lpc_max_order: int = 0,
) -> Column:
    """struct(out_bytes, n_out): payload re-encoded as REAL FLAC (see
    transcode_flac_batch). One Arrow hop; n_out = -1 marks rows that
    could not be transcoded. ``lpc_max_order=k`` enables the quantized
    LPC predictor trial (smaller archives on tonal material; still
    lossless either way)."""

    @pandas_udf(DECIMATE_TYPE)
    def _tc(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return transcode_flac_batch(p, sr, lpc_max_order)

    return _tc(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


def gain_normalize_batch(
    payloads: pd.Series,
    target_rms: float = 0.1,
    max_gain: float = 4.0,
) -> pd.DataFrame:
    """Vectorized batch kernel: loudness (RMS) normalization.

    gain = min(max_gain, target_rms / rms_linear) where
    rms_linear = sqrt(sum(v^2) / n) / 32768; each sample becomes
    clip(floor(v * gain + 0.5), -32768, 32767) re-emitted as raw
    pcm_s16le (containers transcode on the way through).

    EVERY operation in both the gain and the sample path is exactly
    rounded IEEE double arithmetic (sum of int squares is exact in int64,
    division / sqrt / multiply are correctly rounded, floor(x + 0.5) is
    explicit half-up — np.round's half-to-even would NOT be SQL-
    reproducible) — so a DuckDB oracle recomputes the output payload
    bit-for-bit. All-zero clips keep gain = max_gain by definition
    (zeros stay zeros; avoids the div-by-zero NULL/inf engine split).
    NULL/undecodable rows return NULL bytes + n_out = -1.
    """
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    gains = np.full(n, np.nan)
    for i, raw in enumerate(payloads.tolist()):
        if raw is None:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        nout[i] = m
        if m == 0:
            outb[i] = b""
            gains[i] = max_gain
            continue
        v = pcm.astype(np.int64)
        ss = int(np.dot(v, v))  # exact: n * 32768^2 << 2^63
        if ss == 0:
            g = float(max_gain)
        else:
            g = min(float(max_gain), target_rms / (np.sqrt(ss / m) / 32768.0))
        gains[i] = g
        out = np.floor(pcm.astype(np.float64) * g + 0.5)
        out = np.clip(out, -32768.0, 32767.0).astype("<i2")
        outb[i] = out.tobytes()
    return pd.DataFrame({"out_bytes": outb, "n_out": nout, "gain": gains})


GAIN_NORMALIZE_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("gain", T.DoubleType()),
    ]
)


def gain_normalize(
    payload: Column | str,
    target_rms: float = 0.1,
    max_gain: float = 4.0,
) -> Column:
    """struct(out_bytes, n_out, gain): RMS-normalized payload (see
    gain_normalize_batch). One Arrow hop; n_out = -1 marks pass-through."""

    @pandas_udf(GAIN_NORMALIZE_TYPE)
    def _gn(p: pd.Series) -> pd.DataFrame:
        return gain_normalize_batch(p, target_rms, max_gain)

    return _gn(F.col(payload) if isinstance(payload, str) else payload)


def lufs_normalize_batch(
    payloads: pd.Series,
    srs: pd.Series,
    target_lufs: float = -23.0,
    max_gain: float = 8.0,
) -> pd.DataFrame:
    """Vectorized batch kernel: loudness normalization to a target
    INTEGRATED program loudness (BS.1770-4 gated LUFS — the broadcast /
    speech-corpus convention, e.g. EBU R128's -23), the perceptual
    upgrade over plain RMS normalization (gain_normalize): K-weighting
    discounts inaudible LF rumble and the gate ignores silence, so two
    clips normalized here sound equally loud even when their RMS differ.

    gain = min(max_gain, 10^((target - measured)/20)); each sample
    becomes clip(floor(v * gain + 0.5)) re-emitted as raw pcm_s16le.
    Unlike the RMS path the GAIN is not SQL-replayable (pow/log and the
    K-weighting IIR are not correctly-rounded cross-engine), so the
    contract oracle is a synth-time ledger (clips_lufs_normalize)
    instead of a DuckDB recomputation — the sample rewrite itself is
    still the exact floor(v*g + 0.5) integer path. Clips whose loudness
    is UNDEFINED (undecodable, shorter than one 400 ms gating block, or
    fully gated) pass through unmodified with n_out = -1 — a normalizer
    that cannot measure must not guess. One loudness measurement + one
    rewrite per clip, one Arrow hop."""
    from jsonschema_spark.functions.loudness import loudness_batch

    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    gains = np.full(n, np.nan)
    lufs = np.full(n, np.nan)
    signals: list = [None] * n
    srs_l = srs.tolist()
    for i, raw in enumerate(payloads.tolist()):
        sr = srs_l[i]
        if raw is None or sr is None or (isinstance(sr, float) and np.isnan(sr)):
            continue
        try:
            signals[i] = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
    by_sr: dict[int, list[int]] = {}
    for i, s in enumerate(signals):
        if s is not None and len(s) > 0:
            by_sr.setdefault(int(srs_l[i]), []).append(i)
    chunk = 256
    for sr, idxs in by_sr.items():
        idxs = sorted(idxs, key=lambda i: len(signals[i]))
        for c0 in range(0, len(idxs), chunk):
            part = idxs[c0 : c0 + chunk]
            li = loudness_batch([signals[i] for i in part], sr)[
                "lufs_integrated"
            ]
            for k, i in enumerate(part):
                if np.isnan(li[k]):
                    continue
                lufs[i] = li[k]
                g = min(
                    float(max_gain),
                    10.0 ** ((target_lufs - float(li[k])) / 20.0),
                )
                gains[i] = g
                pcm = signals[i]
                out = np.floor(pcm.astype(np.float64) * g + 0.5)
                out = np.clip(out, -32768.0, 32767.0).astype("<i2")
                outb[i] = out.tobytes()
                nout[i] = len(pcm)
    return pd.DataFrame(
        {"out_bytes": outb, "n_out": nout, "gain": gains,
         "lufs_in": lufs}
    )


LUFS_NORMALIZE_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("gain", T.DoubleType()),
        T.StructField("lufs_in", T.DoubleType()),
    ]
)


def lufs_normalize(
    payload: Column | str,
    sr_hz: Column | str = "sr_hz",
    target_lufs: float = -23.0,
    max_gain: float = 8.0,
) -> Column:
    """struct(out_bytes, n_out, gain, lufs_in): BS.1770-gated loudness
    normalization (see lufs_normalize_batch). One Arrow hop; n_out = -1
    marks pass-through (undecodable or unmeasurable loudness)."""

    @pandas_udf(LUFS_NORMALIZE_TYPE)
    def _ln(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return lufs_normalize_batch(p, sr, target_lufs, max_gain)

    return _ln(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(sr_hz) if isinstance(sr_hz, str) else sr_hz,
    )


# ---------------------------------------------------------------------------
# Training-data augmentation kernels: speed perturbation + overlay mixing.
# Both are integer/exactly-rounded-double arithmetic end to end, so the
# DuckDB oracle recomputes output payloads bit-for-bit from the parquet
# blobs (time masking needs no kernel at all — it is pure JVM binary
# surgery in operators/augment.py).
# ---------------------------------------------------------------------------


def speed_gather_batch(
    payloads: pd.Series, num: int, den: int
) -> pd.DataFrame:
    """Vectorized batch kernel: speed perturbation by the exact rational
    factor ``num/den`` (the classic ASR 0.9x/1.1x augmentation — e.g.
    num=11, den=10 plays 1.1x faster).

    Output sample j is input sample ``(j * num) // den``; output length is
    ``(n * den) // num`` — nearest-sample resampling as pure integer index
    arithmetic (no interpolation), which keeps the payload rewrite
    bit-reproducible in SQL. Containers are transcoded to raw pcm_s16le
    on the way through (the decode already paid for itself). NULL or
    undecodable rows return NULL bytes + n_out = -1 (pass-through)."""
    if num <= 0 or den <= 0:
        raise ValueError("num and den must be positive")
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    for i, raw in enumerate(payloads.tolist()):
        if raw is None:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(pcm)
        n_out = (m * den) // num
        if n_out == 0:
            outb[i] = b""
            nout[i] = 0
            continue
        idx = (np.arange(n_out, dtype=np.int64) * num) // den
        outb[i] = pcm[idx].astype("<i2").tobytes()
        nout[i] = n_out
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


SPEED_GATHER_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
    ]
)


def speed_gather(payload: Column | str, num: int, den: int) -> Column:
    """struct(out_bytes, n_out): payload resampled to speed ``num/den``
    (see speed_gather_batch). One Arrow hop; n_out = -1 marks
    pass-through rows."""

    @pandas_udf(SPEED_GATHER_TYPE)
    def _sp(p: pd.Series) -> pd.DataFrame:
        return speed_gather_batch(p, num, den)

    return _sp(F.col(payload) if isinstance(payload, str) else payload)


def mix_payloads_batch(
    payloads: pd.Series, noise: pd.Series, gain: float
) -> pd.DataFrame:
    """Vectorized batch kernel: additive overlay mixing (speech + scaled
    background), the standard noise-augmentation primitive.

    out[i] = clip(floor(a[i] + b[i] * gain + 0.5), -32768, 32767) over
    the full length of ``a``; the noise clip is truncated past len(a) and
    contributes zero past len(b). Every operation is exactly-rounded IEEE
    double arithmetic with explicit half-up rounding (np.round's
    half-to-even would not be SQL-reproducible), so a DuckDB oracle
    rebuilds the mixed payload bit-for-bit. Containers transcode to raw
    pcm_s16le on the way through. Rows where either payload is NULL or
    undecodable return NULL bytes + n_out = -1 (pass-through)."""
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    g = float(gain)
    for i, (ra, rb) in enumerate(zip(payloads.tolist(), noise.tolist())):
        if ra is None or rb is None:
            continue
        try:
            a = decode_payload(bytes(ra))
            b = decode_payload(bytes(rb))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(a)
        nout[i] = m
        if m == 0:
            outb[i] = b""
            continue
        mixed = a.astype(np.float64).copy()
        k = min(m, len(b))
        if k:
            mixed[:k] += b[:k].astype(np.float64) * g
        out = np.clip(np.floor(mixed + 0.5), -32768.0, 32767.0)
        outb[i] = out.astype("<i2").tobytes()
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


def mix_payloads_snr_batch(
    payloads: pd.Series, noise: pd.Series, snr_lin: float
) -> pd.DataFrame:
    """SNR-targeted overlay mixing: per-pair gain derived from MEASURED
    powers over the overlap region k = min(len(a), len(b)) —

        g = sqrt(Pa) / sqrt(Pb) / r,   P = int64 sum of squares

    so after scaling, rms(signal)/rms(noise) == r (``snr_lin``, a
    LINEAR amplitude ratio — dB would drag pow/log into the float
    path and break cross-engine bit-parity; callers convert once on
    the driver). Every float op is correctly rounded in a fixed order
    (sqrt, /, *, +, floor), so the DuckDB oracle rebuilds the gain AND
    every output sample bit-for-bit. Silent noise or silent signal
    over the overlap -> g = 0 (output == input through the same
    rounding path); undecodable rows pass through with n_out = -1."""
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    gains = np.zeros(n, dtype=np.float64)
    r = float(snr_lin)
    for i, (ra, rb) in enumerate(zip(payloads.tolist(), noise.tolist())):
        if ra is None or rb is None:
            continue
        try:
            a = decode_payload(bytes(ra))
            b = decode_payload(bytes(rb))
        except (ValueError, TypeError, struct.error):
            continue
        m = len(a)
        nout[i] = m
        if m == 0:
            outb[i] = b""
            continue
        k = min(m, len(b))
        a64 = a.astype(np.int64)
        b64 = b.astype(np.int64)
        pa = int((a64[:k] * a64[:k]).sum()) if k else 0
        pb = int((b64[:k] * b64[:k]).sum()) if k else 0
        if pb > 0 and pa > 0:
            g = float(np.sqrt(float(pa))) / float(np.sqrt(float(pb))) / r
        else:
            g = 0.0
        gains[i] = g
        mixed = a.astype(np.float64).copy()
        if k:
            mixed[:k] += b[:k].astype(np.float64) * g
        out = np.clip(np.floor(mixed + 0.5), -32768.0, 32767.0)
        outb[i] = out.astype("<i2").tobytes()
    return pd.DataFrame(
        {"out_bytes": outb, "n_out": nout, "gain": gains}
    )


MIX_SNR_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("gain", T.DoubleType()),
    ]
)


def mix_payloads_snr(
    payload: Column | str, noise_payload: Column | str, snr_lin: float
) -> Column:
    """struct(out_bytes, n_out, gain): SNR-targeted overlay (see
    mix_payloads_snr_batch). One Arrow hop."""

    @pandas_udf(MIX_SNR_TYPE)
    def _mx(p: pd.Series, q: pd.Series) -> pd.DataFrame:
        return mix_payloads_snr_batch(p, q, snr_lin)

    return _mx(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(noise_payload) if isinstance(noise_payload, str) else noise_payload,
    )


MIX_PAYLOADS_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
    ]
)


def mix_payloads(
    payload: Column | str, noise_payload: Column | str, gain: float
) -> Column:
    """struct(out_bytes, n_out): payload overlaid with ``gain``-scaled
    noise payload (see mix_payloads_batch). One Arrow hop; n_out = -1
    marks pass-through rows."""

    @pandas_udf(MIX_PAYLOADS_TYPE)
    def _mx(p: pd.Series, q: pd.Series) -> pd.DataFrame:
        return mix_payloads_batch(p, q, gain)

    return _mx(
        F.col(payload) if isinstance(payload, str) else payload,
        F.col(noise_payload) if isinstance(noise_payload, str) else noise_payload,
    )


# ---------------------------------------------------------------------------
# Multichannel: stereo RIFF/WAVE + channel downmix. Real pipelines ingest
# stereo recordings and normalize to mono before feature extraction; the
# downmix is exact integer arithmetic ((l + r) >> 1 == floor((l+r)/2)),
# so the DuckDB oracle rebuilds output payloads bit-for-bit.
# ---------------------------------------------------------------------------


def encode_wav_pcm16_stereo(
    left: np.ndarray, right: np.ndarray, sr_hz: int
) -> bytes:
    """RIFF/WAVE container around interleaved stereo 16-bit PCM
    (format 1, channels=2, block align 4) — the standard layout."""
    import struct

    if len(left) != len(right):
        raise ValueError("left/right must be the same length")
    inter = np.empty(2 * len(left), dtype="<i2")
    inter[0::2] = left.astype("<i2")
    inter[1::2] = right.astype("<i2")
    data = inter.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, sr_hz, sr_hz * 4, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def downmix_batch(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized batch kernel: stereo-to-mono downmix.

    Rows whose payload is a RIFF/WAVE stereo PCM16 container are rewritten
    as raw mono pcm_s16le with out[i] = (l[i] + r[i]) >> 1 — arithmetic-
    shift floor division, exact integer arithmetic (== floor((l+r)/2.0)
    sample-for-sample, which is what the SQL oracle computes). Everything
    else — mono containers, raw PCM, NULL, undecodable — passes through
    with n_out = -1: downmixing is a no-op for already-mono rows, and
    decode failures surface through the decode checks, not here."""
    n = len(payloads)
    outb: list = [None] * n
    nout = np.full(n, -1, dtype=np.int64)
    for i, raw in enumerate(payloads.tolist()):
        if raw is None:
            continue
        b = bytes(raw)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            continue
        try:
            audio_format, channels, _sr, bits, _ba, _fact, data = _parse_wav(b)
        except (ValueError, struct.error):
            continue
        if (audio_format, channels, bits) != (1, 2, 16):
            continue
        frames = len(data) // 4
        x = (
            np.frombuffer(data[: frames * 4], dtype="<i2")
            .astype(np.int32)
            .reshape(-1, 2)
        )
        mono = (x[:, 0] + x[:, 1]) >> 1
        outb[i] = mono.astype("<i2").tobytes()
        nout[i] = frames
    return pd.DataFrame({"out_bytes": outb, "n_out": nout})


DOWNMIX_TYPE = T.StructType(
    [
        T.StructField("out_bytes", T.BinaryType()),
        T.StructField("n_out", T.LongType()),
    ]
)


@pandas_udf(DOWNMIX_TYPE)
def _downmix_udf(p: pd.Series) -> pd.DataFrame:
    return downmix_batch(p)


def downmix(payload: Column | str = "bytes") -> Column:
    """struct(out_bytes, n_out): stereo WAV payload downmixed to raw mono
    pcm_s16le (see downmix_batch). One Arrow hop; n_out = -1 marks
    pass-through (already-mono / non-WAV / undecodable) rows."""
    return _downmix_udf(F.col(payload) if isinstance(payload, str) else payload)


SEGMENT_TYPE = T.StructType(
    [
        T.StructField("segs", T.ArrayType(T.BinaryType())),
        T.StructField("n_samples", T.LongType()),
    ]
)


def segment_pcm_batch(
    payloads: pd.Series, srs: pd.Series, segment_ms: int
) -> pd.DataFrame:
    """Vectorized batch kernel: decode each payload ONCE (any supported
    container — WAV 8/16/24-bit mono/stereo, G.711, IMA/MS ADPCM, real
    FLAC, raw PCM) and slice the mono int16 stream into fixed
    ``segment_ms`` training windows, returned as an array of raw
    pcm_s16le segment payloads. This is the decode-then-segment path for
    COMPRESSED containers that ``operators.segments.segment_clips``
    cannot byte-slice (its ``sliceable=false`` rows): the O(clip) decode
    happens exactly once per clip inside one Arrow hop, and the
    per-segment fan-out stays JVM-side (``posexplode`` over the returned
    array) so segment rows never round-trip through Python.

    The final segment keeps its natural tail (shorter than segment_ms);
    concatenating the segments in index order reproduces the full decoded
    stream byte-for-byte (slicing is exhaustive and non-overlapping).
    Undecodable / NULL / non-positive-rate rows return NULL segs +
    n_samples = -1 (quarantine upstream, never guess)."""
    n_rows = len(payloads)
    segs: list = [None] * n_rows
    n_dec = np.full(n_rows, -1, dtype=np.int64)
    for i, (raw, sr) in enumerate(zip(payloads.tolist(), srs.tolist())):
        if raw is None or sr is None or (
            isinstance(sr, float) and np.isnan(sr)
        ):
            continue
        sr = int(sr)
        sps = sr * segment_ms // 1000
        if sr <= 0 or sps <= 0:
            continue
        try:
            pcm = decode_payload(bytes(raw))
        except (ValueError, TypeError, struct.error):
            continue
        b = pcm.astype("<i2").tobytes()
        n_dec[i] = len(pcm)
        step = 2 * sps
        segs[i] = [b[o : o + step] for o in range(0, len(b), step)]
    return pd.DataFrame({"segs": segs, "n_samples": n_dec})


def segment_pcm(
    payload: Column | str,
    sr_hz: Column | str,
    segment_ms: int,
) -> Column:
    """struct(segs array<binary>, n_samples): the payload decoded once and
    sliced into fixed ``segment_ms`` raw-PCM16 windows (see
    segment_pcm_batch). One Arrow hop; NULL segs + n_samples = -1 marks
    undecodable rows."""
    if segment_ms <= 0:
        raise ValueError("segment_ms must be positive")

    @pandas_udf(SEGMENT_TYPE)
    def _seg(p: pd.Series, sr: pd.Series) -> pd.DataFrame:
        return segment_pcm_batch(p, sr, segment_ms)

    c = lambda x: F.col(x) if isinstance(x, str) else x  # noqa: E731
    return _seg(c(payload), c(sr_hz))


ENERGY_TYPE = T.StructType(
    [
        T.StructField("sumsq", T.LongType()),
        T.StructField("peak", T.LongType()),
    ]
)


def pcm_energy_batch(payloads: pd.Series) -> pd.DataFrame:
    """Vectorized batch kernel: integer-EXACT energy of raw mono
    pcm_s16le payloads — sum of squares and peak |sample| of the int16
    stream (int64-safe: a 10-second 48 kHz window is < 2^49). Integer
    arithmetic end-to-end, so a SQL engine re-decoding the same bytes
    reproduces both values bit-for-bit. NULL payloads return NULL row
    values; odd trailing bytes are malformed PCM16 and also return NULL
    (loud, consistent with decode_payload's frombuffer raise)."""
    n_rows = len(payloads)
    sumsq = np.full(n_rows, np.nan, dtype=np.float64)
    peak = np.full(n_rows, np.nan, dtype=np.float64)
    for i, raw in enumerate(payloads.tolist()):
        if raw is None or len(raw) % 2 == 1:
            continue
        w = np.frombuffer(bytes(raw), dtype="<i2").astype(np.int64)
        sumsq[i] = float(np.dot(w, w))
        peak[i] = float(np.abs(w).max()) if len(w) else 0.0
    return pd.DataFrame(
        {
            "sumsq": pd.array(
                [None if np.isnan(v) else int(v) for v in sumsq],
                dtype="Int64",
            ),
            "peak": pd.array(
                [None if np.isnan(v) else int(v) for v in peak],
                dtype="Int64",
            ),
        }
    )


@pandas_udf(ENERGY_TYPE)
def _pcm_energy_udf(p: pd.Series) -> pd.DataFrame:
    return pcm_energy_batch(p)


def pcm_energy(payload: Column | str = "seg_bytes") -> Column:
    """struct(sumsq, peak): integer-exact energy of a raw pcm_s16le
    payload (see pcm_energy_batch). One Arrow hop."""
    return _pcm_energy_udf(
        F.col(payload) if isinstance(payload, str) else payload
    )
