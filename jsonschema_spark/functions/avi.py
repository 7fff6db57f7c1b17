"""Motion-JPEG AVI — REAL compressed video, zero codec libs.

The engine's JPEG codec (functions/jpeg.py) makes the classic
compressed-video interchange format reachable: an AVI (RIFF) container
whose '00dc' chunks are ordinary JPEG frames. This module implements
the container both ways —

- ``encode_avi_mjpeg``: RIFF/'AVI ' writer (hdrl: avih + strl/strh/
  strf with biCompression='MJPG'; movi: one '00dc' JPEG chunk per
  frame, even-padded; idx1: one keyframe entry per chunk) around
  frames encoded by our own baseline JPEG encoder;
- ``parse_avi_mjpeg``: structural walk with the validation checks a
  crawl corpus needs — RIFF magic/size discipline, avih vs strf
  dimension consistency, declared dwTotalFrames vs counted chunks,
  idx1 offset/size agreement with the actual chunk layout, torn-tail
  detection;
- ``decode_avi_frame``: random access to frame k (chunk walk, then the
  full JPEG decode) — the sampling primitive.

Public-knowledge sources: the AVI RIFF layout (MainAVIHeader /
AVIStreamHeader / BITMAPINFOHEADER / idx1) is the public Microsoft
multimedia file-format documentation; JPEG is T.81 (functions/jpeg.py).

Scale shape: header walking is O(chunks) Python inside the usual
Arrow-batched iteration; only SAMPLED frames pay the JPEG decode.
"""

from __future__ import annotations

import struct

import numpy as np

AVIF_HASINDEX = 0x10
AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(
    frames: np.ndarray,
    fps: int = 25,
    quality: int = 85,
    declared_frames: int | None = None,
    corrupt_index: bool = False,
) -> bytes:
    """(n, h, w) uint8 luma stack -> Motion-JPEG AVI bytes.

    ``declared_frames`` overrides dwTotalFrames/dwLength (to plant
    count mismatches); ``corrupt_index`` flips the first idx1 offset
    (to plant index/layout disagreement). Deterministic output."""
    from jsonschema_spark.functions.jpeg import encode_jpeg_gray

    n, h, w = frames.shape
    decl = n if declared_frames is None else declared_frames
    jpegs = [encode_jpeg_gray(frames[k], quality) for k in range(n)]
    max_sz = max((len(j) for j in jpegs), default=0)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,   # dwMicroSecPerFrame
        max_sz * fps,       # dwMaxBytesPerSec
        0,                  # dwPaddingGranularity
        AVIF_HASINDEX,      # dwFlags
        decl,               # dwTotalFrames
        0,                  # dwInitialFrames
        1,                  # dwStreams
        max_sz,             # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,         # dwReserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,        # flags, priority, language+initialframes...
            0,              # dwInitialFrames
            1, fps,         # dwScale / dwRate
            0,              # dwStart
            decl,           # dwLength
            max_sz,         # dwSuggestedBufferSize
            0xFFFFFFFF,     # dwQuality
            0,              # dwSampleSize
        )
        + struct.pack("<4h", 0, 0, w, h)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    idx_entries = []
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(j)))
        movi_body += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_body)
    idx = b""
    for k, (off, sz) in enumerate(idx_entries):
        if corrupt_index and k == 0:
            off ^= 0x40
        idx += b"00dc" + struct.pack("<III", AVIIF_KEYFRAME, off, sz)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


_AVI_FIELDS = (
    "ok", "error", "width", "height", "fps", "declared_frames",
    "actual_frames", "index_ok",
)


def _avi_fail(err: str) -> dict:
    d = {k: None for k in _AVI_FIELDS}
    d["ok"] = False
    d["error"] = err
    return d


def _walk_chunks(raw: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) or raise ValueError."""
    while pos < end:
        if end - pos < 8:
            raise ValueError("truncated")
        fourcc = raw[pos : pos + 4]
        (ln,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = pos + 8
        if body + ln > end:
            raise ValueError("truncated")
        yield fourcc, body, ln
        pos = body + ln + (ln & 1)


def parse_avi_mjpeg(raw: bytes) -> dict:
    """Structural AVI walk + MJPEG-specific consistency checks. Errors:
    not_avi / truncated / missing_hdrl / missing_movi / not_mjpeg /
    dims_mismatch / count_mismatch; ``index_ok`` reports whether idx1
    agrees with the actual chunk layout (False also when absent while
    avih declares AVIF_HASINDEX)."""
    raw = bytes(raw)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return _avi_fail("not_avi")
    (riff_len,) = struct.unpack("<I", raw[4:8])
    if 8 + riff_len > len(raw):
        return _avi_fail("truncated")
    end = 8 + riff_len
    avih = None
    strh = None
    strf = None
    movi_span = None
    movi_fourcc_pos = None
    idx_body = None
    try:
        for fourcc, body, ln in _walk_chunks(raw, 12, end):
            if fourcc == b"LIST":
                kind = raw[body : body + 4]
                if kind == b"hdrl":
                    for f2, b2, l2 in _walk_chunks(raw, body + 4, body + ln):
                        if f2 == b"avih":
                            avih = raw[b2 : b2 + l2]
                        elif f2 == b"LIST" and raw[b2 : b2 + 4] == b"strl":
                            sh = sf = None
                            for f3, b3, l3 in _walk_chunks(
                                raw, b2 + 4, b2 + l2
                            ):
                                if f3 == b"strh":
                                    sh = raw[b3 : b3 + l3]
                                elif f3 == b"strf":
                                    sf = raw[b3 : b3 + l3]
                            # keep the VIDEO stream's headers — an A/V
                            # file's audio strl must not shadow them
                            if sh is not None and sh[:4] == b"vids":
                                strh, strf = sh, sf
                elif kind == b"movi":
                    movi_span = (body + 4, body + ln)
                    movi_fourcc_pos = body
            elif fourcc == b"idx1":
                idx_body = raw[body : body + ln]
    except ValueError as e:
        return _avi_fail(str(e))
    if avih is None or strh is None or strf is None:
        return _avi_fail("missing_hdrl")
    if movi_span is None:
        return _avi_fail("missing_movi")
    # a foreign AVI can frame these chunks correctly but carry SHORT
    # bodies — unpacking a short buffer raises struct.error, which would
    # escape the per-row walker and kill the task instead of producing
    # the error row this validator exists to emit
    if len(avih) < 56 or len(strh) < 8 or len(strf) < 20:
        return _avi_fail("truncated")
    a = struct.unpack("<14I", avih[:56])
    usec, flags, decl, w, h = a[0], a[3], a[4], a[8], a[9]
    if strh[:4] != b"vids" or strh[4:8] != b"MJPG":
        return _avi_fail("not_mjpeg")
    bi = struct.unpack("<Iii", strf[:12])
    compression = strf[16:20]
    if compression != b"MJPG":
        return _avi_fail("not_mjpeg")
    if (bi[1], abs(bi[2])) != (w, h):
        return _avi_fail("dims_mismatch")
    chunks = []
    try:
        for fourcc, body, ln in _walk_chunks(raw, *movi_span):
            if fourcc == b"00dc":
                chunks.append((body, ln))
    except ValueError:
        return _avi_fail("truncated")
    if decl != len(chunks):
        return _avi_fail("count_mismatch")
    index_ok = False
    if idx_body is not None:
        entries = [
            struct.unpack("<4sIII", idx_body[k : k + 16])
            for k in range(0, len(idx_body) - 15, 16)
        ]
        dc = [e for e in entries if e[0] == b"00dc"]
        index_ok = len(dc) == len(chunks) and all(
            movi_fourcc_pos + e[2] + 8 == body and e[3] == ln
            for e, (body, ln) in zip(dc, chunks)
        )
    elif not (flags & AVIF_HASINDEX):
        index_ok = True  # no index declared, none required
    fps = round(1_000_000 / usec) if usec else None
    return {
        "ok": True, "error": None, "width": w, "height": h,
        "fps": fps, "declared_frames": decl,
        "actual_frames": len(chunks), "index_ok": index_ok,
    }


def avi_frame_chunks(raw: bytes) -> list[tuple[int, int]]:
    """(offset, length) of each '00dc' chunk body — tolerant of torn
    tails (returns the complete chunks; callers compare against the
    declared count)."""
    raw = bytes(raw)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return []
    end = min(8 + struct.unpack("<I", raw[4:8])[0], len(raw))
    out = []
    # manual top-level walk: a torn tail leaves the movi LIST's declared
    # size overrunning the data — clamp instead of raising so the
    # complete leading chunks stay reachable
    pos = 12
    while pos + 8 <= end:
        fourcc = raw[pos : pos + 4]
        (ln,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = pos + 8
        if fourcc == b"LIST" and raw[body : body + 4] == b"movi":
            p2 = body + 4
            stop = min(body + ln, len(raw))
            while p2 + 8 <= stop:
                f2 = raw[p2 : p2 + 4]
                (l2,) = struct.unpack("<I", raw[p2 + 4 : p2 + 8])
                if p2 + 8 + l2 > stop:
                    break  # torn tail: stop at the last whole chunk
                if f2 == b"00dc":
                    out.append((p2 + 8, l2))
                p2 += 8 + l2 + (l2 & 1)
        pos = body + ln + (ln & 1)
    return out


def decode_avi_frame(raw: bytes, k: int) -> np.ndarray:
    """Frame k's luma plane (full JPEG decode) — raises on a missing or
    torn frame."""
    from jsonschema_spark.functions.jpeg import decode_jpeg_gray

    chunks = avi_frame_chunks(raw)
    if k < 0 or k >= len(chunks):
        raise ValueError(f"frame {k} not present ({len(chunks)} complete)")
    off, ln = chunks[k]
    return decode_jpeg_gray(bytes(raw)[off : off + ln])[2]


# ---- interleaved audio stream ('01wb' PCM) ----------------------------------
# Real A/V corpora carry audio INSIDE the video container; the demux
# below feeds the engine's whole audio-validation chain (decode, SNR,
# loudness, transcript invariants) from the same payload that feeds the
# frame pipeline. PCM audio keeps the chain lossless end to end.


def encode_avi_mjpeg_av(
    frames: np.ndarray,
    pcm: np.ndarray,
    sample_rate: int = 16000,
    fps: int = 25,
    quality: int = 85,
) -> bytes:
    """Motion-JPEG AVI with an interleaved 16-bit mono PCM audio stream
    ('01wb' chunks, one per video frame, round-robin interleaved).
    ``pcm`` is int16 samples; the per-frame split is samples//n_frames
    with the remainder on the last chunk (sample-exact round trip)."""
    from jsonschema_spark.functions.jpeg import encode_jpeg_gray

    n, h, w = frames.shape
    pcm = pcm.astype("<i2")
    jpegs = [encode_jpeg_gray(frames[k], quality) for k in range(n)]
    max_sz = max((len(j) for j in jpegs), default=0)
    per = len(pcm) // max(n, 1)
    audio_chunks = [
        pcm[k * per : (k + 1) * per if k < n - 1 else len(pcm)].tobytes()
        for k in range(n)
    ]

    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_sz * fps, 0, AVIF_HASINDEX,
        n, 0, 2, max_sz, w, h, 0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                      max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    strh_a = (
        b"auds" + b"\x00\x00\x00\x00"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, sample_rate, 0,
                      len(pcm), max(per * 2, 2), 0xFFFFFFFF, 2)
        + struct.pack("<4h", 0, 0, 0, 0)
    )
    strf_a = struct.pack(  # WAVEFORMATEX, PCM mono 16-bit
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
        + _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)),
    )
    movi_body = b""
    idx_entries = []
    for k in range(n):
        idx_entries.append((b"00dc", 4 + len(movi_body), len(jpegs[k])))
        movi_body += _chunk(b"00dc", jpegs[k])
        idx_entries.append((b"01wb", 4 + len(movi_body),
                            len(audio_chunks[k])))
        movi_body += _chunk(b"01wb", audio_chunks[k])
    movi = _list(b"movi", movi_body)
    idx = b"".join(
        f4 + struct.pack("<III", AVIIF_KEYFRAME, off, sz)
        for f4, off, sz in idx_entries
    )
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_audio_meta(raw: bytes) -> dict | None:
    """(sample_rate, channels, bits) from the 'auds' stream's
    WAVEFORMATEX, or None when the AVI has no audio stream."""
    raw = bytes(raw)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return None
    end = min(8 + struct.unpack("<I", raw[4:8])[0], len(raw))
    try:
        for fourcc, body, ln in _walk_chunks(raw, 12, end):
            if fourcc != b"LIST" or raw[body : body + 4] != b"hdrl":
                continue
            for f2, b2, l2 in _walk_chunks(raw, body + 4, body + ln):
                if f2 != b"LIST" or raw[b2 : b2 + 4] != b"strl":
                    continue
                strh = strf = None
                for f3, b3, l3 in _walk_chunks(raw, b2 + 4, b2 + l2):
                    if f3 == b"strh":
                        strh = raw[b3 : b3 + l3]
                    elif f3 == b"strf":
                        strf = raw[b3 : b3 + l3]
                if strh is not None and strh[:4] == b"auds" and strf:
                    if len(strf) < 16:  # short WAVEFORMATEX body: treat
                        return None     # as no usable audio stream
                    fmt, ch, sr = struct.unpack("<HHI", strf[:8])
                    bits = struct.unpack("<H", strf[14:16])[0]
                    if fmt != 1:
                        return {"sample_rate": None, "channels": None,
                                "bits": None, "pcm": False}
                    return {"sample_rate": sr, "channels": ch,
                            "bits": bits, "pcm": True}
    except ValueError:
        return None
    return None


def avi_audio_pcm(raw: bytes) -> bytes:
    """Concatenated '01wb' audio payload (raw little-endian PCM) — the
    demux feeding the engine's audio-validation chain. Torn tails keep
    the complete leading chunks (same stance as the frame walk)."""
    raw = bytes(raw)
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return b""
    end = min(8 + struct.unpack("<I", raw[4:8])[0], len(raw))
    out = []
    pos = 12
    while pos + 8 <= end:
        fourcc = raw[pos : pos + 4]
        (ln,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        body = pos + 8
        if fourcc == b"LIST" and raw[body : body + 4] == b"movi":
            p2 = body + 4
            stop = min(body + ln, len(raw))
            while p2 + 8 <= stop:
                f2 = raw[p2 : p2 + 4]
                (l2,) = struct.unpack("<I", raw[p2 + 4 : p2 + 8])
                if p2 + 8 + l2 > stop:
                    break
                if f2 == b"01wb":
                    out.append(raw[p2 + 8 : p2 + 8 + l2])
                p2 += 8 + l2 + (l2 & 1)
        pos = body + ln + (ln & 1)
    return b"".join(out)
