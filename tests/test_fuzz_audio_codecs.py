"""Differential fuzz for the multi-depth audio codec surface.

Three properties, each against an independent replay or an algebraic
identity (no Spark needed — pure kernel fuzz):

1. FLAC round-trip (mono + stereo, every channel assignment, random
   blocksizes incl. non-dividing ones) is bit-exact, and EVERY single-bit
   flip anywhere in the stream raises — the CRC-8 (headers) / CRC-16
   (bodies, poly 0x8005 has an (x+1) factor: all odd-bit errors) /
   STREAMINFO-MD5 chain leaves no silent window.
2. WAV 8/16/24-bit mono/stereo decode equals a per-sample pure-Python
   replay of the conventions ((u-128)<<8, signed>>8, (l+r)>>1).
3. interpolate_batch equals a per-sample replay of the offset-binary
   blend, and decimate(upsample(x)) == x (the even-phase identity).
"""

import random

import numpy as np
import pytest

from jsonschema_spark.functions.audio import (
    decode_payload,
    encode_wav_pcm,
    interpolate_batch,
)
from jsonschema_spark.functions.flac import (
    _STEREO_MODES,
    decode_flac,
    encode_flac,
)


def _rand_pcm(rng: random.Random, n: int, spiky: bool) -> np.ndarray:
    """Mix of smooth (predictor-friendly) and spiky (verbatim-ish) data."""
    r = np.random.RandomState(rng.randrange(1 << 31))
    if spiky:
        return r.randint(-32768, 32768, n).astype(np.int64)
    t = np.arange(n)
    base = 9000 * np.sin(t / (3 + r.randint(1, 40)))
    return np.clip(base + r.randint(-700, 700, n), -32768, 32767).astype(
        np.int64
    )


@pytest.mark.parametrize("seed", [5, 23, 91])
def test_flac_roundtrip_fuzz(seed):
    rng = random.Random(seed)
    for trial in range(8):
        n = rng.randint(1, 5000)
        bs = rng.choice([192, 576, 1000, 4096])
        stereo = rng.random() < 0.6
        if stereo:
            l = _rand_pcm(rng, n, rng.random() < 0.3)
            r = np.clip(
                (l * rng.choice([1, -1])) // rng.choice([1, 2, 3])
                + _rand_pcm(rng, n, False) // 8,
                -32768, 32767,
            )
            x = np.stack([l, r], axis=1)
            mode = rng.choice([None, *list(_STEREO_MODES)])
        else:
            x = _rand_pcm(rng, n, rng.random() < 0.3)
            mode = None
        lmo = rng.choice([0, 4, 8])   # fixed-only and LPC paths alike
        if rng.random() < 0.3:        # shifted material: wasted bits
            x = (x >> 2) << 2
        depth = rng.choice([8, 12, 16, 20, 24, 32])
        if depth < 16:
            x = x >> (16 - depth)     # scale into range; zeros stay valid
        elif depth > 16:
            x = x << (depth - 16)     # 32-bit rides the int32 rails
        raw = encode_flac(
            x, 16000, blocksize=bs, stereo_mode=mode, lpc_max_order=lmo,
            detect_wasted=rng.random() < 0.5, bits=depth,
        )
        sr, out = decode_flac(raw)
        assert sr == 16000
        assert np.array_equal(out.astype(np.int64), x), (
            seed, trial, mode, lmo,
        )


@pytest.mark.parametrize("seed", [7, 33])
def test_flac_bit_flips_never_silently_change_samples_fuzz(seed):
    """The integrity property the format actually guarantees: a single-bit
    flip anywhere either RAISES (CRC-8 headers, CRC-16 bodies, MD5,
    structural checks) or decodes to the EXACT same samples — the only
    unprotected bytes in a FLAC stream are non-sample STREAMINFO metadata
    (min/max frame size, the sample-rate field), which is true of the
    real format too (metadata blocks carry no CRC; the MD5 covers
    samples only). Samples can never change silently."""
    rng = random.Random(seed)
    x = _rand_pcm(rng, 700, False)
    st = np.stack([x, -x], axis=1)
    raw = bytearray(encode_flac(st, 8000, blocksize=256, lpc_max_order=8))
    n_raised = 0
    for _ in range(150):
        pos = rng.randrange(len(raw))
        bit = 1 << rng.randrange(8)
        flipped = bytearray(raw)
        flipped[pos] ^= bit
        try:
            _sr, out = decode_flac(bytes(flipped))
        except ValueError:
            n_raised += 1
            continue
        # silent flips are confined to non-sample metadata: PCM identical
        assert np.array_equal(out.astype(np.int64), st), (seed, pos, bit)
        # ... and only ever inside the unprotected STREAMINFO region
        assert 8 <= pos < 8 + 18, (seed, pos)
    assert n_raised > 100  # the overwhelming majority of bytes ARE armored


@pytest.mark.parametrize("seed", [11, 59])
def test_wav_depth_decode_matches_replay(seed):
    rng = random.Random(seed)
    for _ in range(12):
        n = rng.randint(1, 2000)
        bits = rng.choice([8, 16, 24])
        stereo = rng.random() < 0.5
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        r = np.random.RandomState(rng.randrange(1 << 31))
        shape = (n, 2) if stereo else (n,)
        x = r.randint(lo, hi + 1, shape).astype(np.int64)
        out = np.asarray(
            decode_payload(encode_wav_pcm(x, 16000, bits=bits)),
            dtype=np.int64,
        )
        # independent per-sample replay of the documented conventions
        def to16(v: int) -> int:
            if bits == 8:
                return v << 8
            if bits == 16:
                return v
            return v >> 8 if v >= 0 else -((-v + 255) // 256)  # floor shift

        if stereo:
            want = [(to16(int(a)) + to16(int(b))) >> 1 for a, b in x]
        else:
            want = [to16(int(v)) for v in x]
        assert out.tolist() == want, (seed, bits, stereo)


@pytest.mark.parametrize("seed", [13, 77])
def test_interpolate_matches_replay_and_inverts(seed):
    import pandas as pd

    from jsonschema_spark.functions.audio import decimate_batch

    rng = random.Random(seed)
    for _ in range(10):
        n = rng.randint(1, 800)
        L = rng.choice([2, 3, 4, 6])
        r = np.random.RandomState(rng.randrange(1 << 31))
        x = r.randint(-32768, 32768, n).astype(np.int64)
        sr = 8000
        d = interpolate_batch(
            pd.Series([x.astype("<i2").tobytes()]), pd.Series([sr]), sr * L
        )
        out = np.frombuffer(bytes(d.iloc[0]["out_bytes"]), dtype="<i2")
        assert d.iloc[0]["n_out"] == n * L
        # per-sample replay (Python ints, floor division)
        want = []
        for j in range(n * L):
            q, rr = divmod(j, L)
            q1 = min(q + 1, n - 1)
            want.append(
                ((L - rr) * (int(x[q]) + 32768)
                 + rr * (int(x[q1]) + 32768)) // L - 32768
            )
        assert out.astype(np.int64).tolist() == want, (seed, n, L)
        # even-phase identity: decimating back recovers the original
        back = decimate_batch(
            pd.Series([bytes(d.iloc[0]["out_bytes"])]),
            pd.Series([sr * L]),
            sr,
        )
        assert bytes(back.iloc[0]["out_bytes"]) == x.astype("<i2").tobytes()
