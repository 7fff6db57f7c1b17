"""Vorbis I codec (functions/vorbis.py) — VERDICT r3 item 5: real
sample decode for the SNR invariant. Spec: Xiph Vorbis I (public)."""

import numpy as np
import pandas as pd
import pytest

from jsonschema_spark.functions.vorbis import (
    BadStream,
    BitReader,
    BitWriter,
    Residue,
    assign_codewords,
    decode_vorbis_stream,
    encode_vorbis_clip,
    encode_vorbis_packets,
    float32_pack,
    float32_unpack,
    frame_vorbis_packets,
    ilog,
    lookup1_values,
    mdct_forward,
    imdct,
    vorbis_decode_profile_batch,
    vorbis_reference,
    vorbis_window,
)


def test_ilog_and_lookup1():
    assert [ilog(x) for x in (0, 1, 2, 3, 4, 7)] == [0, 1, 2, 2, 3, 3]
    assert lookup1_values(1024, 1) == 1024
    assert lookup1_values(1024, 2) == 32
    assert lookup1_values(26, 3) == 2  # 3**3=27 > 26


def test_bit_io_round_trip_lsb_first():
    w = BitWriter()
    fields = [(5, 3), (0, 1), (0x564342, 24), (1023, 10), (1, 1)]
    for v, n in fields:
        w.write(v, n)
    r = BitReader(w.bytes())
    assert [r.read(n) for _v, n in fields] == [v for v, _n in fields]
    # LSB-first byte layout: writing 0x01 in 8 bits gives byte 0x01
    w2 = BitWriter()
    w2.write(1, 8)
    assert w2.bytes() == b"\x01"


def test_float32_pack_round_trip():
    for v in (1.0, -1.0, 0.5, 3.14159, 1e-6, -2.5e4, 0.0):
        packed, exact = float32_pack(v)
        assert float32_unpack(packed) == exact
        if v != 0:
            assert abs(exact - v) / abs(v) < 1e-6


def test_huffman_assignment_spec_example():
    """The worked example from Vorbis I §3.2.1.2."""
    codes = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    want = {
        0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4), 3: (0b0110, 4),
        4: (0b0111, 4), 5: (0b10, 2), 6: (0b110, 3), 7: (0b111, 3),
    }
    assert codes == want


def test_single_entry_codebook_rejected():
    with pytest.raises(BadStream, match="single_entry"):
        assign_codewords([1])


def test_tdac_perfect_reconstruction():
    """Windowed forward/inverse MDCT overlap-adds back exactly (the
    Princen-Bradley property of the Vorbis window, ~270 dB in float64)."""
    n = 256
    w = vorbis_window(n, n, False, 0, 0)
    pb = w[: n // 2] ** 2 + w[n // 2 :] ** 2
    assert np.allclose(pb, 1.0, atol=1e-12)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2048)
    xp = np.concatenate([np.zeros(n), x, np.zeros(2 * n)])
    recon = np.zeros(len(xp))
    for c in range(0, 2048, n // 2):
        lo = c + n // 2
        blk = xp[lo : lo + n]
        recon[lo : lo + n] += w * imdct(mdct_forward(w * blk))
    seg = recon[n + n // 2 : n + 1536]
    ref = x[n // 2 : 1536]
    snr = 10 * np.log10(np.sum(ref**2) / np.sum((seg - ref) ** 2))
    assert snr > 200


@pytest.mark.parametrize(
    "ch,kw",
    [
        (1, {}),
        (2, {}),
        (1, dict(bs0=128, bs1=1024, switching=True)),
        (2, dict(bs0=128, bs1=1024, switching=True)),
        (1, dict(bs0=512, bs1=512)),
        (2, dict(coupling=True)),
        (2, dict(bs0=128, bs1=1024, switching=True, coupling=True)),
    ],
)
def test_encode_decode_snr(ch, kw):
    pcm = vorbis_reference(f"clip-rt-{ch}-{len(kw)}", 5000, ch)
    raw, nsamp = encode_vorbis_clip(pcm, 16000, **kw)
    dec, rate = decode_vorbis_stream(raw)
    assert rate == 16000 and dec.shape[1] == ch and len(dec) == nsamp
    m = min(len(dec), len(pcm))
    err = dec[:m] - pcm[:m]
    snr = 10 * np.log10(np.sum(pcm[:m] ** 2) / np.sum(err**2))
    assert snr > 33, snr


def test_failure_classes_exact_errors():
    pcm = vorbis_reference("clip-f", 3000, 1)
    raw, _ = encode_vorbis_clip(pcm, 16000)
    with pytest.raises(BadStream, match="truncated"):
        decode_vorbis_stream(raw[:-5])
    b = bytearray(raw)
    b[-3] ^= 1
    with pytest.raises(BadStream, match="crc_mismatch"):
        decode_vorbis_stream(bytes(b))
    packets, centers = encode_vorbis_packets(pcm, 16000)
    setup = bytearray(packets[2])
    setup[8] ^= 0xFF
    packets[2] = bytes(setup)
    with pytest.raises(BadStream, match="bad_codebook_sync"):
        decode_vorbis_stream(frame_vorbis_packets(packets, centers))


def test_integer_coupling_is_lossless():
    """Encoder-side square-polar coupling (quantize first, couple the
    integer levels) composed with the decoder's §4.3.5 inverse is the
    identity — coupling adds ZERO loss beyond quantization."""
    import numpy as np

    from jsonschema_spark.functions.vorbis import _forward_couple

    rng = np.random.default_rng(3)
    l = rng.integers(-1023, 1024, 5000)
    r = rng.integers(-1023, 1024, 5000)
    m, a = _forward_couple(l, r)
    assert np.abs(a).max() <= 2046 and np.abs(m).max() <= 1023
    new_m = m.astype(float).copy()
    new_a = a.astype(float).copy()
    pm = m > 0
    pa = a > 0
    new_a[pm & pa] = (m - a)[pm & pa]
    new_m[pm & ~pa] = (m + a)[pm & ~pa]
    new_a[pm & ~pa] = m[pm & ~pa]
    new_a[~pm & pa] = (m + a)[~pm & pa]
    new_m[~pm & ~pa] = (m - a)[~pm & ~pa]
    new_a[~pm & ~pa] = m[~pm & ~pa]
    assert (new_m == l).all() and (new_a == r).all()


def test_inverse_coupling_spec_cases():
    """§4.3.5 square polar: all four (sign of M, sign of A) branches,
    exercised through a real coupled packet is overkill — drive the
    decode-side arithmetic directly."""
    from jsonschema_spark.functions import vorbis as V

    # decode mapping: (M, A) -> (new_M, new_A)
    cases = {
        (4.0, 1.0): (4.0, 3.0),    # M>0, A>0: A' = M - A
        (4.0, -1.0): (3.0, 4.0),   # M>0, A<=0: M' = M + A, A' = M
        (-4.0, 1.0): (-4.0, -3.0), # M<=0, A>0: A' = M + A
        (-4.0, -1.0): (-3.0, -4.0),# M<=0, A<=0: M' = M - A, A' = M
    }
    # run through decode_audio_packet's vectorized branch logic by
    # replicating it on arrays
    m = np.array([k[0] for k in cases])
    a = np.array([k[1] for k in cases])
    new_m = m.copy()
    new_a = a.copy()
    pos_m = m > 0
    pos_a = a > 0
    new_a[pos_m & pos_a] = (m - a)[pos_m & pos_a]
    new_m[pos_m & ~pos_a] = (m + a)[pos_m & ~pos_a]
    new_a[pos_m & ~pos_a] = m[pos_m & ~pos_a]
    new_a[~pos_m & pos_a] = (m + a)[~pos_m & pos_a]
    new_m[~pos_m & ~pos_a] = (m - a)[~pos_m & ~pos_a]
    new_a[~pos_m & ~pos_a] = m[~pos_m & ~pos_a]
    for i, k in enumerate(cases):
        assert (new_m[i], new_a[i]) == cases[k], k


def test_profile_kernel_batch():
    pcm = vorbis_reference("clip-k", 4000, 1)
    raw, _ = encode_vorbis_clip(pcm, 16000)
    df = vorbis_decode_profile_batch(
        pd.Series([bytearray(raw), bytearray(raw[:-5]), None]),
        pd.Series(["clip-k", "clip-k", "x"]),
        pd.Series([16000, 16000, 16000]),
        pd.Series([250, 250, 250]),
    )
    assert bool(df.iloc[0]["ok"]) and df.iloc[0]["snr_db"] > 33
    assert df.iloc[1]["error"] == "truncated"
    assert df.iloc[2]["error"] == "null_payload"


def test_decoder_never_crashes_on_random_tears():
    import random

    rng = random.Random(7)
    pcm = vorbis_reference("clip-z", 3000, 2)
    raw, _ = encode_vorbis_clip(pcm, 16000, bs0=128, bs1=1024,
                                switching=True)
    for _ in range(60):
        if rng.random() < 0.5:
            cand = raw[: rng.randrange(len(raw) + 1)]
        else:
            b = bytearray(raw)
            for _k in range(rng.randint(1, 3)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            cand = bytes(b)
        df = vorbis_decode_profile_batch(
            pd.Series([bytearray(cand)]), pd.Series(["clip-z"]),
            pd.Series([16000]), pd.Series([187]),
        )
        assert df.iloc[0]["ok"] in (True, False)


def test_residue_begin_end_clamp():
    """§8.6.2 errata: begin/end beyond the actual vector size clamp
    instead of over-running (libvorbis streams share residue configs
    across blocksizes)."""
    res = Residue(2, 0, 10_000, 32, 2, 0, [0, 1],
                  [[-1] * 8, [1] + [-1] * 7])
    # decoding with a tiny vector must not raise on the oversize end
    from jsonschema_spark.functions.vorbis import (
        Codebook,
        assign_codewords,
    )

    classbook = Codebook(1, 2, assign_codewords([1, 1]), 0, None)
    vq = np.zeros((4, 1))
    valbook = Codebook(1, 4, assign_codewords([2, 2, 2, 2]), 1, vq)
    w = BitWriter()
    for _ in range(64 // 32):  # 2 partitions of the clamped 64-size vec
        w.write_huff(0, 1)  # class 0 -> silent
    r = BitReader(w.bytes())
    out = res.decode(r, [classbook, valbook], [False], 64, 1)
    assert out.shape == (1, 64) and not out.any()


def test_residue_fast_path_equals_general_walk():
    """The round-5 batched residue decode (full-uniform-tree gather)
    must be BIT-identical to the reference per-partition walk — forced
    by monkeypatching the fast path off and comparing raw float64 PCM."""
    import numpy as np

    from jsonschema_spark.functions import vorbis as V
    from jsonschema_spark.functions.ogg import _collect_packets, _scan_pages

    orig = V.Residue._decode_fast_single
    try:
        for i, (sr, ch, kw) in enumerate([
            (16000, 1, {}),
            (16000, 2, dict(coupling=True)),
            (16000, 2, dict(bs0=128, bs1=1024, switching=True,
                            coupling=True)),
            (8000, 1, dict(bs0=512, bs1=512)),
        ]):
            src = V.vorbis_reference(f"fp{i}", sr * 400 // 1000, ch)
            raw, _ = V.encode_vorbis_clip(src, sr, serial=0x700 + i, **kw)
            pks = _collect_packets(_scan_pages(raw))
            V._SETUP_CACHE.clear()
            fast, _ = V.decode_vorbis_packets(pks)
            V.Residue._decode_fast_single = lambda *a, **k: False
            V._SETUP_CACHE.clear()
            gen, _ = V.decode_vorbis_packets(pks)
            V.Residue._decode_fast_single = orig
            assert fast.shape == gen.shape
            assert np.array_equal(fast, gen), i
    finally:
        V.Residue._decode_fast_single = orig
