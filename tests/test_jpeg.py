"""Baseline JPEG codec (functions/jpeg.py — pure numpy, Annex K tables).

Pins: round-trip fidelity bounds by quality, exact flat-image recovery,
odd (non-multiple-of-8) dimensions, color (4:4:4/4:2:0) and progressive
(SOF2 Annex G) decode — including progressive==baseline bit-equality —
loud rejection of arithmetic/malformed streams, dispatch through
decode_image, and the end-to-end Spark decode over the ledger corpora
incl. verified truncations.
"""

import struct

import numpy as np
import pytest

from jsonschema_spark.functions.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
    scaled_quant,
)
from jsonschema_spark.functions.multimodal import decode_image


def _img(seed=1, h=32, w=48):
    rng = np.random.RandomState(seed)
    base = np.add.outer(np.linspace(0, 200, h), np.linspace(0, 55, w))
    return np.clip(base + rng.randn(h, w) * 8, 0, 255).astype(np.uint8)


def _rmse(a, b):
    return float(np.sqrt(np.mean((a.astype(float) - b.astype(float)) ** 2)))


def test_round_trip_quality_bounds():
    px = _img()
    for q, bound in ((95, 3.0), (85, 7.0), (50, 10.0)):
        w, h, dec = decode_jpeg_gray(encode_jpeg_gray(px, q))
        assert (w, h) == (48, 32)
        assert _rmse(dec, px) < bound, q


def test_quality_monotonic_size():
    px = _img(2)
    sizes = [len(encode_jpeg_gray(px, q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)
    assert scaled_quant(90).max() < scaled_quant(30).max()


def test_flat_and_odd_dimensions_exact():
    flat = np.full((17, 9), 77, dtype=np.uint8)
    w, h, dec = decode_jpeg_gray(encode_jpeg_gray(flat, 85))
    assert (w, h) == (9, 17)
    assert np.array_equal(dec, flat)


def test_decode_image_dispatch():
    px = _img(3)
    w, h, dec = decode_image(encode_jpeg_gray(px, 95))
    assert (w, h) == (48, 32) and _rmse(dec, px) < 3.0


def test_exotic_component_count_rejected_loudly():
    raw = bytearray(encode_jpeg_gray(_img(4), 85))
    i = raw.find(b"\xff\xc0")
    # patch component count 1 -> 4 (CMYK-style) in the SOF0 header
    assert raw[i + 9] == 1
    raw[i + 9] = 4
    with pytest.raises(NotImplementedError, match="component"):
        decode_jpeg_gray(bytes(raw))


def test_arithmetic_sof_rejected_loudly():
    # progressive (SOF2) is now SUPPORTED (dispatched to Annex G);
    # arithmetic-coded SOF9 remains a loud rejection
    raw = bytearray(encode_jpeg_gray(_img(5), 85))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC9  # SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(bytes(raw))


def test_malformed_streams_raise():
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\x00\x01\x02")
    with pytest.raises((ValueError, struct.error, IndexError)):
        decode_jpeg_gray(b"\xff\xd8\xff\xdb\x00\x04\x00")


def test_spark_ledger_corpus_end_to_end(spark):
    from jsonschema_spark.sources.images import (
        JPEG_TRUNC_CLS,
        JPEG_TRUNC_MOD,
        synth_jpeg_images,
    )

    imgs = synth_jpeg_images(spark, 45, partitions=4)
    rows = imgs.collect()
    assert len(rows) == 45
    for r in rows:
        truncated = r["_row_idx"] % JPEG_TRUNC_MOD == JPEG_TRUNC_CLS
        raw = bytes(r["bytes"])
        if truncated:
            assert r["_ysum"] is None
            with pytest.raises(Exception):
                decode_jpeg_gray(raw)
        else:
            w, h, px = decode_jpeg_gray(raw)
            assert (w, h) == (r["width"], r["height"])
            assert int(px.astype(np.int64).sum()) == r["_ysum"]


def test_restart_intervals_round_trip():
    from jsonschema_spark.functions.jpeg import encode_jpeg_gray

    px = _img(6)
    base = decode_jpeg_gray(encode_jpeg_gray(px, 95))[2]
    for ri in (1, 3, 7):
        raw = encode_jpeg_gray(px, 95, restart_interval=ri)
        assert b"\xff\xdd" in raw  # DRI emitted
        w, h, dec = decode_jpeg_gray(raw)
        assert np.array_equal(dec, base)


def test_color_jpeg_decodes_to_luma():
    from jsonschema_spark.functions.jpeg import (
        encode_jpeg_color,
        rgb_to_ycbcr,
    )

    rng = np.random.RandomState(8)
    base = np.add.outer(np.linspace(0, 200, 32), np.linspace(0, 55, 48))
    rgb = np.stack([
        np.clip(base + rng.randn(32, 48) * 5, 0, 255),
        np.clip(255 - base + rng.randn(32, 48) * 5, 0, 255),
        np.clip(base * 0.5 + 60 + rng.randn(32, 48) * 5, 0, 255),
    ], axis=-1).astype(np.uint8)
    w, h, lum = decode_jpeg_gray(encode_jpeg_color(rgb, 95))
    assert (w, h) == (48, 32)
    ytrue = rgb_to_ycbcr(rgb)[..., 0]
    assert _rmse(lum, ytrue) < 3.0
    # and through the generic dispatch
    w2, h2, lum2 = decode_image(encode_jpeg_color(rgb, 95))
    assert np.array_equal(lum, lum2)


def test_single_component_scan_ignores_sampling_factors():
    # some encoders declare 2x2 sampling on grayscale; a one-component
    # scan is NON-interleaved so the stream layout is identical
    raw = bytearray(encode_jpeg_gray(_img(9), 90))
    i = raw.find(b"\xff\xc0")
    assert raw[i + 11] == 0x11
    raw[i + 11] = 0x22  # declare 2x2
    w, h, dec = decode_jpeg_gray(bytes(raw))
    base = decode_jpeg_gray(encode_jpeg_gray(_img(9), 90))[2]
    assert np.array_equal(dec, base)


def test_color_420_decodes_to_full_res_luma():
    """4:2:0 — the layout virtually every real color JPEG uses: 2x2 Y
    blocks per interleaved MCU. Exercises the decoder's multi-block
    luma placement, which the 4:4:4 path never touches."""
    from jsonschema_spark.functions.jpeg import (
        encode_jpeg_color,
        rgb_to_ycbcr,
    )

    rng = np.random.RandomState(10)
    base = np.add.outer(np.linspace(0, 180, 33), np.linspace(0, 70, 49))
    rgb = np.stack([
        np.clip(base + rng.randn(33, 49) * 5, 0, 255),
        np.clip(200 - base * 0.7 + rng.randn(33, 49) * 5, 0, 255),
        np.clip(base * 0.4 + 40 + rng.randn(33, 49) * 5, 0, 255),
    ], axis=-1).astype(np.uint8)  # odd dims on purpose
    raw = encode_jpeg_color(rgb, 95, subsample="420")
    w, h, lum = decode_jpeg_gray(raw)
    assert (w, h) == (49, 33)
    ytrue = rgb_to_ycbcr(rgb)[..., 0]
    assert _rmse(lum, ytrue) < 3.0
    # 4:2:0 should be smaller than 4:4:4 of the same image
    assert len(raw) < len(encode_jpeg_color(rgb, 95, subsample="444"))


# ---------------------------------------------------------------------------
# Progressive (SOF2, Annex G) — VERDICT r2 item 5
# ---------------------------------------------------------------------------


def _texture(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        128 + 60 * np.sin(xx / 7.0) + 40 * np.cos(yy / 9.0)
        + rng.integers(-20, 20, (h, w))
    ).clip(0, 255).astype(np.uint8)


def test_progressive_equals_baseline_decode():
    """Progressive encode -> Annex G decode is bit-identical to the
    baseline decode of the same pixels (identical quantized
    coefficients) across sizes, qualities and edge-padded shapes."""
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    for seed, (h, w) in enumerate([(8, 8), (17, 31), (64, 48), (33, 9)]):
        px = _texture(h, w, 40 + seed)
        for q in (30, 85, 95):
            base = decode_jpeg_gray(encode_jpeg_gray(px, q))[2]
            prog = decode_jpeg_progressive(
                encode_jpeg_progressive_gray(px, q)
            )[2]
            assert np.array_equal(base, prog), (h, w, q)


def test_progressive_spectral_only_script():
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    px = _texture(40, 56, 99)
    scans = ((0, 0, 0, 0), (1, 31, 0, 0), (32, 63, 0, 0))
    prog = decode_jpeg_progressive(
        encode_jpeg_progressive_gray(px, 85, scans)
    )[2]
    base = decode_jpeg_gray(encode_jpeg_gray(px, 85))[2]
    assert np.array_equal(base, prog)


def test_progressive_dispatch_from_decode_jpeg_gray():
    """decode_jpeg_gray now dispatches SOF2 to the Annex G decoder
    instead of raising NotImplementedError."""
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    px = _texture(24, 24, 7)
    w, h, out = decode_jpeg_gray(encode_jpeg_progressive_gray(px, 85))
    assert (w, h) == (24, 24) and out.shape == (24, 24)


def test_progressive_scan_script_validation():
    from jsonschema_spark.functions.jpeg import encode_jpeg_progressive_gray

    px = _texture(16, 16, 3)
    with pytest.raises(ValueError, match="DC and AC"):
        encode_jpeg_progressive_gray(px, 85, ((0, 63, 0, 0),))
    with pytest.raises(ValueError, match="first DC scan"):
        encode_jpeg_progressive_gray(px, 85, ((1, 63, 0, 0),))


def test_progressive_truncation_fails_loudly():
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
    )

    px = _texture(32, 32, 11)
    raw = encode_jpeg_progressive_gray(px, 85)
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        decode_jpeg_progressive(raw[:100])


def test_progressive_ledger_corpus(spark):
    """Corpus round-trip through the Spark-side kernel shape: decoded
    sums equal the ledger; truncated rows fail loudly."""
    from jsonschema_spark.functions.jpeg import decode_jpeg_progressive
    from jsonschema_spark.sources.images import (
        JPEG_TRUNC_CLS,
        JPEG_TRUNC_MOD,
        synth_progressive_jpeg_images,
    )

    rows = synth_progressive_jpeg_images(spark, 27).collect()
    assert len(rows) == 27
    for r in rows:
        trunc = r["_row_idx"] % JPEG_TRUNC_MOD == JPEG_TRUNC_CLS
        if trunc:
            with pytest.raises(Exception):
                decode_jpeg_progressive(bytes(r["bytes"]))
        else:
            w, h, px = decode_jpeg_progressive(bytes(r["bytes"]))
            assert (w, h) == (r["width"], r["height"])
            assert int(px.astype(np.int64).sum()) == r["_ysum"]


def test_progressive_color_interleaved_dc_equals_baseline():
    """Color progressive (interleaved DC first + refinement, per-
    component AC spectral scans, 4:4:4 AND 4:2:0) decodes to the SAME
    luma as the baseline color stream — exercises the interleaved-DC
    and subsampled-component-dims paths of the Annex G decoder."""
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_color,
        encode_jpeg_progressive_color,
    )

    rng = np.random.default_rng(3)
    for (h, w) in [(16, 16), (33, 41)]:
        rgb = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "420"):
            for q in (85, 45):
                base = decode_jpeg_gray(encode_jpeg_color(rgb, q, sub))[2]
                prog = decode_jpeg_progressive(
                    encode_jpeg_progressive_color(rgb, q, sub)
                )[2]
                assert np.array_equal(base, prog), (h, w, sub, q)


def test_progressive_dri_rejected_loudly():
    """Progressive + restart intervals: not supported — must reject
    loudly (a misparsed RSTn would silently corrupt coefficients)."""
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
    )

    raw = bytearray(encode_jpeg_progressive_gray(_texture(16, 16, 5), 85))
    # splice a DRI (interval 4) right after the DQT segment
    i = raw.find(b"\xff\xc2")
    dri = b"\xff\xdd\x00\x04\x00\x04"
    patched = bytes(raw[:i]) + dri + bytes(raw[i:])
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_progressive(patched)


def test_progressive_random_scan_scripts_fuzz():
    """Bounded fuzz: random VALID scan scripts (random spectral band
    splits, random successive-approximation ladders) must all decode
    bit-identical to baseline — the EOB-run/refinement control flow has
    no script-shape assumptions."""
    import random

    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_gray,
        encode_jpeg_progressive_gray,
    )

    rng = random.Random(77)
    for trial in range(12):
        h, w = rng.randint(8, 48), rng.randint(8, 48)
        px = _texture(h, w, 100 + trial)
        q = rng.choice([30, 60, 85, 95])
        # random spectral split of 1..63 into 1-3 bands
        cuts = sorted(rng.sample(range(2, 63), rng.randint(0, 2)))
        bands = []
        lo = 1
        for c in cuts + [63]:
            bands.append((lo, c))
            lo = c + 1
        # random AC approximation depth 0..2
        al_ac = rng.randint(0, 2)
        scans = [(0, 0, 0, 1)]
        scans += [(ss, se, 0, al_ac) for ss, se in bands]
        for a in range(al_ac, 0, -1):
            scans.append((1, 63, a, a - 1))
        scans.append((0, 0, 1, 0))
        base = decode_jpeg_gray(encode_jpeg_gray(px, q))[2]
        prog = decode_jpeg_progressive(
            encode_jpeg_progressive_gray(px, q, tuple(scans))
        )[2]
        assert np.array_equal(base, prog), (trial, h, w, q, scans)


def test_progressive_color_uses_distinct_dc_tables():
    """ADVICE r3: libjpeg's default progressive scan script assigns
    DISTINCT DC tables in the interleaved DC scan (luma Td=0, chroma
    Td=1). Pin that the encoder emits that layout (so the corpus
    exercises it) AND that the decoder selects the table per component
    (shared-table decoders misparse this bitstream)."""
    from jsonschema_spark.functions.jpeg import (
        decode_jpeg_gray,
        decode_jpeg_progressive,
        encode_jpeg_color,
        encode_jpeg_progressive_color,
    )

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
    raw = encode_jpeg_progressive_color(rgb, 85, "444")
    # the interleaved DC SOS: Ns=3, (1,0x00),(2,0x10),(3,0x10), Ss=Se=0
    assert raw.find(bytes([3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0])) > 0
    # two DC DHT segments present (class 0 ids 0 and 1)
    assert b"\xff\xc4" in raw
    base = decode_jpeg_gray(encode_jpeg_color(rgb, 85, "444"))[2]
    prog = decode_jpeg_progressive(raw)[2]
    assert np.array_equal(base, prog)
