"""Multimodal binary-column plumbing (image/video stubs) + embedding dedup."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jsonschema_spark.functions.multimodal import (
    IMAGE_FEATURES_SCHEMA,
    decode_image,
    decode_video_frame,
    encode_fake_image,
    encode_fake_video,
    image_features,
    sample_frames,
)
from jsonschema_spark.operators import dedup
from jsonschema_spark.sources.tables import load_table

from .conftest import SF_DIR


def _img(seed: int, w: int = 8, h: int = 6) -> bytes:
    rng = np.random.RandomState(seed)
    return encode_fake_image(w, h, rng.randint(0, 256, size=(h, w)))


def test_fake_image_round_trip():
    raw = _img(1, 10, 4)
    w, h, px = decode_image(raw)
    assert (w, h) == (10, 4) and px.shape == (4, 10)


def test_real_codec_is_stubbed():
    # PNG and baseline grayscale JPEG decode for real (test_png_*,
    # test_jpeg.py); malformed bodies are decode FAILURES (ValueError),
    # and the still-unavailable codecs (webp, mpeg) stay loudly stubbed
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises((ValueError, Exception)):
        decode_image(b"\xff\xd8\xff\xe0" + b"0" * 32)  # torn JPEG
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF0000WEBP")
    with pytest.raises(NotImplementedError):
        decode_video_frame(b"\x00\x00\x01\xba mpeg", 0)


def test_image_features_batch(spark):
    rows = [
        Row(image_id="img-0", bytes=_img(0)),
        Row(image_id="img-1", bytes=_img(1, 16, 16)),
        Row(image_id="img-2", bytes=b"\xffJPEG-like"),  # undecodable
        Row(image_id="img-3", bytes=None),
    ]
    df = spark.createDataFrame(rows).repartition(2)
    feats = image_features(df)
    assert feats.schema == IMAGE_FEATURES_SCHEMA
    got = {r.image_id: r for r in feats.collect()}
    assert got["img-1"].width == 16 and got["img-1"].decode_ok
    assert 0 <= got["img-0"].mean_luma <= 255
    assert not got["img-2"].decode_ok and got["img-2"].width is None
    assert not got["img-3"].decode_ok
    # decode failures isolate; they never kill the job
    assert feats.count() == 4


def test_video_frame_sampling(spark):
    lumas = np.arange(100) % 256
    rows = [Row(video_id="v0", bytes=encode_fake_video(100, lumas), n_frames=100)]
    df = spark.createDataFrame(rows)
    frames = sample_frames(df, every_n=10)
    got = frames.orderBy("frame_index").collect()
    # JVM-side fan-out: frames 0,10,...,90 sampled, decoded values match
    assert [r.frame_index for r in got] == list(range(0, 100, 10))
    assert all(r.decode_ok for r in got)
    assert [int(r.frame_luma) for r in got] == [i % 256 for i in range(0, 100, 10)]


def test_embedding_bruteforce_pairs(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    pairs = dedup.embedding_pairs_bruteforce(emb, threshold=0.4).collect()
    assert all(r.id_a < r.id_b and r.cos >= 0.4 for r in pairs)


def test_embedding_lsh_finds_planted_near_dups(spark):
    emb = load_table(spark, SF_DIR, "embeddings").limit(100)
    # plant near-duplicates: tiny perturbation of existing vectors
    dups = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.0001 + 0.0001).alias("embedding"),
        "label",
    )
    both = emb.unionByName(dups)
    found = dedup.embedding_near_dups(both, threshold=0.99).collect()
    planted = {(r.id_a, r.id_b) for r in found if r.id_b == r.id_a + 100000}
    # LSH must recover nearly all planted near-identical pairs
    assert len(planted) >= 90
    # and exact verification keeps precision: everything reported is >= 0.99
    assert all(r.cos >= 0.99 for r in found)


def test_real_ppm_pgm_bmp_decode():
    """PPM/PGM/BMP are codec-free REAL formats — decoded with pure numpy
    (only compressed formats remain stubbed)."""
    import struct

    import numpy as np

    from jsonschema_spark.functions.multimodal import decode_image

    # PGM (P5), 3x2 grayscale with a header comment
    pgm = b"P5\n# comment\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    w, h, px = decode_image(pgm)
    assert (w, h) == (3, 2)
    assert px.tolist() == [[10, 20, 30], [40, 50, 60]]

    # PPM (P6), 2x1 RGB: pure red + pure white
    ppm = b"P6 2 1 255\n" + bytes([255, 0, 0, 255, 255, 255])
    w, h, px = decode_image(ppm)
    assert (w, h) == (2, 1)
    assert px[0, 0] == 76   # Rec.601 luma of pure red
    assert px[0, 1] == 255

    # BMP: 2x2 uncompressed 24-bit, bottom-up, 4-byte row padding (2*3->8)
    width, height = 2, 2
    stride = (width * 3 + 3) & ~3
    # rows stored bottom-up in BGR; make top row white, bottom row black
    bottom = bytes([0, 0, 0] * width) + b"\x00" * (stride - width * 3)
    top = bytes([255, 255, 255] * width) + b"\x00" * (stride - width * 3)
    pixel_data = bottom + top
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    w, h, px = decode_image(header + info + pixel_data)
    assert (w, h) == (2, 2)
    assert px[0].tolist() == [255, 255]  # top row (flipped from bottom-up)
    assert px[1].tolist() == [0, 0]

    np.testing.assert_array_equal(px, px)  # exercised; shape sane


def test_compressed_formats_still_stubbed():
    import pytest as _pytest

    from jsonschema_spark.functions.multimodal import decode_image

    # baseline grayscale JPEG now decodes natively (test_jpeg.py);
    # webp stays loudly stubbed
    with _pytest.raises(NotImplementedError):
        decode_image(b"RIFF0000WEBPVP8 ")


def test_truncated_bmp_is_decode_failure_not_crash(spark):
    """Poison-pill contract: a truncated BMP header yields decode_ok=false
    rows instead of crashing the task (ValueError, never struct.error)."""
    import pytest as _pytest
    from pyspark.sql import Row

    from jsonschema_spark.functions.multimodal import decode_image, image_features

    with _pytest.raises(ValueError):
        decode_image(b"BM" + b"\x00" * 8)
    df = spark.createDataFrame(
        [Row(image_id="bad", bytes=bytearray(b"BM" + b"\x00" * 8))]
    )
    rows = image_features(df).collect()
    assert len(rows) == 1 and rows[0].decode_ok is False


def test_png_round_trip_gray_and_rgb():
    import numpy as np

    from jsonschema_spark.functions.multimodal import (
        _luma,
        decode_image,
        encode_png,
    )

    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (23, 31)).astype(np.uint8)
    w, h, px = decode_image(encode_png(g))
    assert (w, h) == (31, 23) and (px == g).all()
    rgb = rng.randint(0, 256, (9, 13, 3)).astype(np.uint8)
    w, h, px = decode_image(encode_png(rgb))
    assert (w, h) == (13, 9) and (px == _luma(rgb)).all()


def test_png_all_five_filters_decode():
    """Hand-built PNG whose scanlines cycle through filters 0-4, the
    filtered bytes produced by an independent scalar filter ENCODER —
    the decoder must invert every filter exactly."""
    import struct
    import zlib

    import numpy as np

    from jsonschema_spark.functions.multimodal import (
        _PNG_MAGIC,
        _decode_png,
        _luma,
        _paeth,
        _png_chunk,
    )

    rng = np.random.RandomState(7)
    W, H, CH = 7, 5, 3
    truth = rng.randint(0, 256, (H, W * CH)).astype(np.int32)
    lines = []
    prev = np.zeros(W * CH, np.int32)
    for y in range(H):
        ft = y % 5
        cur = truth[y]
        enc = cur.copy()
        for x in range(W * CH - 1, -1, -1):
            a = int(cur[x - CH]) if x >= CH else 0
            b = int(prev[x])
            c = int(prev[x - CH]) if x >= CH else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: _paeth(a, b, c)}[ft]
            enc[x] = (cur[x] - pred) & 255
        lines.append(bytes([ft]) + enc.astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    png = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )
    w, h, px = _decode_png(png)
    want = _luma(truth.astype(np.uint8).reshape(H, W, CH))
    assert (w, h) == (W, H) and (px == want).all()


def test_png_unsupported_layouts_are_decode_failures():
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from jsonschema_spark.functions.multimodal import (
        _PNG_MAGIC,
        _decode_png,
        _png_chunk,
        encode_png,
    )

    def png_with_ihdr(depth, ctype, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace)
        raw = zlib.compress(b"\x00\x00\x00" * 2)
        return (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", raw)
            + _png_chunk(b"IEND", b"")
        )

    with _pytest.raises(ValueError):  # 16-bit depth
        _decode_png(png_with_ihdr(16, 0, 0))
    with _pytest.raises(ValueError):  # Adam7 interlace
        _decode_png(png_with_ihdr(8, 0, 1))
    with _pytest.raises(ValueError):  # palette color
        _decode_png(png_with_ihdr(8, 3, 0))
    with _pytest.raises(ValueError):  # truncated pixel data
        bad = encode_png(np.zeros((4, 4), np.uint8))
        # shrink the IDAT payload: re-deflate fewer bytes than h*(w+1)
        _decode_png(png_with_ihdr(8, 0, 0).replace(
            zlib.compress(b"\x00\x00\x00" * 2), zlib.compress(b"\x00")
        ))
        del bad


def test_image_features_over_png(spark):
    import numpy as np
    from pyspark.sql import Row

    from jsonschema_spark.functions.multimodal import encode_png, image_features

    rng = np.random.RandomState(9)
    rows = []
    lumas = {}
    for i in range(6):
        px = rng.randint(0, 256, (8 + i, 10)).astype(np.uint8)
        lumas[f"img-{i}"] = (float(px.mean()), px.shape)
        rows.append(Row(image_id=f"img-{i}", bytes=bytearray(encode_png(px))))
    rows.append(Row(image_id="img-bad", bytes=bytearray(b"\xff\xd8\xff\xe0junk")))
    df = spark.createDataFrame(rows)
    got = {r["image_id"]: r for r in image_features(df).collect()}
    assert not got["img-bad"]["decode_ok"]
    for k, (mean, (h, w)) in lumas.items():
        r = got[k]
        assert r["decode_ok"] and (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_luma"] - mean) < 1e-9


def test_dhash_png_round_trip():
    """dHash of decoded PNG pixels == dHash of source pixels (lossless)."""
    import numpy as np

    from jsonschema_spark.functions.multimodal import (
        dhash_from_pixels,
        encode_png,
    )

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(32, 48)).astype(np.uint8)
    w, h, dec = decode_image(encode_png(px))
    assert (w, h) == (48, 32)
    assert dhash_from_pixels(dec) == dhash_from_pixels(px)


def test_dhash_signed_packing():
    """An all-ones top bit packs into a NEGATIVE int64 (two's complement)."""
    import numpy as np

    from jsonschema_spark.functions.multimodal import dhash_from_pixels

    # strictly decreasing columns -> every gradient bit is 1 -> hash -1
    px = np.tile(np.arange(255, 255 - 48, -1, dtype=np.uint8), (32, 1))
    assert dhash_from_pixels(px) == -1
    # strictly increasing -> all zero
    px = np.tile(np.arange(0, 48, dtype=np.uint8), (32, 1))
    assert dhash_from_pixels(px) == 0


def test_image_near_dup_pairs_matches_brute(spark):
    """Banded pairs == brute-force over the ledger hashes (pigeonhole),
    exact dups at Hamming 0, undecodable rows poison-pilled out."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import image_near_dup_pairs
    from jsonschema_spark.sources.images import synth_images

    images = synth_images(spark, 60).withColumn(
        "bytes",
        F.when(F.col("_row_idx") == 59, F.lit(b"not an image")).otherwise(
            F.col("bytes")
        ),
    )
    got = image_near_dup_pairs(images, max_hamming=3)
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in got.collect()}
    # brute force over the ledger truth (excluding the poisoned row)
    truth = {
        r["image_id"]: r["_dhash"]
        for r in images.select("image_id", "_dhash").collect()
        if r["image_id"] != "img-000059"
    }
    expect = {}
    ids = sorted(truth)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((truth[a] ^ truth[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                expect[(a, b)] = h
    assert rows == expect
    # every family's exact duplicate is present at hamming 0
    assert all(
        rows.get((f"img-{f*3:06d}", f"img-{f*3+1:06d}")) == 0 for f in range(19)
    )


def test_y4m_round_trip_and_frame_luma():
    from jsonschema_spark.functions.multimodal import (
        decode_video_frame,
        decode_y4m_frame_luma,
        encode_y4m,
        y4m_frame_count,
    )

    frames = np.arange(3 * 8 * 8, dtype=np.uint8).reshape(3, 8, 8) % 256
    raw = encode_y4m(frames)
    assert raw[:9] == b"YUV4MPEG2"
    assert y4m_frame_count(raw) == 3
    for f in range(3):
        want = float(int(frames[f].astype(np.int64).sum()) / 64)
        assert decode_y4m_frame_luma(raw, f) == want
        assert decode_video_frame(raw, f) == want
    with pytest.raises(IndexError):
        decode_y4m_frame_luma(raw, 3)


def test_y4m_header_constants_match_source():
    from jsonschema_spark.functions.multimodal import encode_y4m
    from jsonschema_spark.sources.videos import (
        Y4M_FRAME_LEN,
        Y4M_HEADER_LEN,
        video_frames,
    )

    raw = encode_y4m(video_frames(0))
    # the oracle hardcodes these offsets — pin them against the encoder
    assert raw.index(b"\n") + 1 == Y4M_HEADER_LEN
    assert (len(raw) - Y4M_HEADER_LEN) % Y4M_FRAME_LEN == 0
    assert raw[Y4M_HEADER_LEN : Y4M_HEADER_LEN + 6] == b"FRAME\n"


def test_y4m_truncation_detected():
    from jsonschema_spark.functions.multimodal import (
        decode_y4m_frame_luma,
        y4m_frame_count,
    )
    from jsonschema_spark.sources.videos import _row, video_n_frames

    i = 4  # TRUNC_CLS row
    _, raw, _, _, claimed, _ = _row(i)
    raw = bytes(raw)
    assert claimed == video_n_frames(i)
    assert y4m_frame_count(raw) == claimed - 1
    decode_y4m_frame_luma(raw, claimed - 2)  # last complete frame ok
    with pytest.raises(IndexError):
        decode_y4m_frame_luma(raw, claimed - 1)


def test_y4m_odd_dims_and_bad_stream():
    from jsonschema_spark.functions.multimodal import encode_y4m, y4m_frame_count

    with pytest.raises(ValueError):
        encode_y4m(np.zeros((1, 7, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        y4m_frame_count(b"MPEG-PS whatever")


def test_y4m_sample_frames_end_to_end(spark):
    from jsonschema_spark.functions.multimodal import sample_frames
    from jsonschema_spark.sources.videos import (
        TRUNC_CLS,
        TRUNC_MOD,
        synth_videos,
        video_frames,
        video_n_frames,
    )

    vids = synth_videos(spark, 33, partitions=4)
    rows = sample_frames(vids, every_n=3).collect()
    by = {(r["video_id"], r["frame_index"]): r for r in rows}
    for i in range(33):
        n = video_n_frames(i)
        actual = n - 1 if i % TRUNC_MOD == TRUNC_CLS else n
        fr = video_frames(i)
        for fi in range(0, n, 3):
            r = by[(f"vid-{i:06d}", fi)]
            if fi < actual:
                assert r["decode_ok"]
                assert r["frame_luma"] == float(
                    int(fr[fi].astype(np.int64).sum()) / 64
                )
            else:
                assert not r["decode_ok"] and r["frame_luma"] is None
