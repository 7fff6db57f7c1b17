"""Container / metadata integrity checks — scan-speed payload validation.

The cheapest tier of the audio-validation ladder: BEFORE paying the Arrow
boundary for decode-PCM SNR (functions/audio.py), a 10^12-row pipeline
should reject structurally broken payloads with pure Column expressions —
whole-stage codegen over the binary column, zero Python, zero shuffles.
These checks catch truncation, wrong-container bytes, and header-vs-
metadata drift (the classic symptom of a bad backfill) at full scan speed,
so the expensive decode UDF only ever sees plausibly-decodable rows.

Two operators:

- ``payload_integrity``  — codec-dispatched magic-prefix and exact
  byte-length reconciliation against the (sr_hz, dur_ms, codec) metadata
  columns. Works for headerless raw PCM and magic-prefixed containers.
- ``wav_header_checks``  — field-level parse of the canonical 44-byte
  RIFF/WAVE PCM header (RFC 2361 layout) with little-endian integers
  decoded via hex-nibble reordering + ``conv`` — still pure codegen. The
  parsed fields are cross-checked against each other (riff/data sizes vs
  actual byte length, byte_rate vs sample_rate) and against the metadata
  columns (sample rate, duration-implied sample count). Non-canonical
  layouts (extra chunks) are flagged ``canonical = false`` rather than
  misparsed — route those to the Python chunk-walking decoder.

Both are engine-replayable (hex arithmetic exists in any SQL dialect), so
the contract queries hash-match DuckDB oracles that recompute every field
from the same parquet blobs.

NULL semantics: a NULL payload fails every check (loud), never NULLs
through — gate columns are ``coalesce(..., false)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hex(prefix) per synthetic container (functions/audio.py encode_payload);
# raw pcm_s16le has no magic. Uppercase — both F.hex and DuckDB hex().
MAGIC_HEX = {"flac": "664C614330", "opus": "4F707553"}
HEADER_LEN = {"pcm_s16le": 0, "flac": 5, "opus": 4, "wav": 44}
BYTES_PER_SAMPLE = {"pcm_s16le": 2, "flac": 4, "opus": 2, "wav": 2}
_WAV_MAGIC_RIFF = "52494646"  # 'RIFF'
_WAV_MAGIC_WAVE = "57415645"  # 'WAVE'
_WAV_MAGIC_FMT = "666D7420"  # 'fmt '
_WAV_MAGIC_DATA = "64617461"  # 'data'


def _le_uint(col: Column, pos: int, nbytes: int) -> Column:
    """Little-endian unsigned int at 1-based byte offset ``pos`` — hex the
    bytes highest-first and radix-convert. Codegen'd JVM expressions."""
    parts = [F.hex(F.substring(col, pos + i, 1)) for i in reversed(range(nbytes))]
    return F.conv(F.concat(*parts), 16, 10).cast("long")


def payload_integrity(
    df: DataFrame,
    bytes_col: str = "bytes",
    sr_col: str = "sr_hz",
    dur_col: str = "dur_ms",
    codec_col: str = "codec",
) -> DataFrame:
    """Input plus (expected_samples, actual_len, expected_len, magic_ok,
    len_ok, integrity_ok).

    ``expected_len`` is the exact container size implied by the metadata
    (header + bytes/sample × sr·dur/1000); an unknown codec yields NULL
    expected_len / magic_ok and therefore ``integrity_ok = false`` — a
    codec this operator cannot certify is not certified.
    """
    b = F.col(bytes_col)
    # integer DIV, not float divide — the oracle replays this in SQL and
    # both engines must floor identically
    n = F.expr(
        f"CAST((CAST({sr_col} AS BIGINT) * CAST({dur_col} AS BIGINT)) DIV 1000 "
        "AS BIGINT)"
    )
    codec = F.col(codec_col)

    expected = None
    for name, hdr in HEADER_LEN.items():
        term = F.when(codec == name, F.lit(hdr) + F.lit(BYTES_PER_SAMPLE[name]) * n)
        expected = term if expected is None else expected.when(
            codec == name, F.lit(hdr) + F.lit(BYTES_PER_SAMPLE[name]) * n
        )

    magic = (
        F.when(codec == "pcm_s16le", b.isNotNull())
        .when(codec == "flac", F.hex(F.substring(b, 1, 5)) == MAGIC_HEX["flac"])
        .when(codec == "opus", F.hex(F.substring(b, 1, 4)) == MAGIC_HEX["opus"])
        .when(
            codec == "wav",
            (F.hex(F.substring(b, 1, 4)) == _WAV_MAGIC_RIFF)
            & (F.hex(F.substring(b, 9, 4)) == _WAV_MAGIC_WAVE),
        )
    )

    out = df.withColumn("expected_samples", n)
    out = out.withColumn("actual_len", F.length(b).cast("long"))
    out = out.withColumn("expected_len", expected)
    out = out.withColumn("magic_ok", F.coalesce(magic, F.lit(False)))
    out = out.withColumn(
        "len_ok",
        F.coalesce(F.col("expected_len") == F.col("actual_len"), F.lit(False)),
    )
    return out.withColumn("integrity_ok", F.col("magic_ok") & F.col("len_ok"))


def wav_header_checks(
    df: DataFrame,
    bytes_col: str = "bytes",
    sr_col: str = "sr_hz",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """Input plus parsed canonical-WAV header fields and reconciliation
    flags.

    Added columns: ``is_riff`` (RIFF/WAVE magics), ``canonical`` (fmt
    chunk at 13 with size 16, data chunk at 37 — the layout
    ``encode_wav_pcm16`` and most encoders emit), header fields
    (``audio_format, n_channels, header_sr, byte_rate, block_align,
    bits_per_sample, data_size`` — NULL unless canonical), and checks:

    - ``riff_size_ok``  riff chunk size == actual length − 8
    - ``data_size_ok``  data chunk size == actual length − 44
    - ``fmt_ok``        PCM16 mono with self-consistent byte_rate/align
    - ``sr_match``      header_sr == the ``sr_col`` metadata column
    - ``samples_match`` data_size/2 == sr·dur/1000 implied sample count
    - ``header_ok``     conjunction of all of the above
    """
    b = F.col(bytes_col)
    blen = F.length(b).cast("long")
    long_enough = blen >= 44
    is_riff = (
        long_enough
        & (F.hex(F.substring(b, 1, 4)) == _WAV_MAGIC_RIFF)
        & (F.hex(F.substring(b, 9, 4)) == _WAV_MAGIC_WAVE)
    )
    canonical = (
        is_riff
        & (F.hex(F.substring(b, 13, 4)) == _WAV_MAGIC_FMT)
        & (_le_uint(b, 17, 4) == 16)
        & (F.hex(F.substring(b, 37, 4)) == _WAV_MAGIC_DATA)
    )

    out = df.withColumn("actual_len", blen)
    out = out.withColumn("is_riff", F.coalesce(is_riff, F.lit(False)))
    out = out.withColumn("canonical", F.coalesce(canonical, F.lit(False)))
    gate = F.col("canonical")
    for name, pos, nb in [
        ("audio_format", 21, 2),
        ("n_channels", 23, 2),
        ("header_sr", 25, 4),
        ("byte_rate", 29, 4),
        ("block_align", 33, 2),
        ("bits_per_sample", 35, 2),
        ("data_size", 41, 4),
    ]:
        out = out.withColumn(name, F.when(gate, _le_uint(b, pos, nb)))

    ok = lambda c: F.coalesce(gate & c, F.lit(False))  # noqa: E731
    out = out.withColumn("riff_size_ok", ok(_le_uint(b, 5, 4) == blen - 8))
    out = out.withColumn("data_size_ok", ok(F.col("data_size") == blen - 44))
    out = out.withColumn(
        "fmt_ok",
        ok(
            (F.col("audio_format") == 1)
            & (F.col("n_channels") == 1)
            & (F.col("bits_per_sample") == 16)
            & (F.col("byte_rate") == F.col("header_sr") * 2)
            & (F.col("block_align") == 2)
        ),
    )
    out = out.withColumn("sr_match", ok(F.col("header_sr") == F.col(sr_col)))
    meta_samples = F.expr(
        f"CAST((CAST({sr_col} AS BIGINT) * CAST({dur_col} AS BIGINT)) DIV 1000 "
        "AS BIGINT)"
    )
    out = out.withColumn(
        "samples_match",
        ok(F.expr("CAST(data_size DIV 2 AS BIGINT)") == meta_samples),
    )
    return out.withColumn(
        "header_ok",
        F.col("riff_size_ok")
        & F.col("data_size_ok")
        & F.col("fmt_ok")
        & F.col("sr_match")
        & F.col("samples_match"),
    )


def content_manifest(
    df: DataFrame,
    key_col: str = "clip_id",
    payload_col: str = "bytes",
    n_buckets: int = 64,
) -> DataFrame:
    """Content-addressable transfer manifest: one row per bucket with a
    Merkle-style rollup digest — the integrity artifact a 100 TB corpus
    copy/restore verifies against (re-run on the destination, compare
    bucket digests, re-transfer only mismatched buckets).

    bucket        md5_60(key) % n_buckets — engine-independent, so the
                  destination side of a copy reproduces the assignment;
    n_rows        rows in the bucket;
    total_bytes   payload bytes in the bucket (NULL payloads count 0);
    digest_sum    SUM of md5_60('key:' || md5(payload-hex)) per bucket as
                  DECIMAL(38,0) — a commutative content checksum: exact
                  (no overflow below ~10^17 rows/bucket), identical under
                  ANY partitioning/order, and the aggregate is a plain
                  partial+final sum, so per-group state is O(1) — no
                  collect_list whose per-bucket memory grows with corpus
                  size. Keyed-line hashing means a swapped payload pair,
                  a renamed key, or a byte flip all move the sum; what a
                  sum cannot catch (unlike a sorted-concat Merkle digest)
                  is a crafted ADVERSARIAL collision — this is a transfer
                  corruption check, not an authentication code.

    Plan: one scan -> per-row md5 (codegen, 42 KB payloads reduce to
    32-byte digests BEFORE the shuffle) -> ONE narrow groupBy(bucket).
    NULL payloads hash as the literal 'null' so presence is attested."""
    b = (
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10)
        .cast("long") % n_buckets
    ).alias("bucket")
    line = F.concat(
        F.col(key_col),
        F.lit(":"),
        F.coalesce(F.md5(F.hex(F.col(payload_col))), F.lit("null")),
    )
    rows = df.select(
        b,
        F.conv(F.substring(F.md5(line), 1, 15), 16, 10)
        .cast("decimal(38,0)")
        .alias("_h"),
        F.coalesce(F.length(F.col(payload_col)), F.lit(0))
        .cast("long")
        .alias("_len"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_len").alias("total_bytes"),
        F.sum("_h").cast("decimal(38,0)").alias("digest_sum"),
    )
