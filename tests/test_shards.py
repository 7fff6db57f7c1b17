"""WebDataset tar shards (sources/shards.py).

Anchors: pack->unpack is lossless for every container type and every
sidecar field; shard bytes are reproducible (fixed mtime/uid, USTAR)
so two packs of the same sorted frame are bit-identical; size capping
produces multiple shards that sum to the corpus; torn shards and
payload/sidecar key mismatches fail LOUDLY.
"""

import glob
import io
import os
import tarfile

import pyspark.sql.functions as F
import pytest

from jsonschema_spark.sources.shards import (
    read_tar_shards,
    write_tar_shards,
)


def _clips(spark, n=60):
    from jsonschema_spark.sources.clips import synth_mixed_clips

    df = synth_mixed_clips(spark, n, partitions=4)
    return df.drop(*[c for c in df.columns if c.startswith("_")])


def test_roundtrip_lossless(spark, tmp_path):
    d = str(tmp_path / "shards")
    clips = _clips(spark).persist()
    man = write_tar_shards(
        clips.repartition(3), d, shard_bytes=256 * 1024
    ).collect()
    assert sum(r["n_samples"] for r in man) == 60
    assert all(os.path.exists(r["shard"]) for r in man)
    back = read_tar_shards(spark, d + "/*.tar")
    cols = ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"]
    a = clips.select(F.md5(F.hex("bytes")).alias("h"), *cols)
    b = back.select(F.md5(F.hex("bytes")).alias("h"), *cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    clips.unpersist()


def test_reproducible_shard_bytes(spark, tmp_path):
    clips = _clips(spark, 24).persist()
    src = clips.repartitionByRange(2, "clip_id").sortWithinPartitions(
        "clip_id"
    )
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(src, d1, shard_bytes=1 << 20).collect()
    write_tar_shards(src, d2, shard_bytes=1 << 20).collect()
    f1 = sorted(os.path.basename(p) for p in glob.glob(d1 + "/*.tar"))
    f2 = sorted(os.path.basename(p) for p in glob.glob(d2 + "/*.tar"))
    assert f1 == f2 and f1
    for name in f1:
        with open(os.path.join(d1, name), "rb") as a, open(
            os.path.join(d2, name), "rb"
        ) as b:
            assert a.read() == b.read(), name
    clips.unpersist()


def test_size_capping(spark, tmp_path):
    d = str(tmp_path / "small")
    man = write_tar_shards(
        _clips(spark, 40).coalesce(1), d, shard_bytes=64 * 1024
    ).collect()
    assert len(man) > 1
    assert sum(r["n_samples"] for r in man) == 40
    # every shard but possibly the last of the partition respects the
    # cap within one member's overshoot
    for r in man:
        assert r["bytes"] < 64 * 1024 + 512 * 1024


def test_torn_shard_fails_loudly(spark, tmp_path):
    d = str(tmp_path / "torn")
    write_tar_shards(
        _clips(spark, 10).coalesce(1), d, shard_bytes=1 << 20
    ).collect()
    path = glob.glob(d + "/*.tar")[0]
    data = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(data[: len(data) // 2 + 7])
    with pytest.raises(Exception):
        read_tar_shards(spark, d + "/*.tar").count()


def test_sidecar_mismatch_fails_loudly(spark, tmp_path):
    d = str(tmp_path / "bad")
    os.makedirs(d)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        info = tarfile.TarInfo("orphan.wav")
        info.size = 4
        tar.addfile(info, io.BytesIO(b"RIFF"))
    with open(os.path.join(d, "shard-0.tar"), "wb") as f:
        f.write(buf.getvalue())
    with pytest.raises(Exception):
        read_tar_shards(spark, d + "/*.tar").count()


# ---------------------------------------------------------------------------
# Tensor shards (.npy members)
# ---------------------------------------------------------------------------


def test_tensor_roundtrip_lossless(spark, tmp_path):
    """int64 and float64 tensors survive the npy+tar cycle bit-for-bit
    (doubles included — npy is raw IEEE bytes), sidecars carry
    n_frames + transcript, and zero-frame clips are skipped."""
    import numpy as np
    import pyspark.sql.types as T

    from jsonschema_spark.sources.shards import (
        read_tensor_shards,
        write_tensor_shards,
    )

    rng = np.random.default_rng(9)
    rows = []
    for i, nfr in enumerate([3, 1, 0, 7]):
        mat = rng.integers(-9000, 3000, size=nfr * 4).astype(np.int64)
        x = rng.standard_normal(nfr * 4)
        rows.append(
            (
                f"c{i}",
                [int(v) for v in mat],
                [float(v) for v in x],
                nfr,
                f"transcript {i}",
            )
        )
    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("x", T.ArrayType(T.DoubleType())),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("transcript", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema).repartition(2, "clip_id")
    out = str(tmp_path / "tshards")
    man = write_tensor_shards(
        df, out, tensor_cols={"mat_q": "mat", "x": "x"}
    ).collect()
    assert sum(m["n_samples"] for m in man) == 3  # zero-frame skipped
    back = read_tensor_shards(
        spark, out + "/*.tar", members={"mat": "long", "x": "double"}
    ).collect()
    got = {r["clip_id"]: r for r in back}
    assert set(got) == {"c0", "c1", "c3"}
    for cid, mat, x, nfr, txt in rows:
        if nfr == 0:
            continue
        r = got[cid]
        assert list(r["mat"]) == mat
        assert list(r["x"]) == x  # bit-equal doubles
        assert r["n_frames"] == nfr and r["transcript"] == txt


def test_tensor_shard_bad_length_fails(spark, tmp_path):
    import pyspark.sql.types as T
    import pytest as _pytest

    from jsonschema_spark.sources.shards import write_tensor_shards

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("mat_q", T.ArrayType(T.LongType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )
    df = spark.createDataFrame([("c0", [1, 2, 3], 2)], schema)
    with _pytest.raises(Exception, match="not divisible"):
        write_tensor_shards(df, str(tmp_path / "bad")).collect()


def test_tar_member_index_random_access(spark, tmp_path):
    """The index enables ranged reads: bytes[offset:offset+size] from
    the raw shard file equal the member content — no tarfile needed on
    the consumer side."""
    import tarfile as _tf

    import pyspark.sql.types as T

    from jsonschema_spark.sources.shards import (
        tar_member_index,
        write_tar_shards,
    )

    schema = T.StructType(
        [
            T.StructField("clip_id", T.StringType()),
            T.StructField("bytes", T.BinaryType()),
            T.StructField("sr_hz", T.IntegerType()),
            T.StructField("dur_ms", T.IntegerType()),
            T.StructField("codec", T.StringType()),
            T.StructField("transcript", T.StringType()),
        ]
    )
    rows = [
        (f"c{i:03d}", bytes([i]) * (100 + 37 * i), 16000, 100,
         "pcm_s16le", f"t {i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, schema).coalesce(1).sortWithinPartitions("clip_id")
    out = str(tmp_path / "ix")
    write_tar_shards(df, out).collect()
    idx = tar_member_index(spark, out + "/*.tar").collect()
    assert len(idx) == 24  # payload + json per clip
    by_member = {}
    import os as _os

    for r in idx:
        path = _os.path.join(out, r["shard"])
        with open(path, "rb") as f:
            f.seek(r["offset_data"])
            data = f.read(r["size_bytes"])
        by_member[r["member"]] = data
        assert r["key"] == r["member"].rsplit(".", 1)[0]
    # ranged reads equal tarfile extraction
    shard_path = _os.path.join(out, idx[0]["shard"])
    with _tf.open(shard_path) as tar:
        for m in tar.getmembers():
            assert by_member[m.name] == tar.extractfile(m).read()
    # and payload members equal the source bytes
    for cid, payload, *_ in rows:
        assert by_member[f"{cid}.wav"] == payload


def test_dotted_or_empty_keys_rejected_at_pack_time(spark, tmp_path):
    """WebDataset member names are '<key>.<member>.<ext>' and readers
    split on the LAST dot — a dotted clip_id would silently mis-group
    members on read. Both packers must reject at pack time (ADVICE r2)."""
    from jsonschema_spark.sources.shards import write_tensor_shards

    clips = _clips(spark, 4).withColumn(
        "clip_id", F.concat(F.col("clip_id"), F.lit(".v2"))
    )
    with pytest.raises(Exception, match="contains '\\.'"):
        write_tar_shards(
            clips, str(tmp_path / "bad1"), shard_bytes=1 << 20
        ).collect()

    tens = spark.createDataFrame(
        [("a.b", [1, 2, 3, 4], 2, "hi")],
        "clip_id string, mat_q array<long>, n_frames int, transcript string",
    )
    with pytest.raises(Exception, match="contains '\\.'"):
        write_tensor_shards(
            tens, str(tmp_path / "bad2"), tensor_cols={"mat_q": "mat"}
        ).collect()
