"""WebDataset-style tar shards — the de-facto distribution format for
audio/vision training corpora (pure stdlib tarfile; no webdataset lib).

Training corpora ship as numbered ``.tar`` shards whose members pair a
payload with a JSON sidecar under one key (``<key>.wav`` +
``<key>.json``). The shard is the unit of sequential IO AND the unit
of parallelism: a 100 TB corpus is ~a million 128 MB shards, and every
framework (and this engine) maps one task to one shard.

  write_tar_shards   distributed sink: one mapInPandas pass writes
                     size-capped tars per partition (file names carry
                     the partition id, so tasks never collide) and
                     returns a MANIFEST DataFrame (shard, samples,
                     bytes) — the thing a training job actually
                     consumes. Tar bytes are REPRODUCIBLE: fixed
                     mtime/uid/gid, USTAR format, members emitted in
                     sorted-key order when the caller pre-sorts.
  read_tar_shards    distributed source: ``binaryFile`` scan of the
                     shard glob (one row per shard — Spark's native
                     parallelism over files) + one mapInPandas hop
                     unpacking payload + sidecar back into the
                     engine's clips schema. A torn/truncated shard
                     fails LOUDLY (tarfile.ReadError -> the task
                     raises) rather than yielding partial rows.

Scale shape: no shuffle in either direction (the sink reuses the
caller's partitioning; the source parallelizes over shard files);
payloads cross the Arrow boundary once each way.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_tar_shards", "read_tar_shards", "MANIFEST_TYPE"]

MANIFEST_TYPE = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

_EXT_BY_CODEC = {
    "flac": "flac", "aiff": "aiff", "au": "au", "mp3": "mp3",
    "ogg": "ogg", "opus": "ogg", "vorbis": "ogg",
}

_META_COLS = ("sr_hz", "dur_ms", "codec", "transcript")


def _ext_for(codec: str | None) -> str:
    return _EXT_BY_CODEC.get((codec or "").lower(), "wav")


def _tar_member(tar: tarfile.TarFile, name: str, data: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(data))


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    shard_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Pack ``df`` (clips schema) into WebDataset tars under
    ``out_dir``; returns the manifest DataFrame. One pass, no shuffle
    — partitioning (and within-partition order) is the caller's
    choice; ``df.repartitionByRange("clip_id").sortWithinPartitions(
    "clip_id")`` gives globally-ordered reproducible shards."""
    os.makedirs(out_dir, exist_ok=True)
    meta_present = [c for c in _META_COLS if c in df.columns]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        buf: io.BytesIO | None = None
        tar: tarfile.TarFile | None = None
        count = 0
        manifest: list[tuple[str, int, int]] = []

        def flush():
            nonlocal buf, tar, count, seq
            if tar is None:
                return
            tar.close()
            data = buf.getvalue()
            path = os.path.join(
                out_dir, f"shard-{pid:05d}-{seq:05d}.tar"
            )
            with open(path, "wb") as f:
                f.write(data)
            manifest.append((path, count, len(data)))
            buf = tar = None
            count = 0
            seq += 1

        def ensure() -> tarfile.TarFile:
            nonlocal buf, tar
            if tar is None:
                buf = io.BytesIO()
                tar = tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                )
            return tar

        for b in batches:
            for row in b.itertuples(index=False):
                d = row._asdict()
                key = d["clip_id"]
                # WebDataset keys may not contain '.' (readers split
                # member names on the last dot) — reject at pack time.
                if not key or "." in key:
                    raise ValueError(
                        f"shard key {key!r} is empty or contains '.' — "
                        f"WebDataset member names split on the last "
                        f"dot; sanitize clip_id first"
                    )
                payload = bytes(d["bytes"])
                meta = {}
                for c in meta_present:
                    v = d[c]
                    if v is None or (
                        not isinstance(v, (str, bytes)) and pd.isna(v)
                    ):
                        continue
                    if isinstance(v, str):
                        meta[c] = v
                    else:
                        meta[c] = int(v)
                t = ensure()
                _tar_member(
                    t, f"{key}.{_ext_for(d.get('codec'))}", payload
                )
                _tar_member(
                    t,
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True).encode(),
                )
                count += 1
                if buf.tell() >= shard_bytes:
                    flush()
        flush()
        yield pd.DataFrame(
            manifest, columns=["shard", "n_samples", "bytes"]
        )

    return df.mapInPandas(pack, schema=MANIFEST_TYPE)


def read_tar_shards(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read WebDataset tars back into the engine clips schema — one
    ``binaryFile`` row per shard (native file-level parallelism), one
    Arrow hop to unpack. Malformed tars raise (loud failure)."""
    from jsonschema_spark.sources.clips import CLIPS_SCHEMA

    files = spark.read.format("binaryFile").load(path_glob)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for raw in b["content"]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(raw)), mode="r"
                ) as tar:
                    payloads: dict[str, bytes] = {}
                    metas: dict[str, dict] = {}
                    for m in tar.getmembers():
                        key, _, ext = m.name.rpartition(".")
                        data = tar.extractfile(m).read()
                        if ext == "json":
                            metas[key] = json.loads(data)
                        else:
                            payloads[key] = data
                    if set(payloads) != set(metas):
                        raise ValueError(
                            "tar shard payload/sidecar key mismatch"
                        )
                    for key in sorted(payloads):
                        meta = metas[key]
                        rows.append(
                            (
                                key,
                                bytearray(payloads[key]),
                                meta.get("sr_hz"),
                                meta.get("dur_ms"),
                                meta.get("codec"),
                                meta.get("transcript"),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in CLIPS_SCHEMA.fields],
            )

    return files.select("content").mapInPandas(
        unpack, schema=CLIPS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Tensor shards: .npy members — the training-side WebDataset format
# ---------------------------------------------------------------------------


def _npy_bytes(arr) -> bytes:
    """Standard NPY v1.0 serialization (np.save to a buffer) — the
    member format every training loader (webdataset, torch, numpy
    mmap) consumes natively. Deterministic for a given dtype/shape."""
    import numpy as np

    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def write_tensor_shards(
    df: DataFrame,
    out_dir: str,
    tensor_cols: dict[str, str] | None = None,
    n_frames_col: str = "n_frames",
    id_col: str = "clip_id",
    meta_cols: tuple[str, ...] = ("transcript",),
    shard_bytes: int = 128 * 1024 * 1024,
    vector_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Pack per-clip feature tensors into WebDataset tars: each key
    carries one ``<key>.<member>.npy`` per tensor column (reshaped to
    (n_frames, width); int64 arrays as <i8, doubles as <f8) plus a
    ``<key>.json`` sidecar (n_frames + ``meta_cols``). The training
    job reads these directly — no engine required on the consumer
    side, which is the point of shipping npy instead of parquet.

    ``vector_cols`` members are 1-D arrays written at their own length
    (label id sequences, per-clip embeddings) — no frame reshape.

    Same scale shape as ``write_tar_shards``: one mapInPandas pass,
    no shuffle, reproducible tar bytes, manifest returned. Clips with
    n_frames == 0 (undecodable / sub-window) are SKIPPED — there is
    no tensor to train on; count them upstream via the extraction
    report, not here."""
    import numpy as np

    tensor_cols = tensor_cols or {"mat_q": "mat"}
    vector_cols = vector_cols or {}
    os.makedirs(out_dir, exist_ok=True)
    meta_present = [c for c in meta_cols if c in df.columns]

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq = 0
        buf: io.BytesIO | None = None
        tar: tarfile.TarFile | None = None
        count = 0
        manifest: list[tuple[str, int, int]] = []

        def flush():
            nonlocal buf, tar, count, seq
            if tar is None:
                return
            tar.close()
            data = buf.getvalue()
            path = os.path.join(
                out_dir, f"tensors-{pid:05d}-{seq:05d}.tar"
            )
            with open(path, "wb") as f:
                f.write(data)
            manifest.append((path, count, len(data)))
            buf = tar = None
            count = 0
            seq += 1

        def ensure() -> tarfile.TarFile:
            nonlocal buf, tar
            if tar is None:
                buf = io.BytesIO()
                tar = tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                )
            return tar

        for b in batches:
            for row in b.itertuples(index=False):
                d = row._asdict()
                key = d[id_col]
                # WebDataset keys may not contain '.': readers split
                # '<key>.<member>.npy' on the LAST dot, so a dotted or
                # empty id silently mis-groups members. Fail at pack
                # time, loudly, instead.
                if not key or "." in key:
                    raise ValueError(
                        f"tensor-shard key {key!r} is empty or contains "
                        f"'.' — WebDataset member names are "
                        f"'<key>.<member>.npy' and split on the last "
                        f"dot; sanitize the id column first"
                    )
                nfr = int(d[n_frames_col] or 0)
                if nfr <= 0:
                    continue
                t = ensure()
                for col, member in tensor_cols.items():
                    flat = d[col]
                    vals = list(flat)
                    width = len(vals) // nfr
                    if width * nfr != len(vals):
                        raise ValueError(
                            f"{col} length {len(vals)} not divisible"
                            f" by n_frames {nfr} for {key}"
                        )
                    if vals and isinstance(vals[0], float):
                        arr = np.asarray(vals, dtype="<f8")
                    else:
                        arr = np.asarray(vals, dtype="<i8")
                    _tar_member(
                        t,
                        f"{key}.{member}.npy",
                        _npy_bytes(arr.reshape(nfr, width)),
                    )
                for col, member in vector_cols.items():
                    vals = list(d[col]) if d[col] is not None else []
                    if vals and isinstance(vals[0], float):
                        arr = np.asarray(vals, dtype="<f8")
                    else:
                        arr = np.asarray(vals, dtype="<i8")
                    _tar_member(
                        t, f"{key}.{member}.npy", _npy_bytes(arr)
                    )
                meta = {"n_frames": nfr}
                for c in meta_present:
                    v = d[c]
                    if v is not None and (
                        isinstance(v, (str, bytes)) or not pd.isna(v)
                    ):
                        meta[c] = v if isinstance(v, str) else int(v)
                _tar_member(
                    t,
                    f"{key}.json",
                    json.dumps(meta, sort_keys=True).encode(),
                )
                count += 1
                if buf.tell() >= shard_bytes:
                    flush()
        flush()
        yield pd.DataFrame(
            manifest, columns=["shard", "n_samples", "bytes"]
        )

    return df.mapInPandas(pack, schema=MANIFEST_TYPE)


def read_tensor_shards(
    spark: SparkSession,
    path_glob: str,
    members: dict[str, str] | None = None,
) -> DataFrame:
    """Read tensor tars back: one binaryFile row per shard, one Arrow
    hop unpacking npy members (``members`` maps member name ->
    'long' | 'double') into flattened arrays + n_frames + transcript.
    Torn tars and key mismatches fail loudly."""
    import numpy as np

    members = members or {"mat": "long"}
    fields = [T.StructField("clip_id", T.StringType(), False)]
    for name, kind in members.items():
        fields.append(
            T.StructField(
                name,
                T.ArrayType(
                    T.LongType() if kind == "long" else T.DoubleType()
                ),
            )
        )
    fields += [
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("transcript", T.StringType()),
    ]
    schema = T.StructType(fields)
    files = spark.read.format("binaryFile").load(path_glob)

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for raw in b["content"]:
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(raw)), mode="r"
                ) as tar:
                    tensors: dict[str, dict[str, list]] = {}
                    metas: dict[str, dict] = {}
                    for m in tar.getmembers():
                        data = tar.extractfile(m).read()
                        if m.name.endswith(".json"):
                            metas[m.name[:-5]] = json.loads(data)
                            continue
                        if not m.name.endswith(".npy"):
                            raise ValueError(
                                f"unexpected member {m.name}"
                            )
                        stem = m.name[:-4]
                        key, _, member = stem.rpartition(".")
                        arr = np.load(
                            io.BytesIO(data), allow_pickle=False
                        )
                        tensors.setdefault(key, {})[member] = (
                            arr.reshape(-1).tolist()
                        )
                    if set(tensors) != set(metas):
                        raise ValueError(
                            "tensor shard npy/sidecar key mismatch"
                        )
                    for key in sorted(tensors):
                        meta = metas[key]
                        rows.append(
                            (key,)
                            + tuple(
                                tensors[key].get(name)
                                for name in members
                            )
                            + (
                                meta.get("n_frames"),
                                meta.get("transcript"),
                            )
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in schema.fields]
            )

    return files.select("content").mapInPandas(unpack, schema=schema)


TAR_INDEX_TYPE = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("member", T.StringType(), False),
        T.StructField("offset_data", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)


def tar_member_index(spark: SparkSession, path_glob: str) -> DataFrame:
    """Random-access index over WebDataset shards: one row per tar
    member with its absolute data offset and size — the artifact a
    training loader uses to read any sample with a single ranged
    read (object-store GET with Range header) instead of streaming
    the whole shard. One binaryFile row per shard, one Arrow hop; a
    100 TB corpus indexes in one pass with no shuffle.

    Offsets come from the tar structure itself (``offset_data``), so
    the index is valid for ANY tar, not just this engine's packs —
    but this engine's packs are reproducible USTAR, which is what
    makes the index externally auditable (the contract oracle rebuilds
    every offset from member sizes alone: header 512 + data padded to
    512 per member)."""

    files = spark.read.format("binaryFile").load(path_glob)

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for path, raw in zip(b["path"], b["content"]):
                name = os.path.basename(str(path))
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(raw)), mode="r"
                ) as tar:
                    for m in tar.getmembers():
                        key, _, _ext = m.name.rpartition(".")
                        if m.name.endswith(".npy"):
                            key = key.rpartition(".")[0] or key
                        rows.append(
                            (name, key, m.name, m.offset_data, m.size)
                        )
            yield pd.DataFrame(
                rows, columns=[f.name for f in TAR_INDEX_TYPE.fields]
            )

    return files.select("path", "content").mapInPandas(
        walk, schema=TAR_INDEX_TYPE
    )
