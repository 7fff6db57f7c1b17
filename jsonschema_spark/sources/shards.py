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
