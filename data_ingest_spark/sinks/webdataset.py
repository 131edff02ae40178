"""WebDataset-style tar shards for multimodal training corpora.

The de-facto loading format for large multimodal training jobs is a
directory of tar files ("shards"), each holding one file per sample
(``{id}.{ext}`` payload + ``{id}.json`` metadata), streamed
sequentially by data loaders. This module writes and reads that layout
from Spark:

- ``write_webdataset`` — content-addressed shard assignment (seeded
  md5 of the id, like sinks/shards.py), one repartition so each shard
  is built by exactly one task, entries sorted by id and written with
  ``mtime=0`` so shard bytes are deterministic for a given input.
- ``read_webdataset`` — distributed tar parsing: the shard *list*
  parallelizes (one task per shard), each task streams its tar
  sequentially — exactly the access pattern tar was chosen for.

Scale: shard count is the parallelism knob (1000 executors want ≥1000
shards); payloads never route through the driver. Paths are written
with the local filesystem API — on a cluster, point ``path`` at a
shared mount or write locally and upload via the UploadSink contract
(sinks/exports.py).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

from data_ingest_spark.extensions.sampling import hash_bucket

READ_SCHEMA = StructType([
    StructField("shard", StringType()),
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("meta_json", StringType()),
])


def write_webdataset(df: DataFrame, path: str, n_shards: int = 4,
                     id_col: str = "doc_id", payload_col: str = "payload",
                     meta_cols: list[str] | None = None,
                     ext: str = "bin", seed: int = 7) -> None:
    """Write ``df`` as ``shard-{k:05d}.tar`` files under ``path``."""
    meta_cols = meta_cols or []
    os.makedirs(path, exist_ok=True)
    shard = (hash_bucket(F.col(id_col), seed) % n_shards).alias("_shard")
    data = (df.select(shard, F.col(id_col), F.col(payload_col),
                      *[F.col(c) for c in meta_cols])
            .repartition(n_shards, "_shard")
            .sortWithinPartitions("_shard", id_col))

    def write_part(rows) -> None:
        open_tars: dict[int, tarfile.TarFile] = {}
        for row in rows:
            k = row["_shard"]
            tar = open_tars.get(k)
            if tar is None:
                tar = tarfile.open(
                    os.path.join(path, f"shard-{k:05d}.tar"), "w")
                open_tars[k] = tar
            payload = bytes(row[payload_col])
            info = tarfile.TarInfo(f"{row[id_col]}.{ext}")
            info.size, info.mtime = len(payload), 0
            tar.addfile(info, io.BytesIO(payload))
            meta = json.dumps({c: row[c] for c in meta_cols},
                              sort_keys=True).encode()
            minfo = tarfile.TarInfo(f"{row[id_col]}.json")
            minfo.size, minfo.mtime = len(meta), 0
            tar.addfile(minfo, io.BytesIO(meta))
        for tar in open_tars.values():
            tar.close()

    data.foreachPartition(write_part)


def read_webdataset(spark: SparkSession, path: str,
                    ext: str = "bin") -> DataFrame:
    """Read a shard directory back to
    ``(shard, doc_id, payload, meta_json)`` — one task per shard."""
    shards = sorted(f for f in os.listdir(path) if f.endswith(".tar"))
    files = spark.createDataFrame([(os.path.join(path, s),) for s in shards],
                                  "file string").repartition(len(shards) or 1)

    def parse(batches):
        import pandas as pd
        for pdf in batches:
            out = {c: [] for c in
                   ("shard", "doc_id", "payload", "meta_json")}
            for fpath in pdf["file"]:
                with tarfile.open(fpath, "r") as tar:
                    samples: dict[str, dict] = {}
                    for member in tar.getmembers():
                        stem, kind = member.name.rsplit(".", 1)
                        buf = tar.extractfile(member).read()
                        samples.setdefault(stem, {})[kind] = buf
                    for stem, parts in sorted(samples.items()):
                        out["shard"].append(os.path.basename(fpath))
                        out["doc_id"].append(int(stem))
                        out["payload"].append(parts.get(ext, b""))
                        out["meta_json"].append(
                            parts.get("json", b"{}").decode())
            yield pd.DataFrame(out)

    return files.mapInPandas(parse, READ_SCHEMA)
