"""LLM-corpus quickstart: the training-data side of the engine.

Reads the harness's documents/embeddings parquet, then runs the full
curation story: profile → quality + language signals → exact +
near-dup dedup → benchmark decontamination → deterministic split →
tokenization → training shards with an audit manifest.

    python examples/curate_quickstart.py [sf_dir] [outdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_")
    from pyspark.sql import functions as F

    from data_ingest_spark.extensions.curate import curate_corpus
    from data_ingest_spark.extensions.dedup import near_dup_pairs
    from data_ingest_spark.extensions.profile import profile_table
    from data_ingest_spark.extensions.text import (text_quality,
                                                   tokenize_with_vocab)
    from data_ingest_spark.session import get_spark
    from data_ingest_spark.sinks.shards import shard_manifest, write_shards

    spark = get_spark("curate-quickstart", cpus=8)
    docs = spark.read.parquet(f"{sf}/documents.parquet")

    print("== profile ==")
    profile_table(docs, ["doc_id", "text", "lang", "source"]).show(
        truncate=False)

    nd = near_dup_pairs(docs, threshold=0.5).count()
    q = text_quality(docs).agg(
        F.round(F.avg("quality_score"), 4).alias("avg_quality")).head()
    print(f"near-dup pairs (J>=0.5): {nd}; avg quality: {q['avg_quality']}")

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    curated = curate_corpus(corpus, bench, min_tokens=30)
    by_split = {r["split"]: r["n"] for r in
                curated.groupBy("split").agg(F.count("*").alias("n"))
                .collect()}
    print(f"curated split sizes: {by_split}")

    kept_docs = docs.join(curated.select("doc_id"), "doc_id")
    ids = tokenize_with_vocab(kept_docs, vocab_size=500)
    train = (curated.filter(F.col("split") == "train").drop("n_tokens")
             .join(ids, "doc_id")
             .select("doc_id", "ids_csv", "n_tokens"))
    write_shards(train, os.path.join(out, "train"), n_shards=4)
    manifest = shard_manifest(train, "doc_id", 4)
    print(f"train shards written to {out}/train; manifest rows: "
          f"{manifest.count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
