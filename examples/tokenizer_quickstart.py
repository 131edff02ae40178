"""Training-prep quickstart: BPE train -> encode -> bucket -> shuffle.

Walks the tokenizer/training-data surface end to end on the sf0.001
documents fixture: learn a BPE merge table from the corpus, tokenize
with it (pure Catalyst folds, no UDF), audit padding waste with
length buckets, down-weight exact duplicates softly, and emit the
deterministic epoch-0 training order.

Run: python examples/tokenizer_quickstart.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_ingest_spark.extensions.bpe import bpe_encode, bpe_train  # noqa: E402
from data_ingest_spark.extensions.dedup import soft_dedup_weights  # noqa: E402
from data_ingest_spark.extensions.packing import length_buckets  # noqa: E402
from data_ingest_spark.extensions.sampling import epoch_shuffle  # noqa: E402
from data_ingest_spark.session import get_spark  # noqa: E402


def main() -> int:
    spark = get_spark("tokenizer-quickstart", cpus=8)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    merges_df = bpe_train(docs, n_merges=12)
    merges = [(r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()]
    print(f"learned {len(merges)} merges:",
          " ".join(l + "+" + r for l, r in merges[:8]), "...")

    enc = bpe_encode(docs, merges).cache()
    stats = enc.agg(F.sum("n_tokens").alias("tok"),
                    F.count("*").alias("docs")).collect()[0]
    print(f"encoded {stats['docs']} docs -> {stats['tok']} BPE tokens")

    buckets = length_buckets(enc.select("doc_id", "n_tokens"))
    for r in buckets.orderBy("bucket").collect():
        print(f"  bucket<= {r['pad_target']:>5}: {r['n_docs']:>4} docs, "
              f"waste {r['waste_frac']:.1%}")

    weights = soft_dedup_weights(docs)
    eff = weights.agg(F.round(F.sum("weight"), 2).alias("w")).collect()[0]["w"]
    print(f"soft-dedup effective corpus mass: {eff} docs")

    order = epoch_shuffle(docs, seed=0, num_shards=4)
    head = [r["doc_id"] for r in order.orderBy("pos").limit(5).collect()]
    print("epoch-0 order starts:", head)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
