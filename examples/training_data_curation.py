"""Example: curate a web corpus into training data.

    python examples/training_data_curation.py [sf_dir]

quality gate → exact dedup → near-dup removal (Jaccard) → token accounting,
then similarity search over the embedding table.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zerox_spark.operators.curation import curate
from zerox_spark.operators.dedup import dedup_minhash_pairs, with_injected_duplicates
from zerox_spark.operators.similarity import ann_topk_exact
from zerox_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("local[8]", app_name="zerox-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = with_injected_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    print("corpus size (with injected dups):", docs.count())

    kept = curate(docs)
    kept.cache()
    summary = kept.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    ).collect()[0]
    print("curated:", summary.asDict())

    pairs = dedup_minhash_pairs(docs)
    print("minhash near-dup pairs found:", pairs.count())

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    ann_topk_exact(emb, queries, k=3).show(9)
    spark.stop()


if __name__ == "__main__":
    main()
