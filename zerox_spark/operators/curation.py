"""Corpus curation — the end-to-end training-data pipeline composed from
the engine's operators:

    documents → quality gate → exact dedup (keep min doc_id)
              → near-dup removal (MinHash+LSH candidates, exact-Jaccard
                verified; keep min of each pair)
              → token accounting

One pass of each family (filter, hash-dedup, similarity-join dedup,
accounting) in a single lazy plan: the quality gate prunes before the
expensive near-dup stage; dedup survivors are computed with anti-joins so
the corpus side streams. This is the query a 100 TB pretraining-data run
actually executes; every stage is the oracle-checked operator from its own
module.

Near-dup stage choice: ``dedup_minhash_pairs`` (banded LSH bucket join →
candidates-only exact verification), NOT the raw bigram-shingle self-join —
common shingles ("of the") give the raw join posting lists that explode
quadratically at 100 TB, while the LSH path's cost stays ∝ candidates. The
two operators have the same verified-pair output contract (both hash-match
the same Jaccard SQL oracle), so swapping them changes the plan, not the
result; ``dedup_ngram_pairs`` remains the test-scale ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from zerox_spark.operators.dedup import dedup_minhash_pairs
from zerox_spark.operators.textstats import quality_score, token_counts

QUALITY_MIN = 0.5
JACCARD_MAX = 0.5


def curate(
    docs: DataFrame,
    quality_min: float = QUALITY_MIN,
    jaccard_max: float = JACCARD_MAX,
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens, quality) for documents that survive
    the quality gate, exact dedup, and near-dup removal."""
    quality = quality_score(docs).filter(F.col("quality") >= quality_min)
    gated = docs.join(quality.select("doc_id", "quality"), "doc_id", "inner")

    # exact dedup: survivors = min doc_id per text
    survivors = (
        gated.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    )
    gated = gated.join(survivors.select("doc_id"), "doc_id", "left_semi")

    # near-dup removal: for each pair at jaccard ≥ threshold, the larger
    # doc_id is removed (anti-join against the loser set); pairs come from
    # the sub-quadratic LSH path (see module docstring)
    pairs = dedup_minhash_pairs(gated.select("doc_id", "text"), jaccard_max)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = gated.join(losers, "doc_id", "left_anti")

    toks = token_counts(kept.select("doc_id", "text"))
    return (
        kept.select("doc_id", "quality")
        .join(toks, "doc_id")
        .select("doc_id", "ws_tokens", "bpe_tokens", "quality")
    )
