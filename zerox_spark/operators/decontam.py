"""Benchmark decontamination — n-gram overlap between a training corpus and
an evaluation/benchmark set.

Every serious training-data pipeline runs this before training: any document
sharing a long word n-gram with a benchmark is flagged (and usually dropped)
so evaluation numbers aren't contaminated by memorized test items. The
standard formulation (used by the public FineWeb/Dolma/GPT-3 appendix
descriptions) is exact long-n-gram match — n around 8-13 words — because at
that length false positives are negligible.

Scale shape (100 TB): the benchmark side is SMALL (eval sets are 10^4-10^6
items) — its distinct n-gram table broadcasts; the corpus side explodes to
n-grams map-side and semi-joins against the broadcast WITHOUT shuffling the
crawl. The only wide operation is the per-doc hit aggregation, keyed by
doc_id — the same key the corpus is already bucketed on, so with a bucketed
input even that agg is shuffle-free. No all-pairs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_N = 8


def _gram_col(text_col: str, n: int):
    """Array of word n-grams (lowercased, single-space tokenization) as a
    JVM column expression — stays in whole-stage codegen, no UDF."""
    words = f"split(lower({text_col}), ' ')"
    return F.expr(
        f"CASE WHEN size({words}) >= {n} THEN "
        f"transform(sequence(1, size({words}) - {n} + 1), "
        f"i -> array_join(slice({words}, i, {n}), ' ')) "
        f"ELSE array() END"
    )


def benchmark_ngrams(benchmark: DataFrame, n: int = DEFAULT_N, text_col: str = "text") -> DataFrame:
    """Benchmark rows → distinct n-gram table (the broadcast side)."""
    return (
        benchmark.select(F.explode(_gram_col(text_col, n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = DEFAULT_N,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits, contaminated): per document, how many DISTINCT
    benchmark n-grams it contains, and the keep/drop flag. Documents with
    fewer than ``n`` words trivially pass (no grams)."""
    grams = benchmark_ngrams(benchmark, n, text_col)
    # order matters at scale: the broadcast match FILTERS FIRST, so the
    # only rows that ever shuffle (for the per-doc distinct count) are the
    # matches — rare by construction. A distinct() before the join would
    # shuffle every exploded n-gram of the whole crawl instead.
    doc_grams = docs.select(
        "doc_id", F.explode(_gram_col(text_col, n)).alias("gram")
    ).join(F.broadcast(grams), "gram")
    hits = doc_grams.groupBy("doc_id").agg(
        F.countDistinct("gram").alias("n_hits")
    )
    return (
        docs.select("doc_id")
        # the join-back is a plain key join — hits size is DATA-DEPENDENT
        # (a benchmark full of boilerplate 8-grams can match a large slice
        # of a crawl), so forcing a broadcast here would turn contamination
        # skew into a driver OOM; AQE picks broadcast itself when hits is
        # actually small, and the key is the corpus bucketing key anyway
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
            F.when(F.coalesce("n_hits", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )
