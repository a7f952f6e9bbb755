"""Sequence packing — placing documents into fixed-length training rows.

The last mile of a pretraining data pipeline: tokenized documents are
concatenated and split into fixed ``seq_len`` training sequences
(GPT-style concat-then-chunk). The operator computes each document's
PLACEMENT — which shard, at what token offset, spanning which sequence
indices — as pure column algebra, so the actual byte-moving job (write
sequence shards) is a deterministic follow-up join/sort.

Scale design: packing needs an ORDER, and a global order at 10^12
documents means a global sort — the one thing a 100 TB plan must never
do. Instead documents are sharded by a deterministic key (doc_id modulo
``n_shards`` here; a url-hash in production — the same partitioning the
extract job already uses) and packed independently WITHIN each shard by
doc order. Cross-shard sequence ids never collide: the id is
(shard, seq_in_shard).

The per-shard running sum is TWO-LEVEL (round 6 — it used to be one
window per shard, which put a whole shard's rows on a single task and
made ``n_shards`` a cluster-sizing knob): doc_ids are cut into fixed
``_PACK_BLOCK``-wide blocks, a window per (shard, block) computes the
local prefix sums (every group is ≤ _PACK_BLOCK rows regardless of
corpus size, so parallelism grows with the data and no knob needs
sizing), a tiny (shard, block) → block-total aggregate yields the
carry each block inherits from its predecessors (a window over rows
that are 4-5 orders of magnitude fewer than the corpus), and a
broadcast join adds carry + local offset. Placement is bit-identical
to the single-window formulation — the token_counts/pack_placement
oracle hash proves it.

Boundary semantics: a document whose tokens straddle a sequence boundary
spans [seq_first, seq_last] — the standard training-time behavior
(attention masks or document-boundary resets are the consumer's choice);
``n_boundary_crossings = seq_last - seq_first`` quantifies the packing
fragmentation a different seq_len would change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from zerox_spark.operators.textstats import ws_tokens_col

# carry-block width in doc_id space: every level-1 window group holds at
# most this many rows however large the corpus is
_PACK_BLOCK = 1 << 16


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 32,
    tokens_col: str | None = None,
) -> DataFrame:
    """docs(doc_id, text | tokens_col) → per-document placement:

    (doc_id, shard, n_tokens, pack_offset, seq_first, seq_last)

    where ``pack_offset`` is the document's starting token offset within
    its shard's concatenation and sequence index k covers tokens
    [k*seq_len, (k+1)*seq_len). Token counts follow the corpus
    accountant's convention (ws_tokens_col: split on spaces, so an empty
    string counts as ONE token — consistent with the token_counts
    oracle); pass ``tokens_col`` with a pre-computed count for
    exact-zero empty-document semantics."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    tokens = (
        F.col(tokens_col) if tokens_col else ws_tokens_col()
    ).cast("long")
    shard = (F.col("doc_id") % n_shards).cast("int")
    base = docs.select(
        "doc_id",
        shard.alias("shard"),
        tokens.alias("n_tokens"),
        F.floor(F.col("doc_id") / _PACK_BLOCK).cast("long").alias("block"),
    )
    # level 1: local prefix sums within each bounded (shard, block) group
    w_local = (
        Window.partitionBy("shard", "block")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local_off = (F.sum("n_tokens").over(w_local) - F.col("n_tokens")).alias(
        "local_off"
    )
    # level 2: each block's carry = sum of earlier blocks' totals in the
    # same shard — computed over the tiny per-block aggregate, then
    # broadcast back (at 10^12 docs this table is ~10^7 rows of 20 B;
    # raise _PACK_BLOCK if ever that broadcast itself grows awkward)
    totals = base.groupBy("shard", "block").agg(
        F.sum("n_tokens").alias("block_tokens")
    )
    w_carry = (
        Window.partitionBy("shard")
        .orderBy("block")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = totals.select(
        "shard",
        "block",
        F.coalesce(F.sum("block_tokens").over(w_carry), F.lit(0)).alias(
            "carry"
        ),
    )
    out = (
        base.select("doc_id", "shard", "n_tokens", "block", local_off)
        .join(F.broadcast(carries), ["shard", "block"])
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            (F.col("carry") + F.col("local_off")).alias("pack_offset"),
        )
    )
    last_tok = F.col("pack_offset") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    return out.select(
        "doc_id",
        "shard",
        "n_tokens",
        "pack_offset",
        F.floor(F.col("pack_offset") / seq_len)
        .cast("long")
        .alias("seq_first"),
        F.floor(last_tok / seq_len).cast("long").alias("seq_last"),
    )


def packing_stats(placed: DataFrame, seq_len: int = 2048) -> DataFrame:
    """Shard-level packing accounting over pack_sequences output:
    (shard, n_docs, total_tokens, n_seqs, fill_ratio, boundary_crossings).
    fill_ratio is the fraction of the last-sequence-padded token budget
    actually used — the number a seq_len sweep optimizes."""
    return placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.ceil(F.sum("n_tokens") / seq_len).cast("long").alias("n_seqs"),
        F.round(
            F.sum("n_tokens")
            / (F.ceil(F.sum("n_tokens") / seq_len) * F.lit(seq_len)),
            6,
        ).alias("fill_ratio"),
        F.sum(F.col("seq_last") - F.col("seq_first"))
        .cast("long")
        .alias("boundary_crossings"),
    )
