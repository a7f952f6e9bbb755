"""Text analysis for training-data pipelines: language-ID, quality scoring,
token counting, document fingerprinting.

Everything except the winnowing fingerprint is pure JVM-side column algebra
(split/filter/aggregate/regexp) — whole-stage-codegen friendly, no Python in
the hot path; each has a DuckDB-oracle-expressible definition so the driver
can value-check it. The winnowing fingerprint needs a rolling window min —
implemented as a vectorized pandas UDF (Arrow-batched), checked by property
tests instead of SQL.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# language marker words → language, checked in this order (argmax with
# first-listed winning ties). A deterministic n-gram-ish heuristic stand-in:
# real corpora would use charset n-gram profiles; the synthetic corpus is
# English-ish word soup, so the value is the *operator shape* + oracle parity.
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "a", "and", "of")),
    ("de", ("der", "die", "und", "das")),
    ("fr", ("le", "la", "et", "les")),
    ("es", ("el", "los", "y", "que")),
]

STOPWORDS = ("the", "a", "and", "of", "to", "in")

# BPE-ish tokenization: letter runs, digit runs, single punctuation marks.
# Kept RE2-compatible (no backrefs/lookarounds) so Spark (Java regex) and
# DuckDB (RE2) agree.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

WINNOW_K = 5  # k-gram length (chars)
WINNOW_W = 4  # window size


def _words(col):
    return F.split(col, " ")


def _count_in(words_col, vocab: tuple[str, ...]):
    return F.size(F.filter(words_col, lambda w: w.isin(*vocab)))


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) by marker-word argmax; 'und' (undetermined) when
    no marker hits."""
    words = _words(F.col("text"))
    counts = {lang: _count_in(words, vocab) for lang, vocab in LANG_MARKERS}
    best = F.greatest(*[F.lit(0), *counts.values()])
    pred = F.lit("und")
    # build reversed so earlier-listed languages win ties
    for lang, _ in reversed(LANG_MARKERS):
        pred = F.when((counts[lang] > 0) & (counts[lang] == best), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", pred.alias("pred_lang"))


def quality_score(docs: DataFrame) -> DataFrame:
    """Deterministic quality features + composite score per document.

    Features mirror standard web-corpus filters (length, mean word length,
    stopword ratio, non-alnum ratio); score is a fixed linear blend rounded
    to 6dp for cross-engine float stability."""
    text = F.col("text")
    words = _words(text)
    n_chars = F.length(text)
    n_words = F.size(words)
    mean_wl = F.round((n_chars - (n_words - 1)) / n_words, 6)
    stop_ratio = F.round(_count_in(words, STOPWORDS) / n_words, 6)
    alnum = F.length(F.regexp_replace(text, r"[^A-Za-z0-9 ]", ""))
    punct_ratio = F.round((n_chars - alnum) / n_chars, 6)
    score = F.round(
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * 0.4
        + stop_ratio * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.2,
        6,
    )
    return docs.select(
        "doc_id",
        n_chars.cast("int").alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens): whitespace tokens and BPE-ish regex
    tokens — the two standard corpus-size accountants."""
    return docs.select(
        "doc_id",
        F.size(_words(F.col("text"))).cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_PATTERN), 0))
        .cast("int")
        .alias("bpe_tokens"),
    )


# PII redaction — regexes kept RE2-compatible (no lookaround/backrefs) so
# Spark (Java regex) and DuckDB (RE2) produce identical replacements.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def redact_pii(docs: DataFrame) -> DataFrame:
    """(doc_id, redacted, n_emails, n_ips): emails → [EMAIL], IPv4 → [IP],
    with per-doc match counts — the standard pretraining scrub pass, pure
    regexp_replace/regexp_extract_all (JVM-side)."""
    text = F.col("text")
    return docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_PATTERN, "[EMAIL]"),
            IPV4_PATTERN,
            "[IP]",
        ).alias("redacted"),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))
        .cast("int")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(IPV4_PATTERN), 0))
        .cast("int")
        .alias("n_ips"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, distinct_word_ratio, top_word_share): intra-document
    repetition signals — the filter that catches boilerplate loops and the
    pathological repeated-paragraph rows (FIXTURES.md e04)."""
    words = _words(F.col("text"))
    n = F.size(words)
    distinct_ratio = F.round(F.size(F.array_distinct(words)) / n, 6)
    # share of the most frequent word: sort grouped counts descending
    top_share = F.round(
        F.array_max(
            F.transform(
                F.array_distinct(words),
                lambda w: F.size(F.filter(words, lambda x: x == w)),
            )
        )
        / n,
        6,
    )
    return docs.select(
        "doc_id",
        distinct_ratio.alias("distinct_word_ratio"),
        top_share.alias("top_word_share"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling-hash document signature)


def _winnow_one(text: str) -> list[int]:
    """Classic winnowing (Schleimer et al. 2003, public algorithm): k-gram
    rolling hashes, per-window minimum (rightmost on ties), deduped in
    order. Pure function of the text."""
    if len(text) < WINNOW_K:
        return []
    base, mod = 257, (1 << 31) - 1
    h = 0
    power = pow(base, WINNOW_K - 1, mod)
    hashes: list[int] = []
    for i, ch in enumerate(text):
        if i >= WINNOW_K:
            h = (h - ord(text[i - WINNOW_K]) * power) % mod
        h = (h * base + ord(ch)) % mod
        if i >= WINNOW_K - 1:
            hashes.append(h)
    fingerprints: list[int] = []
    prev = -1
    for w in range(max(1, len(hashes) - WINNOW_W + 1)):
        window = hashes[w : w + WINNOW_W]
        m = min(window)
        pos = w + max(i for i, v in enumerate(window) if v == m)
        if pos != prev:
            fingerprints.append(m)
            prev = pos
    return fingerprints


@pandas_udf(T.ArrayType(T.LongType()))
def _winnow_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: _winnow_one(t or ""))


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp: array<long>, fp_hash) winnowing fingerprint + a single
    64-bit digest (xxhash64 of the joined fingerprint) for exact joins."""
    with_fp = docs.select("doc_id", _winnow_udf(F.col("text")).alias("fp"))
    return with_fp.select(
        "doc_id",
        "fp",
        F.xxhash64(F.array_join(F.transform("fp", lambda x: x.cast("string")), ",")).alias(
            "fp_hash"
        ),
    )
