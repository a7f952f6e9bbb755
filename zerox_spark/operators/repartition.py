"""Salted url-hash repartitioning — explicit skew handling (north_rule).

Why explicit: this is a map-heavy job, and AQE's skew mitigation
(spark.sql.adaptive.skewJoin) only rebalances *shuffle reads for joins*; it
cannot split the work of a single pathological row (a 200x-median document,
FIXTURES.md e04), nor does it fire at all on a shuffle-less scan→UDF plan.
So the job plans its own layout:

- partition key: ``xxhash64(url)`` — co-locates all rows of a url (required
  for the maintainFormat fold and idempotent per-url overwrite) while
  spreading urls uniformly;
- salt: rows whose payload exceeds ``skew_threshold`` bytes get a per-row
  salt derived from ``xxhash64(url, warc_ts)``, spreading heavy *documents of
  the same site/url-prefix* across ``salt_buckets`` partitions instead of
  piling onto one. The salt is deterministic (no rand()) so replays land in
  the same partition — resume-safe.

At 100 TB: partition count should target ~128-256 MB of html per task
(set ``num_partitions`` ≈ input_bytes / 200MB via job.py); the shuffle this
repartition introduces is the job's only full shuffle and is what buys even
task runtimes on skewed crawl data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_SKEW_THRESHOLD = 1 << 20  # 1 MiB payload → "heavy" row
DEFAULT_SALT_BUCKETS = 16


def salted_repartition(
    pages: DataFrame,
    num_partitions: int,
    skew_threshold: int = DEFAULT_SKEW_THRESHOLD,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Repartition by (url-hash, conditional salt)."""
    salt = F.when(
        F.length(F.col("html")) > F.lit(skew_threshold),
        F.pmod(F.xxhash64("url", "warc_ts"), F.lit(salt_buckets)),
    ).otherwise(F.lit(0))
    return pages.repartition(
        num_partitions, F.xxhash64("url"), salt.alias("_salt")
    )


def partition_bucket(num_buckets: int):
    """Stable url → bucket id column; the unit of resume/overwrite
    granularity (operators/resume.py, sinks.py)."""
    return F.pmod(F.xxhash64(F.col("url")), F.lit(num_buckets)).cast("int")
