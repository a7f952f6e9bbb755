"""Resume-from-checkpoint: reprocess only what a failed run didn't commit.

SURVEY.md §4.2: the reference contains error pages *within* a run
(ErrorMode.IGNORE); across runs its unit of retry is the whole document. At
10^12 documents the unit must be the partition: a restarted job

1. reads the lineage table committed by prior attempts of the same job_id,
2. keeps buckets whose status is SUCCESS (PARTIAL buckets re-run so their
   ERROR rows get another attempt — cheap, they are rare),
3. anti-joins the input on its stable url-bucket against that committed set,
4. reprocesses only the remainder; the sink's dynamic-partition overwrite
   (sinks.py) makes re-emission of a bucket idempotent (latest warc_ts wins
   per url inside the extract, so e08 duplicate-url rows are stable too).

The committed-bucket set is tiny (one row per bucket) → broadcast anti-join,
no shuffle of the 100 TB side. ``bucket_of`` must match the bucket used at
write time (operators/repartition.py partition_bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import broadcast

from zerox_spark.operators.repartition import partition_bucket


def committed_buckets(lineage: DataFrame, job_id: str) -> DataFrame:
    """Distinct bucket ids fully committed by earlier attempts (1 col df)."""
    return (
        lineage.filter(
            (F.col("job_id") == job_id) & (F.col("status") == "SUCCESS")
        )
        .select(F.col("partition_id").alias("bucket"))
        .distinct()
    )


def filter_uncommitted(
    pages: DataFrame, committed: DataFrame, num_buckets: int
) -> DataFrame:
    """Input minus already-committed buckets (broadcast LEFT ANTI join)."""
    with_bucket = pages.withColumn("_bucket", partition_bucket(num_buckets))
    remaining = with_bucket.join(
        broadcast(committed),
        with_bucket["_bucket"] == committed["bucket"],
        "left_anti",
    )
    return remaining.drop("_bucket")
