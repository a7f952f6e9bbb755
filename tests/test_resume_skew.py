"""Tests: partial-failure resume (FIXTURES.md §5 e04/e08 scale machinery)
and salted-skew partition distribution."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from tests.conftest import SF_SMOKE

from zerox_spark.pipeline import ExtractionPipeline, PipelineConfig
from zerox_spark.schema import PAGES_SCHEMA
from zerox_spark.sinks import ParquetSnapshotSink
from zerox_spark.synth import synth_pages


def test_partial_failure_resume(spark, tmp_path):
    """Simulate a job that died after committing some buckets: the restart
    must reprocess ONLY the missing buckets and converge to the full table."""
    out = str(tmp_path / "sink")
    pages = synth_pages(spark, SF_SMOKE)
    pipe = ExtractionPipeline(PipelineConfig(num_partitions=8, num_buckets=16))
    sink = ParquetSnapshotSink(out)

    # attempt 1: only a subset of buckets (simulated crash mid-job)
    from zerox_spark.operators.repartition import partition_bucket

    subset = pages.filter(partition_bucket(16) < 6)
    stats1 = pipe.run(spark, subset, sink, job_id="crashy")
    lineage1 = sink.read_lineage(spark)
    committed1 = {r.partition_id for r in lineage1.collect()}
    assert committed1 and committed1 <= set(range(6))

    # attempt 2: same job_id over the FULL input → only uncommitted buckets
    # should be re-extracted
    from zerox_spark.operators.resume import committed_buckets, filter_uncommitted

    todo = filter_uncommitted(
        pages, committed_buckets(lineage1, "crashy"), 16
    )
    todo_buckets = {
        r.b for r in todo.select(partition_bucket(16).alias("b")).distinct().collect()
    }
    assert todo_buckets.isdisjoint(committed1)

    stats2 = pipe.run(spark, pages, sink, job_id="crashy")
    # final table complete: every url of the input is present exactly once
    got = spark.read.parquet(f"{out}/extracted")
    assert got.select("url").distinct().count() == pages.count()
    assert stats2["total_docs"] == pages.count()
    # dynamic partition overwrite kept attempt-1 buckets intact (no dupes)
    dupes = (
        got.groupBy("url", "page_no").count().filter(F.col("count") > 1).count()
    )
    assert dupes == 0


def test_salted_repartition_spreads_heavy_rows(spark):
    """Heavy rows of one url-neighborhood must not pile onto one partition:
    with the salt, rows above the threshold from the same url spread across
    partitions; light rows of one url stay co-located."""
    from zerox_spark.operators.repartition import salted_repartition

    heavy = [
        Row(url="https://hot/site", warc_ts=__import__("datetime").datetime(2024, 1, 1, 0, 0, i),
            html=b"x" * 2000, text=None, lang="en")
        for i in range(32)
    ]
    df = spark.createDataFrame(heavy, PAGES_SCHEMA)
    rep = salted_repartition(df, 8, skew_threshold=1000, salt_buckets=8)
    parts = {
        r.p
        for r in rep.select(F.spark_partition_id().alias("p")).collect()
    }
    assert len(parts) > 1, "salt failed to spread heavy same-url rows"

    light = spark.createDataFrame(
        [Row(url="https://cold/site", warc_ts=None, html=b"tiny", text=None, lang="en")
         for _ in range(16)],
        PAGES_SCHEMA,
    )
    rep2 = salted_repartition(light, 8, skew_threshold=1000)
    parts2 = {
        r.p for r in rep2.select(F.spark_partition_id().alias("p")).collect()
    }
    assert len(parts2) == 1, "light same-url rows must stay co-located"
