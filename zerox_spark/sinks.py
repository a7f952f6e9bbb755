"""Sinks: committed, idempotent, resume-friendly output tables.

Production target is Iceberg (north_rule): ``IcebergSink`` below emits the
exact DataFrameWriterV2 calls (``writeTo(...).overwritePartitions()``) and
relies on Iceberg's snapshot isolation for commit atomicity + time travel.
The sandbox ships no Iceberg runtime jars, so ``ParquetSnapshotSink``
implements the same contract on plain parquet:

- extracted table partitioned by the logical url bucket (``partition_id``),
  written with **dynamic partition overwrite** — re-emitting a bucket on
  resume replaces exactly that bucket's files, nothing else (idempotence);
- lineage table is append-only; the latest SUCCESS row per (job_id, bucket)
  is authoritative (operators/resume.py filters on it);
- a tiny JSON snapshot manifest is written after each successful commit —
  the parquet-mode stand-in for Iceberg's snapshot log.

Mirrors the reference's sink layer (markdown file + ZeroxOutput,
node-zerox/src/index.ts:564-607) lifted to table semantics (SURVEY.md §2.8).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, TypeVar

from pyspark.sql import DataFrame
from pyspark.sql import types as T, SparkSession, functions as F

from zerox_spark.schema import LINEAGE_SCHEMA

_R = TypeVar("_R")


def run_retries(fn: Callable[[], _R], max_retries: int = 1) -> _R:
    """runRetries analog (node-zerox/src/utils/common.ts:62-80): retry up to
    max_retries times, rethrow at the limit. The deterministic compute needs
    no retries — this guards I/O commits only (SURVEY.md §2.4 O6); task-level
    compute retries stay with spark.task.maxFailures."""
    attempt = 0
    while True:
        try:
            return fn()
        except Exception:
            if attempt >= max_retries:
                raise
            attempt += 1


class ParquetSnapshotSink:
    def __init__(self, root: str) -> None:
        self.root = root
        self.extracted_path = os.path.join(root, "extracted")
        self.lineage_path = os.path.join(root, "lineage")
        self.snap_dir = os.path.join(root, "_snapshots")

    def write_extracted(
        self, extracted: DataFrame, snap_id: int = 0, append: bool = False
    ) -> None:
        """Full/resume runs overwrite whole buckets (dynamic partition
        overwrite — idempotent because those runs re-emit complete buckets).
        Incremental (delta) runs APPEND with a snapshot-id version column:
        a delta touches only part of a bucket, so overwrite would destroy
        sibling rows — re-crawled urls instead coexist as versions and
        ``read_extracted_latest`` resolves to the newest (the parquet-mode
        analog of Iceberg MERGE INTO upserts)."""
        versioned = extracted.withColumn("_snap", F.lit(int(snap_id)))
        if append:
            versioned.write.mode("append").partitionBy("partition_id").parquet(
                self.extracted_path
            )
            return
        # per-WRITE option, not a session conf set: mutating the shared
        # session's partitionOverwriteMode would silently leak dynamic
        # semantics into every later overwrite in the same session
        (
            versioned.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("partition_id")
            .parquet(self.extracted_path)
        )

    def write_lineage(self, lineage: DataFrame) -> None:
        run_retries(
            lambda: lineage.write.mode("append").parquet(self.lineage_path)
        )

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        # EXPLICIT schema: a sink dir written by an older engine version
        # may lack newer columns (e.g. max_warc_ts) — single-footer
        # inference could sample an old file and fail the watermark
        # aggregation AFTER the expensive extraction ran, and mergeSchema
        # would pay a footer-merge over every part file on every read.
        # The known schema null-fills old files for free.
        try:
            return spark.read.schema(LINEAGE_SCHEMA).parquet(
                self.lineage_path
            )
        except Exception:  # first run: no lineage yet
            return spark.createDataFrame([], LINEAGE_SCHEMA)

    def read_extracted(self, spark: SparkSession) -> DataFrame:
        """All row versions (plus the _snap version column). Explicit
        schema for the same old-sink-dir reason as read_lineage."""
        from zerox_spark.operators.extract import RAW_EXTRACTED_SCHEMA

        on_disk = T.StructType(
            RAW_EXTRACTED_SCHEMA.fields + [T.StructField("_snap", T.IntegerType(), True)]
        )
        return spark.read.schema(on_disk).parquet(self.extracted_path)

    def read_extracted_latest(self, spark: SparkSession) -> DataFrame:
        """Latest version per (url, page_no) — the logical table a consumer
        reads after incremental upserts."""
        from pyspark.sql import Window

        df = self.read_extracted(spark)
        # warc_ts tie-break after _snap: one snapshot can legitimately
        # carry two versions of a url (the >= watermark boundary re-emits
        # rows, and dedupe_latest_warc_ts=False keeps input duplicates) —
        # the newest crawl must win inside a snapshot too
        w = Window.partitionBy("url", "page_no").orderBy(
            F.col("_snap").desc(), F.col("warc_ts").desc_nulls_last()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _max_snap_id(self) -> int:
        """Highest committed snapshot id, -1 if none. max()+1 — NOT a
        file count: deleting/compacting an old snapshot file must never
        make a new id collide with rows already on disk."""
        if not os.path.isdir(self.snap_dir):
            return -1
        best = -1
        for name in os.listdir(self.snap_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[5:-5]))
                except ValueError:
                    continue
        return best

    def next_snapshot_id(self) -> int:
        return self._max_snap_id() + 1

    def commit_snapshot(self, job_id: str, meta: dict) -> str:
        os.makedirs(self.snap_dir, exist_ok=True)
        snap_id = self._max_snap_id() + 1
        path = os.path.join(self.snap_dir, f"snap-{snap_id:06d}.json")
        payload = {"snapshot": snap_id, "job_id": job_id,
                   "ts": int(time.time() * 1000), **meta}
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(payload, fh, sort_keys=True)
        return path

    def last_watermark(self) -> str | None:
        """High watermark (max warc_ts, isoformat) committed by the latest
        snapshot that recorded one — the incremental-scan cursor (the
        parquet-mode analog of reading Iceberg's snapshot summary)."""
        if not os.path.isdir(self.snap_dir):
            return None
        for name in sorted(os.listdir(self.snap_dir), reverse=True):
            with open(os.path.join(self.snap_dir, name), encoding="utf-8") as fh:
                meta = json.load(fh)
            if meta.get("watermark"):
                return meta["watermark"]
        return None


def export_markdown_files(extracted: DataFrame, out_dir: str) -> int:
    """The reference's primary sink: one ``{outputDir}/{fileName}.md`` per
    document, pages joined "\\n\\n" in page order (node-zerox/src/index.ts:
    564-568; py_zerox/pyzerox/core/zerox.py:97-99,168-172), file name via
    the PY sanitization rule. Runs distributed (foreachPartition writes from
    executors — ``out_dir`` must be a shared filesystem on a cluster).
    Returns the document count. Collision note: faithful to the reference,
    the name is the sanitized stem only — two urls sanitizing equal
    overwrite each other, exactly as two equal input file names would."""
    from zerox_spark.extract.fences import sanitize_filename

    from zerox_spark.operators.extract import pages_join_expr

    os.makedirs(out_dir, exist_ok=True)
    docs = extracted.groupBy("url").agg(
        pages_join_expr("\n\n").alias("doc_markdown")
    )
    # count from the DataFrame, not len(listdir): a pre-existing out_dir
    # (or a non-shared fs where the driver can't see executor writes)
    # would make the directory listing lie about how many docs exported
    docs = docs.persist()
    n_docs = docs.count()

    def write_part(rows) -> None:
        for row in rows:
            name = sanitize_filename(row.url) or "doc"
            path = os.path.join(out_dir, f"{name}.md")
            with open(path, "w", encoding="utf-8") as fh:
                fh.write(row.doc_markdown)

    docs.foreachPartition(write_part)
    docs.unpersist()
    return n_docs


class IcebergSink:
    """Iceberg table sink (requires an Iceberg catalog on the session —
    spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-...).

    Not exercisable in this sandbox (no jars); the call shapes are the
    production path and are covered by the ParquetSnapshotSink contract
    tests."""

    def __init__(self, extracted_table: str, lineage_table: str) -> None:
        self.extracted_table = extracted_table
        self.lineage_table = lineage_table

    def write_extracted(
        self, extracted: DataFrame, snap_id: int = 0, append: bool = False
    ) -> None:
        if append:
            # delta upsert: production path is MERGE INTO on (url, page_no);
            # append+read-latest is the portable equivalent
            extracted.withColumn(
                "_snap", F.lit(int(snap_id))
            ).writeTo(self.extracted_table).append()
            return
        # per-bucket idempotent replace; Iceberg commits a new snapshot
        extracted.withColumn("_snap", F.lit(int(snap_id))).writeTo(
            self.extracted_table
        ).overwritePartitions()

    def write_lineage(self, lineage: DataFrame) -> None:
        lineage.writeTo(self.lineage_table).append()

    def read_lineage(self, spark: SparkSession) -> DataFrame:
        return spark.read.table(self.lineage_table)

    def read_extracted(self, spark: SparkSession) -> DataFrame:
        return spark.read.table(self.extracted_table)

    def read_extracted_latest(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import Window

        df = self.read_extracted(spark)
        # warc_ts tie-break after _snap: one snapshot can legitimately
        # carry two versions of a url (the >= watermark boundary re-emits
        # rows, and dedupe_latest_warc_ts=False keeps input duplicates) —
        # the newest crawl must win inside a snapshot too
        w = Window.partitionBy("url", "page_no").orderBy(
            F.col("_snap").desc(), F.col("warc_ts").desc_nulls_last()
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def next_snapshot_id(self) -> int:
        return 0  # Iceberg's snapshot log owns ids; _snap is per-commit

    def commit_snapshot(self, job_id: str, meta: dict) -> str:
        # Iceberg's own snapshot log is the commit record
        return f"{self.extracted_table}@latest"


def write_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int,
    path: str,
    bucket_col: str = "url",
) -> None:
    """Bucketed + sorted parquet table — the co-located-join layout.

    Two tables bucketed identically on the join key sort-merge-join with
    ZERO exchange on either side (plan-tested): at 100 TB this is how the
    extracted table joins its consumers (dedup verdicts, structured
    values, lineage backfills) without re-shuffling the crawl-scale side
    every downstream job. Spark-native bucketing (no Hive needed);
    `sortBy` makes the SMJ sort a no-op read order.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
