"""Sources: scans and format-detection predicates (SURVEY.md §2.1).

The reference's source stage is downloadFile + mime/extension resolution +
magic-byte sniffing (node-zerox/src/utils/file.ts:32-98). Table-native
equivalents:

- ``read_pages``: the primary scan — parquet path or Iceberg table of the
  input_hint shape. Predicate pushdown / column pruning come free from
  Catalyst (filter on lang/warc_ts before any UDF and it reaches the scan).
- ``read_html_dir``: the raw-file analog of downloadFile — a directory of
  HTML/PDF files via Spark's binaryFile source, mapped into the pages
  schema (url = file path, warc_ts = modificationTime). For crawl dumps not
  yet in a table.
- magic-byte predicate columns: checkIsPdfFile / checkIsCFBFile
  (file.ts:95-98, 89-92) re-expressed as JVM-side column expressions usable
  in plan-level routing (``when``/filters), mirroring the reference's
  extension-based fast-path switch (isExcelFile, file.ts:363-371).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from zerox_spark.schema import PAGES_SCHEMA


def read_pages(spark: SparkSession, source: str, fmt: str = "parquet") -> DataFrame:
    """Scan the pages table. fmt: 'parquet' (path) | 'iceberg' (table name)."""
    if fmt == "iceberg":
        return spark.read.table(source)
    return spark.read.schema(PAGES_SCHEMA).parquet(source)


def read_html_dir(spark: SparkSession, path: str, lang: str = "") -> DataFrame:
    """Directory/glob of raw files → pages rows (binaryFile source).

    binaryFile gives (path, modificationTime, length, content); pruning
    still applies — filters on path/length are pushed to the file index.
    """
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit(lang).alias("lang"),
    )


# ---------------------------------------------------------------------------
# magic-byte / routing predicates (all pure column expressions)


def is_pdf_payload(col: Column) -> Column:
    """%PDF magic sniff (checkIsPdfFile, node-zerox/src/utils/file.ts:95-98)."""
    return F.substring(col, 1, 4) == F.lit(b"%PDF")


def is_cfb_payload(col: Column) -> Column:
    """Legacy-Office CFB magic D0 CF 11 E0 (checkIsCFBFile, file.ts:89-92)."""
    return F.hex(F.substring(col, 1, 4)) == F.lit("D0CF11E0")


def is_sheet_payload(col: Column) -> Column:
    """Structured-sheet payload magic (the Excel fast-path analog, S6)."""
    return F.substring(col, 1, 6) == F.lit(b"%SHEET")


def is_html_payload(col: Column) -> Column:
    """Loose HTML sniff: leading '<' after optional BOM/whitespace.

    Works in hex space — ``decode(…,'UTF-8')`` is strict under ANSI mode and
    would throw on arbitrary binary. The anchored alternation consumes whole
    byte pairs, so hex-pair alignment is preserved."""
    head = F.hex(F.substring(col, 1, 32))
    stripped = F.regexp_replace(head, r"^((20)|(09)|(0A)|(0D)|(EFBBBF))+", "")
    return stripped.startswith("3C")


def is_valid_url(col: Column) -> Column:
    """http(s) URL predicate (isValidUrl, node-zerox/src/utils/common.ts:39-47;
    py_zerox/pyzerox/processor/utils.py:36-46)."""
    return col.rlike("^https?://")
