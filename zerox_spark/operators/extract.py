"""The hot-loop operator: pages → per-page markdown rows via mapInPandas.

Design notes (scale-first):

- ONE ``mapInPandas`` over the (repartitioned) scan. The trusted-text fast
  path and the %PDF layout branch are routed **inside** the vectorized UDF
  rather than as a DataFrame filter+union: a plan-level branch would scan the
  input twice (or force a cache) and union two UDF stages — strictly worse at
  100 TB than one pass with a per-row branch that costs nanoseconds. The
  reference's routing (node-zerox/src/index.ts:161-213) is likewise a
  per-document switch, not a second pass.
- Arrow batch size is capped (session.py) so a batch of heavy rows cannot
  blow executor memory; within a batch, work is per-document Python over
  numpy/str — no JVM round-trips.
- Error containment is row-level (ErrorMode.IGNORE,
  node-zerox/src/index.ts:338-352): one ERROR row per failed doc, the task
  never dies.
- Each output row carries ``partition_id`` — the **logical url bucket**
  (operators/repartition.py partition_bucket), the shared id space of the
  lineage table, the resume anti-join and the sink's overwrite granularity —
  plus a first-row-of-batch ``elapsed_ms`` so lineage (operators/lineage.py)
  can aggregate per-bucket metrics without a second timing pass. (Physical
  task ids are useless across runs; stable url buckets survive restarts.)
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from zerox_spark.extract.core import ExtractConfig, extract_document
from zerox_spark.schema import EXTRACTED_SCHEMA

# extract output = the canonical per-page schema (schema.py, derived — not
# re-declared, so the two can't drift) + lineage carrier columns
RAW_EXTRACTED_SCHEMA = T.StructType(
    list(EXTRACTED_SCHEMA.fields)
    + [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("elapsed_ms", T.LongType(), False),
        # crawl-provenance carrier: lets lineage compute the incremental
        # watermark (max warc_ts per bucket) from the WRITTEN files, so
        # pipeline.run never re-scans the 100 TB input for it
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

_COLS = [f.name for f in RAW_EXTRACTED_SCHEMA.fields]


def _extract_iter(
    batches: Iterator[pd.DataFrame], config: ExtractConfig
) -> Iterator[pd.DataFrame]:
    from zerox_spark.operators.fold import refold_page_results

    for pdf in batches:
        t0 = time.monotonic()
        # columnar accumulation: pd.DataFrame(dict-of-lists) skips the
        # row-tuple transpose pandas does for a list-of-tuples input
        c_url: list = []
        c_no: list = []
        c_md: list = []
        c_len: list = []
        c_status: list = []
        c_error: list = []
        c_spans: list = []
        c_pid: list = []
        c_ts: list = []
        for url, html, text, pid, ts in zip(
            pdf["url"], pdf["html"], pdf["text"], pdf["_bucket"],
            pdf["warc_ts"],
        ):
            payload = bytes(html) if html is not None else None
            pages = extract_document(payload, text, config)
            if config.maintain_format and len(pages) > 1:
                # zero-shuffle inline fold: all pages of this document are
                # right here in this task (see operators/fold.py rationale)
                pages = refold_page_results(pages)
            pid = int(pid)
            for page in pages:
                c_url.append(url)
                c_no.append(page.page_no)
                c_md.append(page.markdown)
                c_len.append(page.content_length)
                c_status.append(page.status)
                c_error.append(page.error)
                c_spans.append(
                    [
                        {"kind": k, "start": s, "end": e, "score": sc}
                        for k, s, e, sc in page.spans
                    ]
                )
                c_pid.append(pid)
                c_ts.append(ts)
        n_rows = len(c_url)
        elapsed_us = int((time.monotonic() - t0) * 1_000_000)
        # amortize the batch's wall time across its rows (µs resolution,
        # remainder on row 0) so lineage sums are correct under ANY
        # grouping of rows into logical buckets (lineage.py)
        c_elapsed = [0] * n_rows
        if n_rows:
            per_row = elapsed_us // n_rows // 1000
            c_elapsed = [per_row] * n_rows
            c_elapsed[0] = elapsed_us // 1000 - per_row * (n_rows - 1)
        yield pd.DataFrame(
            {
                "url": c_url,
                "page_no": c_no,
                "markdown": c_md,
                "content_length": c_len,
                "status": c_status,
                "error": c_error,
                "spans": c_spans,
                "partition_id": c_pid,
                "elapsed_ms": c_elapsed,
                "warc_ts": c_ts,
            },
            columns=_COLS,
        )


def extract_pages(
    pages: DataFrame,
    config: ExtractConfig | None = None,
    num_buckets: int = 64,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → raw extracted rows.

    ``num_buckets`` sizes the logical url-bucket space (lineage/resume/
    overwrite granularity) — on a real cluster set it ≥ executor count so a
    resume can skip work at sub-executor granularity.

    Catalyst prunes unreferenced input columns (``lang`` never reaches
    Python unless a prior operator used it) — check with ``.explain``: the
    parquet ReadSchema excludes it. ``warc_ts`` IS carried through as the
    provenance/watermark carrier column (see RAW_EXTRACTED_SCHEMA).
    """
    from zerox_spark.operators.repartition import partition_bucket

    config = config or ExtractConfig()
    needed = pages.select(
        "url",
        "html",
        "text",
        "warc_ts",
        partition_bucket(num_buckets).alias("_bucket"),
    )
    return needed.mapInPandas(
        lambda it: _extract_iter(it, config), schema=RAW_EXTRACTED_SCHEMA
    )


def extract_synthetic(
    docs: DataFrame,
    row_fn,
    config: ExtractConfig | None = None,
    num_buckets: int = 64,
    num_partitions: int | None = None,
) -> DataFrame:
    """FUSED corpus-synthesis + extraction for the sandbox query paths:
    documents(doc_id, text, lang, source) → raw extracted rows in ONE
    mapInPandas, instead of the chained synth_pages → extract_pages pair.

    The chained shape moves every synthesized payload across the
    JVM↔Python Arrow boundary three times (out of the synth worker, into
    the extract worker, results out again); fusing makes it once — guide
    §4.1's "you control how many columns cross" applied to how many TIMES
    they cross. Measured at sf0.1/local[32]: pdf_crypt 2.48 s → 1.31 s.

    Byte-identical to the chained shape by construction: the page rows are
    built by the same ``row_fn``/``doc_url``/``doc_ts`` calls synth uses,
    and the frames feed the same ``_extract_iter`` loop ``extract_pages``
    runs — only the intermediate Arrow round-trip is gone. url and the
    lineage bucket are computed JVM-side (the same xxhash64 expression as
    ``partition_bucket``) so bucket ids match the unfused path exactly.

    Production jobs (pipeline.py, job.py) read REAL pages tables and keep
    using extract_pages — this operator exists for inputs that are
    themselves synthesized document-by-document."""
    from zerox_spark.operators.repartition import partition_bucket

    config = config or ExtractConfig()
    spark = docs.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://site"), (d % 97).cast("string"), F.lit(".example/"),
        F.col("source"), F.lit("/"), d.cast("string"),
    )
    prepared = (
        docs.select("doc_id", "text", "lang", "source")
        .repartition(num_partitions, "doc_id")
        .select(
            "doc_id", "text", "lang", "source",
            url.alias("url"),
            partition_bucket(num_buckets).alias("_bucket"),
        )
    )

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zerox_spark.synth import doc_ts

        def pages_frames() -> Iterator[pd.DataFrame]:
            for pdf in batches:
                c_url: list = []
                c_ts: list = []
                c_html: list = []
                c_text: list = []
                c_bucket: list = []
                for doc_id, text, lang, source, u, bkt in zip(
                    pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"],
                    pdf["url"], pdf["_bucket"],
                ):
                    doc_id = int(doc_id)
                    payload, trusted = row_fn(doc_id, text, lang, source)
                    c_url.append(u)
                    c_ts.append(doc_ts(doc_id).replace(tzinfo=None))
                    c_html.append(payload)
                    c_text.append(trusted)
                    c_bucket.append(bkt)
                yield pd.DataFrame(
                    {
                        "url": c_url,
                        "warc_ts": c_ts,
                        "html": c_html,
                        "text": c_text,
                        "_bucket": c_bucket,
                    }
                )

        yield from _extract_iter(pages_frames(), config)

    return prepared.mapInPandas(fused, schema=RAW_EXTRACTED_SCHEMA)


def pages_join_expr(delim: str):
    """THE doc-assembly aggregate: markdown pages joined in page order
    (array_sort on (page_no, markdown) structs → deterministic regardless
    of partitioning). Shared by the doc-agg query, keyword matching and
    structured extraction so the ordering/null contract lives once."""
    per_page = F.struct("page_no", "markdown")
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(per_page)), lambda s: s.markdown
        ),
        delim,
    )
