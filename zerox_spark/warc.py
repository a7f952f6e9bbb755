"""WARC ingestion — Common Crawl's native archive format (ISO 28500).

The input_hint models an Iceberg table of Common-Crawl-style pages; this
module closes the loop from the RAW crawl: ``read_warc`` turns a directory
of ``*.warc(.gz)`` files into the exact pages schema the whole engine
consumes (url, warc_ts, html, text, lang), so the pipeline runs end-to-end
from archive bytes without a separate ETL. (The reference's downloadFile
fetches one document per call, node-zerox/src/utils/file.ts:32-86; a crawl
archive is the table-native generalization.)

Format notes (public spec, ISO 28500 / WARC 1.0-1.1):

- a warc.gz is CONCATENATED gzip members, canonically one record per
  member (the Common Crawl layout — members are independently seekable);
  plain .warc is the same records uncompressed.
- record = ``WARC/1.x CRLF`` + header lines + blank line + Content-Length
  body bytes + CRLF CRLF. ``WARC-Type: response`` records carry an HTTP
  response; the html payload starts after the HTTP header block's blank
  line.

Scale + robustness:

- Spark side is a ``binaryFile`` scan → ``mapInPandas`` parse: one archive
  file = one task (Common Crawl ships ~64k files per crawl, so file-level
  parallelism is the natural unit, exactly how production WARC jobs run).
- per-record body cap (MAX_RECORD_BYTES) and a per-file decompression
  budget (MAX_ARCHIVE_BYTES) bound the work a hostile archive can cause;
  oversized records are SKIPPED (the next member resyncs), a blown file
  budget truncates the file's record stream (rows so far are kept).
- malformed record headers stop the parse at the last whole record —
  degrade, never crash (the extractor's containment philosophy).

``write_warc`` is the deterministic writer (gzip mtime pinned) used by the
test corpus; it round-trips through ``parse_warc`` byte-exactly.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io

from pyspark.sql import DataFrame, SparkSession

MAX_RECORD_BYTES = 64 * 1024 * 1024
MAX_ARCHIVE_BYTES = 1 << 30  # 1 GiB decompressed per archive file

_CRLF2 = b"\r\n\r\n"


def _decompress_members(data: bytes, budget: int = MAX_ARCHIVE_BYTES) -> bytes:
    """All concatenated gzip members (GzipFile iterates members natively),
    chunked against the decompression budget; non-gzip input passes
    through. A blown budget truncates — callers keep whole records."""
    if data[:2] != b"\x1f\x8b":
        return data[:budget]
    out = []
    total = 0
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        try:
            while total < budget:
                chunk = gz.read(1 << 20)
                if not chunk:
                    break
                out.append(chunk)
                total += len(chunk)
        except (OSError, EOFError):
            pass  # corrupt tail member — keep what decompressed
    return b"".join(out)


def parse_warc(data: bytes):
    """Yield (url, ts, payload) per ``WARC-Type: response`` record. The
    payload is the HTTP body (headers stripped at the first blank line;
    records with no HTTP header block yield their whole body)."""
    raw = _decompress_members(data)
    pos, n = 0, len(raw)
    while pos < n:
        if not raw.startswith(b"WARC/", pos):
            nxt = raw.find(b"\r\n\r\nWARC/", pos)
            if nxt == -1:
                break
            pos = nxt + 4  # resync at the next record boundary
        head_end = raw.find(_CRLF2, pos)
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        for line in raw[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if _:
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break  # header block without a parseable length — stop clean
        body_at = head_end + 4
        if length < 0 or body_at + length > n:
            break  # truncated record — keep everything before it
        if length <= MAX_RECORD_BYTES and (
            headers.get("warc-type", "").lower() == "response"
        ):
            body = raw[body_at : body_at + length]
            http_end = body.find(_CRLF2)
            payload = body[http_end + 4 :] if http_end != -1 else body
            url = headers.get("warc-target-uri", "")
            ts = None
            date = headers.get("warc-date", "")
            if date:
                try:
                    ts = _dt.datetime.fromisoformat(
                        date.replace("Z", "+00:00")
                    ).replace(tzinfo=None)
                except ValueError:
                    ts = None
            if url:
                yield url, ts, payload
        pos = body_at + length
        if raw.startswith(_CRLF2, pos):
            pos += 4


def write_warc(
    records: list[tuple[str, _dt.datetime, bytes]], compress: bool = True
) -> bytes:
    """Deterministic WARC writer (test corpus): one response record per
    gzip member (the Common Crawl layout), gzip mtime pinned to 0."""
    out = []
    for url, ts, html in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {url}\r\n".encode("latin-1")
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        record = head + http + _CRLF2
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            out.append(buf.getvalue())
        else:
            out.append(record)
    return b"".join(out)


def read_warc(spark: SparkSession, path: str, lang: str = "") -> DataFrame:
    """Directory/glob of ``*.warc(.gz)`` → pages DataFrame (input_hint
    shape). binaryFile scan → mapInPandas parse; one archive = one task."""
    import pandas as pd

    from zerox_spark.schema import PAGES_SCHEMA

    raw = spark.read.format("binaryFile").load(path)

    def batches(it):
        for pdf in it:
            rows = []
            for content in pdf["content"]:
                for url, ts, payload in parse_warc(bytes(content)):
                    rows.append(
                        {
                            "url": url,
                            "warc_ts": ts,
                            "html": payload,
                            "text": "",
                            "lang": lang,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return raw.select("content").mapInPandas(batches, schema=PAGES_SCHEMA)
