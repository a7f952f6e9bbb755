"""Deterministic synthesis of the input_hint pages table.

BASELINE.json's input is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``. No such table ships with the sandbox,
so this module derives one — **deterministically, with zero randomness** —
from the driver's ``documents.parquet`` (doc_id, text, lang, source,
n_chars): every doc_id maps to exactly one page row whose html/pdf payload is
a pure function of (doc_id, text, lang, source).

Because the renderer is deterministic AND the extractor is deterministic, the
expected extraction output is itself a closed-form function of the documents
row — which is what lets the DuckDB oracle (oracles.py) reconstruct the
byte-exact expected markdown in plain SQL. ``expected_markdown_pages`` below
is the Python statement of that contract; tests assert
extractor(render(doc)) == expected(doc) for every row.

Row taxonomy (all mod rules on doc_id, mutually ordered):

- fast path   (doc_id % 10 == 7):  pages.text = documents.text (trusted
  pre-extracted text; extractor routes around the DOM pass — the Excel
  fast-path analog, node-zerox/src/index.ts:167-168);
- pseudo-PDF  (doc_id % 5 == 0):  %PDF layout payload, 2 + doc_id % 3 pages
  (multi-page share 20%, FIXTURES.md §1);
- HTML        (everything else): full page with nav/header/aside/footer
  boilerplate and an <article> carrying deterministic optional blocks
  (table, list, code fence, checkboxes, extra section) plus a ~4% skew
  cohort whose body paragraph repeats 40× (FIXTURES.md pathological rows).
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# taxonomy constants (shared with queries.py oracles — change both or neither)
FAST_MOD, FAST_EQ = 10, 7
SHEET_MOD, SHEET_EQ = 10, 1  # structured-sheet fast path (Excel analog)
PDF_MOD = 5  # doc_id % 5 == 0 → pdf
TABLE_MOD, TABLE_EQ = 7, 3
LIST_MOD, LIST_EQ = 5, 2
CODE_MOD, CODE_EQ = 11, 5
CHECK_MOD, CHECK_EQ = 13, 6
SECTION_MOD, SECTION_EQ = 17, 9
SKEW_MOD, SKEW_EQ = 23, 11
SKEW_REPEAT = 40
SECTION_WORDS = 10
PDF_WORDS_PER_LINE = 8

EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)


def doc_url(doc_id: int, source: str) -> str:
    return f"https://site{doc_id % 97}.example/{source}/{doc_id}"


def doc_ts(doc_id: int) -> _dt.datetime:
    return EPOCH + _dt.timedelta(seconds=int(doc_id))


def is_fast(doc_id: int) -> bool:
    return doc_id % FAST_MOD == FAST_EQ


def is_sheet_doc(doc_id: int) -> bool:
    return doc_id % SHEET_MOD == SHEET_EQ


def is_pdf_doc(doc_id: int) -> bool:
    return doc_id % PDF_MOD == 0 and not is_fast(doc_id)


def n_pdf_pages(doc_id: int) -> int:
    return 2 + doc_id % 3


# ---------------------------------------------------------------------------
# renderers


def render_html(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Common-Crawl-style page: site chrome + ads around an <article>."""
    site = doc_id % 97
    body = text if doc_id % SKEW_MOD != SKEW_EQ else None
    paras = (
        f"<p>{text}</p>"
        if body is not None
        else "".join(f"<p>{text}</p>" for _ in range(SKEW_REPEAT))
    )
    blocks = [f"<h1>Document {doc_id}</h1>", paras]
    if doc_id % TABLE_MOD == TABLE_EQ:
        blocks.append(
            "<table class=\"stats\"><tr><th>metric</th><th>value</th></tr>"
            f"<tr><td>views</td><td>{(doc_id * 37) % 1000}</td></tr>"
            f"<tr><td>score</td><td>{(doc_id * 53) % 100}</td></tr></table>"
        )
    if doc_id % LIST_MOD == LIST_EQ:
        blocks.append(
            "<ul>"
            + "".join(
                f"<li>item {(doc_id * k) % 100}</li>" for k in (7, 11, 13)
            )
            + "</ul>"
        )
    if doc_id % CODE_MOD == CODE_EQ:
        blocks.append(f'<pre><code class="python">print({doc_id})</code></pre>')
    if doc_id % CHECK_MOD == CHECK_EQ:
        blocks.append(
            f'<p><input type="checkbox" checked> done {doc_id}</p>'
            f'<p><input type="checkbox"> todo {doc_id}</p>'
        )
    if doc_id % SECTION_MOD == SECTION_EQ:
        first = " ".join(text.split(" ")[:SECTION_WORDS])
        blocks.append(f"<h2>Section {doc_id}</h2><p>{first}</p>")
    article = "\n".join(blocks)
    html = f"""<!DOCTYPE html>
<html lang="{lang}"><head><title>Document {doc_id} — {source}</title>
<meta charset="utf-8"><script>var docId={doc_id};</script>
<style>body{{margin:0;font:14px serif}}</style></head>
<body>
<nav class="topnav"><ul><li><a href="/">Home</a></li><li><a href="/about">About</a></li><li><a href="/contact">Contact</a></li><li><a href="/login">Login</a></li></ul></nav>
<header><div class="banner"><a href="/promo">Limited offer — click here now!</a></div></header>
<aside class="ads"><div><a href="https://ads.example/1">Buy now</a> <a href="https://ads.example/2">Subscribe</a> <a href="https://ads.example/3">Hot deal</a></div></aside>
<article>
{article}
</article>
<footer><p><a href="/terms">Terms</a> · <a href="/privacy">Privacy</a> · © 2024 site{site}.example</p></footer>
</body></html>"""
    return html.encode("utf-8")


def sheet_cells(doc_id: int) -> tuple[list[list[str]], list[list[str]]]:
    """Deterministic cell grids for the two sheets of a sheet-doc."""
    data = [
        ["name", "q1", "q2"],
        ["r0", str((doc_id * 7) % 100), str((doc_id * 11) % 100)],
        ["r1", str((doc_id * 7 + 13) % 100), str((doc_id * 11 + 17) % 100)],
    ]
    summary = [["name", "total"], ["all", str((doc_id * 19) % 1000)]]
    return data, summary


def render_sheet(doc_id: int) -> bytes:
    """Structured-sheet payload (grammar in extract/sheets.py): 2 sheets."""
    data, summary = sheet_cells(doc_id)
    out = ["%SHEET csv 1.0"]
    for name, rows in (("data", data), ("summary", summary)):
        out.append(f"%%sheet name={name}")
        out.extend(",".join(row) for row in rows)
    return ("\n".join(out) + "\n").encode("utf-8")


def render_pdf(doc_id: int, text: str) -> bytes:
    """Pseudo-PDF layout payload (grammar in layout.py)."""
    words = text.split(" ")
    total = len(words)
    np_ = n_pdf_pages(doc_id)
    out = ["%PDF-SYNTH 1.0"]
    for p in range(1, np_ + 1):
        out.append(f"%%page no={p} w=612.0 h=792.0")
        out.append(
            f"%%line y=750.0 x=72.0 size=18.0 text=Document {doc_id} — page {p}"
        )
        chunk = words[(p - 1) * total // np_ : p * total // np_]
        y = 700.0
        for i in range(0, len(chunk), PDF_WORDS_PER_LINE):
            seg = " ".join(chunk[i : i + PDF_WORDS_PER_LINE])
            out.append(f"%%line y={y} x=72.0 size=10.0 text={seg}")
            y -= 20.0
        out.append(f"%%line y=40.0 x=306.0 size=8.0 text={p}")
    return ("\n".join(out) + "\n").encode("utf-8")


# ---------------------------------------------------------------------------
# the closed-form expected output (the oracle contract, python statement)


def render_payload(doc_id: int, text: str, lang: str, source: str) -> bytes:
    """Route to the right renderer for this doc_id (single entry point for
    tests and the Spark batch renderer)."""
    if is_sheet_doc(doc_id):
        return render_sheet(doc_id)
    if is_pdf_doc(doc_id):
        return render_pdf(doc_id, text)
    return render_html(doc_id, text, lang, source)


def _table_html(rows: list[list[str]]) -> str:
    parts = ["<table>"]
    for i, row in enumerate(rows):
        tag = "th" if i == 0 else "td"
        parts.append(
            "<tr>" + "".join(f"<{tag}>{c}</{tag}>" for c in row) + "</tr>"
        )
    parts.append("</table>")
    return "".join(parts)


def expected_markdown_pages(
    doc_id: int, text: str, source: str
) -> list[tuple[int, str]]:
    if is_fast(doc_id):
        return [(1, text)]
    if is_sheet_doc(doc_id):
        data, summary = sheet_cells(doc_id)
        return [(1, _table_html(data)), (2, _table_html(summary))]
    if is_pdf_doc(doc_id):
        words = text.split(" ")
        total = len(words)
        np_ = n_pdf_pages(doc_id)
        pages = []
        for p in range(1, np_ + 1):
            chunk = " ".join(words[(p - 1) * total // np_ : p * total // np_])
            md = (
                f"# Document {doc_id} — page {p}\n\n{chunk}\n\n"
                f"<page_number>{p}</page_number>"
            )
            pages.append((p, md))
        return pages
    blocks = [f"# Document {doc_id}"]
    if doc_id % SKEW_MOD == SKEW_EQ:
        blocks.extend([text] * SKEW_REPEAT)
    else:
        blocks.append(text)
    if doc_id % TABLE_MOD == TABLE_EQ:
        blocks.append(
            "<table><tr><th>metric</th><th>value</th></tr>"
            f"<tr><td>views</td><td>{(doc_id * 37) % 1000}</td></tr>"
            f"<tr><td>score</td><td>{(doc_id * 53) % 100}</td></tr></table>"
        )
    if doc_id % LIST_MOD == LIST_EQ:
        blocks.append(
            "\n".join(f"- item {(doc_id * k) % 100}" for k in (7, 11, 13))
        )
    if doc_id % CODE_MOD == CODE_EQ:
        blocks.append(f"```python\nprint({doc_id})\n```")
    if doc_id % CHECK_MOD == CHECK_EQ:
        blocks.append(f"☑ done {doc_id}")
        blocks.append(f"☐ todo {doc_id}")
    if doc_id % SECTION_MOD == SECTION_EQ:
        blocks.append(f"## Section {doc_id}")
        blocks.append(" ".join(text.split(" ")[:SECTION_WORDS]))
    return [(1, "\n\n".join(blocks))]


# ---------------------------------------------------------------------------
# Spark-side synthesis (distributed: mapInPandas over the documents scan)


def _synth_batch(batches):
    for pdf in batches:
        rows = []
        for doc_id, text, lang, source in zip(
            pdf["doc_id"], pdf["text"], pdf["lang"], pdf["source"]
        ):
            doc_id = int(doc_id)
            if is_sheet_doc(doc_id):
                payload = render_sheet(doc_id)
            elif is_pdf_doc(doc_id):
                payload = render_pdf(doc_id, text)
            else:
                payload = render_html(doc_id, text, lang, source)
            rows.append(
                {
                    "url": doc_url(doc_id, source),
                    "warc_ts": doc_ts(doc_id).replace(tzinfo=None),
                    "html": payload,
                    "text": text if is_fast(doc_id) else "",
                    "lang": lang,
                }
            )
        yield pd.DataFrame(
            rows, columns=["url", "warc_ts", "html", "text", "lang"]
        )


def synth_pages(
    spark: SparkSession, sf_dir: str, num_partitions: int | None = None
) -> DataFrame:
    """documents.parquet → deterministic pages DataFrame (input_hint shape).

    The sandbox documents file is a single small parquet → a single scan
    split, which would serialize the render; repartition by doc_id first so
    synthesis is distributed. At real scale this whole stage is replaced by
    the Iceberg table scan itself (many splits for free).
    """
    from zerox_spark.schema import PAGES_SCHEMA

    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    docs = docs.repartition(num_partitions, "doc_id")
    return docs.mapInPandas(_synth_batch, schema=PAGES_SCHEMA)
