"""csv/tsv structured-data fast path — the reference's delimited branch.

The reference lists csv/tsv as first-class input types
(/root/reference/README.md:506-507) and routes structured data around OCR
into sheet-shaped pages (extractPagesFromStructuredDataFile,
node-zerox/src/utils/file.ts:311-329). A delimited file is a one-sheet
workbook: it extracts as ONE page holding the canonical first-row-``<th>``
HTML table — the same serialization the %SHEET, xlsx and .xls paths emit
(sheets.py / ooxml.grids_to_pages), so a csv and an xlsx of the same grid
produce the same ``<table>`` body.

Sniffing is content-based (the engine has no filenames): a payload whose
first lines parse to a CONSISTENT field count ≥ 2 under one delimiter is
a table; anything else falls through to the plain-text path. csv.reader
does the parsing, so quoted fields (embedded delimiters, doubled quotes)
are handled; prose with incidental commas fails the consistent-count rule.
Tab is probed before comma — a tsv whose fields contain commas must not
be mis-split.

Conservative by design: a single-column csv is indistinguishable from
plain lines of text and extracts as paragraphs (documented divergence —
the reference keys on the .csv extension, which crawl payloads don't have).
"""

from __future__ import annotations

import csv
import io

from zerox_spark.extract.markdown import Block, join_blocks
from zerox_spark.extract.sheets import sheet_to_table

_SNIFF_LINES = 20
_DELIMITERS = ("\t", ",")


def sniff_delimiter(src: str) -> str | None:
    """Return the delimiter if ``src`` looks like a delimited table:
    ≥ 2 non-empty lines whose first _SNIFF_LINES all parse to the same
    field count ≥ 2. None otherwise."""
    lines = [ln for ln in src.split("\n") if ln.strip()]
    if len(lines) < 2:
        return None
    probe = lines[:_SNIFF_LINES]
    for delim in _DELIMITERS:
        try:
            counts = [
                len(row)
                for row in csv.reader(io.StringIO("\n".join(probe)), delimiter=delim)
            ]
        except csv.Error:
            continue
        if (
            len(counts) >= 2
            and counts[0] >= 2
            and all(c == counts[0] for c in counts)
        ):
            return delim
    return None


def delimited_to_pages(
    src: str, delimiter: str
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    """One page: the full parsed grid as the canonical first-row-<th>
    table (empty rows dropped, cells whitespace-trimmed — the %SHEET
    parser's tolerance contract, sheets.py)."""
    rows = [
        [c.strip() for c in row]
        for row in csv.reader(io.StringIO(src), delimiter=delimiter)
    ]
    rows = [r for r in rows if any(c != "" for c in r)]
    if not rows:
        raise ValueError("delimited payload with no rows")
    markdown, spans = join_blocks([Block("table", sheet_to_table(rows))])
    return [(1, markdown, spans)]
