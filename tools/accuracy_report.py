"""Keyword-accuracy harness — the reference test harness re-created.

Mirrors node-zerox/tests: a per-document expected-keyword list is matched
case-insensitively against the extracted pages (compareKeywords,
node-zerox/tests/utils.ts:3-41), per-file accuracy and an overall figure are
printed and written to output.json (tests/index.ts:100-148).

Keywords derive from the corpus spec (synth.py): every document must contain
its title tokens plus the conditional block contents its doc_id implies.

    python tools/accuracy_report.py [sf_dir] [output.json]
"""

from __future__ import annotations

import json
import sys

import duckdb

sys.path.insert(0, ".")

from zerox_spark.extract.core import extract_document  # noqa: E402
from zerox_spark.operators.fold import apply_maintain_format  # noqa: E402
from zerox_spark.synth import (  # noqa: E402
    is_fast,
    is_pdf_doc,
    is_sheet_doc,
    n_pdf_pages,
    render_payload,
)


def expected_keywords(doc_id: int, text: str) -> list[str]:
    words = text.split(" ")
    if is_fast(doc_id):
        return words[:3]
    if is_sheet_doc(doc_id):
        return ["<th>name</th>", f"<td>{(doc_id * 19) % 1000}</td>"]
    if is_pdf_doc(doc_id):
        return [
            f"document {doc_id} — page 1",
            f"<page_number>{n_pdf_pages(doc_id)}</page_number>",
            words[0],
        ]
    kws = [f"document {doc_id}", words[0]]
    if doc_id % 7 == 3:
        kws.append(f"<td>{(doc_id * 37) % 1000}</td>")
    if doc_id % 13 == 6:
        kws.append(f"done {doc_id}")
    if doc_id % 17 == 9:
        kws.append(f"section {doc_id}")
    return kws


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/accuracy_output.json"
    rows = duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    results = []
    for doc_id, text, lang, source in rows:
        payload = render_payload(doc_id, text, lang, source)
        trusted = text if is_fast(doc_id) else ""
        pages = extract_document(payload, trusted)
        folded = apply_maintain_format(
            [(p.page_no, p.markdown, p.status) for p in pages]
        )
        doc_md = "\n\n".join(md for _, md, _ in folded).lower()
        kws = expected_keywords(doc_id, text)
        found = [k for k in kws if k.lower() in doc_md]
        missing = [k for k in kws if k.lower() not in doc_md]
        results.append(
            {
                "file": f"doc_{doc_id}",
                "keywords": len(kws),
                "found": len(found),
                "missing": missing,
                "accuracy": round(100.0 * len(found) / len(kws), 2),
            }
        )

    overall = round(
        100.0 * sum(r["found"] for r in results) / sum(r["keywords"] for r in results),
        2,
    )
    report = {"overall_accuracy": overall, "documents": results}
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(report, fh, indent=1)

    worst = sorted(results, key=lambda r: r["accuracy"])[:5]
    print(f"{'file':>10}  {'kw':>3}  {'found':>5}  accuracy")
    for r in worst:
        print(f"{r['file']:>10}  {r['keywords']:>3}  {r['found']:>5}  {r['accuracy']:6.2f}%  missing={r['missing'][:2]}")
    print(f"overall: {overall}% over {len(results)} documents → {out_path}")
    return 0 if overall == 100.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
