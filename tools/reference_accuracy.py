"""Reference-corpus keyword gate — runs the engine over the reference's OWN
test corpus (``/root/reference/shared/inputs`` + ``shared/test.json``) for
every input family it can consume natively, and reports per-file keyword
accuracy the way the reference harness does (compareKeywords,
node-zerox/tests/utils.ts:3-41; per-file loop, tests/index.ts:100-148 —
semantics re-stated fresh, not copied).

Matching: the reference lowercases page content and checks substring
containment per keyword. We extract deterministically (no OCR), join all
pages, and match each keyword two ways:
  - normalized: lowercase + whitespace runs collapsed to one space
  - squashed: all whitespace removed (letter-spaced fonts — e.g. the 10-Q's
    "U N ITED STA TES" — carry kerning-induced spaces in the text layer;
    squashing makes the comparison spacing-insensitive, which is exactly
    what a human keyword check would accept)

Scanned/image-only inputs (png, image-only PDFs) are reported as
``no_text_layer`` — this engine reads born-digital text layers, it does not
OCR pixels (the honest boundary; PARITY.md §2.3).

    python tools/reference_accuracy.py [reference_dir] [output.json]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, ".")

from zerox_spark.extract.core import extract_document  # noqa: E402

_WS = re.compile(r"\s+")


# real markup only — must open with a letter or a closing slash, so the
# datasheet prose "< 100KΩ ... > 1 MΩ" is never eaten as a tag
_TAG = re.compile(r"</?[A-Za-z][^<>]{0,78}>")


def _fold(s: str) -> str:
    # NFKC folds compatibility forms both sides may disagree on: Kangxi
    # radicals vs unified ideographs (a real ToUnicode in the corpus maps
    # glyphs to U+2Fxx radicals), fullwidth forms, ligatures (ﬁ → fi).
    # Markup tags (our dialect's HTML tables, <page_number>) are
    # STRUCTURE, not content — they fold to a space so cell texts stay
    # adjacent the way the reference's pipe-table markdown reads, and so
    # <td>/<tr> never count as tokens in the F1
    import unicodedata

    return unicodedata.normalize("NFKC", _TAG.sub(" ", s)).lower()


def _norm(s: str) -> str:
    return _WS.sub(" ", _fold(s)).strip()


def _squash(s: str) -> str:
    return _WS.sub("", _fold(s))


def token_f1(ours: str, reference: str) -> dict:
    """Multiset token F1 between our markdown and the reference's committed
    LLM-OCR output (shared/outputs/*.md) — a second, harsher parity figure
    than keyword recall: byte-identity vs an LLM's free-form markdown is
    not meaningful, token overlap is. Tokens are NFKC-folded lowercase
    alphanumeric runs (markdown syntax and punctuation excluded on both
    sides)."""
    from collections import Counter

    tok = re.compile(r"[a-z0-9]+")
    a = Counter(tok.findall(_fold(ours)))
    b = Counter(tok.findall(_fold(reference)))
    overlap = sum((a & b).values())
    na, nb = sum(a.values()), sum(b.values())
    prec = overlap / na if na else 0.0
    rec = overlap / nb if nb else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "token_precision": round(prec, 4),
        "token_recall": round(rec, 4),
        "token_f1": round(f1, 4),
    }


def _decomma(s: str) -> str:
    # comma-insensitive variant: the text layer says "16,398" /
    # "Tesla, Inc." where the LLM-OCR-derived keyword says "16398" /
    # "Tesla Inc." — the same class of dialect gap the squash variant
    # covers for letter-spaced layers. Commas are deleted outright on
    # BOTH sides (digit grouping "16,398" → "16398"; "tesla, inc." →
    # "tesla inc."), so this can't match across a real content
    # difference, only across punctuation style.
    return _WS.sub(" ", _fold(s).replace(",", "")).strip()


def keyword_hits(full_text: str, keywords: list[str]) -> tuple[int, list[str]]:
    norm = _norm(full_text)
    squash = _squash(full_text)
    decomma = _decomma(full_text)
    found = 0
    missing: list[str] = []
    for kw in keywords:
        if (
            _norm(kw) in norm
            or _squash(kw) in squash
            or _decomma(kw) in decomma
        ):
            found += 1
        else:
            missing.append(kw)
    return found, missing


def run(reference_dir: str) -> dict:
    shared = Path(reference_dir) / "shared"
    spec = json.loads((shared / "test.json").read_text())
    files = []
    for entry in spec:
        name = entry["file"]
        path = shared / "inputs" / name
        if not path.exists():
            continue
        keywords = [kw for page in entry["expectedKeywords"] for kw in page]
        payload = path.read_bytes()
        pages = extract_document(payload, None)
        ok_pages = [p for p in pages if p.status == "SUCCESS"]
        text = "\n\n".join(p.markdown for p in ok_pages)
        if not ok_pages or not text:
            files.append(
                {
                    "file": name,
                    "status": "no_text_layer",
                    "error": pages[0].error,
                    "n_keywords": len(keywords),
                }
            )
            continue
        found, missing = keyword_hits(text, keywords)
        row = {
            "file": name,
            "status": "extracted",
            "n_pages": len(ok_pages),
            "n_keywords": len(keywords),
            "found": found,
            "accuracy": round(found / len(keywords), 4) if keywords else 1.0,
            "missing_sample": missing[:8],
        }
        ref_md = shared / "outputs" / (Path(name).stem + ".md")
        if ref_md.exists():
            row.update(token_f1(text, ref_md.read_text(errors="replace")))
        files.append(row)
    extracted = [f for f in files if f["status"] == "extracted"]
    total_kw = sum(f["n_keywords"] for f in extracted)
    total_found = sum(f["found"] for f in extracted)
    return {
        "n_inputs": len(files),
        "n_extracted": len(extracted),
        "n_no_text_layer": len(files) - len(extracted),
        "overall_accuracy": round(total_found / total_kw, 4) if total_kw else None,
        "files": files,
    }


def main() -> int:
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/reference_accuracy.json"
    report = run(ref_dir)
    Path(out_path).write_text(json.dumps(report, indent=1))
    for f in report["files"]:
        if f["status"] == "extracted":
            print(
                f"{f['file']}: {f['found']}/{f['n_keywords']}"
                f" ({f['accuracy']:.1%}) over {f['n_pages']} pages"
            )
        else:
            print(f"{f['file']}: {f['status']}")
    print(
        f"overall: {report['overall_accuracy']:.1%} across"
        f" {report['n_extracted']} extracted files"
        f" ({report['n_no_text_layer']} image-only)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
