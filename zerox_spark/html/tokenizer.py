"""A small, deterministic, error-tolerant HTML5 tokenizer.

Produces a flat token stream (no tree — see dom.py for the tree). Written
from scratch for byte-identical reproducibility: no external parser whose
version bumps could change output. Tolerates the malformed-HTML cases the
synthetic corpus and real Common-Crawl pages exhibit (unclosed tags, stray
'<', attribute soup, missing quotes).

Determinism contract: pure function of the input string; no locale, no
environment, no randomness.
"""

from __future__ import annotations

import html as _htmllib
import re
from typing import Iterator, NamedTuple


class Token(NamedTuple):
    kind: str  # 'start' | 'end' | 'text' | 'comment' | 'doctype'
    tag: str  # lowercase tag name ('' for text/comment/doctype)
    attrs: dict[str, str] | None
    text: str  # raw text for text/comment tokens
    self_closing: bool


# elements whose content is raw text (no nested tags parsed)
RAWTEXT_ELEMENTS = frozenset({"script", "style", "textarea", "title"})

# void elements: never have children, never need a close tag
VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_TAG_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9:_-]*")
_ATTR_RE = re.compile(
    r"""\s*([^\s=/>]+)(?:\s*=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)


def unescape(text: str) -> str:
    """Decode HTML entities (&amp; &#x..; etc). Stdlib, deterministic."""
    if "&" not in text:
        return text
    return _htmllib.unescape(text)


def tokenize(src: str) -> Iterator[Token]:
    """Yield tokens; never raises on malformed input.

    Hot loop on the cluster (every byte of every page flows through here) —
    branch order and the single-char peeks are deliberate."""
    i, n = 0, len(src)
    find = src.find
    while i < n:
        lt = find("<", i)
        if lt == -1:
            yield Token("text", "", None, src[i:], False)
            return
        if lt > i:
            yield Token("text", "", None, src[i:lt], False)
        i = lt
        c = src[i + 1] if i + 1 < n else ""
        # decide what kind of markup starts at '<'
        if c == "!" or c == "?":
            if src.startswith("<!--", i):
                end = find("-->", i + 4)
                if end == -1:
                    yield Token("comment", "", None, src[i + 4 :], False)
                    return
                yield Token("comment", "", None, src[i + 4 : end], False)
                i = end + 3
                continue
            if src.startswith("<![CDATA[", i):
                end = find("]]>", i + 9)
                if end == -1:
                    yield Token("text", "", None, src[i + 9 :], False)
                    return
                yield Token("text", "", None, src[i + 9 : end], False)
                i = end + 3
                continue
            end = find(">", i)
            if end == -1:
                return
            yield Token("doctype", "", None, src[i:end], False)
            i = end + 1
            continue
        if c == "/":
            m = _TAG_NAME_RE.match(src, i + 2)
            if not m:
                # '</' not followed by a name: literal text
                yield Token("text", "", None, src[i : i + 2], False)
                i += 2
                continue
            end = find(">", m.end())
            if end == -1:
                return
            yield Token("end", m.group(0).lower(), None, "", False)
            i = end + 1
            continue
        m = _TAG_NAME_RE.match(src, i + 1)
        if not m:
            # stray '<' (e.g. "a < b"): literal text
            yield Token("text", "", None, "<", False)
            i += 1
            continue
        tag = m.group(0).lower()
        end = find(">", m.end())
        if end == -1:
            # unclosed tag at EOF: drop the fragment
            return
        attr_src = src[m.end() : end]
        if not attr_src:
            attrs = None
            self_closing = False
        else:
            self_closing = attr_src.rstrip().endswith("/")
            if self_closing:
                attr_src = attr_src.rstrip()[:-1]
            attrs = _parse_attrs(attr_src) if attr_src.strip() else None
        yield Token("start", tag, attrs, "", self_closing or tag in VOID_ELEMENTS)
        i = end + 1
        if tag in RAWTEXT_ELEMENTS and not self_closing:
            close = _find_close(src, i, tag)
            if close == -1:
                yield Token("text", "", None, src[i:], False)
                yield Token("end", tag, None, "", False)
                return
            yield Token("text", "", None, src[i:close], False)
            # skip over the close tag
            gt = find(">", close)
            yield Token("end", tag, None, "", False)
            i = n if gt == -1 else gt + 1


def _find_close(src: str, start: int, tag: str) -> int:
    """Index of '</tag' (case-insensitive) at/after start, or -1."""
    needle = "</" + tag
    low = src.lower()
    return low.find(needle, start)


def _parse_attrs(attr_src: str) -> dict[str, str]:
    attrs: dict[str, str] = {}
    for m in _ATTR_RE.finditer(attr_src):
        name = m.group(1).lower()
        raw = m.group(2)
        if raw is None:
            value = ""
        elif raw[:1] in ("'", '"'):
            value = raw[1:-1]
        else:
            value = raw
        if name not in attrs:
            attrs[name] = unescape(value)
    return attrs
