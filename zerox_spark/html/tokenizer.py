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
    """Field layout of the tuples ``tokenize`` yields. The hot loop yields
    PLAIN tuples (NamedTuple construction is a measurable share of the
    per-page cost); ``Token`` exists for tests/consumers that want attribute
    access — ``Token(*t)`` wraps, and ``==`` compares across the two (both
    are tuples)."""

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


# single-scan token pattern: every byte of every page flows through this one
# C-level match per token (≈2x faster than hand-rolled find/peek chains).
# Group map: 1 text run · 2 comment body · 3 CDATA body · 4 end-tag name ·
# 5 start-tag name · 6 attr source. Decls/doctypes carry no group.
#
# Start-tag attribute-area contract (documented, locked by tests):
#   * a quote character ALWAYS opens a quoted value, which ends at the next
#     matching quote (or end of input if none follows);
#   * '>' inside such a quoted value does NOT end the tag ('<a title="1 > 2">'
#     is one tag — HTML5-correct, and a deliberate change from the pre-scanner
#     tokenizer which ended every tag at the first raw '>');
#   * end of input before the terminating '>' (including inside an
#     unterminated quote) makes the whole trailing fragment a truncated tag,
#     which is dropped (mirrors HTML5 "EOF in tag" — no token emitted).
# The alternation below is UNAMBIGUOUS: the catch-all excludes quote chars,
# and each quote branch accepts exactly one parse (run to matching quote or
# \Z). Failure therefore backtracks linearly — no exponential blowup on
# truncated tags with many quoted attributes (a single malformed crawl page
# must never pin an executor core).
_SCANNER = re.compile(
    r"([^<]+)"
    r"|<!--(.*?)(?:-->|\Z)"
    r"|<!\[CDATA\[(.*?)(?:\]\]>|\Z)"
    r"|<[!?][^>]*>"
    r"|</([a-zA-Z][a-zA-Z0-9:_-]*)[^>]*>"
    r"|<([a-zA-Z][a-zA-Z0-9:_-]*)"
    r"((?:\"[^\"]*(?:\"|\Z)|'[^']*(?:'|\Z)|[^>\"'])*)>"
    r"|<",
    re.S,
)


# close-tag scanners per rawtext element: explicit ASCII-case classes, NOT
# str.lower() of the document — lowercase can change string LENGTH (e.g.
# 'İ' U+0130 → 2 chars), which would misalign indices found in the lowered
# copy against the original
_RAWTEXT_CLOSE = {
    # the close-tag NAME must end at a boundary char (HTML5 script-data
    # end-tag-open state): '</scripty>' inside a JS string must NOT close
    # the <script> — a bare-prefix match would leak script text into
    # document content
    tag: re.compile(
        "</" + "".join(f"[{c}{c.upper()}]" for c in tag) + r"(?=[\s/>]|\Z)"
    )
    for tag in RAWTEXT_ELEMENTS
}


def tokenize(src: str) -> Iterator[tuple]:
    """Yield (kind, tag, attrs, text, self_closing) tuples (see Token);
    never raises on malformed input."""
    pos, n = 0, len(src)
    match = _SCANNER.match
    find = src.find
    while pos < n:
        m = match(src, pos)
        pos = m.end()
        g = m.lastindex
        if g == 1:
            yield ("text", "", None, m.group(1), False)
            continue
        if g == 6 or g == 5:
            tag = m.group(5).lower()
            attr_src = m.group(6)
            if not attr_src:
                attrs = None
                self_closing = False
            else:
                stripped = attr_src.rstrip()
                self_closing = stripped.endswith("/")
                if self_closing:
                    # HTML5 unquoted-attribute-value state CONSUMES '/':
                    # <a href=http://x.com/> is NOT self-closing and the
                    # slash belongs to the value. Only a solidus preceded
                    # by whitespace, a closing quote, or nothing is the
                    # self-closing flag.
                    before = stripped[:-1]
                    toks = before.split()
                    last = toks[-1] if toks else ""
                    if (
                        before
                        and before[-1] not in " \t\n\r\f\"'"
                        and "=" in last
                        and not last.endswith("=")
                    ):
                        self_closing = False  # slash is part of the value
                    else:
                        attr_src = before
                attrs = _parse_attrs(attr_src) if attr_src.strip() else None
            yield (
                "start", tag, attrs, "", self_closing or tag in VOID_ELEMENTS
            )
            if tag in RAWTEXT_ELEMENTS and not self_closing:
                m_close = _RAWTEXT_CLOSE[tag].search(src, pos)
                close = m_close.start() if m_close else -1
                if close == -1:
                    yield ("text", "", None, src[pos:], False)
                    yield ("end", tag, None, "", False)
                    return
                yield ("text", "", None, src[pos:close], False)
                gt = find(">", close)
                yield ("end", tag, None, "", False)
                pos = n if gt == -1 else gt + 1
            continue
        if g == 4:
            yield ("end", m.group(4).lower(), None, "", False)
            continue
        if g == 2:
            body = m.group(2)
            yield ("comment", "", None, body, False)
            if not src.endswith("-->", 0, pos) and pos >= n:
                return
            continue
        if g == 3:
            yield ("text", "", None, m.group(3), False)
            continue
        token_text = m.group(0)
        if token_text == "<":
            # bare '<': literal text UNLESS it begins a truncated trailing
            # fragment, which is dropped:
            #   * '</name' with no '>' before EOF (legacy semantics);
            #   * '<name...' whose start-tag alternative failed — under the
            #     unambiguous scanner that happens exactly when EOF arrives
            #     before the terminating '>' (possibly inside an unterminated
            #     quoted value), i.e. a truncated tag;
            #   * '<!'/'<?' declaration with no '>' before EOF.
            # '</'+non-name advances two chars as literal text.
            if src.startswith("/", pos):
                nm = _TAG_NAME_RE.match(src, pos + 1)
                if nm is not None and find(">", nm.end()) == -1:
                    return
                yield ("text", "", None, "</", False)
                pos += 1
                continue
            if _TAG_NAME_RE.match(src, pos) is not None:
                return
            if src[pos : pos + 1] in ("!", "?") and find(">", pos) == -1:
                return
            yield ("text", "", None, "<", False)
            continue
        # '<!'/'<?' declaration with '>' present → doctype (no body group);
        # an unterminated declaration never matches this alternative and is
        # dropped by the bare-'<' branch above
        yield ("doctype", "", None, token_text[:-1], False)


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
