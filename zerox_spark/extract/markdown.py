"""Markdown emitter implementing the reference's output dialect.

Dialect spec (from the zerox system prompts, node-zerox/src/constants.ts:11-23,
py_zerox/pyzerox/constants/prompts.py:4-16, shared/systemPrompt.txt:1-12):

- headings → ATX markdown (#..######),
- tables  → **HTML**, not pipe-markdown (canonical single-line, attribute-free
  serialization here, for byte-stable goldens),
- checkboxes → ☑ (checked) / ☐ (unchecked),
- logos → <logo>text</logo>, watermarks → <watermark>text</watermark>,
  page numbers → <page_number>n</page_number>,
- figures/images → ![alt](#) placeholders (shared/outputs golden style),
- code → fenced blocks with language tag,
- all other prose → paragraphs, lists, blockquotes.

Emission is a deterministic walk of the scored DOM: boilerplate subtrees
(score.is_boilerplate) are skipped, blocks are joined with "\n\n", and each
emitted block records a provenance span (kind, start, end, score) into the
final markdown string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from zerox_spark.html.dom import BLOCK_TAGS, Node
from zerox_spark.html.score import NodeStats, compute_stats, is_boilerplate, select_content_root

_WS = re.compile(r"\s+")
_BR = "\x00"
_MD_LINK = re.compile(r"\[([^\]]*)\]\([^)]*\)")

CHECKED = "☑"  # ☑
UNCHECKED = "☐"  # ☐

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}


@dataclass
class Block:
    kind: str
    text: str
    score: float = 1.0


def html_to_markdown(src: str) -> tuple[str, list[tuple[str, int, int, float]]]:
    """Full pipeline for one HTML document → (markdown, spans)."""
    from zerox_spark.html.dom import parse

    nodes = parse(src)
    stats = compute_stats(nodes)
    root = select_content_root(nodes, stats)
    blocks = emit_blocks(nodes, stats, root)
    return join_blocks(blocks)


def join_blocks(blocks: list[Block]) -> tuple[str, list[tuple[str, int, int, float]]]:
    """Join blocks with blank lines; compute character spans."""
    parts: list[str] = []
    spans: list[tuple[str, int, int, float]] = []
    pos = 0
    for i, blk in enumerate(blocks):
        if i > 0:
            pos += 2  # "\n\n"
        start = pos
        parts.append(blk.text)
        pos += len(blk.text)
        spans.append((blk.kind, start, pos, blk.score))
    return "\n\n".join(parts), spans


def emit_blocks(
    nodes: list[Node], stats: list[NodeStats], root: int
) -> list[Block]:
    blocks: list[Block] = []
    pending_inline: list[str] = []

    def flush_inline() -> None:
        if pending_inline:
            text = _finish_inline("".join(pending_inline))
            pending_inline.clear()
            if text:
                for line in text.split("\n"):
                    line = line.strip()
                    if not line:
                        continue
                    kind = (
                        "checkbox"
                        if line.startswith((CHECKED, UNCHECKED))
                        else "para"
                    )
                    blocks.append(Block(kind, line, _content_score(line)))

    def walk(idx: int) -> None:
        node = nodes[idx]
        if node.tag is None:
            pending_inline.append(node.text)
            return
        # the ROOT was explicitly selected as the content container
        # (select_content_root) — re-testing it against the boilerplate
        # hints would let a negative class token on e.g. the chosen
        # <article> empty the whole document
        if idx != root and is_boilerplate(nodes, stats, idx):
            return
        tag = node.tag
        if tag in _HEADINGS:
            flush_inline()
            text = _inline_text(nodes, node)
            if text:
                blocks.append(Block("heading", "#" * _HEADINGS[tag] + " " + text))
            return
        if tag == "p":
            flush_inline()
            for c in node.children:
                walk(c)
            flush_inline()
            return
        if tag in ("ul", "ol"):
            flush_inline()
            text = _emit_list(nodes, stats, node, ordered=(tag == "ol"), depth=0)
            if text:
                blocks.append(Block("list", text))
            return
        if tag == "pre":
            flush_inline()
            blocks.append(_emit_pre(nodes, node))
            return
        if tag == "table":
            flush_inline()
            blocks.append(Block("table", _emit_table(nodes, node)))
            return
        if tag == "blockquote":
            flush_inline()
            inner: list[Block] = []
            for c in node.children:
                inner.extend(emit_blocks(nodes, stats, c))
            quoted = "\n".join(
                "> " + line for b in inner for line in b.text.split("\n")
            )
            if quoted:
                blocks.append(Block("quote", quoted))
            return
        if tag == "hr":
            flush_inline()
            blocks.append(Block("rule", "---"))
            return
        if tag == "img":
            flush_inline()
            blk = _emit_img(node)
            if blk is not None:
                blocks.append(blk)
            return
        if tag == "br":
            pending_inline.append(_BR)
            return
        if tag == "a":
            pending_inline.append(_inline_anchor(nodes, node))
            return
        if tag in ("strong", "b"):
            inner = _inline_text(nodes, node)
            if inner:
                pending_inline.append(f"**{inner}**")
            return
        if tag in ("em", "i"):
            inner = _inline_text(nodes, node)
            if inner:
                pending_inline.append(f"*{inner}*")
            return
        if tag == "code":
            inner = _inline_text(nodes, node)
            if inner:
                pending_inline.append(f"`{inner}`")
            return
        if tag in ("s", "del", "strike"):
            inner = _inline_text(nodes, node)
            if inner:
                pending_inline.append(f"~~{inner}~~")
            return
        if tag in ("sub", "sup"):
            inner = _inline_text(nodes, node)
            if inner:
                pending_inline.append(f"<{tag}>{inner}</{tag}>")
            return
        if tag == "figcaption":
            flush_inline()
            inner = _inline_text(nodes, node)
            if inner:
                blocks.append(Block("caption", f"*{inner}*"))
            return
        if tag == "summary":
            flush_inline()
            inner = _inline_text(nodes, node)
            if inner:
                blocks.append(Block("para", f"**{inner}**"))
            return
        if tag == "input":
            if node.attrs.get("type", "").lower() == "checkbox":
                glyph = CHECKED if "checked" in node.attrs else UNCHECKED
                pending_inline.append(_BR + glyph + " ")
            return
        if tag in ("dl",):
            flush_inline()
            text = _emit_dl(nodes, node)
            if text:
                blocks.append(Block("list", text))
            return
        # generic container (div/section/article/span/body/...): recurse.
        is_block = tag in BLOCK_TAGS or tag in ("body", "html", "#root", "td", "th")
        if is_block:
            flush_inline()
        for c in node.children:
            walk(c)
        if is_block:
            flush_inline()

    walk(root)
    flush_inline()
    return blocks


# ---------------------------------------------------------------------------
# inline helpers

def _content_score(block_text: str) -> float:
    """Per-block confidence — the engine's LogprobPage analog (SURVEY.md
    §1.1: "we emit per-block score spans instead",
    node-zerox/src/types.ts:234-237): 1 − fraction of the block's characters
    that are link text. A paragraph that is mostly links is low-confidence
    content (the same signal score.py uses to DROP whole containers —
    surviving borderline blocks carry the residual risk in their span)."""
    if "](" not in block_text:
        return 1.0
    linked = sum(len(m.group(1)) for m in _MD_LINK.finditer(block_text))
    if not linked:
        return 1.0
    return round(1.0 - linked / len(block_text), 4)


def _finish_inline(raw: str) -> str:
    # " ".join(split()) = \s+ collapse + edge strip in one C pass (~2-3x
    # the regex sub); edge whitespace is either BR-adjacent (removed by the
    # replaces below, same as before) or was stripped at the end anyway
    collapsed = " ".join(raw.split())
    if _BR in collapsed:  # <br> is rare; skip 3 string passes otherwise
        collapsed = collapsed.replace(" " + _BR, _BR).replace(_BR + " ", _BR)
        collapsed = collapsed.replace(_BR, "\n").strip()
    return collapsed


def _inline_text(nodes: list[Node], node: Node) -> str:
    parts: list[str] = []
    _collect_inline(nodes, node, parts)
    return _finish_inline("".join(parts))


def _collect_inline(nodes: list[Node], node: Node, parts: list[str]) -> None:
    for c in node.children:
        child = nodes[c]
        if child.tag is None:
            parts.append(child.text)
        elif child.tag == "br":
            parts.append(_BR)
        elif child.tag == "a":
            parts.append(_inline_anchor(nodes, child))
        elif child.tag in ("strong", "b"):
            inner = _inline_text(nodes, child)
            if inner:
                parts.append(f"**{inner}**")
        elif child.tag in ("em", "i"):
            inner = _inline_text(nodes, child)
            if inner:
                parts.append(f"*{inner}*")
        elif child.tag == "code":
            inner = _inline_text(nodes, child)
            if inner:
                parts.append(f"`{inner}`")
        elif child.tag in ("s", "del", "strike"):
            inner = _inline_text(nodes, child)
            if inner:
                parts.append(f"~~{inner}~~")
        elif child.tag in ("sub", "sup"):
            inner = _inline_text(nodes, child)
            if inner:
                parts.append(f"<{child.tag}>{inner}</{child.tag}>")
        elif child.tag == "input":
            if child.attrs.get("type", "").lower() == "checkbox":
                glyph = CHECKED if "checked" in child.attrs else UNCHECKED
                parts.append(glyph + " ")
        elif child.tag == "img":
            blk = _emit_img(child)
            if blk is not None:
                parts.append(blk.text)
        elif child.tag in ("script", "style", "noscript"):
            continue
        else:
            _collect_inline(nodes, child, parts)


def _inline_anchor(nodes: list[Node], node: Node) -> str:
    text = _inline_text(nodes, node)
    href = node.attrs.get("href", "")
    if not text:
        return ""
    if not href or href.startswith(("#", "javascript:")):
        return text
    return f"[{text}]({href})"


def _emit_img(node: Node) -> Block | None:
    classes = node.classes()
    alt = _WS.sub(" ", node.attrs.get("alt", "")).strip()
    if "logo" in classes:
        return Block("logo", f"<logo>{alt}</logo>")
    if "watermark" in classes:
        return Block("watermark", f"<watermark>{alt}</watermark>")
    return Block("figure", f"![{alt}](#)")


# ---------------------------------------------------------------------------
# block helpers

def _emit_list(
    nodes: list[Node], stats: list[NodeStats], node: Node, ordered: bool, depth: int
) -> str:
    lines: list[str] = []
    counter = 0
    indent = "  " * depth
    for c in node.children:
        child = nodes[c]
        if child.tag != "li":
            continue
        counter += 1
        # split the li into its own inline content and nested lists
        inline_parts: list[str] = []
        nested: list[str] = []
        for gc in child.children:
            gchild = nodes[gc]
            if gchild.tag in ("ul", "ol"):
                nested.append(
                    _emit_list(
                        nodes, stats, gchild, ordered=(gchild.tag == "ol"),
                        depth=depth + 1,
                    )
                )
            elif gchild.tag is None:
                inline_parts.append(gchild.text)
            else:
                tmp: list[str] = []
                _collect_inline(nodes, gchild, tmp)
                inline_parts.extend(tmp)
        text = _finish_inline("".join(inline_parts))
        marker = f"{counter}." if ordered else "-"
        if text:
            lines.append(f"{indent}{marker} {text}")
        lines.extend(n for n in nested if n)
    return "\n".join(lines)


def _emit_dl(nodes: list[Node], node: Node) -> str:
    lines: list[str] = []
    for c in node.children:
        child = nodes[c]
        if child.tag == "dt":
            text = _inline_text(nodes, child)
            if text:
                lines.append(f"- **{text}**")
        elif child.tag == "dd":
            text = _inline_text(nodes, child)
            if text:
                lines.append(f"  {text}")
    return "\n".join(lines)


def grid_table(rows: list[list[str]]) -> str:
    """THE canonical first-row-<th> grid serialization (attr-free,
    single-line) — the one byte format shared by the %SHEET, xlsx, xls,
    ods and csv/tsv paths (sheets.py / ooxml.py / delimited.py wrap
    this). layout._table_block differs BY DESIGN (its header rule is the
    per-line kind attribute, not first-row). Change the canonical form
    here and every grid path moves together."""
    parts = ["<table>"]
    for i, row in enumerate(rows):
        tag = "th" if i == 0 else "td"
        parts.append("<tr>")
        for cell in row:
            parts.append(f"<{tag}>{cell}</{tag}>")
        parts.append("</tr>")
    parts.append("</table>")
    return "".join(parts)


def _subtree_text(nodes: list[Node], node: Node) -> str:
    """Raw concatenation of EVERY descendant text node in document order,
    no whitespace collapse — pre/code content must keep its formatting
    even when a syntax highlighter wrapped each token in <span>s (direct
    children alone would drop all highlighted tokens)."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        for c in n.children:
            child = nodes[c]
            if child.tag is None:
                parts.append(child.text)
            else:
                walk(child)

    walk(node)
    return "".join(parts)


def _emit_pre(nodes: list[Node], node: Node) -> Block:
    # language from a nested <code class="language-x"|"x">
    lang = ""
    raw = None
    for c in node.children:
        child = nodes[c]
        if child.tag == "code":
            for cls in child.classes():
                if cls.startswith("language-"):
                    lang = cls[len("language-") :]
                    break
                if cls and not lang:
                    lang = cls
            raw = _subtree_text(nodes, child)
            break
    if raw is None:
        raw = _subtree_text(nodes, node)
    code = raw.strip("\n")
    return Block("code", f"```{lang}\n{code}\n```")


def _emit_table(nodes: list[Node], table: Node) -> str:
    """Canonical attribute-free single-line HTML table serialization.

    The dialect mandates HTML tables (node-zerox/src/constants.ts:15); the
    canonical form here (lowercase tags, no attrs, trimmed cells, single
    line) is what the goldens freeze.
    """
    parts: list[str] = ["<table>"]

    def rows_of(idx: int) -> None:
        for c in nodes[idx].children:
            child = nodes[c]
            if child.tag == "tr":
                parts.append("<tr>")
                for cc in child.children:
                    cell = nodes[cc]
                    if cell.tag in ("td", "th"):
                        text = _inline_text(nodes, cell)
                        parts.append(f"<{cell.tag}>{text}</{cell.tag}>")
                parts.append("</tr>")
            elif child.tag in ("thead", "tbody", "tfoot"):
                rows_of(child.idx)
            elif child.tag == "caption":
                text = _inline_text(nodes, child)
                if text:
                    parts.append(f"<caption>{text}</caption>")

    rows_of(table.idx)
    parts.append("</table>")
    return "".join(parts)
