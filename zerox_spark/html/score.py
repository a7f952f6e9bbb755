"""Readability/Arc90-style boilerplate scoring over the DOM array.

Replaces the reference's per-page image cleanup (trim/rotate, SURVEY.md §2.3
I1-I3): where zerox removes border pixels before OCR, we remove boilerplate
DOM regions before markdown emission. Heuristics are classic public-domain
readability signals:

- link density  = link_text_len / text_len per element (Arc90's canonical
  boilerplate signal) — drop when > LINK_DENSITY_MAX,
- structural boilerplate tags (nav/aside/form/iframe/noscript + site-chrome
  header/footer at body level),
- class/id token hints (nav, menu, banner, ad, promo, sidebar, ...),
- main-content root selection: prefer <article>/<main>/[role=main]; else the
  candidate with max text_len * (1 - link_density).

All thresholds are fixed constants — byte-identical output requires that no
tuning happens at runtime.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from zerox_spark.html.dom import Node

LINK_DENSITY_MAX = 0.33
MIN_CANDIDATE_TEXT = 25  # chars of normalized text to be a content candidate

# dropped unconditionally, wherever they appear
DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "iframe", "form", "button",
     "select", "nav", "aside",
     # vector/embedded media: their text children (<svg><title>, fallback
     # content) are accessibility strings, not document content
     "svg", "canvas", "object", "embed", "map"}
)
# dropped only when they are site chrome (direct child of body/root), since
# in-content <header>/<footer> must be kept (the reference's prompt demands
# headers/footers be preserved, node-zerox/src/constants.ts:11-23)
CHROME_TAGS = frozenset({"header", "footer"})

_NEGATIVE_HINT = re.compile(
    r"(^|[-_ ])(nav|menu|footer|banner|masthead|breadcrumb|ad|ads|advert|"
    r"promo|sponsor|sidebar|widget|social|share|comment|related|popup|"
    r"cookie|subscribe|newsletter)($|[-_ ])"
)
_POSITIVE_HINT = re.compile(
    r"(^|[-_ ])(article|content|main|body|entry|post|text|story)($|[-_ ])"
)

_WS = re.compile(r"\s+")


def _norm_len(s: str) -> int:
    # collapse runs but do NOT strip: per-fragment stripping would undercount
    # inter-element whitespace and inflate link-density on mixed inline runs
    return len(_WS.sub(" ", s))


@dataclass
class NodeStats:
    text_len: int = 0
    link_text_len: int = 0

    @property
    def link_density(self) -> float:
        return self.link_text_len / self.text_len if self.text_len else 0.0


def compute_stats(nodes: list[Node]) -> list[NodeStats]:
    """Bottom-up text-length / link-text-length sweep (single pass: the node
    array is in document order, so children always follow parents; iterate
    in reverse to accumulate bottom-up)."""
    stats = [NodeStats() for _ in nodes]
    for i in range(len(nodes) - 1, -1, -1):
        node = nodes[i]
        if node.tag is None:
            stats[i].text_len = _norm_len(node.text)
        elif node.tag in ("script", "style", "noscript"):
            stats[i] = NodeStats()
        if node.parent >= 0:
            stats[node.parent].text_len += stats[i].text_len
            if node.tag == "a":
                stats[node.parent].link_text_len += stats[i].text_len
            else:
                stats[node.parent].link_text_len += stats[i].link_text_len
    return stats


def hint_score(node: Node) -> int:
    """-1 boilerplate hint, +1 content hint, 0 neutral (class/id tokens)."""
    blob = " ".join([node.attrs.get("id", ""), node.attrs.get("class", "")]).lower()
    if not blob.strip():
        return 0
    if _NEGATIVE_HINT.search(blob):
        return -1
    if _POSITIVE_HINT.search(blob):
        return 1
    return 0


def is_boilerplate(nodes: list[Node], stats: list[NodeStats], idx: int) -> bool:
    """Should this element subtree be dropped entirely?"""
    node = nodes[idx]
    if node.tag is None:
        return False
    if node.tag in DROP_TAGS:
        return True
    if node.tag in CHROME_TAGS:
        parent_tag = nodes[node.parent].tag if node.parent >= 0 else None
        if parent_tag in ("body", "html", "#root", None):
            return True
    hint = hint_score(node)
    if hint < 0:
        return True
    if hint > 0:
        return False
    # link-density drop applies to containers, never to single anchors or
    # content-bearing leaves like headings inside the main content
    if (
        node.tag in ("div", "section", "ul", "ol", "p", "span", "dl")
        and stats[idx].text_len >= 10
        and stats[idx].link_density > LINK_DENSITY_MAX
    ):
        return True
    return False


def select_content_root(nodes: list[Node], stats: list[NodeStats]) -> int:
    """Pick the main-content root node index.

    Preference order: <article> → <main> → [role=main] → best-scoring
    candidate container → <body> → 0. Ties break on document order (lowest
    idx) for determinism.
    """
    for want in ("article", "main"):
        for n in nodes:
            if n.tag == want and stats[n.idx].text_len >= MIN_CANDIDATE_TEXT:
                return n.idx
    for n in nodes:
        if n.tag is not None and n.attrs.get("role", "").lower() == "main":
            return n.idx
    best_idx, best_score = -1, 0.0
    for n in nodes:
        if n.tag not in ("div", "section", "td", "body"):
            continue
        st = stats[n.idx]
        if st.text_len < MIN_CANDIDATE_TEXT:
            continue
        score = st.text_len * (1.0 - st.link_density)
        if hint_score(n) > 0:
            score *= 1.5
        if score > best_score:
            best_idx, best_score = n.idx, score
    if best_idx >= 0:
        return best_idx
    for n in nodes:
        if n.tag == "body":
            return n.idx
    return 0
