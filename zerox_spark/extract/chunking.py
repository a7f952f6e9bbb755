"""Giant-document chunking — the full splitTallImage analog.

The reference splits pathological tall images into ~aspect-ratio many
sections, cutting at the nearest whitespace valley within a search radius of
the uniform target, with a minimum gap past the previous cut and a clamped
fallback (node-zerox/src/utils/image.ts:116-231: ASPECT_RATIO_THRESHOLD=5,
radius = min(150, sectionHeight/3), ≥50px past previous, fallback clamp).

Here the same algorithm runs in markdown space: a document whose single-page
markdown exceeds ``chunk_chars`` splits into ``ceil(len/chunk_chars)`` pages,
cutting at the nearest *block boundary* (span edges — the text-density
valleys of a markdown document) within ``radius = min(chunk_chars/4,
section/3)`` of each uniform target, at least ``chunk_chars/10`` past the
previous cut, with a clamped fallback when no boundary qualifies. Salting
spreads heavy rows across partitions (operators/repartition.py); chunking
bounds the *output page model* of one heavy row — together they are the
engine's complete skew story (SURVEY.md §7 hard part c).
"""

from __future__ import annotations

import math

Span = tuple[str, int, int, float]


def chunk_blocks(
    markdown: str, spans: list[Span], chunk_chars: int
) -> list[tuple[str, list[Span]]]:
    """Split (markdown, spans) into ≥1 (markdown, spans) pages at block
    boundaries. Blocks are never split; offsets are re-based per page."""
    total = len(markdown)
    if total <= chunk_chars or len(spans) < 2:
        return [(markdown, spans)]
    n_sections = math.ceil(total / chunk_chars)
    # candidate cut positions: block end offsets (exclusive of the last)
    candidates = [end for _, _, end, _ in spans[:-1]]
    radius = min(chunk_chars // 4, total // n_sections // 3)
    min_gap = max(1, chunk_chars // 10)

    cuts: list[int] = []
    prev = 0
    for i in range(1, n_sections):
        target = i * total // n_sections
        viable = [
            c for c in candidates
            if abs(c - target) <= radius and c >= prev + min_gap
        ]
        if viable:
            cut = min(viable, key=lambda c: (abs(c - target), c))
        else:
            # clamped fallback (image.ts:198-205): nearest candidate past
            # the minimum gap, else skip this section boundary
            later = [c for c in candidates if c >= prev + min_gap]
            if not later:
                break
            cut = min(later, key=lambda c: (abs(c - target), c))
            # (no duplicate-cut guard needed: later only holds candidates
            # ≥ prev + min_gap and prev == cuts[-1], so cut > cuts[-1])
        if cut <= prev or cut >= total:
            continue
        cuts.append(cut)
        prev = cut

    if not cuts:
        return [(markdown, spans)]

    pages: list[tuple[str, list[Span]]] = []
    bounds = [0, *cuts, total]
    for lo, hi in zip(bounds, bounds[1:]):
        page_spans = [
            (k, s - lo, e - lo, sc) for (k, s, e, sc) in spans if lo <= s and e <= hi
        ]
        text = markdown[lo:hi]
        # strip the inter-block "\n\n" seam at the edges
        stripped = text.strip("\n")
        shift = len(text) - len(text.lstrip("\n"))
        if shift:
            page_spans = [(k, s - shift, e - shift, sc) for k, s, e, sc in page_spans]
        pages.append((stripped, page_spans))
    return pages
