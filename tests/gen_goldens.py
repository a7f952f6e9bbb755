"""Generate golden snapshots from fixtures at the CURRENT extractor version.

Run manually ONCE per intentional extractor-behavior change, then commit the
diff; tests byte-compare against these files (the reference's frozen
shared/outputs model). Pages are joined with the A1 rule ("\\n\\n") after a
"<!-- page N -->" marker line per page for multi-page docs.

    python tests/gen_goldens.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tests.fixtures import FIXTURES  # noqa: E402

from zerox_spark.extract.core import ExtractConfig, extract_document  # noqa: E402
from zerox_spark.operators.fold import apply_maintain_format  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).resolve().parent / "goldens"


def render(name: str, payload: bytes) -> str:
    pages = extract_document(payload, None, ExtractConfig())
    folded = apply_maintain_format(
        [(p.page_no, p.markdown, p.status) for p in pages]
    )
    parts = []
    for page_no, markdown, status in folded:
        parts.append(f"<!-- page {page_no} status={status} -->\n{markdown}")
    return "\n\n".join(parts) + "\n"


def main() -> None:
    GOLDEN_DIR.mkdir(exist_ok=True)
    for name, payload in sorted(FIXTURES.items()):
        out = GOLDEN_DIR / f"{name}.md"
        out.write_text(render(name, payload), encoding="utf-8")
        print("wrote", out)


if __name__ == "__main__":
    main()
