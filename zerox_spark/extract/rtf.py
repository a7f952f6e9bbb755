"""RTF extraction — minimal stdlib group/control-word parser.

The reference lists .rtf as a supported input type
(/root/reference/README.md:495), converted through libreoffice
(convertFileToPdf, node-zerox/src/utils/file.ts:129-150). RTF is a public
plain-text-with-markup format; this parser implements the subset that
carries the text:

- groups ``{...}`` with state save/restore; ``{\\*...}`` and known
  non-content destinations (fonttbl, colortbl, stylesheet, info, pict, …)
  are skipped entirely;
- control words: ``\\par`` ends a paragraph, ``\\page`` ends a page,
  ``\\tab``/``\\line``/``\\~`` emit a space, ``\\'hh`` is a cp1252 byte,
  ``\\uN`` a unicode char (with ``\\ucN`` fallback-skip semantics),
  ``\\binN`` skips N raw bytes; ``\\\\ \\{ \\}`` are literals; everything
  else is formatting and is dropped;
- raw CR/LF in the source are markup whitespace, not content.

Page model: ``\\page`` splits pages, ``\\par`` splits paragraphs, each
paragraph is a ``para`` block — the .doc text-pipeline shape
(legacy_office.doc_to_pages). Output is bounded by input size by
construction (every escape shrinks or is 1:1; ``\\bin`` payloads are
skipped, not emitted), so no separate output budget is needed.

Error tolerance: anything structurally hopeless (not starting ``{\\rtf``,
no extractable content) raises ValueError into the contained-ERROR path;
mangled markup degrades to dropped formatting, never a crash.
"""

from __future__ import annotations

import re

from zerox_spark.extract.markdown import Block, join_blocks

_CW = re.compile(rb"([a-z]{1,32})(-?\d{1,10})?\ ?")
_WS_RUN = re.compile(r"\s+")
_LONE_SURROGATE = re.compile("[\ud800-\udfff]")

# non-content destination groups (text inside never renders)
_DESTINATIONS = frozenset(
    {
        b"fonttbl",
        b"colortbl",
        b"stylesheet",
        b"filetbl",
        b"listtable",
        b"listoverridetable",
        b"info",
        b"pict",
        b"object",
        b"themedata",
        b"generator",
        b"header",
        b"headerl",
        b"headerr",
        b"headerf",
        b"footer",
        b"footerl",
        b"footerr",
        b"footerf",
        b"footnote",
        b"xmlnstbl",
        b"rsidtbl",
    }
)


def is_rtf(payload: bytes) -> bool:
    return payload[:5] == b"{\\rtf"


def rtf_to_pages(
    payload: bytes,
) -> list[tuple[int, str, list[tuple[str, int, int, float]]]]:
    if not is_rtf(payload):
        raise ValueError("not an RTF payload")
    data = payload
    i, n = 0, len(data)
    stack: list[tuple[bool, int]] = []
    ignorable = False
    uc = 1  # \ucN: fallback chars to skip after \uN
    pending_uskip = 0
    pages: list[list[str]] = [[]]
    cur: list[str] = []

    def emit(ch: str) -> None:
        nonlocal pending_uskip
        if ignorable:
            return
        if pending_uskip:
            pending_uskip -= 1
            return
        cur.append(ch)

    def end_para() -> None:
        text = _WS_RUN.sub(" ", "".join(cur)).strip()
        cur.clear()
        # any surrogate NOT consumed by pair-combination below is lone —
        # replace it (a lone surrogate can't round-trip through Arrow/UTF-8)
        text = _LONE_SURROGATE.sub("�", text)
        if text:
            pages[-1].append(text)

    def end_page() -> None:
        end_para()
        if pages[-1]:
            pages.append([])

    while i < n:
        b = data[i]
        if b == 0x7B:  # {
            stack.append((ignorable, uc))
            i += 1
            if data[i : i + 2] == b"\\*":
                ignorable = True
                i += 2
        elif b == 0x7D:  # }
            if stack:
                ignorable, uc = stack.pop()
            i += 1
        elif b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c = data[i]
            if c in b"\\{}":
                emit(chr(c))
                i += 1
            elif c == 0x27:  # \'hh
                try:
                    ch = bytes([int(data[i + 1 : i + 3], 16)]).decode(
                        "cp1252", "replace"
                    )
                except ValueError:
                    ch = ""
                if ch:
                    emit(ch)
                i += 3
            elif c == 0x7E:  # \~ non-breaking space
                emit(" ")
                i += 1
            elif c in b"-_:|":  # optional hyphen / subentry markers
                i += 1
            elif c in (0x0D, 0x0A):  # \<CR/LF> = \par alias
                if not ignorable:
                    end_para()
                i += 1
            else:
                m = _CW.match(data, i)
                if m is None:
                    i += 1  # bare control symbol we don't know — drop
                    continue
                word, param = m.group(1), m.group(2)
                i = m.end()
                # break control words are gated on `ignorable` like emit():
                # a \par inside a skipped destination (footnote, header)
                # must not flush/split the surrounding visible paragraph
                if word == b"par":
                    if not ignorable:
                        end_para()
                elif word == b"page":
                    if not ignorable:
                        end_page()
                elif word in (b"tab", b"line", b"emspace", b"enspace"):
                    emit(" ")
                elif word == b"u":
                    cp = int(param or 0)
                    if cp < 0:
                        cp += 65536
                    if not ignorable:
                        if pending_uskip:
                            pending_uskip -= 1
                        else:
                            # non-BMP chars arrive as \u surrogate pairs:
                            # combine a low surrogate with a pending high one
                            if (
                                0xDC00 <= cp <= 0xDFFF
                                and cur
                                and "\ud800" <= cur[-1] <= "\udbff"
                            ):
                                cur[-1] = chr(
                                    0x10000
                                    + ((ord(cur[-1]) - 0xD800) << 10)
                                    + (cp - 0xDC00)
                                )
                            else:
                                cur.append(chr(cp))
                            pending_uskip = uc
                elif word == b"uc":
                    uc = max(0, int(param or 1))
                elif word == b"bin":
                    i += max(0, int(param or 0))  # raw bytes: skip, never emit
                elif word in _DESTINATIONS:
                    ignorable = True
                # every other control word is formatting — dropped
        elif b in (0x0D, 0x0A):
            i += 1  # source line breaks are markup whitespace
        else:
            # "replace", not strict: 0x81/0x8D/0x8F/0x90/0x9D are undefined
            # in cp1252 and a strict decode would ERROR the whole document,
            # violating the degrade-don't-crash contract
            emit(
                chr(b) if b < 0x80 else bytes([b]).decode("cp1252", "replace")
            )
            i += 1

    end_para()
    out = []
    for paras in pages:
        if not paras:
            continue
        markdown, spans = join_blocks([Block("para", p) for p in paras])
        out.append((len(out) + 1, markdown, spans))
    if not out:
        raise ValueError("rtf produced no content")
    return out
