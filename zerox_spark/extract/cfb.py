"""Compound File Binary (CFB/OLE2) container — stdlib reader + writer.

The reference pushes every legacy Office document through libreoffice
(convertFileToPdf, node-zerox/src/utils/file.ts:129-150) after sniffing the
CFB magic (checkIsCFBFile, file.ts:89-92). No office runtime ships in this
container, but CFB is a fully documented public format ([MS-CFB]): a FAT
filesystem-in-a-file with 512-byte sectors, a directory tree, and a
mini-stream for small streams. This module implements just enough of it —
header, DIFAT→FAT, directory, miniFAT — to pull named streams out
(``Workbook`` for .xls, ``WordDocument``/``1Table`` for .doc; see
legacy_office.py) and to write well-formed containers for the deterministic
test corpus.

Error tolerance: every structural violation raises ValueError; extract/
core.py contains it as an ERROR row in IGNORE mode.
"""

from __future__ import annotations

import io
import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
SECTOR = 512
MINI_SECTOR = 64
MINI_CUTOFF = 4096
_MAX_SECTORS = 1 << 20  # 512 MB container cap — a cycle/bomb guard


def is_cfb(payload: bytes) -> bool:
    return payload[:8] == MAGIC


class CfbReader:
    """Parse a CFB container; expose streams by name (case-sensitive)."""

    def __init__(self, payload: bytes) -> None:
        if not is_cfb(payload):
            raise ValueError("not a CFB container")
        if len(payload) < SECTOR:
            raise ValueError("CFB truncated before header end")
        self._data = payload
        (
            _minor,
            major,
            _byte_order,
            sector_shift,
            _mini_shift,
        ) = struct.unpack_from("<HHHHH", payload, 24)
        if major not in (3, 4) or sector_shift not in (9, 12):
            raise ValueError(f"unsupported CFB version {major}")
        self._sector = 1 << sector_shift
        (
            _num_dir,
            num_fat,
            first_dir,
            _tsig,
            _cutoff,
            first_minifat,
            num_minifat,
            first_difat,
            num_difat,
        ) = struct.unpack_from("<IIIIIIIII", payload, 40)
        fat_sectors = list(struct.unpack_from("<109I", payload, 76))
        # DIFAT extension sectors (rare; large files). num_difat is
        # ATTACKER-CONTROLLED header data: bound the walk by the real
        # container capacity and reject revisits, or a crafted self-cycle
        # (sector whose next-pointer is itself) spins for ~4e9 iterations
        # growing fat_sectors unboundedly — the containment contract
        # requires ValueError, never a pinned core.
        difat_cap = min(num_difat, len(payload) // self._sector + 1)
        visited: set[int] = set()
        seen = 0
        sid = first_difat
        while sid not in (ENDOFCHAIN, FREESECT) and seen < difat_cap:
            if sid in visited:
                raise ValueError(f"DIFAT sector cycle at {sid}")
            visited.add(sid)
            block = self._sector_bytes(sid)
            ints = struct.unpack(f"<{self._sector // 4}I", block)
            fat_sectors.extend(ints[:-1])
            sid = ints[-1]
            seen += 1
        self._fat = self._load_table(
            [s for s in fat_sectors if s != FREESECT][:num_fat]
        )
        self._minifat = self._load_table(
            self._chain_sectors(first_minifat, self._fat)
        )
        self._dir_entries = self._load_directory(first_dir)
        root = next(
            (e for e in self._dir_entries if e["type"] == 5), None
        )
        if root is None:
            raise ValueError("CFB has no root entry")
        self._mini_stream = self._read_chain(
            root["start"], root["size"], self._fat
        )

    # -- low level ---------------------------------------------------------
    def _sector_bytes(self, sid: int) -> bytes:
        if sid >= _MAX_SECTORS:
            raise ValueError(f"sector id out of range: {sid}")
        # sector 0 starts one sector-size past offset 0 (v3: right after the
        # 512-byte header; v4: the 512-byte header is padded to 4096)
        off = (sid + 1) * self._sector
        chunk = self._data[off : off + self._sector]
        if len(chunk) < self._sector:
            raise ValueError(f"sector {sid} beyond end of file")
        return chunk

    def _load_table(self, sectors: list[int]) -> list[int]:
        out: list[int] = []
        for sid in sectors:
            out.extend(
                struct.unpack(f"<{self._sector // 4}I", self._sector_bytes(sid))
            )
        return out

    def _chain_sectors(self, start: int, fat: list[int]) -> list[int]:
        chain, sid = [], start
        while sid != ENDOFCHAIN:
            if sid in (FREESECT, FATSECT) or sid >= len(fat):
                raise ValueError(f"broken sector chain at {sid}")
            chain.append(sid)
            if len(chain) > _MAX_SECTORS:
                raise ValueError("sector chain cycle")
            sid = fat[sid]
        return chain

    def _read_chain(self, start: int, size: int, fat: list[int]) -> bytes:
        if size == 0 or start == ENDOFCHAIN:
            return b""
        out = b"".join(
            self._sector_bytes(s) for s in self._chain_sectors(start, fat)
        )
        return out[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        chain, sid = [], start
        while sid != ENDOFCHAIN:
            if sid == FREESECT or sid >= len(self._minifat):
                raise ValueError(f"broken mini chain at {sid}")
            chain.append(sid)
            if len(chain) > _MAX_SECTORS:
                raise ValueError("mini chain cycle")
            sid = self._minifat[sid]
        out = b"".join(
            self._mini_stream[s * MINI_SECTOR : (s + 1) * MINI_SECTOR]
            for s in chain
        )
        return out[:size]

    def _load_directory(self, first_dir: int) -> list[dict]:
        raw = b"".join(
            self._sector_bytes(s)
            for s in self._chain_sectors(first_dir, self._fat)
        )
        entries = []
        for off in range(0, len(raw), 128):
            entry = raw[off : off + 128]
            if len(entry) < 128:
                break
            name_len = struct.unpack_from("<H", entry, 64)[0]
            if name_len < 2 or name_len > 64:
                continue
            name = entry[: name_len - 2].decode("utf-16-le", "replace")
            etype = entry[66]
            start, size_lo = struct.unpack_from("<II", entry, 116)
            entries.append(
                {"name": name, "type": etype, "start": start, "size": size_lo}
            )
        return entries

    # -- public ------------------------------------------------------------
    def stream_names(self) -> list[str]:
        return [e["name"] for e in self._dir_entries if e["type"] == 2]

    def read_stream(self, name: str) -> bytes:
        for e in self._dir_entries:
            if e["type"] == 2 and e["name"] == name:
                if e["size"] < MINI_CUTOFF:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"], self._fat)
        raise ValueError(f"CFB stream not found: {name}")


# ---------------------------------------------------------------------------
# writer (test-corpus synthesis; v3, 512-byte sectors)


def write_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal deterministic CFB v3 writer. Small streams (<4096) go to the
    mini stream (so the reader's miniFAT path is exercised by the synth
    corpus); big ones get regular chains."""
    big = [(n, d) for n, d in streams if len(d) >= MINI_CUTOFF]
    small = [(n, d) for n, d in streams if len(d) < MINI_CUTOFF]

    def pad(b: bytes, unit: int) -> bytes:
        rem = len(b) % unit
        return b + b"\x00" * (unit - rem) if rem else b

    # mini stream layout
    mini_data = b""
    mini_starts: dict[str, int] = {}
    minifat: list[int] = []
    for name, data in small:
        start = len(mini_data) // MINI_SECTOR
        mini_starts[name] = start if data else ENDOFCHAIN
        if not data:
            # no sector allocated → no miniFAT entry either: appending an
            # ENDOFCHAIN here would shift every later small stream's miniFAT
            # entries one past their sector ids (the start is already
            # recorded as ENDOFCHAIN above)
            continue
        padded = pad(data, MINI_SECTOR)
        n = len(padded) // MINI_SECTOR
        mini_data += padded
        minifat.extend(list(range(start + 1, start + n)) + [ENDOFCHAIN])

    # sector plan: [dir]*, [minifat]*, [ministream]*, [big streams]*, [fat]*
    sectors: list[bytes] = []
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        if not data:
            return ENDOFCHAIN
        padded = pad(data, SECTOR)
        start = len(sectors)
        n = len(padded) // SECTOR
        for i in range(n):
            sectors.append(padded[i * SECTOR : (i + 1) * SECTOR])
        fat.extend(list(range(start + 1, start + n)) + [ENDOFCHAIN])
        return start

    # directory entries: root + streams (flat red-black fiction: simple
    # left/right = NOSTREAM, root.child = first entry; readers that walk the
    # full directory array — like ours and olefile — are fine with this)
    NOSTREAM = 0xFFFFFFFF

    def dir_entry(
        name: str, etype: int, start: int, size: int, child: int = NOSTREAM,
        left: int = NOSTREAM, right: int = NOSTREAM,
    ) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        if len(raw_name) > 64:
            raise ValueError(f"stream name too long: {name}")
        e = bytearray(128)
        e[: len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<II", e, 116, start, size)
        return bytes(e)

    # reserve directory sector space first (positions are needed in entries,
    # but entry contents need stream starts → two-phase: compute sizes now,
    # patch starts later)
    n_dir_entries = 1 + len(streams)
    n_dir_sectors = (n_dir_entries * 128 + SECTOR - 1) // SECTOR
    dir_start = 0
    for _ in range(n_dir_sectors):
        sectors.append(b"")  # placeholder
    fat.extend(list(range(1, n_dir_sectors)) + [ENDOFCHAIN])

    minifat_bytes = b"".join(struct.pack("<I", v) for v in minifat)
    minifat_start = add_chain(minifat_bytes)
    n_minifat_sectors = (
        0 if not minifat_bytes else (len(pad(minifat_bytes, SECTOR)) // SECTOR)
    )
    mini_stream_start = add_chain(mini_data)

    big_starts: dict[str, int] = {}
    for name, data in big:
        big_starts[name] = add_chain(data)

    # build directory with a simple balanced-enough tree: root.child → first
    # stream entry; stream i: right sibling = i+1 (degenerate tree — valid
    # per spec readers that do array scans; acceptable for the test corpus)
    entries = [
        dir_entry(
            "Root Entry", 5, mini_stream_start, len(mini_data),
            child=1 if streams else NOSTREAM,
        )
    ]
    for i, (name, data) in enumerate(streams):
        start = (
            big_starts[name] if len(data) >= MINI_CUTOFF else mini_starts[name]
        )
        right = i + 2 if i + 1 < len(streams) else NOSTREAM
        entries.append(dir_entry(name, 2, start, len(data), right=right))
    dir_bytes = pad(b"".join(entries), SECTOR)
    for i in range(n_dir_sectors):
        sectors[dir_start + i] = dir_bytes[i * SECTOR : (i + 1) * SECTOR]

    # FAT sectors (self-referencing FATSECT marks)
    ints_per_sector = SECTOR // 4
    n_fat_sectors = 1
    while (len(fat) + n_fat_sectors + ints_per_sector - 1) // ints_per_sector > n_fat_sectors:
        n_fat_sectors += 1
    fat_start = len(sectors)
    full_fat = fat + [FATSECT] * n_fat_sectors
    full_fat += [FREESECT] * (n_fat_sectors * ints_per_sector - len(full_fat))
    for i in range(n_fat_sectors):
        sectors.append(
            b"".join(
                struct.pack("<I", v)
                for v in full_fat[i * ints_per_sector : (i + 1) * ints_per_sector]
            )
        )

    header = bytearray(SECTOR)
    header[:8] = MAGIC
    struct.pack_into("<HHHHH", header, 24, 0x3E, 3, 0xFFFE, 9, 6)
    struct.pack_into(
        "<IIIIIIIII",
        header,
        40,
        0,  # num dir sectors (v3: 0)
        n_fat_sectors,
        dir_start,
        0,
        MINI_CUTOFF,
        minifat_start if minifat_bytes else ENDOFCHAIN,
        n_minifat_sectors,
        ENDOFCHAIN,  # no DIFAT extension
        0,
    )
    difat = [fat_start + i for i in range(n_fat_sectors)]
    difat += [FREESECT] * (109 - len(difat))
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)
