"""Minimal pure-stdlib reader for Compound File Binary (OLE2) containers
and the Outlook ``.msg`` layout on top of it.

CFB is the publicly documented [MS-CFB] format: a 512-byte header, a FAT
of sector chains, a mini-FAT for streams under 4096 bytes (stored inside
the root entry's mini stream), and a directory of 128-byte entries
forming a red-black tree. An Outlook ``.msg`` stores each MAPI property
as a stream named ``__substg1.0_<tag><type>`` (type ``001F`` = UTF-16LE
string, ``001E`` = 8-bit string, ``0102`` = binary), with attachments
under ``__attach_version1.0_#NNNNNNNN`` storages — all public structure
(reference parsers.py:103-109 reads the same fields via extract_msg,
which remains the full-fidelity tier when importable).

Supported: v3 (512 B sectors) and v4 (4096 B sectors) containers, FAT
chains incl. DIFAT overflow, mini-FAT streams, directory tree walk.
Not supported (documented): encrypted/IRM messages, RTF-compressed
bodies (``1009`` streams are returned as raw bytes by the caller's
choice), property-stream type coercion beyond strings/binary.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
FREESECT = 0xFFFFFFFF
ENDOFCHAIN = 0xFFFFFFFE
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF


class DirEntry:
    __slots__ = (
        "name", "obj_type", "left", "right", "child", "start", "size",
        "index", "path",
    )

    def __init__(self, raw: bytes, index: int):
        name_len = struct.unpack_from("<H", raw, 64)[0]
        self.name = raw[: max(0, name_len - 2)].decode(
            "utf-16-le", "replace"
        )
        self.obj_type = raw[66]  # 0 unknown, 1 storage, 2 stream, 5 root
        self.left, self.right, self.child = struct.unpack_from(
            "<III", raw, 68
        )
        self.start = struct.unpack_from("<I", raw, 116)[0]
        self.size = struct.unpack_from("<Q", raw, 120)[0]
        self.index = index
        self.path = ()  # filled by the tree walk


class CfbFile:
    """Parse ``data`` (a whole OLE2 container) into navigable streams."""

    def __init__(self, data: bytes):
        if data[:8] != MAGIC:
            raise ValueError("not an OLE2/CFB container")
        self._data = data
        (
            sector_shift,
            mini_shift,
        ) = struct.unpack_from("<HH", data, 30)
        self.sector_size = 1 << sector_shift
        self.mini_size = 1 << mini_shift
        self.n_fat = struct.unpack_from("<I", data, 44)[0]
        self.first_dir = struct.unpack_from("<I", data, 48)[0]
        self.mini_cutoff = struct.unpack_from("<I", data, 56)[0]
        self.first_minifat = struct.unpack_from("<I", data, 60)[0]
        self.n_minifat = struct.unpack_from("<I", data, 64)[0]
        first_difat = struct.unpack_from("<I", data, 68)[0]
        n_difat = struct.unpack_from("<I", data, 72)[0]

        difat = list(struct.unpack_from("<109I", data, 76))
        sect = first_difat
        for _ in range(n_difat):
            if sect in (ENDOFCHAIN, FREESECT):
                break
            raw = self._sector(sect)
            entries = struct.unpack(
                f"<{self.sector_size // 4}I", raw
            )
            difat.extend(entries[:-1])
            sect = entries[-1]

        self._fat: list[int] = []
        per = self.sector_size // 4
        for s in difat:
            if s in (FREESECT, ENDOFCHAIN):
                continue
            self._fat.extend(struct.unpack(f"<{per}I", self._sector(s)))

        # directory
        self.entries: list[DirEntry] = []
        for raw in self._chunks(self._read_chain(self.first_dir), 128):
            if len(raw) == 128:
                self.entries.append(DirEntry(raw, len(self.entries)))
        self.root = self.entries[0]

        # mini FAT + mini stream
        self._minifat: list[int] = []
        if self.first_minifat not in (ENDOFCHAIN, FREESECT):
            raw = self._read_chain(self.first_minifat)
            self._minifat = list(
                struct.unpack(f"<{len(raw) // 4}I", raw)
            )
        self._ministream = self._read_chain(self.root.start)[
            : self.root.size
        ]

        self._walk(self.root, ())

    # -- sector plumbing ---------------------------------------------------
    def _sector(self, n: int) -> bytes:
        off = (n + 1) * self.sector_size
        return self._data[off: off + self.sector_size]

    @staticmethod
    def _chunks(buf: bytes, size: int):
        for i in range(0, len(buf), size):
            yield buf[i: i + size]

    def _read_chain(self, start: int) -> bytes:
        out, sect, seen = [], start, set()
        while sect not in (ENDOFCHAIN, FREESECT) and sect not in seen:
            seen.add(sect)
            out.append(self._sector(sect))
            if sect >= len(self._fat):
                break
            sect = self._fat[sect]
        return b"".join(out)

    def _read_minichain(self, start: int) -> bytes:
        out, sect, seen = [], start, set()
        while sect not in (ENDOFCHAIN, FREESECT) and sect not in seen:
            seen.add(sect)
            off = sect * self.mini_size
            out.append(self._ministream[off: off + self.mini_size])
            if sect >= len(self._minifat):
                break
            sect = self._minifat[sect]
        return b"".join(out)

    # -- directory tree ----------------------------------------------------
    def _walk(self, entry: DirEntry, path: tuple) -> None:
        """Assign each directory entry its storage path. Fully iterative
        with ONE seen set across the whole tree: a corrupt container whose
        child pointers form a cycle (A.child -> B, B.child -> A) must
        terminate, not exhaust the stack — a recursive walk with per-level
        cycle detection still recurses unboundedly through children."""
        entry.path = path
        seen = {entry.index}
        stack = []
        if entry.child != NOSTREAM:
            stack.append((
                self.entries[entry.child],
                path if entry.obj_type == 5 else path + (entry.name,),
            ))
        while stack:
            e, parent = stack.pop()
            if e.index in seen:
                continue
            seen.add(e.index)
            e.path = parent + (e.name,)
            for nxt in (e.left, e.right):
                if nxt != NOSTREAM:
                    stack.append((self.entries[nxt], parent))
            if e.child != NOSTREAM:
                stack.append((self.entries[e.child], e.path))

    # -- public API --------------------------------------------------------
    def stream_names(self) -> list[tuple]:
        return [e.path for e in self.entries if e.obj_type == 2]

    def read_stream(self, path: tuple | str) -> bytes:
        if isinstance(path, str):
            path = (path,)
        for e in self.entries:
            if e.obj_type == 2 and e.path == tuple(path):
                if e.size < self.mini_cutoff:
                    return self._read_minichain(e.start)[: e.size]
                return self._read_chain(e.start)[: e.size]
        raise KeyError(f"no stream {path!r}")


# ---------------------------------------------------------------------------
# Outlook .msg on top of CFB
# ---------------------------------------------------------------------------

_STR_PROPS = {  # tag -> label order for the text compose
    "0037": "subject",
    "0C1A": "sender",
    "0E04": "to",
    "1000": "body",
}


def _msg_string(cfb: CfbFile, tag: str, prefix: tuple = ()) -> str | None:
    for type_suffix, enc in (("001F", "utf-16-le"), ("001E", "cp1252")):
        try:
            raw = cfb.read_stream(prefix + (f"__substg1.0_{tag}{type_suffix}",))
        except KeyError:
            continue
        return raw.decode(enc, "replace")
    return None


def msg_to_text(content: bytes) -> str:
    """Subject, sender, recipient display and body of an Outlook ``.msg``
    — the same four fields (and the same join) the extract_msg tier
    surfaces, so swapping tiers never changes downstream text shape."""
    cfb = CfbFile(content)
    parts = [_msg_string(cfb, tag) for tag in _STR_PROPS]
    return "\n".join(p for p in parts if p)


def msg_attachments(content: bytes) -> list[tuple[str, bytes]]:
    """(filename, payload) per attachment storage
    (``__attach_version1.0_#NNNNNNNN``): long filename property ``3707``,
    fallback ``3704``, payload ``37010102`` (reference parsers.py:103-109
    writes these to disk; we return rows)."""
    cfb = CfbFile(content)
    out = []
    prefixes = sorted(
        {
            e.path[:1]
            for e in cfb.entries
            if e.path and e.path[0].startswith("__attach_version1.0_#")
        }
    )
    for prefix in prefixes:
        name = (
            _msg_string(cfb, "3707", prefix)
            or _msg_string(cfb, "3704", prefix)
            or prefix[0]
        )
        try:
            payload = cfb.read_stream(prefix + ("__substg1.0_37010102",))
        except KeyError:
            payload = b""
        out.append((name, payload))
    return out
