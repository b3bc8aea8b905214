"""Independent [MS-CFB] emitter — the second producer for CFB goldens.

tests/test_cfb.py already golden-tests sources/cfb.py against a minimal
writer, but that writer shares this repo's idioms AND only exercises the
easy half of the format: v3 512-byte sectors, one FAT sector, right-sibling
directory chains, every stream in the mini stream. This emitter is built
from the [MS-CFB] spec text with the OPPOSITE structural choices, so
reader/emitter agreement is evidence rather than a shared assumption
(the same role tests/ecma376_emitter.py plays for OOXML):

- the directory is a balanced binary search tree keyed by the spec's
  name ordering (length first, then upper-cased UTF-16 code units) —
  left AND right pointers carry real structure;
- sector chains are allocated round-robin across all chains, so no
  chain is contiguous and FAT-following is exercised for real;
- v3 (512 B) and v4 (4096 B, 512-byte header zero-padded to one sector)
  containers;
- streams at or over the 4096-byte mini cutoff live in regular FAT
  chains; only small streams go to the mini stream;
- more than 109 FAT sectors spills into DIFAT sectors chained from the
  header (``difat_pad`` forces this without callers hand-sizing data).

Real-producer quirks carried over from observed Outlook output: minor
version 0x3E, little-endian byte-order mark 0xFFFE, trailing directory
sectors padded with type-0 free entries, and a ``__properties_version1.0``
binary stream in the .msg helper that text extraction must skip.

The reader under test (sources/cfb.py) shares no code with this file.
"""

from __future__ import annotations

import struct

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC
NOSTREAM = 0xFFFFFFFF
MINI_CUTOFF = 4096
MINI_SIZE = 64


class _Entry:
    def __init__(self, name, obj_type, start=0, size=0):
        self.name = name
        self.obj_type = obj_type  # 1 storage, 2 stream, 5 root
        self.start = start
        self.size = size
        self.left = NOSTREAM
        self.right = NOSTREAM
        self.child = NOSTREAM
        self.index = None

    def pack(self) -> bytes:
        raw = bytearray(128)
        enc = self.name.encode("utf-16-le")
        raw[: len(enc)] = enc
        struct.pack_into("<H", raw, 64, len(enc) + 2)
        raw[66] = self.obj_type
        raw[67] = 1  # black — color is irrelevant to ordering semantics
        struct.pack_into("<III", raw, 68, self.left, self.right, self.child)
        struct.pack_into("<I", raw, 116, self.start)
        struct.pack_into("<Q", raw, 120, self.size)
        return bytes(raw)


def _cfb_name_key(name: str):
    # [MS-CFB] 2.6.4: shorter names sort first; equal lengths compare by
    # upper-cased UTF-16 code units
    units = struct.unpack(f"<{len(name)}H", name.upper().encode("utf-16-le"))
    return (len(name.encode("utf-16-le")) + 2, units)


def _build_bst(entries: list[_Entry]) -> int:
    """Link ``entries`` (siblings of one storage) into a balanced BST by
    CFB name order; returns the root entry's directory index."""
    ordered = sorted(entries, key=lambda e: _cfb_name_key(e.name))

    def build(lo: int, hi: int) -> int:
        if lo > hi:
            return NOSTREAM
        mid = (lo + hi) // 2
        node = ordered[mid]
        node.left = build(lo, mid - 1)
        node.right = build(mid + 1, hi)
        return node.index

    return build(0, len(ordered) - 1)


def emit_cfb(streams, version: int = 3, difat_pad: int = 0) -> bytes:
    """Serialize ``streams`` — a list of ``(path_tuple, bytes)`` — into a
    CFB container. Storages are created for every path prefix (any
    depth). ``version`` is 3 (512 B sectors) or 4 (4096 B). ``difat_pad``
    appends one hidden padding stream large enough to force at least that
    many FAT sectors (>109 spills the sector map into DIFAT sectors).
    """
    if version not in (3, 4):
        raise ValueError("CFB version must be 3 or 4")
    sector_size = 512 if version == 3 else 4096
    fat_per = sector_size // 4

    streams = list(streams)
    if difat_pad:
        # one stream spanning difat_pad * fat_per sectors guarantees the
        # FAT itself needs >= difat_pad sectors
        pad_len = difat_pad * fat_per * sector_size
        streams.append((("__difat_pad",), b"\xa5" * pad_len))

    # ---- directory entries -------------------------------------------------
    root = _Entry("Root Entry", 5)
    entries: list[_Entry] = [root]
    storages: dict[tuple, _Entry] = {(): root}
    stream_entries: dict[tuple, _Entry] = {}
    for path, data in streams:
        path = tuple(path)
        if path in stream_entries:
            raise ValueError(f"duplicate stream path {path!r}")
        for i in range(1, len(path)):
            prefix = path[:i]
            if prefix not in storages:
                ent = _Entry(prefix[-1], 1)
                entries.append(ent)
                storages[prefix] = ent
        ent = _Entry(path[-1], 2, size=len(data))
        entries.append(ent)
        stream_entries[path] = ent
    for i, e in enumerate(entries):
        e.index = i

    # link each storage's members into a balanced BST
    members: dict[tuple, list[_Entry]] = {p: [] for p in storages}
    for path, ent in stream_entries.items():
        members[path[:-1]].append(ent)
    for prefix, ent in storages.items():
        if prefix:
            members[prefix[:-1]].append(ent)
    for prefix, kids in members.items():
        storages[prefix].child = _build_bst(kids) if kids else NOSTREAM

    # ---- mini stream (small streams) + mini FAT ----------------------------
    mini = bytearray()
    minifat: list[int] = []
    for path, data in streams:
        ent = stream_entries[tuple(path)]
        if len(data) >= MINI_CUTOFF:
            continue
        first = len(mini) // MINI_SIZE
        n = max(1, -(-len(data) // MINI_SIZE))
        mini.extend(data.ljust(n * MINI_SIZE, b"\x00"))
        minifat.extend(range(first + 1, first + n))
        minifat.append(ENDOFCHAIN)
        ent.start = first
    root.size = len(mini)

    # ---- carve every FAT-allocated chain into sector payloads --------------
    def to_sectors(buf: bytes) -> list[bytes]:
        buf = bytes(buf)
        n = max(1, -(-len(buf) // sector_size))
        buf = buf.ljust(n * sector_size, b"\x00")
        return [buf[i: i + sector_size] for i in range(0, len(buf), sector_size)]

    dir_per = sector_size // 128
    n_dir_sect = -(-len(entries) // dir_per)
    dir_payload = b"".join(e.pack() for e in entries).ljust(
        n_dir_sect * sector_size, b"\x00"
    )

    minifat_payload = b"".join(struct.pack("<I", v) for v in minifat)

    chains: list[tuple[str, list[bytes]]] = [("dir", to_sectors(dir_payload))]
    if minifat:
        chains.append(("minifat", to_sectors(minifat_payload)))
    if mini:
        chains.append(("ministream", to_sectors(mini)))
    big_keys: list[tuple] = []
    for path, data in streams:
        if len(data) >= MINI_CUTOFF:
            key = tuple(path)
            big_keys.append(key)
            chains.append((("big",) + key, to_sectors(data)))

    # ---- round-robin sector allocation: no chain is contiguous -------------
    queues = [(name, list(sects)) for name, sects in chains]
    order: list[tuple] = []  # (chain_name, payload_bytes)
    while any(q for _n, q in queues):
        for name, q in queues:
            if q:
                order.append((name, q.pop(0)))
    n_payload = len(order)
    chain_sectors: dict = {}
    for sect_id, (name, _payload) in enumerate(order):
        chain_sectors.setdefault(name, []).append(sect_id)

    # ---- FAT / DIFAT sizing fixpoint ---------------------------------------
    n_fat, n_difat = 1, 0
    while True:
        total = n_payload + n_fat + n_difat
        need_fat = -(-total // fat_per)
        need_difat = 0 if need_fat <= 109 else -(-(need_fat - 109) // (fat_per - 1))
        if (need_fat, need_difat) == (n_fat, n_difat):
            break
        n_fat, n_difat = need_fat, need_difat
    difat_ids = list(range(n_payload, n_payload + n_difat))
    fat_ids = list(range(n_payload + n_difat, n_payload + n_difat + n_fat))
    total_sectors = n_payload + n_difat + n_fat

    fat = [FREESECT] * (n_fat * fat_per)
    for sects in chain_sectors.values():
        for a, b in zip(sects, sects[1:]):
            fat[a] = b
        fat[sects[-1]] = ENDOFCHAIN
    for s in fat_ids:
        fat[s] = FATSECT
    for s in difat_ids:
        fat[s] = DIFSECT

    # ---- wire directory starts now that sectors are known ------------------
    dir_start = chain_sectors["dir"][0]
    root.start = chain_sectors["ministream"][0] if mini else ENDOFCHAIN
    first_minifat = chain_sectors["minifat"][0] if minifat else ENDOFCHAIN
    for key in big_keys:
        stream_entries[key].start = chain_sectors[("big",) + key][0]
    # re-pack the directory payload with final start sectors
    dir_payload = b"".join(e.pack() for e in entries).ljust(
        n_dir_sect * sector_size, b"\x00"
    )
    dir_chunks = to_sectors(dir_payload)

    # ---- assemble the sector image ------------------------------------------
    image = [b"\x00" * sector_size] * total_sectors
    dir_i = 0
    for sect_id, (name, payload) in enumerate(order):
        if name == "dir":
            payload = dir_chunks[dir_i]
            dir_i += 1
        image[sect_id] = payload
    for i, s in enumerate(difat_ids):
        lo = 109 + i * (fat_per - 1)
        part = fat_ids[lo: lo + fat_per - 1]
        part += [FREESECT] * (fat_per - 1 - len(part))
        nxt = difat_ids[i + 1] if i + 1 < len(difat_ids) else ENDOFCHAIN
        image[s] = struct.pack(f"<{fat_per}I", *(part + [nxt]))
    for i, s in enumerate(fat_ids):
        image[s] = struct.pack(
            f"<{fat_per}I", *fat[i * fat_per: (i + 1) * fat_per]
        )

    # ---- header --------------------------------------------------------------
    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)           # minor (observed)
    struct.pack_into("<H", header, 26, version)          # major
    struct.pack_into("<H", header, 28, 0xFFFE)           # byte order
    struct.pack_into("<H", header, 30, 9 if version == 3 else 12)
    struct.pack_into("<H", header, 32, 6)                # mini shift
    if version == 4:
        struct.pack_into("<I", header, 40, n_dir_sect)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, len(chain_sectors.get("minifat", [])))
    struct.pack_into(
        "<I", header, 68, difat_ids[0] if difat_ids else ENDOFCHAIN
    )
    struct.pack_into("<I", header, 72, n_difat)
    head_difat = fat_ids[:109] + [FREESECT] * (109 - min(109, len(fat_ids)))
    struct.pack_into("<109I", header, 76, *head_difat)
    header = bytes(header).ljust(sector_size, b"\x00")  # v4: zero-pad

    return header + b"".join(image)


def emit_msg(
    subject: str,
    sender: str,
    to: str,
    body: str,
    attachments=(),
    version: int = 3,
) -> bytes:
    """Emit an Outlook ``.msg`` through the independent emitter: one
    ``__substg1.0_<tag>001F`` UTF-16LE stream per text property, one
    ``__attach_version1.0_#NNNNNNNN`` storage per attachment (long
    filename ``3707``, payload ``37010102``), plus the
    ``__properties_version1.0`` and ``__nameid_version1.0`` furniture
    real producers write and text extraction must skip."""
    streams = [
        (("__substg1.0_0037001F",), subject.encode("utf-16-le")),
        (("__substg1.0_0C1A001F",), sender.encode("utf-16-le")),
        (("__substg1.0_0E04001F",), to.encode("utf-16-le")),
        (("__substg1.0_1000001F",), body.encode("utf-16-le")),
        (("__properties_version1.0",), b"\x00" * 32 + b"\x37" * 16),
        (("__nameid_version1.0", "__substg1.0_00020102"), b"\x01\x02\x03"),
    ]
    for i, (name, payload) in enumerate(attachments):
        prefix = f"__attach_version1.0_#{i:08X}"
        streams.append(
            ((prefix, "__substg1.0_3707001F"), name.encode("utf-16-le"))
        )
        streams.append(((prefix, "__substg1.0_37010102"), payload))
    return emit_cfb(streams, version=version)
