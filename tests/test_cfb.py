"""Golden tests for the pure-stdlib [MS-CFB] (OLE2) reader and the
Outlook .msg decode on top of it (sources/cfb.py). The fixture is built
by a minimal spec-compliant CFB WRITER defined here (512-byte sectors,
mini-FAT for streams under the 4096 cutoff), so the tests run in every
environment — no extract_msg needed."""

import struct

import pytest

from vectordb_data_ingestion_spark.sources import files as fmod
from vectordb_data_ingestion_spark.sources.cfb import (
    CfbFile,
    msg_attachments,
    msg_to_text,
)

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
NOSTREAM = 0xFFFFFFFF


def _dir_entry(name, obj_type, left, right, child, start, size):
    raw = bytearray(128)
    enc = name.encode("utf-16-le")
    raw[: len(enc)] = enc
    struct.pack_into("<H", raw, 64, len(enc) + 2 if name else 0)
    raw[66] = obj_type
    raw[67] = 1  # black
    struct.pack_into("<III", raw, 68, left, right, child)
    struct.pack_into("<I", raw, 116, start)
    struct.pack_into("<Q", raw, 120, size)
    return bytes(raw)


def write_cfb(streams):
    """Minimal v3 CFB writer: ``streams`` is a list of (path_tuple, data).
    Top-level storages are created for multi-segment paths (one level).
    All streams are < 4096 bytes -> they live in the mini stream; the
    directory tree is a right-sibling chain (valid, if unbalanced)."""
    assert all(len(d) < 4096 for _p, d in streams)
    # --- mini stream + mini FAT ---
    mini, minifat, starts = bytearray(), [], {}
    for path, data in streams:
        first = len(mini) // 64
        n = max(1, (len(data) + 63) // 64)
        starts[path] = first
        mini.extend(data + b"\x00" * (n * 64 - len(data)))
        minifat.extend(list(range(first + 1, first + n)) + [ENDOFCHAIN])
    # --- directory: root + storages + streams ---
    storages = []
    for path, _d in streams:
        if len(path) == 2 and path[0] not in storages:
            storages.append(path[0])
    entries = [None]  # root placeholder
    top, members = [], {s: [] for s in storages}
    for s in storages:
        top.append((s, 1, None))
    for path, data in streams:
        rec = (path[-1], 2, (starts[path], len(data)))
        if len(path) == 2:
            members[path[0]].append(rec)
        else:
            top.append(rec)

    def chain(recs, base_index):
        """Append recs as a right-sibling chain; returns first index."""
        idxs = list(range(base_index, base_index + len(recs)))
        return idxs

    # lay out: root(0), then top entries, then members per storage
    flat = []
    top_base = 1
    member_base = top_base + len(top)
    member_offsets = {}
    off = member_base
    for s in storages:
        member_offsets[s] = off
        off += len(members[s])
    for i, (name, typ, payload) in enumerate(top):
        right = top_base + i + 1 if i + 1 < len(top) else NOSTREAM
        if typ == 1:
            kids = members[name]
            child = member_offsets[name] if kids else NOSTREAM
            flat.append(_dir_entry(name, 1, NOSTREAM, right, child, 0, 0))
        else:
            start, size = payload
            flat.append(
                _dir_entry(name, 2, NOSTREAM, right, NOSTREAM, start, size)
            )
    for s in storages:
        recs = members[s]
        for j, (name, _typ, (start, size)) in enumerate(recs):
            right = (
                member_offsets[s] + j + 1 if j + 1 < len(recs) else NOSTREAM
            )
            flat.append(
                _dir_entry(name, 2, NOSTREAM, right, NOSTREAM, start, size)
            )

    # sectors: [dir...][minifat][ministream...][fat]
    dir_bytes = b"".join(flat)
    n_dir = max(1, (128 + len(dir_bytes) + 511) // 512)
    mini_bytes = bytes(mini)
    n_mini_sect = max(1, (len(mini_bytes) + 511) // 512)
    first_dir, first_minifat = 0, n_dir
    first_mini = first_minifat + 1
    fat_sector = first_mini + n_mini_sect

    root = _dir_entry(
        "Root Entry", 5, NOSTREAM, NOSTREAM,
        1 if (top or storages) else NOSTREAM, first_mini, len(mini_bytes),
    )
    dir_full = root + dir_bytes
    dir_full += b"\x00" * (n_dir * 512 - len(dir_full))

    fat = [FREESECT] * 128
    for i in range(n_dir):
        fat[i] = i + 1 if i + 1 < n_dir else ENDOFCHAIN
    fat[first_minifat] = ENDOFCHAIN
    for i in range(n_mini_sect):
        s = first_mini + i
        fat[s] = s + 1 if i + 1 < n_mini_sect else ENDOFCHAIN
    fat[fat_sector] = FATSECT

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x3E)   # minor
    struct.pack_into("<H", header, 26, 3)      # major (512B sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian marker
    struct.pack_into("<H", header, 30, 9)      # sector shift
    struct.pack_into("<H", header, 32, 6)      # mini shift
    struct.pack_into("<I", header, 44, 1)      # one FAT sector
    struct.pack_into("<I", header, 48, first_dir)
    struct.pack_into("<I", header, 56, 4096)   # mini cutoff
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, 1)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT overflow
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *(
        [fat_sector] + [FREESECT] * 108
    ))

    minifat_sector = b"".join(
        struct.pack("<I", v) for v in minifat
    )
    minifat_sector += b"\xff" * (512 - len(minifat_sector))
    mini_padded = mini_bytes + b"\x00" * (n_mini_sect * 512 - len(mini_bytes))
    fat_bytes = b"".join(struct.pack("<I", v) for v in fat)
    return bytes(header) + dir_full + minifat_sector + mini_padded + fat_bytes


def golden_msg():
    u16 = lambda s: s.encode("utf-16-le")  # noqa: E731
    return write_cfb([
        (("__substg1.0_0037001F",), u16("Quarterly sync")),
        (("__substg1.0_0C1A001F",), u16("Ana Example")),
        (("__substg1.0_0E04001F",), u16("team@example.com")),
        (("__substg1.0_1000001F",), u16("Hello team,\nnotes attached.")),
        (("__attach_version1.0_#00000000", "__substg1.0_3707001F"),
         u16("notes.txt")),
        (("__attach_version1.0_#00000000", "__substg1.0_37010102"),
         b"attached payload bytes"),
    ])


def test_cfb_reader_walks_streams_and_ministream():
    cfb = CfbFile(golden_msg())
    names = set(cfb.stream_names())
    assert ("__substg1.0_0037001F",) in names
    assert (
        "__attach_version1.0_#00000000", "__substg1.0_37010102",
    ) in names
    raw = cfb.read_stream(("__substg1.0_0037001F",))
    assert raw.decode("utf-16-le") == "Quarterly sync"
    with pytest.raises(KeyError):
        cfb.read_stream(("__substg1.0_9999001F",))
    with pytest.raises(ValueError):
        CfbFile(b"not an ole2 container at all")


def test_msg_to_text_fields_in_extract_msg_order():
    text = msg_to_text(golden_msg())
    assert text == (
        "Quarterly sync\nAna Example\nteam@example.com\n"
        "Hello team,\nnotes attached."
    )


def test_msg_attachments_real_rows():
    atts = msg_attachments(golden_msg())
    assert atts == [("notes.txt", b"attached payload bytes")]


def test_registry_msg_tier_and_stub_fallback():
    """msg dispatches through the stdlib CFB tier when extract_msg is
    absent; attachment extraction of a NON-OLE2 payload falls back to the
    deterministic stub (shape preserved for synthetic pipelines)."""
    if fmod.DECODER_TIER["msg"] == "stdlib":
        text = fmod.parse_bytes(golden_msg(), "msg")
        assert text.startswith("Quarterly sync")
        assert not text.startswith("[stub:")
    junk = b"msg payload one"
    # real-only default: no fabricated rows for junk OR corrupt OLE2
    assert fmod._attachments(junk) == []
    assert fmod._attachments(golden_msg()[:700]) == []  # truncated .msg
    # synthetic pipelines opt in explicitly
    assert fmod._attachments(junk, allow_stub=True) == (
        fmod._stub_attachments(junk)
    )
    assert fmod._attachments(golden_msg()) == [
        ("notes.txt", b"attached payload bytes")
    ]


def test_parse_attachments_through_registry(spark, tmp_path):
    """End-to-end: a .msg with a txt and a docx attachment lands in a
    binary catalog; parse_attachments extracts the attachments via the
    CFB reader and pushes each back through the parser registry by its
    extension — real text for both, no disk round-trip."""
    from tests.test_ooxml import golden_docx
    from vectordb_data_ingestion_spark.sources.files import (
        parse_attachments,
        read_binary_catalog,
    )

    u16 = lambda s: s.encode("utf-16-le")  # noqa: E731
    msg = write_cfb([
        (("__substg1.0_0037001F",), u16("With attachments")),
        (("__substg1.0_1000001F",), u16("see attached")),
        (("__attach_version1.0_#00000000", "__substg1.0_3707001F"),
         u16("readme.txt")),
        (("__attach_version1.0_#00000000", "__substg1.0_37010102"),
         b"plain attachment text body"),
        (("__attach_version1.0_#00000001", "__substg1.0_3707001F"),
         u16("doc.docx")),
        (("__attach_version1.0_#00000001", "__substg1.0_37010102"),
         golden_docx()),
    ])
    d = tmp_path / "mail"
    d.mkdir()
    (d / "m.msg").write_bytes(msg)
    cat = read_binary_catalog(spark, str(d) + "/**")
    rows = {
        r["attachment_name"]: r for r in parse_attachments(cat).collect()
    }
    assert set(rows) == {"readme.txt", "doc.docx"}
    assert rows["readme.txt"]["text"] == "plain attachment text body"
    assert rows["doc.docx"]["text"].startswith("hello world")


def test_directory_child_cycle_terminates():
    """A corrupt container whose child pointers form a cycle (storage's
    grandchild points back at the storage) must parse-or-degrade, never
    exhaust the stack: the tree walk keeps ONE seen set across the whole
    directory, and the _attachments boundary returns a list regardless."""
    import struct as _struct

    from vectordb_data_ingestion_spark.sources import files as fmod

    data = bytearray(golden_msg())
    cf = CfbFile(bytes(data))
    names = [e.name for e in cf.entries]
    attach_idx = names.index("__attach_version1.0_#00000000")
    child_idx = cf.entries[attach_idx].child
    child_name = cf.entries[child_idx].name

    # locate the child's 128-byte directory record by its UTF-16LE name
    # (unique in this golden) and point its own child back at the storage
    rec = data.find(child_name.encode("utf-16-le"))
    assert rec != -1 and rec % 128 == 0, "directory record not found"
    _struct.pack_into("<I", data, rec + 76, attach_idx)

    CfbFile(bytes(data))  # must terminate (was: unbounded recursion)
    out = fmod._attachments(bytes(data))
    assert isinstance(out, list)
