"""Archive member scan (`dupers up+`) vs planted fixtures — the reference's
archive integration scenario (migration_integration_test.go:22-264): members
are hashed like files, and a file duplicated inside an archive matches the
standalone copy by digest."""

import hashlib

from pyspark.sql import functions as F

from dupers_spark.operators import archive, exact
from dupers_spark.sources import datagen

N_ARCH = 12
MEMBERS = 5


def _scan(spark):
    return archive.archive_scan(datagen.make_archives(spark, N_ARCH, MEMBERS))


def test_member_explosion_and_ids(spark):
    rows = _scan(spark).collect()
    ok = [r for r in rows if r["ok"]]
    bad = [r for r in rows if not r["ok"]]
    # last archive is corrupt → one error row; others explode fully
    assert len(bad) == 1 and bad[0]["archive_id"].startswith("arch_0011")
    assert bad[0]["err"]
    assert len(ok) == (N_ARCH - 1) * MEMBERS
    for r in ok:
        # member identity = join(archive, innerName) (dupe.go:727-733)
        assert r["member_id"] == f"{r['archive_id']}/{r['member_path']}"
        assert len(r["sha256"]) == 64


def test_formats_sniffed_by_content_not_extension(spark):
    """zip/tar/tar.gz all decode; sniff is magic-byte (archive.go:117-126)."""
    rows = _scan(spark).filter(F.col("ok")).collect()
    fmts = {r["archive_id"].split(".", 1)[1]: r["fmt"] for r in rows}
    assert fmts == {"zip": "zip", "tar": "tar", "tar.gz": "gzip"}


def test_lying_extension_is_resniffed(spark):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zi = zipfile.ZipInfo("x.txt", date_time=(1980, 1, 1, 0, 0, 0))
        zf.writestr(zi, b"hello")
    df = spark.createDataFrame(
        [("liar.tar", buf.getvalue())], "image_id string, bytes binary"
    )
    rows = archive.archive_scan(df).collect()
    assert len(rows) == 1 and rows[0]["ok"]
    assert rows[0]["fmt"] == "zip"  # content wins over extension
    assert rows[0]["sha256"] == hashlib.sha256(b"hello").hexdigest()


def test_cross_archive_duplicate_members(spark):
    """Member 0 of every archive is byte-identical → one digest bucket of
    N_ARCH−1 members (corrupt archive excluded)."""
    sigs = archive.archive_signatures(datagen.make_archives(spark, N_ARCH, MEMBERS))
    groups = {r["sha256"]: r for r in exact.dup_groups(sigs).collect()}
    shared = hashlib.sha256(b"shared-across-all-archives\n").hexdigest()
    assert shared in groups
    assert groups[shared]["cnt"] == N_ARCH - 1
    # pairwise dup: member 1 of archives (0,1), (2,3), ... share bytes
    pair_digest = hashlib.sha256(datagen._member_blob(1_000_000)).hexdigest()
    assert groups[pair_digest]["cnt"] == 2


def test_member_matches_standalone_file(spark):
    """The up+ semantics: a standalone file whose bytes equal an archive
    member is reported as its duplicate (same digest join)."""
    arch_sigs = archive.archive_signatures(
        datagen.make_archives(spark, N_ARCH, MEMBERS)
    )
    standalone = spark.createDataFrame(
        [("plain/copy.txt", b"shared-across-all-archives\n")],
        "image_id string, bytes binary",
    )
    file_sigs = exact.signatures(standalone, bucket_col=None)
    matches = exact.probe_matches(file_sigs, arch_sigs).collect()
    assert len(matches) == 1
    assert matches[0]["image_id"] == "plain/copy.txt"
    assert matches[0]["exemplar"].startswith("arch_")


def test_single_member_gzip(spark):
    import gzip as gz

    df = spark.createDataFrame(
        [("logs/app.log.gz", gz.compress(b"line1\nline2\n", mtime=0))],
        "image_id string, bytes binary",
    )
    rows = archive.archive_scan(df).collect()
    assert len(rows) == 1 and rows[0]["ok"]
    assert rows[0]["member_path"] == "app.log"
    assert rows[0]["sha256"] == hashlib.sha256(b"line1\nline2\n").hexdigest()


def test_7z_members_scanned(spark):
    """7z archives (S4's last sliver): plain-header store + LZMA2 archives
    yield member rows with correct digests; the reference reads 7z too
    (dupe.go:648-693)."""
    from dupers_spark.functions.sevenzip import write_7z

    members = [("x/a.txt", b"alpha"), ("b.bin", bytes(range(200)) * 7)]
    df = spark.createDataFrame(
        [("arch_s.7z", bytearray(write_7z(members, compress=False))),
         ("arch_c.7z", bytearray(write_7z(members, compress=True)))],
        ["image_id", "bytes"],
    )
    rows = archive.archive_scan(df).collect()
    assert all(r["ok"] for r in rows)
    assert all(r["fmt"] == "7z" for r in rows)
    got = {(r["archive_id"], r["member_path"]): r["sha256"] for r in rows}
    for aid in ("arch_s.7z", "arch_c.7z"):
        for name, blob in members:
            assert got[(aid, name)] == hashlib.sha256(blob).hexdigest()


def test_7z_encoded_header_members_scanned(spark):
    """Modern 7-Zip compresses the header itself by default
    (kEncodedHeader) — those archives must now scan like plain ones."""
    from dupers_spark.functions.sevenzip import write_7z

    members = [("x/a.txt", b"alpha"), ("b.bin", bytes(range(200)) * 7)]
    df = spark.createDataFrame(
        [("arch_eh.7z",
          bytearray(write_7z(members, compress=True, encoded_header=True)))],
        ["image_id", "bytes"],
    )
    rows = archive.archive_scan(df).collect()
    assert all(r["ok"] for r in rows) and len(rows) == 2
    got = {r["member_path"]: r["sha256"] for r in rows}
    for name, blob in members:
        assert got[name] == hashlib.sha256(blob).hexdigest()


def test_7z_bcj2_members_scanned(spark):
    """BCJ2 multi-stream folders (7-Zip's x86 shape: BCJ2 + LZMA2, one
    bind pair, four pack streams) decode through the general folder-DAG
    path and scan like any other archive."""
    import random

    from dupers_spark.functions.sevenzip import write_7z

    rng = random.Random(11)
    blob = bytearray(rng.randbytes(8000))
    for _ in range(500):  # salt with branch opcodes so all 4 streams fill
        i = rng.randrange(len(blob))
        blob[i] = rng.choice([0xE8, 0xE9, 0x0F, 0x84])
    members = [("app.exe", bytes(blob)), ("note.txt", b"readme")]
    df = spark.createDataFrame(
        [("bcj2.7z", bytearray(write_7z(members, bcj2=True))),
         ("bcj2_eh.7z",
          bytearray(write_7z(members, bcj2=True, encoded_header=True)))],
        ["image_id", "bytes"],
    )
    rows = archive.archive_scan(df).collect()
    assert all(r["ok"] for r in rows) and len(rows) == 4
    got = {(r["archive_id"], r["member_path"]): r["sha256"] for r in rows}
    for aid in ("bcj2.7z", "bcj2_eh.7z"):
        for name, data in members:
            assert got[(aid, name)] == hashlib.sha256(data).hexdigest()


def test_bcj2_transform_roundtrip():
    """The BCJ2 range-coded branch converter inverts exactly on x86-ish
    payloads, including all-branch floods and a trailing branch byte with
    no operand room (recorded as unconverted in the rc stream)."""
    import random

    from dupers_spark.functions.sevenzip import bcj2_decode, bcj2_encode

    rng = random.Random(42)
    cases = []
    for _ in range(20):
        n = rng.randrange(0, 2000)
        d = bytearray(rng.randbytes(n))
        for _ in range(n // 12):
            i = rng.randrange(max(1, n))
            if i < n:
                d[i] = rng.choice([0xE8, 0xE9, 0x0F, 0x80, 0x8F])
        cases.append(bytes(d))
    cases += [b"\xe8" * 777, b"tail\xe9", b"", b"\x0f\x85ABCD"]
    for data in cases:
        m, c, j, rc = bcj2_encode(data)
        assert bcj2_decode(m, c, j, rc, len(data)) == data


def test_7z_exotic_variant_is_accounted(spark):
    """A 7z using a coder outside the supported subset (here the BCJ2
    coder id declared WITHOUT its 4 input streams — a malformed/simple
    declaration) → ONE ok=false row with the reason, never a silent skip.
    A truncated encoded header is likewise an accounted malformed-archive
    row."""
    import struct
    import zlib

    from dupers_spark.functions.sevenzip import (
        SIGNATURE, _Writer, K_HEADER, K_MAIN_STREAMS, K_PACK_INFO, K_SIZE,
        K_END, K_UNPACK_INFO, K_FOLDER, K_CODERS_UNPACK_SIZE)

    w = _Writer()
    w.number(K_HEADER)
    w.number(K_MAIN_STREAMS)
    w.number(K_PACK_INFO); w.number(0); w.number(1)
    w.number(K_SIZE); w.number(5); w.number(K_END)
    w.number(K_UNPACK_INFO); w.number(K_FOLDER); w.number(1); w.byte(0)
    w.number(1); w.byte(4); w.bytes_(b"\x03\x03\x01\x1b")  # BCJ2 coder id
    w.number(K_CODERS_UNPACK_SIZE); w.number(5)
    w.number(K_END); w.number(K_END)
    w.number(K_END)
    hdr = bytes(w.buf)
    sh = struct.pack("<QQI", 5, len(hdr), zlib.crc32(hdr))
    weird = (SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(sh))
             + sh + b"hello" + hdr)
    trunc_eh = SIGNATURE + b"\x00\x04" + b"\x00" * 4 + struct.pack(
        "<QQI", 0, 1, 0) + bytes([0x17])  # kEncodedHeader, then nothing
    df = spark.createDataFrame(
        [("weird.7z", bytearray(weird)), ("trunc.7z", bytearray(trunc_eh))],
        ["image_id", "bytes"],
    )
    rows = {r["archive_id"]: r for r in archive.archive_scan(df).collect()}
    assert len(rows) == 2
    assert not rows["weird.7z"]["ok"]
    assert "unsupported" in rows["weird.7z"]["err"]
    assert not rows["trunc.7z"]["ok"]
    assert "truncated" in rows["trunc.7z"]["err"]


def _chain_7z(payload: bytes, pre_filter: dict, coder_id: bytes,
              coder_props: bytes) -> bytes:
    """Hand-build a one-member 7z whose folder is a [pre_filter, LZMA2]
    coder chain (compression order) — the shape 7-Zip emits for
    executable/delta-friendly payloads (pre_filter=None keeps the slot for
    identity post-coders like Copy). Independent of write_7z so the
    reader is checked against the spec, not against our own writer."""
    import lzma
    import struct
    import zlib

    from dupers_spark.functions.sevenzip import (
        SIGNATURE, _Writer, CODER_LZMA2, K_HEADER, K_MAIN_STREAMS,
        K_PACK_INFO, K_SIZE, K_END, K_UNPACK_INFO, K_FOLDER,
        K_CODERS_UNPACK_SIZE, K_FILES_INFO, K_NAME)

    chain = (([pre_filter] if pre_filter else [])
             + [{"id": lzma.FILTER_LZMA2, "preset": 6}])
    comp = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=chain)
    packed = comp.compress(payload) + comp.flush()
    l2props = lzma._encode_filter_properties(
        {"id": lzma.FILTER_LZMA2, "preset": 6})
    w = _Writer()
    w.number(K_HEADER)
    w.number(K_MAIN_STREAMS)
    w.number(K_PACK_INFO); w.number(0); w.number(1)
    w.number(K_SIZE); w.number(len(packed)); w.number(K_END)
    w.number(K_UNPACK_INFO); w.number(K_FOLDER); w.number(1); w.byte(0)
    w.number(2)  # decode order: coder0 LZMA2 (reads packed) → coder1 filter
    w.byte(len(CODER_LZMA2) | 0x20); w.bytes_(CODER_LZMA2)
    w.number(len(l2props)); w.bytes_(l2props)
    w.byte(len(coder_id) | (0x20 if coder_props else 0)); w.bytes_(coder_id)
    if coder_props:
        w.number(len(coder_props)); w.bytes_(coder_props)
    w.number(1); w.number(0)  # bind: coder1's input ← coder0's output
    w.number(K_CODERS_UNPACK_SIZE)
    w.number(len(payload)); w.number(len(payload))
    w.number(K_END); w.number(K_END)
    w.number(K_FILES_INFO); w.number(1)
    nb = bytearray([0]) + "m.bin".encode("utf-16-le") + b"\x00\x00"
    w.number(K_NAME); w.number(len(nb)); w.bytes_(bytes(nb))
    w.number(K_END); w.number(K_END)
    hdr = bytes(w.buf)
    sh = struct.pack("<QQI", len(packed), len(hdr), zlib.crc32(hdr))
    return (SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(sh))
            + sh + packed + hdr)


def test_7z_delta_and_bcj_chain_folders():
    """Linear multi-coder folders (Delta+LZMA2, BCJ x86+LZMA2): bind-pair
    parse + chained raw-filter decode must reproduce the payload."""
    import lzma

    from dupers_spark.functions.sevenzip import CODER_DELTA, read_7z

    payload = bytes([(i * 7) % 256 for i in range(5000)])
    blob = _chain_7z(payload, {"id": lzma.FILTER_DELTA, "dist": 4},
                     CODER_DELTA, bytes([4 - 1]))
    assert read_7z(blob) == [("m.bin", payload)]

    x86ish = (b"\xe8\x12\x34\x56\x00PAYLOAD" * 400)  # call-opcode dense
    blob2 = _chain_7z(x86ish, {"id": lzma.FILTER_X86},
                      b"\x03\x03\x01\x03", b"")
    assert read_7z(blob2) == [("m.bin", x86ish)]


def test_7z_reference_fixture_reads():
    """The reference repo's own .7z test archive must decode: one member,
    randomfiles.tar.xz, whose bytes are a valid xz stream (cross-checks
    our folder machinery against a real 7-Zip-written file, not just our
    own writer)."""
    import lzma
    import pathlib

    from dupers_spark.functions.sevenzip import read_7z

    p = pathlib.Path("/root/reference/testdata/randomfiles.7z")
    if not p.exists():
        import pytest

        pytest.skip("reference fixture not present")
    members = read_7z(p.read_bytes())
    assert [m[0] for m in members] == ["randomfiles.tar.xz"]
    inner = lzma.decompress(members[0][1])
    assert len(inner) == 2048
    # the extracted member must be BYTE-identical to the on-disk twin the
    # reference ships next to the archive — the regression gate that pins
    # reader correctness to genuine 7-Zip output, not our own writer
    import hashlib

    twin = pathlib.Path("/root/reference/testdata/randomfiles.tar.xz")
    if twin.exists():
        assert hashlib.sha256(members[0][1]).hexdigest() \
            == hashlib.sha256(twin.read_bytes()).hexdigest()


def test_7z_substream_crc_count_excludes_known_folder_crcs():
    """7zFormat.txt: SubStreamsInfo kCRC stores digests only for streams
    with UNKNOWN CRC — a single-substream folder whose CRC was already
    defined in UnpackInfo kCRC contributes no entry. A hand-built archive
    carrying BOTH folder CRCs and substream CRCs must parse (it used to
    misparse because the reader expected sum(num_unpack_streams) digests:
    3 here instead of the 2 actually stored)."""
    import struct
    import zlib

    from dupers_spark.functions.sevenzip import (
        SIGNATURE, _Writer, CODER_COPY, K_HEADER, K_MAIN_STREAMS,
        K_PACK_INFO, K_SIZE, K_END, K_UNPACK_INFO, K_FOLDER,
        K_CODERS_UNPACK_SIZE, K_CRC, K_SUBSTREAMS_INFO,
        K_NUM_UNPACK_STREAM, K_FILES_INFO, K_NAME, read_7z)

    s0, s1a, s1b = b"AAAA", b"BBBB", b"CC"
    pack0, pack1 = s0, s1a + s1b  # two copy-coder folders
    w = _Writer()
    w.number(K_HEADER)
    w.number(K_MAIN_STREAMS)
    w.number(K_PACK_INFO); w.number(0); w.number(2)
    w.number(K_SIZE); w.number(len(pack0)); w.number(len(pack1))
    w.number(K_END)
    w.number(K_UNPACK_INFO); w.number(K_FOLDER); w.number(2); w.byte(0)
    for _ in range(2):
        w.number(1)                       # one Copy coder per folder
        w.byte(len(CODER_COPY)); w.bytes_(CODER_COPY)
    w.number(K_CODERS_UNPACK_SIZE)
    w.number(len(pack0)); w.number(len(pack1))
    w.number(K_CRC); w.byte(1)            # allAreDefined: BOTH folder CRCs
    w.bytes_(struct.pack("<I", zlib.crc32(pack0)))
    w.bytes_(struct.pack("<I", zlib.crc32(pack1)))
    w.number(K_END)
    w.number(K_SUBSTREAMS_INFO)
    w.number(K_NUM_UNPACK_STREAM); w.number(1); w.number(2)
    w.number(K_SIZE); w.number(len(s1a))  # all-but-last per folder: only s1a
    w.number(K_CRC); w.byte(1)            # digests ONLY for folder1's 2
    w.bytes_(struct.pack("<I", zlib.crc32(s1a)))  # unknown streams —
    w.bytes_(struct.pack("<I", zlib.crc32(s1b)))  # folder0 is excluded
    w.number(K_END)
    w.number(K_END)                       # end MainStreamsInfo
    w.number(K_FILES_INFO); w.number(3)
    nb = bytearray([0])
    for n in ("f0.bin", "f1a.bin", "f1b.bin"):
        nb += n.encode("utf-16-le") + b"\x00\x00"
    w.number(K_NAME); w.number(len(nb)); w.bytes_(bytes(nb))
    w.number(K_END); w.number(K_END)
    hdr = bytes(w.buf)
    body = pack0 + pack1
    sh = struct.pack("<QQI", len(body), len(hdr), zlib.crc32(hdr))
    blob = (SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(sh))
            + sh + body + hdr)
    assert read_7z(blob) == [("f0.bin", s0), ("f1a.bin", s1a),
                             ("f1b.bin", s1b)]


def test_7z_copy_inside_chain_decodes():
    """A [LZMA2 → Copy] folder chain (Copy as a post-filter) is an
    identity wrapper some writers emit; the reader drops Copy coders from
    the chain instead of refusing the archive."""
    from dupers_spark.functions.sevenzip import CODER_COPY, read_7z

    payload = bytes(range(256)) * 40
    blob = _chain_7z(payload, None, CODER_COPY, b"")
    members = read_7z(blob)
    assert members == [("m.bin", payload)]
