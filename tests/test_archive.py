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


def test_7z_exotic_variant_is_accounted(spark):
    """A 7z with an encoded (compressed) header is outside the supported
    subset → ONE ok=false row with the reason, never a silent skip."""
    import struct

    from dupers_spark.functions.sevenzip import SIGNATURE

    hdr = bytes([0x17])  # kEncodedHeader
    blob = SIGNATURE + b"\x00\x04" + b"\x00" * 4 + struct.pack(
        "<QQI", 0, len(hdr), 0
    ) + hdr
    df = spark.createDataFrame([("weird.7z", bytearray(blob))],
                               ["image_id", "bytes"])
    rows = archive.archive_scan(df).collect()
    assert len(rows) == 1 and not rows[0]["ok"]
    assert "encoded" in rows[0]["err"]
