"""Archive member scan — dupers' `up+` mode, Spark-first.

Reference behavior reimplemented (citations into /root/reference):
  * walk finds archives, reads each member, hashes member content
    (pkg/dupe/dupe.go:604-645 walkArchiver, :648-693 read7Zip pattern,
    :696-756 readArchiver)
  * member identity = filepath.Join(archive, innerName)
    (pkg/dupe/dupe.go:727-733)
  * format is determined by CONTENT sniffing, not extension
    (pkg/dupe/internal/archive/archive.go:117-126 ReadMIME,
    :130-153 configure) — a lying extension is re-sniffed
  * supported formats table (archive.go:42-68): zip, tar, gzip, bzip2, xz,
    and 7z (plain-header copy/LZMA/LZMA2 archives via the minimal stdlib
    reader in functions/sevenzip.py; exotic 7z variants surface as explicit
    accounted error rows rather than silent skips)

Spark shape: ONE mapInPandas explode over (archive_id, bytes) rows — each
Arrow batch opens its archives with stdlib zipfile/tarfile/gzip/bz2/lzma
(pure Python but I/O-and-zlib-bound, C-speed decompression), emits
(member_id, sha256, …) rows. Member digests then flow into the SAME exact
engine as file digests (operators/exact.py), which is precisely the
reference's semantics: a file duplicated inside an archive matches the
standalone copy by content hash
(pkg/dupe/internal/archive/migration_integration_test.go:22-264).

Scale notes: archives are processed independently per row → embarrassingly
parallel; batch memory is bounded by Arrow batch size × archive size. The
explode output carries only digests + names (~100 B/row), never member
payloads, so the downstream join shuffles stay small. A single giant
archive is one task — at 100 TB the input table should cap archive payload
size upstream (the reference has the same single-file constraint).
"""

from __future__ import annotations

import bz2
import gzip
import hashlib
import io
import lzma
import tarfile
import zipfile

from pyspark.sql import DataFrame

ARCHIVE_SCHEMA = (
    "archive_id string, member_path string, member_id string, "
    "sha256 string, n_bytes long, fmt string, ok boolean, err string"
)


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format sniff (archive.go:117-126 ReadMIME).

    Returns one of 'zip', 'tar', 'gzip', 'bzip2', 'xz', '7z', or None.
    Compressed tars report the COMPRESSION layer ('gzip'/'bzip2'/'xz');
    the member iterator then sniffs the decompressed payload for tar.
    """
    if len(data) < 4:
        return None
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06", b"PK\x07\x08"):
        return "zip"
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:3] == b"BZh":
        return "bzip2"
    if data[:6] == b"\xfd7zXZ\x00":
        return "xz"
    if data[:6] == b"7z\xbc\xaf\x27\x1c":
        return "7z"
    if len(data) > 262 and data[257:262] == b"ustar":
        return "tar"
    return None


def _iter_zip(data: bytes):
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            yield info.filename, zf.read(info)


def _iter_tar(fileobj):
    with tarfile.open(fileobj=fileobj, mode="r:") as tf:
        for m in tf:
            if not m.isfile():
                continue
            f = tf.extractfile(m)
            if f is not None:
                yield m.name, f.read()


def _iter_members(archive_id: str, data: bytes):
    """(member_path, member_bytes) pairs; raises on unsupported/corrupt."""
    fmt = sniff_format(data)
    if fmt == "zip":
        yield from _iter_zip(data)
        return
    if fmt == "tar":
        yield from _iter_tar(io.BytesIO(data))
        return
    if fmt in ("gzip", "bzip2", "xz"):
        decomp = {"gzip": gzip.decompress, "bzip2": bz2.decompress,
                  "xz": lzma.decompress}[fmt](data)
        if sniff_format(decomp) == "tar":
            yield from _iter_tar(io.BytesIO(decomp))
            return
        # single-member compressed file: member name = archive basename
        # minus the compression suffix (gunzip convention)
        base = archive_id.rsplit("/", 1)[-1]
        for suf in (".gz", ".bz2", ".xz", ".tgz", ".tbz2", ".txz"):
            if base.endswith(suf):
                base = base[: -len(suf)]
                break
        yield base, decomp
        return
    if fmt == "7z":
        # minimal stdlib reader (functions/sevenzip.py): plain headers with
        # copy/LZMA/LZMA2 folders — the common cases; exotic archives
        # (encoded headers, BCJ chains) raise and become accounted error
        # rows. Reference reads 7z via a dedicated lib (dupe.go:648-693).
        from dupers_spark.functions.sevenzip import read_7z

        yield from read_7z(data)
        return
    raise ValueError(f"not a supported archive (sniffed: {fmt})")


def archive_scan(archives: DataFrame, id_col: str = "image_id",
                 payload_col: str = "bytes") -> DataFrame:
    """(archive_id, bytes) rows → one row per archive MEMBER:

    (archive_id, member_path, member_id, sha256, n_bytes, fmt, ok, err)

    member_id = '<archive_id>/<member_path>' (dupe.go:727-733 Join).
    Unsupported/corrupt archives yield ONE row with ok=false and the error
    message — never a silent drop. Members are sorted per archive for
    deterministic output.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in ("archive_id", "member_path", "member_id",
                                   "sha256", "n_bytes", "fmt", "ok", "err")}
            for aid, data in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(data) if data is not None else b""
                fmt = sniff_format(raw)
                try:
                    members = sorted(_iter_members(aid, raw), key=lambda m: m[0])
                except Exception as exc:  # noqa: BLE001 — per-archive error row
                    out["archive_id"].append(aid)
                    out["member_path"].append(None)
                    out["member_id"].append(None)
                    out["sha256"].append(None)
                    out["n_bytes"].append(None)
                    out["fmt"].append(fmt)
                    out["ok"].append(False)
                    out["err"].append(str(exc)[:200])
                    continue
                for name, blob in members:
                    out["archive_id"].append(aid)
                    out["member_path"].append(name)
                    out["member_id"].append(f"{aid}/{name}")
                    out["sha256"].append(hashlib.sha256(blob).hexdigest())
                    out["n_bytes"].append(len(blob))
                    out["fmt"].append(fmt)
                    out["ok"].append(True)
                    out["err"].append(None)
            yield pd.DataFrame(
                {k: pd.array(v, dtype="Int64") if k == "n_bytes" else v
                 for k, v in out.items()}
            )

    return archives.select(id_col, payload_col).mapInPandas(
        gen, schema=ARCHIVE_SCHEMA
    )


def archive_signatures(archives: DataFrame, id_col: str = "image_id",
                       payload_col: str = "bytes") -> DataFrame:
    """Member rows shaped for the exact engine: (image_id, sha256).

    Feed the union of file signatures (exact.signatures) and archive-member
    signatures into exact.dup_pairs / probe_matches — this is `dupers up+`:
    duplicates are found across files AND archive members
    (migration_integration_test.go:22-264).
    """
    from pyspark.sql import functions as F

    scan = archive_scan(archives, id_col, payload_col)
    return scan.filter(F.col("ok")).select(
        F.col("member_id").alias("image_id"), "sha256"
    )
