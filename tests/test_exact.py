"""Exact engine vs planted truth — ported dupers semantics (FIXTURES.md §B)."""

from pyspark.sql import functions as F

from dupers_spark.operators import exact
from dupers_spark.sources import datagen

N = 200


SHA256_EMPTY = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"


def test_zero_byte_rows_indexed_under_empty_digest(spark, images_small):
    """Reference semantics: empty files are indexed and group under
    sha256('') — the dupe.go:142-144 guard rejects only an all-zero
    checksum, not empty content."""
    sigs = exact.signatures(images_small)
    rows = {r["image_id"]: r["sha256"] for r in sigs.collect()}
    zid = datagen.zero_byte_ids(N)[0]
    assert zid in rows
    assert rows[zid] == SHA256_EMPTY
    assert len(rows) == N


def test_exact_pairs_match_truth(spark, images_small):
    sigs = exact.signatures(images_small)
    got = {(r["a"], r["b"]) for r in exact.dup_pairs(sigs).collect()}
    assert got == set(datagen.truth_exact_pairs(N))


def test_dup_groups_and_first_exemplar(spark, images_small):
    sigs = exact.signatures(images_small)
    groups = exact.dup_groups(sigs).collect()
    # every planted (r0, r1) pair forms a group whose exemplar is r0 (min id)
    by_exemplar = {g["exemplar"]: g for g in groups}
    for a, b in datagen.truth_exact_pairs(N):
        assert a in by_exemplar
        assert b in by_exemplar[a]["members"]
    ex = exact.first_exemplar(sigs)
    assert ex.count() == ex.select("sha256").distinct().count()


def test_probe_matches_self_exclusion(spark, images_small):
    """A probe identical to the index row itself is not its own duplicate
    (dupe.go:1059-1061); a byte-identical *other* row is."""
    sigs = exact.signatures(images_small).cache()
    matches = exact.probe_matches(sigs, sigs).collect()
    for m in matches:
        assert m["image_id"] != m["exemplar"]
    matched_ids = {m["image_id"] for m in matches}
    for a, b in datagen.truth_exact_pairs(N):
        assert b in matched_ids  # the copy matches exemplar a
        assert a not in matched_ids or a in matched_ids  # a may match only via other dup


def test_incremental_left_anti(spark, images_small):
    """`up` re-scan hashes only NEW rows (dupe.go:941-966)."""
    sigs = exact.signatures(images_small)
    indexed = sigs.limit(0)  # empty index: everything is new
    assert exact.incremental_new(sigs, indexed).count() == sigs.count()
    new = exact.incremental_new(sigs, sigs)
    assert new.count() == 0


def test_merge_upsert_semantics(spark, images_small):
    sigs = exact.signatures(images_small).cache()
    half = sigs.filter(F.col("image_id") < "img_00000100")
    merged = exact.merge_signatures(sigs, half.withColumn("sha256", F.lit("X")))
    x_rows = merged.filter(F.col("sha256") == "X").count()
    assert x_rows == half.count()  # incoming won
    assert merged.count() == sigs.count()


def test_clean_left_semi(spark, images_small):
    """clean = drop rows whose source vanished (bucket.go:53-94)."""
    sigs = exact.signatures(images_small).cache()
    live = sigs.select("image_id").filter(F.col("image_id") >= "img_00000100")
    cleaned = exact.clean(sigs, live)
    assert cleaned.count() == live.count()
    assert cleaned.filter(F.col("image_id") < "img_00000100").count() == 0


def test_sensen_delete_keeps_exe_dirs(spark):
    """-sensen (dupe.go:314-373 delDirsExcept + parse.go:267-295): the unit
    is the TOP-LEVEL source entry; a top dir is kept iff any .com/.exe
    exists anywhere beneath it (recursive walk, extension check only — a
    duplicated exe still keeps its dir); top-level files always deleted."""
    sigs = spark.createDataFrame(
        [
            ("games/doom/DOOM.EXE", "h1"),       # exe → 'games' kept
            ("games/doom/readme.txt", "h2"),     # asset in kept top dir
            ("games/copy/doom2.exe", "h3"),      # dup digest — still keeps
            ("other/doom2.exe", "h3"),           # 'other' kept (dup exe ok)
            ("assets/a/readme.txt", "h6"),       # ancestor of a NESTED exe
            ("assets/a/b/c/game.com", "h7"),     #   → 'assets' kept whole
            ("docs/notes.txt", "h4"),            # no exe → deleted
            ("toplevel.exe", "h5"),              # top-level file → deleted
        ],
        ["image_id", "sha256"],
    )
    doomed = {r["image_id"] for r in exact.sensen_delete(sigs).collect()}
    assert doomed == {"docs/notes.txt", "toplevel.exe"}


def test_compact_stage_reduces_files(spark, tmp_path):
    from dupers_spark.plans.pipeline import compact_stage

    path = str(tmp_path / "stage")
    df = spark.range(0, 10_000, 1, 16).selectExpr(
        "cast(id as string) AS image_id", "sha2(cast(id as string), 256) AS sha256"
    )
    df.write.mode("overwrite").parquet(path)
    with open(f"{path}/_CONFIG_HASH", "w") as fh:
        fh.write("marker")
    before = sorted(r["image_id"] for r in spark.read.parquet(path).collect())
    stats = compact_stage(spark, path, target_file_bytes=10**9)
    assert stats["files_before"] >= 16
    assert stats["files_after"] == 1
    assert stats["rows"] == 10_000
    after = sorted(r["image_id"] for r in spark.read.parquet(path).collect())
    assert after == before  # content identical
    assert open(f"{path}/_CONFIG_HASH").read() == "marker"  # sidecar survives


def test_bucket_info_and_ls(spark, images_small):
    sigs = exact.signatures(images_small)
    info = {r["bucket"]: r for r in exact.bucket_info(sigs).collect()}
    assert set(info) == {"bucket0", "bucket1", "bucket2"}
    assert sum(r["items"] for r in info.values()) == N
    ls = exact.ls_listing(sigs).collect()
    assert [r["image_id"] for r in ls] == sorted(r["image_id"] for r in ls)
