"""Substring search: the four dupers variants + suffix-array ≡ scan."""

from pyspark.sql import functions as F

from dupers_spark.operators import search


def test_contains_case_variants(spark, images_small):
    term = "Tiger"
    cs = search.search_contains(images_small, term)          # case-sensitive
    ci = search.search_contains(images_small, term, case_sensitive=False)
    assert cs.count() == 0  # captions are lowercase
    assert ci.count() > 0
    lower = search.search_contains(images_small, "tiger")
    assert ci.count() == lower.count()


def test_exact_variant(spark, images_small):
    row = images_small.select("caption").first()
    hit = search.search_exact(images_small, row["caption"])
    assert hit.count() >= 1
    assert search.search_exact(images_small, "no such caption at all").count() == 0


def test_basename(spark):
    df = spark.createDataFrame(
        [("dir/sub/file_a.txt",), ("dir/a_sub/other.txt",)], ["image_id"]
    )
    assert search.search_basename(df, "file_a").count() == 1
    assert search.search_basename(df, "a_sub").count() == 0  # dir part excluded
    assert search.search_contains(df, "a_sub", col="image_id").count() == 1


def test_suffix_index_equals_scan(spark, images_small):
    """The suffix-array shard index must return exactly the scan answer."""
    idx = search.build_suffix_index(images_small, "image_id", "caption").cache()
    for term in ["tiger", "brisk large", "zzz-not-there"]:
        via_index = {r["doc_id"] for r in search.query_suffix_index(idx, term).collect()}
        via_scan = {
            r["image_id"]
            for r in search.search_contains(images_small, term).select("image_id").collect()
        }
        assert via_index == via_scan, term


def test_suffix_index_deterministic_across_shards(spark, images_small):
    i4 = search.build_suffix_index(images_small, "image_id", "caption", shards=4)
    i9 = search.build_suffix_index(images_small, "image_id", "caption", shards=9)
    a = {r["doc_id"] for r in search.query_suffix_index(i4, "scan").collect()}
    b = {r["doc_id"] for r in search.query_suffix_index(i9, "scan").collect()}
    assert a == b


def test_suffix_index_persists_and_resumes(spark, images_small, tmp_path):
    """build → StageStore.write → fresh-store read → query must equal both
    the in-memory index's answer and the contains-scan truth: the docstring
    claim 'persisted as a parquet/Iceberg stage table, resumable' is a
    contract, not an aspiration."""
    from dupers_spark.sources.storage import StageStore

    idx = search.build_suffix_index(images_small, "image_id", "caption")
    StageStore(spark, str(tmp_path)).write("suffix_index", idx)
    # a NEW store instance (a resumed process) reads the persisted index
    persisted = StageStore(spark, str(tmp_path)).read("suffix_index")
    for term in ["tiger", "brisk large", "zzz-not-there"]:
        via_disk = {r["doc_id"]
                    for r in search.query_suffix_index(persisted, term).collect()}
        via_scan = {r["image_id"]
                    for r in search.search_contains(images_small, term)
                    .select("image_id").collect()}
        assert via_disk == via_scan, term


def test_suffix_index_incremental_append_equals_rebuild(spark, images_small,
                                                        tmp_path):
    """Incremental SA maintenance: index half the corpus, append the other
    half as new shards — every query on the persisted index must answer
    exactly like a from-scratch build over everything, and the existing
    shards must be untouched (same shard_ids, batch shards strictly
    beyond them)."""
    from pyspark.sql import functions as F

    from dupers_spark.sources.storage import StageStore

    parity = F.substring("image_id", -1, 1).cast("int") % 2
    old, new = images_small.filter(parity == 0), images_small.filter(parity == 1)
    store = StageStore(spark, str(tmp_path))
    store.write("suffix_index", search.build_suffix_index(old))
    before = store.read("suffix_index")
    max_old, n_old = before.agg(
        F.max("shard_id"), F.count("*")).collect()[0]
    search.append_suffix_index(store, "suffix_index", new)
    merged = store.read("suffix_index")
    # batch landed as NEW shards only; the old shard rows are untouched
    assert merged.filter(F.col("shard_id") <= max_old).count() == n_old
    assert merged.agg(F.max("shard_id")).collect()[0][0] > max_old
    for term in ["tiger", "brisk large", "zzz-not-there"]:
        via_index = {r["doc_id"]
                     for r in search.query_suffix_index(merged, term).collect()}
        via_scan = {r["image_id"]
                    for r in search.search_contains(images_small, term)
                    .select("image_id").collect()}
        assert via_index == via_scan, term


def test_suffix_query_prunes_shards_for_selective_terms(spark):
    """Term routing (SURVEY §3.2): a term whose trigrams exist in only one
    shard must probe a STRICT subset of shards — and the pruned answer must
    equal the exact full fan-out. Terms under 3 chars fall back to probing
    every shard (None = no routing)."""
    # 12 shards of homogeneous filler; doc 7 carries a unique marker term
    docs = spark.range(240).selectExpr(
        "concat('doc_', lpad(cast(id as string), 4, '0')) AS image_id",
        "concat(repeat('common filler words ', 20), "
        "case when id = 7 then 'zebraquartz' else '' end) AS caption",
    )
    idx = search.build_suffix_index(docs, target_shard_bytes=10_000).cache()
    n_shards = idx.select("shard_id").distinct().count()
    assert n_shards >= 10

    keep = search.surviving_shards(idx, "zebraquartz")
    assert keep is not None and 0 < len(keep) < n_shards  # strict subset

    pruned = {r["doc_id"]
              for r in search.query_suffix_index(idx, "zebraquartz").collect()}
    exact = {r["doc_id"] for r in search.query_suffix_index(
        idx, "zebraquartz", prune=False).collect()}
    assert pruned == exact == {"doc_0007"}

    # a term present nowhere prunes to zero shards and answers empty
    assert search.surviving_shards(idx, "qqqxyzzy") == []
    assert search.query_suffix_index(idx, "qqqxyzzy").count() == 0

    # short terms cannot route (no trigram) — exact fallback, full fan-out
    assert search.surviving_shards(idx, "co") is None
    with_co = {r["doc_id"]
               for r in search.query_suffix_index(idx, "co").collect()}
    assert len(with_co) == 240  # 'co' in 'common' everywhere

    # common term: every shard survives, answer unchanged
    keep_common = search.surviving_shards(idx, "filler")
    assert keep_common is not None and len(keep_common) == n_shards


def test_suffix_query_reads_legacy_index_without_filter(spark, images_small):
    """An index persisted before tri_filter existed must still answer via
    the full fan-out (routing disabled, never wrong)."""
    idx = search.build_suffix_index(images_small, "image_id", "caption") \
        .drop("tri_filter").cache()
    via_index = {r["doc_id"]
                 for r in search.query_suffix_index(idx, "tiger").collect()}
    via_scan = {r["image_id"]
                for r in search.search_contains(images_small, "tiger")
                .select("image_id").collect()}
    assert via_index == via_scan


def test_suffix_probe_heavy_term_is_vectorized(spark):
    """A term occurring ~10⁵ times inside ONE shard must not trigger a
    per-occurrence Python walk: the probe is two binary searches plus one
    searchsorted regardless of occurrence count."""
    import time

    # 2000 docs in one shard, each containing the needle 50 times → 100k
    # occurrences of 'xy' in the shard's concat
    docs = spark.createDataFrame(
        [(f"d{i:05d}", "xy" * 50 + f" unique{i}") for i in range(2000)],
        ["image_id", "caption"],
    )
    idx = search.build_suffix_index(docs, "image_id", "caption", shards=1).cache()
    idx.count()  # build outside the probe clock
    t0 = time.time()
    hits = {r["doc_id"] for r in search.query_suffix_index(idx, "xy").collect()}
    probe_sec = time.time() - t0
    assert len(hits) == 2000
    assert probe_sec < 10, f"probe took {probe_sec:.1f}s — occurrence walk?"


def test_suffix_shards_sized_by_bytes(spark):
    """Shard count must derive from text VOLUME (bounding each shard's
    single concat string) — not from core count, which would let one
    shard's concat grow past JVM/Arrow single-value limits at scale."""
    from dupers_spark.operators.search import build_suffix_index, query_suffix_index

    docs = spark.range(200).selectExpr(
        "concat('doc_', lpad(cast(id as string), 4, '0')) AS image_id",
        "concat(repeat('x', 999), case when id = 7 then 'Q' else 'y' end) AS caption",
    )
    # 200 KB of text at a 10 KB target → ~20 shards, above the 8-core floor
    idx = build_suffix_index(docs, target_shard_bytes=10_000)
    shards = idx.select("shard_id").distinct().count()
    assert shards >= 15
    # every shard's concat stays near the target, far below the value cap
    max_len = idx.selectExpr("max(length(concat)) AS m").collect()[0]["m"]
    assert max_len < 50_000
    hits = query_suffix_index(idx, "xQ").collect()
    assert [r["doc_id"] for r in hits] == ["doc_0007"]


def test_tri_filter_scales_with_shard_size_and_occupancy_low(spark):
    """Round-6 verdict #3: the fixed 2^17-bit filter saturates long before
    the 256 MB design shard size, silently degrading routing to a full
    fan-out at scale. Filters now size with the shard (tri_bits_for,
    power of two, recorded implicitly as size(tri_filter)), queries derive
    each shard's mask per row — so MIXED filter generations answer
    exactly — and occupancy is observable via tri_filter_occupancy."""
    assert search.tri_bits_for(10_000) == search.TRI_BITS          # floor
    assert search.tri_bits_for(256 << 20) == 1 << 24               # scaled
    assert search.tri_bits_for(1 << 40) == search.TRI_BITS_MAX     # capped

    # two generations in one index: small shards (floor filters) + a
    # bigger appended shard — per-row masks must answer exactly
    docs_a = spark.range(60).selectExpr(
        "concat('a_', id) AS image_id",
        "concat(repeat('common filler words ', 10), "
        "case when id = 7 then 'zebraquartz' else '' end) AS caption")
    docs_b = spark.range(60, 120).selectExpr(
        "concat('b_', id) AS image_id",
        "concat(repeat('other padding text ', 10), "
        "case when id = 99 then 'zebraquartz' else '' end) AS caption")
    idx_a = search.build_suffix_index(docs_a, target_shard_bytes=4_000)
    idx_b = search.build_suffix_index(docs_b, target_shard_bytes=100_000,
                                      shard_offset=1000)
    idx = idx_a.unionByName(idx_b).cache()

    occ = {r["shard_id"]: r for r in search.tri_filter_occupancy(idx).collect()}
    assert occ, "occupancy must be computable per shard"
    assert all(0.0 < r["occupancy"] < 0.5 for r in occ.values())
    assert all(r["tri_bits"] % 64 == 0 and r["tri_bits"] >= search.TRI_BITS
               for r in occ.values())

    pruned = {r["doc_id"] for r in search.query_suffix_index(
        idx, "zebraquartz", route_min_bytes=0).collect()}
    exact = {r["doc_id"] for r in search.query_suffix_index(
        idx, "zebraquartz", prune=False).collect()}
    assert pruned == exact == {"a_7", "b_99"}
    keep = search.surviving_shards(idx, "zebraquartz")
    assert keep is not None and len(keep) < idx.count()  # routing pruned


def test_suffix_query_routing_bypassed_below_size_floor(spark, tmp_path):
    """The routing scan is one Spark job; under the size floor the query
    must skip it (fan-out is cheaper than the barrier — round-6 measured
    0.36-0.55 s fan-out vs 0.66-0.82 s routed at sf0.1) while answering
    identically. Verified by monkeypatch-free construction: a persisted
    tiny index + a huge floor ⇒ the planned scan carries NO shard_id
    pruning filter, and answers still match the exact twin."""
    import re

    docs = spark.range(40).selectExpr(
        "concat('doc_', id) AS image_id",
        "concat('alpha beta gamma ', case when id = 3 then 'zebraquartz' "
        "else '' end) AS caption")
    path = str(tmp_path / "sa")
    search.build_suffix_index(docs, target_shard_bytes=2_000) \
        .write.parquet(path)
    idx = spark.read.parquet(path)

    routed = search.query_suffix_index(idx, "zebraquartz",
                                       route_min_bytes=1 << 40)
    plan = routed._sc._jvm.PythonSQLUtils.explainString(
        routed._jdf.queryExecution(), "formatted")
    assert not re.search(r"shard_id IN", plan)  # routing bypassed
    assert {r["doc_id"] for r in routed.collect()} == {"doc_3"}
    # with the floor off, the same persisted index IS routed
    keep = search.surviving_shards(idx, "zebraquartz")
    assert keep is not None
    routed_on = search.query_suffix_index(idx, "zebraquartz",
                                          route_min_bytes=0)
    assert {r["doc_id"] for r in routed_on.collect()} == {"doc_3"}
