"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-dup dedup pipeline on the synthetic images
table (BASELINE input_hint schema) derived deterministically from seed 42.

``queries()`` / ``oracle_sql()`` — operator coverage over the driver's
parquet tables (documents/embeddings/part/lineitem/...), each Spark query
paired with a value-identical DuckDB SQL oracle. Engine-portable hashing
(sha256 hex, polynomial rolling hash) is used wherever values are compared;
engine-private hashes (xxhash64) appear only in rows-only-checked entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dupers_spark.functions import hashing as H  # noqa: E402
from dupers_spark.operators import (  # noqa: E402
    ann,
    dedup_text,
    exact,
    minhash_lsh as ml,
    search,
    textstats,
)
from dupers_spark.operators.components import connected_components  # noqa: E402
from dupers_spark.sources import datagen  # noqa: E402

P31 = H.P31


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact + caption-near-dup clustering of the images table.

    Returns (image_id, component_id, n_members) for every clustered image —
    dupers' `dupe` semantics upgraded to near-dup components (north_rule).
    """
    images = datagen.make_images(spark, 300)
    edges, _verified, _dropped = ml.near_dup_edges(images)
    assign = connected_components(edges)
    sizes = assign.groupBy("component_id").agg(F.count("*").alias("n_members"))
    return assign.join(sizes, "component_id").select(
        "image_id", "component_id", "n_members"
    )


# --------------------------------------------------------------- helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _docs_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic content key: sha256 of the first 2 words.

    The driver corpus has no exact text dupes, so the dupers 'bucket by
    digest' semantics are exercised on a derived content key
    (FIXTURES.md §C blesses this phrasing).
    """
    d = _docs(spark, sf_dir)
    first2 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2))
    return d.withColumn("digest", F.sha2(first2, 256))


_KEY_SQL = "sha256(array_to_string((string_split(text, ' '))[1:2], ' '))"


# --------------------------------------------------------------- queries

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- exact engine family (SURVEY §2.3/§2.4, dupers J1-J3/A5/A6) -----
    def exact_dup_groups(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        g = exact.dup_groups(sigs)
        return g.select("sha256", "cnt", "exemplar")  # members array omitted for hashing

    q["exact_dup_groups"] = exact_dup_groups

    def exact_dup_pairs(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        return exact.dup_pairs(sigs).select("a", "b")

    q["exact_dup_pairs"] = exact_dup_pairs

    def first_exemplar(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        return exact.first_exemplar(sigs)

    q["first_exemplar"] = first_exemplar

    def incremental_new(spark, sf):
        d = _docs(spark, sf).select(F.col("doc_id").alias("image_id"), "n_chars")
        indexed = d.filter(F.col("image_id") % 3 == 0)
        return exact.incremental_new(d, indexed)

    q["incremental_new"] = incremental_new

    def clean_gc(spark, sf):
        d = _docs(spark, sf).select(F.col("doc_id").alias("image_id"), "n_chars")
        live = d.filter(F.col("image_id") % 2 == 0)
        return exact.clean(d, live)

    q["clean_gc"] = clean_gc

    def probe_matches(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        return exact.probe_matches(sigs, sigs)

    q["probe_matches"] = probe_matches

    def ls_listing(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        return exact.ls_listing(sigs)

    q["ls_listing"] = ls_listing

    def bucket_info(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.col("source").alias("bucket"),
            F.col("digest").alias("sha256"),
        )
        return exact.bucket_info(sigs)

    q["bucket_info"] = bucket_info

    def sensen_delete(spark, sf):
        # -sensen over a synthetic NESTED layout: top dir = source_g{doc%7},
        # files sit one level down (sub{doc%3}/), every 51st doc is an
        # ".exe". Reference semantics (dupe.go:314-373 + parse.go:267-295):
        # a top dir is kept iff ANY exe exists anywhere beneath it; the
        # deletion set is every row outside kept dirs.
        d = _docs_keyed(spark, sf)
        sigs = d.select(
            F.concat(
                F.col("source"), F.lit("_g"), (F.col("doc_id") % 7).cast("string"),
                F.lit("/sub"), (F.col("doc_id") % 3).cast("string"),
                F.lit("/doc_"), F.col("doc_id").cast("string"),
                F.when(F.col("doc_id") % 51 == 0, F.lit(".exe")).otherwise(F.lit(".txt")),
            ).alias("image_id"),
            F.col("digest").alias("sha256"),
        )
        return exact.sensen_delete(sigs)

    q["sensen_delete"] = sensen_delete

    # --- search family (SURVEY §2.7 T1-T3) ------------------------------
    def search_contains(spark, sf):
        return search.search_contains(_docs(spark, sf), "merge join", col="text").select(
            "doc_id"
        )

    q["search_contains"] = search_contains

    def search_contains_nocase(spark, sf):
        return search.search_contains(
            _docs(spark, sf), "MERGE JOIN", col="text", case_sensitive=False
        ).select("doc_id")

    q["search_contains_nocase"] = search_contains_nocase

    def search_part_name(spark, sf):
        return search.search_contains(_part(spark, sf), "red", col="p_name").select(
            "p_partkey", "p_name"
        )

    q["search_part_name"] = search_part_name

    def search_basename(spark, sf):
        # basename-only match (CompareBase) on synthetic path ids
        d = _docs(spark, sf)
        paths = d.select(
            F.concat(F.col("source"), F.lit("/doc_"),
                     F.col("doc_id").cast("string"), F.lit(".txt")).alias("image_id"),
            "doc_id",
        )
        return search.search_basename(paths, "doc_7", col="image_id").select("doc_id")

    q["search_basename"] = search_basename

    def search_exact_caption(spark, sf):
        # -exact whole-string search: probe = doc 0's text (deterministic)
        d = _docs(spark, sf)
        probe = d.filter(F.col("doc_id") == 0).select("text").collect()[0][0]
        return search.search_exact(d, probe, col="text").select("doc_id")

    q["search_exact_caption"] = search_exact_caption

    def delete_dupe_candidates(spark, sf):
        # `dupe -delete` (M7): rows whose digest is already indexed, minus
        # the exemplar itself
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        return exact.delete_candidates(sigs, sigs)

    q["delete_dupe_candidates"] = delete_dupe_candidates

    def merge_upsert(spark, sf):
        # KV upsert (A6/S6): every 5th row re-ingested with a new digest —
        # incoming wins on id, others keep the old digest
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").alias("image_id"), F.col("digest").alias("sha256")
        )
        incoming = sigs.filter(F.col("image_id") % 5 == 0).withColumn(
            "sha256", F.concat(F.lit("new:"), F.col("sha256"))
        )
        return exact.merge_signatures(sigs, incoming)

    q["merge_upsert"] = merge_upsert

    def mv_rm_buckets(spark, sf):
        # bucket rename + drop (M3/M4) over synthetic path ids
        from dupers_spark.sources import csvio

        d = _docs(spark, sf)
        sigs = d.select(
            F.concat(F.col("source"), F.lit("/doc_"),
                     F.col("doc_id").cast("string")).alias("image_id"),
            F.col("source").alias("bucket"),
            F.col("doc_id").cast("string").alias("sha256"),
        )
        buckets = sorted(r["source"] for r in d.select("source").distinct().collect())
        moved = csvio.mv_bucket(sigs, buckets[0], "renamed_bucket")
        return csvio.rm_bucket(moved, buckets[1])

    q["mv_rm_buckets"] = mv_rm_buckets

    def csv_roundtrip(spark, sf):
        # S7/S8 (+T5 hex validation, T8 prefix strip) as one value-checked
        # op: export the min bucket in dupers CSV interchange format, read
        # it back, return the restored signature rows — oracle = identity
        # over that bucket (a lossless round trip IS the export contract,
        # io.go:88-123 / csv.go:79-112)
        import tempfile

        from dupers_spark.sources import csvio

        d = _docs_keyed(spark, sf)
        sigs = d.select(
            F.concat(F.col("source"), F.lit("/doc_"),
                     F.col("doc_id").cast("string")).alias("image_id"),
            F.col("source").alias("bucket"),
            F.col("digest").alias("sha256"),
        )
        bucket = sigs.agg(F.min("bucket")).collect()[0][0]
        path = os.path.join(tempfile.gettempdir(), "dupers_csv_roundtrip",
                            sf.strip("/").replace("/", "_"))
        csvio.csv_export(sigs, bucket, path)
        restored, _b = csvio.csv_import(spark, path)
        return restored

    q["csv_roundtrip"] = csv_roundtrip

    def pipeline_components_e2e(spark, sf):
        # Flagship DedupPipeline end-to-end (fast mode) over a deterministic
        # docs-as-images projection. Keys are NESTED so the exact closure is
        # SQL-expressible: bytes = first-2-words (exact digest groups),
        # caption = first-3-words (subset of digest groups), phash =
        # xxhash64(first-2-words) (identical partition as digest) — so the
        # union edge graph's components are exactly the first-2-words
        # groups, which DuckDB reproduces without recursion.
        import shutil
        import tempfile

        from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig

        d = _docs(spark, sf)
        first2 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2))
        first3 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))
        images = d.select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.encode(first2, "utf-8").alias("bytes"),
            first3.alias("caption"),
            F.xxhash64(first2).alias("phash"),
        )
        wh = os.path.join(tempfile.gettempdir(), "dupers_e2e_wh",
                          sf.strip("/").replace("/", "_"))
        shutil.rmtree(wh, ignore_errors=True)
        os.makedirs(wh, exist_ok=True)
        pipe = DedupPipeline(spark, PipelineConfig(warehouse=wh, fast=True))
        return pipe.run(images).select("image_id", "component_id")

    q["pipeline_components_e2e"] = pipeline_components_e2e

    def pipeline_incremental_e2e(spark, sf):
        # DedupPipeline.run_incremental value-checked end-to-end: full run
        # over the even half of the nested-key docs projection, then the
        # odd half arrives as an append batch (index stages probed and
        # appended, components re-clustered). The final assignment must
        # equal a full rebuild's — same first-2-words-group oracle as
        # pipeline_components_e2e.
        import shutil
        import tempfile

        from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig

        d = _docs(spark, sf)
        first2 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2))
        first3 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))
        images = d.select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.encode(first2, "utf-8").alias("bytes"),
            first3.alias("caption"),
            F.xxhash64(first2).alias("phash"),
            (F.col("doc_id") % 2).alias("par"),
        )
        old = images.filter(F.col("par") == 0).drop("par")
        new = images.filter(F.col("par") == 1).drop("par")
        wh = os.path.join(tempfile.gettempdir(), "dupers_inc_e2e_wh",
                          sf.strip("/").replace("/", "_"))
        shutil.rmtree(wh, ignore_errors=True)
        os.makedirs(wh, exist_ok=True)
        cfg = PipelineConfig(warehouse=wh, fast=True)
        DedupPipeline(spark, cfg).run(old)
        return DedupPipeline(spark, cfg).run_incremental(new).select(
            "image_id", "component_id")

    q["pipeline_incremental_e2e"] = pipeline_incremental_e2e

    def pipeline_mixed_incremental_e2e(spark, sf):
        # The MULTIMODAL pipeline end-to-end with an append: images (the
        # nested-key docs projection), a sibling AVI video corpus and a
        # sibling WAV audio corpus run through ONE DedupPipeline
        # (use_video/use_audio branches: decode → persisted token stage →
        # the shared LSH index family), base = even ids of every modality,
        # then a MIXED batch (odd images + odd videos + odd audio) arrives
        # via run_incremental — every family's persisted index is probed
        # and appended, and the single assignment table is re-clustered.
        # The oracle is the union of three closed forms: the docs
        # first-2-words grouping and the planted media group structure
        # (per 10-row group r0=base, r1=exact/half-gain copy, r2=trimmed
        # copy, r3..r9 singletons → root = (i//10)*10 for r≤2). The
        # cross-modality value hash breaks if ANY family's incremental
        # probe loses a cross-batch edge (r1 sits in the batch, r0/r2 in
        # the base) or the mixed recluster mislabels any modality.
        import shutil
        import tempfile

        from dupers_spark.plans.pipeline import DedupPipeline, PipelineConfig

        d = _docs(spark, sf)
        first2 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2))
        first3 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))
        images = d.select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.encode(first2, "utf-8").alias("bytes"),
            first3.alias("caption"),
            F.xxhash64(first2).alias("phash"),
            (F.col("doc_id") % 2).alias("par"),
        )
        videos = datagen.make_videos(spark, 120).localCheckpoint()
        audio = datagen.make_audio(spark, 120).localCheckpoint()
        mpar = F.substring("media_id", -1, 1).cast("int") % 2
        wh = os.path.join(tempfile.gettempdir(), "dupers_mixed_e2e_wh",
                          sf.strip("/").replace("/", "_"))
        shutil.rmtree(wh, ignore_errors=True)
        os.makedirs(wh, exist_ok=True)
        cfg = PipelineConfig(warehouse=wh, fast=True, use_video=True,
                             use_audio=True, video_every_n=1)
        DedupPipeline(spark, cfg).run(
            images.filter(F.col("par") == 0).drop("par"),
            videos.filter(mpar == 0), audio.filter(mpar == 0))
        return DedupPipeline(spark, cfg).run_incremental(
            images.filter(F.col("par") == 1).drop("par"),
            videos.filter(mpar == 1), audio.filter(mpar == 1),
        ).select("image_id", "component_id")

    q["pipeline_mixed_incremental_e2e"] = pipeline_mixed_incremental_e2e

    def incremental_lsh_components(spark, sf):
        # Append-batch near-dup probe value-checked end-to-end: docs split
        # by doc_id parity; the even half is the "existing corpus" (full
        # LSH build), the odd half arrives as an append batch probed
        # against the persisted signature index (minhash_lsh.incremental_
        # near_dup_edges — the index side is broadcast-joined, never
        # reshuffled). Captions are first-3-words nested keys, so with
        # k=3 word shingles the caption graph's components are EXACTLY the
        # first-3-words groups (single-shingle Jaccard is 0 or 1) — SQL-
        # expressible without recursion. Cross-parity groups force real
        # cross-batch edges through the incremental path.
        from dupers_spark.operators import minhash_lsh as ml
        from dupers_spark.operators.components import with_singletons

        d = _docs(spark, sf)
        first3 = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 3))
        images = d.select(
            F.col("doc_id").cast("string").alias("image_id"),
            first3.alias("caption"),
            (F.col("doc_id") % 2).alias("par"),
        )
        old = images.filter(F.col("par") == 0).drop("par")
        new = images.filter(F.col("par") == 1).drop("par")
        cfg = ml.LSHConfig()
        edges_old, _v, _dr = ml.near_dup_edges(old, cfg)
        sigs_old = ml.signatures(
            ml.collapse_groups(old).select("rep_id", "caption"), cfg)
        edges_inc, _v2, _dr2, _sn = ml.incremental_near_dup_edges(
            sigs_old, new, cfg)
        comb = edges_old.unionByName(edges_inc)
        return with_singletons(
            connected_components(comb), images.select("image_id")
        ).select("image_id", "component_id")

    q["incremental_lsh_components"] = incremental_lsh_components

    def search_suffix_array(spark, sf):
        """Suffix-array index result — must equal the contains-scan oracle.

        The index round-trips through StageStore AND is maintained
        incrementally (build on the even docs → persist → APPEND the odd
        docs as new shards → read → query): what's value-checked is the
        persisted, incrementally-maintained index — the resumable artifact
        a repeated-query deployment actually probes (reference anchor: the
        bbolt-backed index + `up`'s new-keys-only puts,
        database.go:374-447, dupe.go:941-966).
        """
        import tempfile

        from dupers_spark.sources.storage import StageStore

        docs = _docs(spark, sf)
        with tempfile.TemporaryDirectory() as td:
            store = StageStore(spark, td)
            store.write("suffix_index", search.build_suffix_index(
                docs.filter(F.col("doc_id") % 2 == 0), "doc_id", "text",
                shards=8))
            search.append_suffix_index(
                store, "suffix_index",
                docs.filter(F.col("doc_id") % 2 == 1), "doc_id", "text")
            persisted = store.read("suffix_index")
            rows = search.query_suffix_index(persisted, "merge join").select(
                F.col("doc_id").cast("long").alias("doc_id")
            ).collect()  # materialize before the temp warehouse disappears
        return spark.createDataFrame(rows, "doc_id long")

    q["search_suffix_array"] = search_suffix_array

    # --- connected components over the dup-pair graph -------------------
    def cc_exact_groups(spark, sf):
        sigs = _docs_keyed(spark, sf).select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.col("digest").alias("sha256"),
        )
        pairs = exact.dup_pairs(sigs)
        return connected_components(pairs)

    q["cc_exact_groups"] = cc_exact_groups

    # --- text analysis (training-data ops) ------------------------------
    def token_stats(spark, sf):
        return textstats.add_token_stats(_docs(spark, sf)).select(
            "doc_id", "n_tokens", "est_bpe_tokens", F.round("avg_token_len", 6).alias("avg_token_len")
        )

    q["token_stats"] = token_stats

    def quality_scores(spark, sf):
        return textstats.quality_columns(_docs(spark, sf)).select(
            "doc_id",
            "n_tokens",
            F.round("stop_ratio", 6).alias("stop_ratio"),
            F.round("alpha_ratio", 6).alias("alpha_ratio"),
            "quality_score",
        )

    q["quality_scores"] = quality_scores

    def lang_id_counts(spark, sf):
        return (
            textstats.lang_id(_docs(spark, sf))
            .groupBy("lang_guess")
            .agg(F.count("*").alias("cnt"))
        )

    q["lang_id_counts"] = lang_id_counts

    def doc_fingerprint(spark, sf):
        return textstats.fingerprint(_docs(spark, sf), "text", 4, "doc_id")

    q["doc_fingerprint"] = doc_fingerprint

    def minhash_poly(spark, sf):
        return dedup_text.minhash_rows_poly(_docs(spark, sf), num_perm=8)

    q["minhash_poly"] = minhash_poly

    def ngram_jaccard(spark, sf):
        # max_df=None: exact semantics for the value oracle (the production
        # default keeps the document-frequency flood guard ON)
        return dedup_text.ngram_jaccard_pairs(
            _docs(spark, sf), k=3, threshold=0.2, max_df=None
        )[0]

    q["ngram_jaccard"] = ngram_jaccard

    def simhash_docs(spark, sf):
        # poly-hash-seeded 30-bit simhash — cross-engine value oracle; the
        # production xxhash64 simhash64 path is pytest-gated instead.
        return dedup_text.simhash_table_poly(_docs(spark, sf))

    q["simhash_docs"] = simhash_docs

    def simhash_near_pairs(spark, sf):
        # the Hamming-ball ENGINE itself (pigeonhole blocks + hierarchical
        # refinement + verify) value-checked end-to-end: poly 30-bit
        # simhash → hamming_candidates → verify_hamming, against DuckDB's
        # O(n²) bit_count(xor) ≤ 3 oracle
        from dupers_spark.operators import simhash as sh_ops

        t = dedup_text.simhash_table_poly(_docs(spark, sf))
        reps = t.select(F.col("id").cast("string").alias("rep_id"),
                        F.col("simhash").alias("sig"))
        cands, _dropped = sh_ops.hamming_candidates(reps, radius=3)
        ver = sh_ops.verify_hamming(cands, reps, radius=3)
        al, bl = F.col("a").cast("long"), F.col("b").cast("long")
        return ver.select(
            F.least(al, bl).alias("a"), F.greatest(al, bl).alias("b"),
            F.col("dist").cast("int").alias("dist"),
        )

    q["simhash_near_pairs"] = simhash_near_pairs

    # --- archive scan (dupers `up+`, SURVEY S4) --------------------------
    def archive_scan_members(spark, sf):
        # documents zipped per source (deterministic), then exploded +
        # hashed by the archive-scan operator; the oracle recomputes member
        # digests directly from the text column.
        from dupers_spark.operators import archive

        zips = datagen.zip_documents(_docs(spark, sf))
        scan = archive.archive_scan(zips, id_col="archive_id")
        return scan.filter(F.col("ok")).select("member_id", "sha256", "n_bytes")

    q["archive_scan_members"] = archive_scan_members

    def archive_scan_7z(spark, sf):
        # same member/digest contract, but through the 7z reader's modern
        # layout: LZMA2 folders + an ENCODED (compressed) header — the
        # kEncodedHeader decode path value-checked end-to-end.
        from dupers_spark.operators import archive

        svz = datagen.sevenz_documents(_docs(spark, sf))
        scan = archive.archive_scan(svz, id_col="archive_id")
        return scan.filter(F.col("ok")).select("member_id", "sha256", "n_bytes")

    q["archive_scan_7z"] = archive_scan_7z

    # --- similarity search ----------------------------------------------
    def ann_topk(spark, sf):
        e = _emb(spark, sf)
        probes = e.filter(F.col("vec_id") < 8)
        out = ann.brute_force_topk(e, probes, k=3)
        return out.select(
            "probe_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rnk"
        )

    q["ann_topk"] = ann_topk

    def ann_ivf_exhaustive(spark, sf):
        # IVF machinery (k-means centroids, bucket assignment, nprobe
        # candidate join, re-rank) value-checked end-to-end: with
        # nprobe = n_centroids every bucket is visited, so the result must
        # equal exact brute force — same oracle as ann_topk. HOF re-rank
        # matches DuckDB's left-fold bit-for-bit; the approximate
        # nprobe ≪ n_centroids path is recall-gated in tests/test_ann.py.
        e = _emb(spark, sf)
        probes = e.filter(F.col("vec_id") < 8)
        out = ann.ivf_topk(e, probes, k=3, n_centroids=16, nprobe=16,
                           rerank="hof")
        return out.select(
            "probe_id", "neighbor_id", F.round("cos", 5).alias("cos"), "rnk"
        )

    q["ann_ivf_exhaustive"] = ann_ivf_exhaustive

    def embedding_near_dups(spark, sf):
        # EXACT all-pairs variant (oracle-checkable); the SRP-bucketed
        # approximate path is pytest-gated instead (tests/test_ann.py).
        # threshold 0.3: the sf corpora are near-random (top cos ≈ 0.51 at
        # sf0.01), so 0.3 yields ~1k real pairs for the value hash to bite on
        out = ann.cosine_pairs_exact(_emb(spark, sf), threshold=0.3)
        return out.select("a", "b", F.round("cos", 5).alias("cos"))

    q["embedding_near_dups"] = embedding_near_dups

    def _planted_embeddings(spark, sf):
        """embeddings ∪ exact-direction copies (×2-scaled, id+10,000,001)
        of every vec_id % 20 == 0 row. A positive scalar multiple has
        cosine EXACTLY 1.0 with its base and an IDENTICAL SRP sign pattern
        (sign(w·2v) = sign(w·v) for every hyperplane), so each planted pair
        collides in ALL L tables — SRP recall on the planted set is
        provably 1.0, not probabilistically high. Random sf pairs top out
        near cos 0.51, far under the τ=0.8 verify, so the SRP output is
        exactly the planted-pair set — value-checkable against the exact
        all-pairs oracle."""
        e = _emb(spark, sf).select("vec_id", "embedding")
        scaled = e.filter(F.col("vec_id") % 20 == 0).select(
            (F.col("vec_id") + F.lit(10_000_001)).alias("vec_id"),
            F.expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))")
            .alias("embedding"),
        )
        return e, scaled

    def embedding_srp_near_dups(spark, sf):
        # the PRODUCTION SRP path (L-table OR-construction, ann.py
        # embedding_near_dup_pairs) — not the exact-pairs twin — run at a
        # threshold where its recall is provably 1.0 (see _planted_embeddings)
        e, scaled = _planted_embeddings(spark, sf)
        out, _dropped = ann.embedding_near_dup_pairs(
            e.unionByName(scaled), threshold=0.8, dim=64)
        return out.select("a", "b", F.round("cos", 5).alias("cos"))

    q["embedding_srp_near_dups"] = embedding_srp_near_dups

    def embedding_srp_incremental(spark, sf):
        # incremental probe against a persisted SRP index: index = the
        # original embeddings, append batch = the planted copies. Every
        # planted pair straddles the split, old×old pairs are empty at
        # τ=0.8, so the incremental probe's output alone must equal the
        # full-build / exact oracle pair set.
        e, scaled = _planted_embeddings(spark, sf)
        idx = ann.srp_index(e, dim=64)
        verified, _dropped, _idx_new = ann.incremental_embedding_near_dups(
            idx, scaled, threshold=0.8, dim=64)
        return verified.select("a", "b", F.round("cos", 5).alias("cos"))

    q["embedding_srp_incremental"] = embedding_srp_incremental

    # --- multimodal decode engines (planted-truth oracles) ---------------
    def video_near_dup_components(spark, sf):
        # The video engine END-TO-END on a deterministic planted corpus:
        # AVI encode (datagen.make_videos) → stdlib RIFF decode → frame
        # phash token sequences → caption MinHash/LSH engine → connected
        # components. DuckDB cannot decode AVI, but the clustering truth is
        # closed-form BY CONSTRUCTION (per 10-row group: r0 base, r1 exact
        # byte copy, r2 trimmed copy sharing 9/11 frame 2-shingles ⇒
        # J≈0.82 ≥ τ, r3..r9 fresh singletons), so the oracle reproduces
        # the FULL (media_id, component_id=min member) assignment without
        # touching pixels. A split cluster (recall slip), merged groups
        # (precision slip) or cross-group phash collision all break the
        # value hash.
        from dupers_spark.operators import video as vo
        from dupers_spark.operators.components import with_singletons

        videos = datagen.make_videos(spark, 120).localCheckpoint()
        edges, _verified, _dropped = vo.video_near_dup_edges(
            videos, every_n=1)
        assign = with_singletons(
            connected_components(edges), videos.select("media_id"),
            id_col="media_id")
        return assign.select(F.col("image_id").alias("media_id"),
                             "component_id")

    q["video_near_dup_components"] = video_near_dup_components

    def jpeg_psnr_invariant(spark, sf):
        # The REAL baseline-JPEG codec (functions/jpegcodec.py, round 6 —
        # replaces the fake lossy container) value-checked through the
        # BASELINE input_hint's decoded-pixel invariant: every planted
        # (r0 base, r2 re-encode-in-other-fmt) pair must decode comparable
        # and meet PSNR ≥ 40 dB. With 24 groups, 8 have base bmp → r2 JPG
        # (lossy path: DCT, quantization, Huffman, YCbCr round-trip all in
        # the loop) and 8 have base jpg as the DECODE side; the remaining
        # pairs are lossless (psnr inf ⇒ ok). The closed-form oracle says
        # simply: all 24 pairs comparable and passing — any codec drift
        # below the invariant, geometry bug, or decode failure breaks the
        # value hash.
        from dupers_spark.operators import multimodal as mm

        images = datagen.make_images(spark, 240)
        pairs = spark.range(24).select(
            F.format_string("img_%08d", F.col("id") * 10).alias("a"),
            F.format_string("img_%08d", F.col("id") * 10 + 2).alias("b"))
        res = mm.pair_psnr(pairs, images)
        return res.select(
            "a", "b",
            (F.col("pixels_comparable")
             & (F.col("psnr_db") >= F.lit(40.0))).alias("psnr_ok"))

    q["jpeg_psnr_invariant"] = jpeg_psnr_invariant

    def jpeg_progressive_equiv(spark, sf):
        # Round-6 progressive decode value-checked end-to-end: for each
        # deterministic pixel matrix, a baseline (SOF0) and a progressive
        # (SOF2, 14-scan spectral-selection + successive-approximation
        # script) stream carry the SAME quantized coefficients, so the
        # decoded pixels must be bit-identical — pair_psnr reports
        # psnr=inf. Closed form: every pair comparable and exact. Runs
        # through the SAME Arrow pair_psnr operator the pipeline's
        # decoded-pixel invariant stage uses.
        from dupers_spark.operators import multimodal as mm

        n = 16

        def gen(batches):
            import numpy as np
            import pandas as pd

            from dupers_spark.functions.jpegcodec import (
                encode_baseline_jpeg,
                encode_progressive_jpeg,
            )

            for pdf in batches:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    rng = np.random.default_rng(1000 + i)
                    px = rng.integers(0, 256, (8 + i, 11 + i, 3),
                                      dtype=np.uint8)
                    px[(8 + i) // 2:] = 64  # flat half → EOBn coverage
                    ids += [f"jb_{i:04d}", f"jp_{i:04d}"]
                    blobs += [encode_baseline_jpeg(px, 2),
                              encode_progressive_jpeg(
                                  px, 2, spectral_only=i % 2 == 0)]
                yield pd.DataFrame({"image_id": ids, "bytes": blobs,
                                    "fmt": ["jpg"] * len(ids)})

        images = spark.range(0, n, 1, 4).mapInPandas(
            gen, "image_id string, bytes binary, fmt string")
        pairs = spark.range(n).select(
            F.format_string("jb_%04d", F.col("id")).alias("a"),
            F.format_string("jp_%04d", F.col("id")).alias("b"))
        res = mm.pair_psnr(pairs, images)
        return res.select(
            "a", "b",
            (F.col("pixels_comparable")
             & (F.col("psnr_db") == F.lit(float("inf")))).alias("exact"))

    q["jpeg_progressive_equiv"] = jpeg_progressive_equiv

    def audio_wav_features(spark, sf):
        # WAV-PCM decode path value-checked: deterministic square-wave
        # clips (alternating ±A samples, 4096 samples @ 8 kHz mono 16-bit)
        # make every reported feature closed-form — duration = 4096/8000,
        # rms = sqrt(fl((A/32767)²)) (the 4096-sample pairwise mean of
        # identical values is exact: power-of-two count), clipping = 1.0
        # iff A/32767 ≥ 0.999. The oracle computes the IDENTICAL float
        # expressions, so the driver's %.9g value hash matches
        # bit-for-bit. Final row is a malformed payload pinning the
        # decode_ok=False accounting path.
        from dupers_spark.operators import multimodal as mm

        n = 64

        def gen(batches):
            import numpy as np
            import pandas as pd

            # the one WAV-container writer (mono/16-bit/8kHz contract)
            from dupers_spark.sources.datagen import _audio_wav

            for pdf in batches:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    ids.append(f"aud_{i:04d}")
                    if i == n - 1:
                        blobs.append(b"not a riff payload")
                        continue
                    amp = 32767 if i % 8 == 0 else 300 + 497 * i
                    x = np.empty(4096, dtype="<i2")
                    x[0::2], x[1::2] = amp, -amp
                    blobs.append(_audio_wav(x))
                yield pd.DataFrame({"media_id": ids, "bytes": blobs})

        media = spark.range(0, n, 1, 4).mapInPandas(
            gen, "media_id string, bytes binary")
        feats = mm.audio_features(media)
        return feats.select(
            "media_id", "duration_s", "sample_rate", "n_channels",
            F.round("rms", 6).alias("rms"), "clipping_rate", "decode_ok")

    q["audio_wav_features"] = audio_wav_features

    def audio_compressed_features(spark, sf):
        # The round-6 compressed-WAV decoders (functions/wavcodec.py —
        # G.711 µ-law/A-law, IEEE float, IMA ADPCM) value-checked through
        # the same square-wave closed form as audio_wav_features: an
        # alternating ±A clip decodes to ±A' where A' is the companding
        # round-trip value, a pure integer formula the oracle re-derives
        # in SQL (mag=A+132; e=⌊log2 mag⌋−7; mant=⌊mag/2^(e+3)⌋ mod 16;
        # A'=(8·mant+132)·2^e−132 for µ-law, and the A-law analogue).
        # ADPCM is sequential (no closed-form rms) so its fidelity is
        # pinned by pytest SNR gates; here its container fields and
        # decode_ok are value-checked with rms/clip masked NULL.
        from dupers_spark.operators import multimodal as mm

        n = 48

        def gen(batches):
            import numpy as np
            import pandas as pd

            from dupers_spark.functions import wavcodec as wc

            tags = [wc.WAVE_MULAW, wc.WAVE_ALAW, wc.WAVE_FLOAT,
                    wc.WAVE_IMA_ADPCM]
            for pdf in batches:
                ids, blobs = [], []
                for i in pdf["id"]:
                    i = int(i)
                    ids.append(f"g711_{i:04d}")
                    amp = 400 + 512 * i
                    x = np.empty(4096, dtype="<i2")
                    x[0::2], x[1::2] = amp, -amp
                    tag = tags[i % 4]
                    src = (x.astype(np.float32) / 32767.0
                           if tag == wc.WAVE_FLOAT else x)
                    blobs.append(wc.encode_wav(src, 8000, tag))
                yield pd.DataFrame({"media_id": ids, "bytes": blobs})

        media = spark.range(0, n, 1, 4).mapInPandas(
            gen, "media_id string, bytes binary")
        feats = mm.audio_features(media)
        adpcm = (F.substring("media_id", 6, 4).cast("int") % 4) == 3
        return feats.select(
            "media_id", "duration_s", "sample_rate", "n_channels",
            F.when(~adpcm, F.round("rms", 6)).alias("rms"),
            F.when(~adpcm, F.col("clipping_rate")).alias("clipping_rate"),
            "decode_ok")

    q["audio_compressed_features"] = audio_compressed_features

    def audio_near_dup_components(spark, sf):
        # The audio engine END-TO-END on a deterministic planted corpus:
        # WAV-PCM decode → windowed peak-band fingerprint tokens (exactly
        # gain-invariant rank statistic) → caption MinHash/LSH engine →
        # connected components. Clustering truth is closed-form BY
        # CONSTRUCTION (per 10-row group: r0 base, r1 exact HALF-GAIN copy
        # — byte-different, token-identical, collapses structurally —
        # r2 window-aligned trim sharing 13/15 token 2-shingles ⇒ J≈0.87
        # ≥ τ, r3..r9 fresh singletons), so the oracle reproduces the full
        # (media_id, component_id=min member) assignment with no decoding.
        from dupers_spark.operators import audio as ao
        from dupers_spark.operators.components import with_singletons

        clips = datagen.make_audio(spark, 120).localCheckpoint()
        edges, _verified, _dropped = ao.audio_near_dup_edges(clips)
        assign = with_singletons(
            connected_components(edges), clips.select("media_id"),
            id_col="media_id")
        return assign.select(F.col("image_id").alias("media_id"),
                             "component_id")

    q["audio_near_dup_components"] = audio_near_dup_components

    def events_windowed(spark, sf):
        from dupers_spark.streaming.ingest import windowed_event_counts

        ev = spark.read.parquet(f"{sf}/events.parquet")
        out = windowed_event_counts(ev)
        return out.select(
            "win_start", "event_type", "cnt", F.round("sum_value", 4).alias("sum_value")
        )

    q["events_windowed"] = events_windowed

    def top_customers(spark, sf):
        from pyspark.sql import Window

        orders = spark.read.parquet(f"{sf}/orders.parquet")
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        spend = orders.groupBy("o_custkey").agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend")
        )
        w = Window.orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        top = spend.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)
        return top.join(F.broadcast(cust), top.o_custkey == cust.c_custkey).select(
            "o_custkey", "c_name", "total_spend", "rnk"
        )

    q["top_customers"] = top_customers

    def revenue_by_nation(spark, sf):
        li = _lineitem(spark, sf)
        orders = spark.read.parquet(f"{sf}/orders.parquet")
        cust = spark.read.parquet(f"{sf}/customer.parquet")
        nation = spark.read.parquet(f"{sf}/nation.parquet")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"),
                 F.count("*").alias("cnt"))
        )

    q["revenue_by_nation"] = revenue_by_nation

    def events_json_extract(spark, sf):
        # JSON prop extraction + per-type aggregation (events.props is a
        # JSON string column)
        ev = spark.read.parquet(f"{sf}/events.parquet")
        return (
            ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"), F.sum("k").alias("sum_k"),
                 F.max("k").alias("max_k"))
        )

    q["events_json_extract"] = events_json_extract

    def doc_stats_rollup(spark, sf):
        # hierarchical stats for pipeline dashboards: rollup (lang, source).
        # NULL grouping markers coalesced so cross-engine value hashing is
        # representation-independent.
        return (
            _docs(spark, sf)
            .rollup("lang", "source")
            .agg(F.count("*").alias("cnt"), F.sum("n_chars").alias("sum_chars"))
            .select(
                F.coalesce("lang", F.lit("<all>")).alias("lang"),
                F.coalesce("source", F.lit("<all>")).alias("source"),
                "cnt", "sum_chars",
            )
        )

    q["doc_stats_rollup"] = doc_stats_rollup

    def quality_filter(spark, sf):
        scored = textstats.quality_columns(_docs(spark, sf))
        return scored.filter(F.col("quality_score") >= 0.5).select("doc_id")

    q["quality_filter"] = quality_filter

    # --- classic agg sanity (lineitem) ----------------------------------
    def lineitem_pricing(spark, sf):
        li = _lineitem(spark, sf)
        return (
            li.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
                F.count("*").alias("cnt"),
            )
        )

    q["lineitem_pricing"] = lineitem_pricing

    return q


# ------------------------------------------------------------ oracle SQL

def _poly_sql(expr: str, mod: int = 1_000_000_007) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(range(1, greatest(length({expr}), 1) + 1), "
        f"i -> CAST(ascii(substring({expr}, CAST(i AS INTEGER), 1)) AS BIGINT))), "
        f"(acc, c) -> (acc * 31 + c) % {mod})"
    )


_SHINGLES_SQL = (
    # distinct word k-shingles of text (k=3), DuckDB twin of word_shingles
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1), "
    "i -> array_to_string(string_split_regex(trim(text), '\\s+')"
    "[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ')))"
)


def _shingles_sql(k: int) -> str:
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - {k - 1}, 1) + 1), "
        "i -> array_to_string(string_split_regex(trim(text), '\\s+')"
        f"[CAST(i AS INTEGER):CAST(i + {k - 1} AS INTEGER)], ' ')))"
    )


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    keyed = f"SELECT doc_id, {_KEY_SQL} AS digest FROM documents"

    o["exact_dup_groups"] = f"""
        SELECT digest AS sha256, count(*) AS cnt, min(doc_id) AS exemplar
        FROM ({keyed}) GROUP BY digest HAVING count(*) >= 2
    """

    o["exact_dup_pairs"] = f"""
        WITH s AS ({keyed})
        SELECT l.doc_id AS a, r.doc_id AS b
        FROM s l JOIN s r ON l.digest = r.digest AND l.doc_id < r.doc_id
    """

    o["first_exemplar"] = f"""
        SELECT digest AS sha256, min(doc_id) AS exemplar FROM ({keyed}) GROUP BY digest
    """

    o["incremental_new"] = """
        SELECT doc_id AS image_id, n_chars FROM documents
        WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0)
    """

    o["clean_gc"] = """
        SELECT doc_id AS image_id, n_chars FROM documents WHERE doc_id % 2 = 0
    """

    o["probe_matches"] = f"""
        WITH s AS ({keyed}),
             ex AS (SELECT digest, min(doc_id) AS exemplar FROM s GROUP BY digest)
        SELECT s.digest AS sha256, s.doc_id AS image_id, ex.exemplar
        FROM s JOIN ex ON s.digest = ex.digest
        WHERE s.doc_id <> ex.exemplar
    """

    o["ls_listing"] = f"""
        SELECT digest AS sha256, doc_id AS image_id FROM ({keyed}) ORDER BY doc_id
    """

    o["bucket_info"] = f"""
        SELECT source AS bucket, count(*) AS items,
               CAST(sum(length(CAST(doc_id AS VARCHAR)) + 32) AS BIGINT) AS kv_bytes
        FROM documents GROUP BY source ORDER BY source
    """

    o["sensen_delete"] = f"""
        WITH s AS (
          SELECT source || '_g' || CAST(doc_id % 7 AS VARCHAR)
                   || '/sub' || CAST(doc_id % 3 AS VARCHAR)
                   || '/doc_' || CAST(doc_id AS VARCHAR)
                   || (CASE WHEN doc_id % 51 = 0 THEN '.exe' ELSE '.txt' END) AS image_id,
                 source || '_g' || CAST(doc_id % 7 AS VARCHAR) AS dir,
                 {_KEY_SQL} AS sha256,
                 (doc_id % 51 = 0) AS is_exe
          FROM documents),
        keep AS (SELECT DISTINCT dir FROM s WHERE is_exe)
        SELECT image_id, sha256 FROM s
        WHERE dir NOT IN (SELECT dir FROM keep)
    """

    o["search_contains"] = """
        SELECT doc_id FROM documents WHERE contains(text, 'merge join')
    """
    o["search_contains_nocase"] = """
        SELECT doc_id FROM documents WHERE contains(lower(text), lower('MERGE JOIN'))
    """
    o["search_part_name"] = """
        SELECT p_partkey, p_name FROM part WHERE contains(p_name, 'red')
    """
    o["search_suffix_array"] = """
        SELECT doc_id FROM documents WHERE contains(text, 'merge join')
    """

    o["search_basename"] = """
        SELECT doc_id FROM documents
        WHERE contains('doc_' || CAST(doc_id AS VARCHAR) || '.txt', 'doc_7')
    """

    o["search_exact_caption"] = """
        SELECT doc_id FROM documents
        WHERE text = (SELECT text FROM documents WHERE doc_id = 0)
    """

    o["delete_dupe_candidates"] = f"""
        WITH s AS ({keyed}),
             ex AS (SELECT digest, min(doc_id) AS exemplar FROM s GROUP BY digest)
        SELECT s.doc_id AS image_id, s.digest AS sha256
        FROM s JOIN ex ON s.digest = ex.digest
        WHERE s.doc_id <> ex.exemplar
    """

    o["merge_upsert"] = f"""
        SELECT doc_id AS image_id,
               CASE WHEN doc_id % 5 = 0 THEN 'new:' || digest ELSE digest END AS sha256
        FROM ({keyed})
    """

    o["mv_rm_buckets"] = """
        WITH b AS (SELECT DISTINCT source FROM documents),
             first_b AS (SELECT min(source) AS v FROM b),
             second_b AS (SELECT min(source) AS v FROM b
                          WHERE source > (SELECT v FROM first_b))
        SELECT CASE WHEN source = (SELECT v FROM first_b)
                    THEN 'renamed_bucket/doc_' || CAST(doc_id AS VARCHAR)
                    ELSE source || '/doc_' || CAST(doc_id AS VARCHAR) END AS image_id,
               CASE WHEN source = (SELECT v FROM first_b)
                    THEN 'renamed_bucket' ELSE source END AS bucket,
               CAST(doc_id AS VARCHAR) AS sha256
        FROM documents
        WHERE source <> (SELECT v FROM second_b)
    """

    o["csv_roundtrip"] = f"""
        WITH b AS (SELECT min(source) AS v FROM documents)
        SELECT source || '/doc_' || CAST(doc_id AS VARCHAR) AS image_id,
               source AS bucket, {_KEY_SQL} AS sha256
        FROM documents WHERE source = (SELECT v FROM b)
    """

    o["pipeline_components_e2e"] = """
        WITH s AS (
          SELECT CAST(doc_id AS VARCHAR) AS image_id,
                 array_to_string((string_split(text, ' '))[1:2], ' ') AS k
          FROM documents),
        grp AS (SELECT k, min(image_id) AS root FROM s GROUP BY k)
        SELECT s.image_id, grp.root AS component_id
        FROM s JOIN grp USING (k)
    """

    o["pipeline_incremental_e2e"] = """
        WITH s AS (
          SELECT CAST(doc_id AS VARCHAR) AS image_id,
                 array_to_string((string_split(text, ' '))[1:2], ' ') AS k
          FROM documents),
        grp AS (SELECT k, min(image_id) AS root FROM s GROUP BY k)
        SELECT s.image_id, grp.root AS component_id
        FROM s JOIN grp USING (k)
    """

    # the mixed multimodal assignment = docs grouping ∪ the two planted
    # media closed forms (same per-10-row group structure as the
    # video/audio engine oracles)
    o["pipeline_mixed_incremental_e2e"] = """
        WITH s AS (
          SELECT CAST(doc_id AS VARCHAR) AS image_id,
                 array_to_string((string_split(text, ' '))[1:2], ' ') AS k
          FROM documents),
        grp AS (SELECT k, min(image_id) AS root FROM s GROUP BY k),
        med AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 120))
        SELECT s.image_id, grp.root AS component_id
        FROM s JOIN grp USING (k)
        UNION ALL
        SELECT printf('vid_%08d', i),
               printf('vid_%08d',
                      CASE WHEN i % 10 <= 2 THEN (i // 10) * 10 ELSE i END)
        FROM med
        UNION ALL
        SELECT printf('aud_%08d', i),
               printf('aud_%08d',
                      CASE WHEN i % 10 <= 2 THEN (i // 10) * 10 ELSE i END)
        FROM med
    """

    o["incremental_lsh_components"] = """
        WITH s AS (
          SELECT CAST(doc_id AS VARCHAR) AS image_id,
                 array_to_string((string_split(text, ' '))[1:3], ' ') AS k
          FROM documents),
        grp AS (SELECT k, min(image_id) AS root FROM s GROUP BY k)
        SELECT s.image_id, grp.root AS component_id
        FROM s JOIN grp USING (k)
    """

    o["cc_exact_groups"] = f"""
        WITH s AS ({keyed}),
             grp AS (SELECT digest, min(CAST(doc_id AS VARCHAR)) AS root,
                            count(*) AS cnt
                     FROM s GROUP BY digest)
        SELECT CAST(s.doc_id AS VARCHAR) AS image_id, grp.root AS component_id
        FROM s JOIN grp ON s.digest = grp.digest
        WHERE grp.cnt >= 2
    """

    toks = "string_split_regex(trim(text), '\\s+')"
    ntok = f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({toks}) END"
    o["token_stats"] = f"""
        SELECT doc_id,
               {ntok} AS n_tokens,
               CAST(floor(length(text) / 4) AS BIGINT) AS est_bpe_tokens,
               round(CASE WHEN {ntok} > 0
                     THEN CAST(list_sum(list_transform({toks}, t -> length(t))) AS DOUBLE) / {ntok}
                     ELSE 0.0 END, 6) AS avg_token_len
        FROM documents
    """

    stop_list = "['the','a','an','of','and','or','to','in','is','it']"
    nstop = f"len(list_filter({toks}, t -> list_contains({stop_list}, t)))"
    alpha = "length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))"
    o["quality_scores"] = f"""
        SELECT doc_id,
               {ntok} AS n_tokens,
               round(CASE WHEN {ntok} > 0 THEN CAST({nstop} AS DOUBLE) / {ntok} ELSE 0.0 END, 6) AS stop_ratio,
               round(CASE WHEN length(text) > 0 THEN CAST({alpha} AS DOUBLE) / length(text) ELSE 0.0 END, 6) AS alpha_ratio,
               round(least(CAST({ntok} AS DOUBLE) / 64.0, 1.0) * 0.4
                     + (CASE WHEN length(text) > 0 THEN CAST({alpha} AS DOUBLE) / length(text) ELSE 0.0 END) * 0.4
                     + least((CASE WHEN {ntok} > 0 THEN CAST({nstop} AS DOUBLE) / {ntok} ELSE 0.0 END) * 4.0, 1.0) * 0.2,
                     6) AS quality_score
        FROM documents
    """

    def marker_cnt(words: list[str]) -> str:
        lst = "[" + ",".join(f"'{w}'" for w in words) + "]"
        return f"len(list_filter({toks}, t -> list_contains({lst}, t)))"

    c_en = marker_cnt(["the", "and", "of", "is", "with"])
    c_de = marker_cnt(["der", "und", "die", "nicht", "ist"])
    c_fr = marker_cnt(["le", "et", "les", "des", "est"])
    c_es = marker_cnt(["el", "y", "los", "que", "es"])
    o["lang_id_counts"] = f"""
        WITH g AS (
          SELECT CASE
            WHEN greatest({c_en},{c_de},{c_fr},{c_es}) = 0 THEN 'und'
            WHEN {c_en} = greatest({c_en},{c_de},{c_fr},{c_es}) THEN 'en'
            WHEN {c_de} = greatest({c_en},{c_de},{c_fr},{c_es}) THEN 'de'
            WHEN {c_fr} = greatest({c_en},{c_de},{c_fr},{c_es}) THEN 'fr'
            ELSE 'es' END AS lang_guess
          FROM documents)
        SELECT lang_guess, count(*) AS cnt FROM g GROUP BY lang_guess
    """

    sh4 = _shingles_sql(4)
    o["doc_fingerprint"] = f"""
        SELECT doc_id,
               list_min(list_transform({sh4}, s -> {_poly_sql('s')})) AS fingerprint
        FROM documents
    """

    a_co, b_co = H.perm_coeffs(8, 7)
    perm_rows = ", ".join(f"({i}, {int(a_co[i])}, {int(b_co[i])})" for i in range(8))
    sh3 = _shingles_sql(3)
    o["minhash_poly"] = f"""
        WITH perms(perm, a, b) AS (VALUES {perm_rows}),
             hashed AS (
               SELECT doc_id AS id,
                      list_transform({sh3}, s -> {_poly_sql('s')}) AS hs
               FROM documents)
        SELECT hashed.id AS id, perms.perm AS perm,
               list_min(list_transform(hashed.hs, h -> (perms.a * h + perms.b) % {P31})) AS minhash
        FROM hashed CROSS JOIN perms
    """

    o["ngram_jaccard"] = f"""
        WITH sh AS (
          SELECT doc_id AS id, unnest({sh3}) AS shingle FROM documents),
        sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
        p AS (
          SELECT l.id AS a, r.id AS b, count(*) AS common
          FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.id < r.id
          GROUP BY l.id, r.id)
        SELECT p.a, p.b,
               round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM p JOIN sizes sa ON p.a = sa.id JOIN sizes sb ON p.b = sb.id
        WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.2
    """

    # simhash_docs: poly-hash-seeded 30-bit simhash, bit-for-bit DuckDB twin
    bit_terms = " + ".join(
        f"(CASE WHEN coalesce(list_sum(list_transform(hs, "
        f"h -> 2 * ((h // {1 << b}) % 2) - 1)), 0) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(30)
    )
    o["simhash_docs"] = f"""
        WITH t AS (
          SELECT doc_id AS id,
                 CASE WHEN length(trim(text)) = 0 THEN CAST([] AS BIGINT[])
                      ELSE list_transform({toks}, tok -> {_poly_sql('tok')}) END AS hs
          FROM documents)
        SELECT id, CAST({bit_terms} AS BIGINT) AS simhash FROM t
    """

    o["simhash_near_pairs"] = f"""
        WITH t AS ({o["simhash_docs"]})
        SELECT l.id AS a, r.id AS b,
               CAST(bit_count(xor(l.simhash, r.simhash)) AS INTEGER) AS dist
        FROM t l JOIN t r ON l.id < r.id
        WHERE bit_count(xor(l.simhash, r.simhash)) <= 3
    """

    o["archive_scan_members"] = """
        SELECT source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS member_id,
               sha256(text) AS sha256,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
    """

    o["archive_scan_7z"] = """
        SELECT source || '.7z/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS member_id,
               sha256(text) AS sha256,
               CAST(strlen(text) AS BIGINT) AS n_bytes
        FROM documents
    """

    o["ann_topk"] = """
        WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
             p AS (SELECT vec_id AS probe_id, v AS pv FROM c WHERE vec_id < 8),
             scored AS (
               SELECT p.probe_id, c.vec_id AS neighbor_id,
                      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(range(1, len(c.v) + 1),
                          i -> c.v[CAST(i AS INTEGER)] * p.pv[CAST(i AS INTEGER)])), (x, y) -> x + y)
                      / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(c.v, x -> x * x)), (x, y) -> x + y))
                       * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(p.pv, x -> x * x)), (x, y) -> x + y))) AS cos
               FROM c CROSS JOIN p WHERE c.vec_id <> p.probe_id),
             ranked AS (
               SELECT probe_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY probe_id
                                         ORDER BY cos DESC, neighbor_id ASC) AS rnk
               FROM scored)
        SELECT probe_id, neighbor_id, round(cos, 5) AS cos, CAST(rnk AS INTEGER) AS rnk
        FROM ranked WHERE rnk <= 3
    """
    # IVF with nprobe = n_centroids is exact brute force by construction —
    # the oracle is identical; a divergence means the bucketing machinery
    # (centroid assignment / candidate join) lost or duplicated candidates
    o["ann_ivf_exhaustive"] = o["ann_topk"]

    # embedding near-dups: same left-fold double arithmetic both engines
    dot = ("list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           "list_transform(range(1, len(l.v) + 1), "
           "i -> l.v[CAST(i AS INTEGER)] * r.v[CAST(i AS INTEGER)])), (x, y) -> x + y)")
    nrm = ("sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           "list_transform({side}.v, x -> x * x)), (x, y) -> x + y))")
    o["embedding_near_dups"] = f"""
        WITH c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings)
        SELECT l.vec_id AS a, r.vec_id AS b,
               round({dot} / ({nrm.format(side='l')} * {nrm.format(side='r')}), 5) AS cos
        FROM c l JOIN c r ON l.vec_id < r.vec_id
        WHERE {dot} / ({nrm.format(side='l')} * {nrm.format(side='r')}) >= 0.3
    """

    # SRP production path vs the exact all-pairs truth over the planted
    # corpus (originals ∪ ×2-scaled copies of vec_id % 20 == 0, id
    # +10,000,001). Scaling by 2 is exact in float32 (exponent bump), the
    # τ=0.8 verify filters every non-planted pair, and planted pairs
    # collide in all SRP tables — so the approximate engine must reproduce
    # this exact result, not merely approximate it.
    o["embedding_srp_near_dups"] = f"""
        WITH planted AS (
               SELECT vec_id, embedding FROM embeddings
               UNION ALL
               SELECT vec_id + 10000001,
                      list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
               FROM embeddings WHERE vec_id % 20 = 0),
             c AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM planted)
        SELECT l.vec_id AS a, r.vec_id AS b,
               round({dot} / ({nrm.format(side='l')} * {nrm.format(side='r')}), 5) AS cos
        FROM c l JOIN c r ON l.vec_id < r.vec_id
        WHERE {dot} / ({nrm.format(side='l')} * {nrm.format(side='r')}) >= 0.8
    """
    # the incremental probe (originals indexed, copies appended) must land
    # on the identical pair set — same oracle by construction
    o["embedding_srp_incremental"] = o["embedding_srp_near_dups"]

    # planted-truth closed form (datagen.make_videos): per 10-row group,
    # rows r∈{0,1,2} cluster with min-member root r0, the rest are
    # singletons — DuckDB reproduces the full assignment with no decoding
    o["video_near_dup_components"] = """
        SELECT printf('vid_%08d', i) AS media_id,
               printf('vid_%08d',
                      CASE WHEN i % 10 <= 2 THEN (i // 10) * 10 ELSE i END)
                   AS component_id
        FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 120))
    """

    # same-coefficients baseline/progressive twins decode bit-identically
    o["jpeg_progressive_equiv"] = """
        SELECT printf('jb_%04d', i) AS a,
               printf('jp_%04d', i) AS b,
               true AS exact
        FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 16))
    """

    # the decoded-pixel invariant holds for every planted (r0, r2) pair —
    # lossless re-encodes are exact (psnr inf) and real-JPEG legs must
    # clear 40 dB, so the closed form is simply "all true"
    o["jpeg_psnr_invariant"] = """
        SELECT printf('img_%08d', i * 10) AS a,
               printf('img_%08d', i * 10 + 2) AS b,
               true AS psnr_ok
        FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 24))
    """

    # square-wave WAV closed form: the oracle evaluates the SAME IEEE-754
    # expressions the decoder does (see the queries() docstring), so the
    # %.9g float hash matches exactly; the last row is the malformed-
    # payload decode_ok=False branch
    o["audio_wav_features"] = """
        WITH s AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 63)),
        a AS (SELECT i,
                     CASE WHEN i % 8 = 0 THEN 32767
                          ELSE 300 + 497 * i END AS amp
              FROM s)
        SELECT printf('aud_%04d', i) AS media_id,
               4096.0 / 8000.0 AS duration_s,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(1 AS BIGINT) AS n_channels,
               round(sqrt((amp / 32767.0) * (amp / 32767.0)), 6) AS rms,
               CASE WHEN amp / 32767.0 >= 0.999
                    THEN 1.0 ELSE 0.0 END AS clipping_rate,
               TRUE AS decode_ok
        FROM a
        UNION ALL
        SELECT 'aud_0063', CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
               CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE), FALSE
    """

    # compressed-WAV closed form: the companding round-trip value A' is a
    # pure integer function of the planted amplitude (see the queries()
    # docstring), re-derived here; float32 rows quantize A/32767 through
    # REAL; ADPCM rows pin container fields with rms/clip masked (its
    # decode is sequential — fidelity is pytest-gated, not SQL-expressible)
    o["audio_compressed_features"] = """
        WITH s AS (SELECT CAST(range AS INTEGER) AS i FROM range(0, 48)),
        a AS (SELECT i, i % 4 AS f, 400 + 512 * i AS amp FROM s),
        d AS (SELECT i, f, amp,
                     CAST(floor(log2(amp + 132)) AS INTEGER) - 7 AS eu,
                     CAST(floor(log2(amp)) AS INTEGER) - 7 AS ea
              FROM a),
        v AS (SELECT i, f,
                     CASE f
                       WHEN 0 THEN (((CAST(floor((amp + 132)
                                          / power(2, eu + 3)) AS INTEGER)
                                      % 16) * 8 + 132) * power(2, eu)
                                    - 132) / 32767.0
                       WHEN 1 THEN ((CAST(floor(amp / power(2, ea + 3))
                                          AS INTEGER) % 16) * 16 + 264)
                                   * power(2, ea - 1) / 32767.0
                       WHEN 2 THEN CAST(CAST(amp / 32767.0 AS REAL)
                                        AS DOUBLE)
                     END AS xn
              FROM d)
        SELECT printf('g711_%04d', i) AS media_id,
               4096.0 / 8000.0 AS duration_s,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(1 AS BIGINT) AS n_channels,
               CASE WHEN f = 3 THEN NULL
                    ELSE round(sqrt(xn * xn), 6)
               END AS rms,
               CASE WHEN f = 3 THEN NULL ELSE 0.0 END AS clipping_rate,
               TRUE AS decode_ok
        FROM v
    """

    # same closed form as the video oracle (datagen.make_audio plants the
    # same group structure): {r0, r1, r2} cluster rooted at r0 + 7
    # singletons per 10-row group
    o["audio_near_dup_components"] = """
        SELECT printf('aud_%08d', i) AS media_id,
               printf('aud_%08d',
                      CASE WHEN i % 10 <= 2 THEN (i // 10) * 10 ELSE i END)
                   AS component_id
        FROM (SELECT CAST(range AS INTEGER) AS i FROM range(0, 120))
    """

    o["events_windowed"] = """
        SELECT date_trunc('hour', ts) AS win_start, event_type,
               count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """

    o["top_customers"] = """
        WITH spend AS (
          SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend
          FROM orders GROUP BY o_custkey),
        ranked AS (
          SELECT o_custkey, total_spend,
                 row_number() OVER (ORDER BY total_spend DESC, o_custkey ASC) AS rnk
          FROM spend)
        SELECT r.o_custkey, c.c_name, r.total_spend, CAST(r.rnk AS INTEGER) AS rnk
        FROM ranked r JOIN customer c ON r.o_custkey = c.c_custkey
        WHERE r.rnk <= 10
    """

    o["revenue_by_nation"] = """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """

    o["events_json_extract"] = """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
    """

    o["doc_stats_rollup"] = """
        SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
               count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP (lang, source)
    """

    o["quality_filter"] = f"""
        WITH s AS (
          SELECT doc_id,
                 round(least(CAST({ntok} AS DOUBLE) / 64.0, 1.0) * 0.4
                   + (CASE WHEN length(text) > 0 THEN CAST({alpha} AS DOUBLE) / length(text) ELSE 0.0 END) * 0.4
                   + least((CASE WHEN {ntok} > 0 THEN CAST({nstop} AS DOUBLE) / {ntok} ELSE 0.0 END) * 4.0, 1.0) * 0.2,
                   6) AS quality_score
          FROM documents)
        SELECT doc_id FROM s WHERE quality_score >= 0.5
    """

    o["lineitem_pricing"] = """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """

    return o
