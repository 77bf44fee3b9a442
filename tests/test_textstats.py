"""Text analysis unit checks on hand-built rows."""

from pyspark.sql import functions as F

from dupers_spark.operators import dedup_text, textstats


def _df(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog"),
            (1, "the quick brown fox and the lazy dog"),
            (2, "der hund und die katze ist nicht hier"),
            (3, ""),
            (4, "le chat et les chiens est des amis"),
            (5, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )


def test_token_stats(spark):
    out = {r["doc_id"]: r for r in textstats.add_token_stats(_df(spark)).collect()}
    assert out[0]["n_tokens"] == 8
    assert out[3]["n_tokens"] == 0
    assert out[0]["est_bpe_tokens"] == len("the quick brown fox and the lazy dog") // 4
    assert abs(out[0]["avg_token_len"] - (29 / 8)) < 1e-9  # 29 letters, 8 tokens


def test_quality_score_bounds(spark):
    rows = textstats.quality_columns(_df(spark)).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["stop_ratio"] <= 1.0
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[0]["stop_ratio"] > by_id[5]["stop_ratio"]


def test_lang_id(spark):
    out = {r["doc_id"]: r["lang_guess"] for r in textstats.lang_id(_df(spark)).collect()}
    assert out[0] == "en"
    assert out[2] == "de"
    assert out[4] == "fr"
    assert out[3] == "und"
    assert out[5] == "und"


def test_fingerprint_identity_and_difference(spark):
    fp = {r["doc_id"]: r["fingerprint"] for r in textstats.fingerprint(_df(spark)).collect()}
    assert fp[0] == fp[1]          # identical docs → identical fingerprint
    assert fp[0] != fp[2]


def test_exact_dup_groups(spark):
    groups = dedup_text.exact_dup_groups(_df(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["cnt"] == 2
    assert groups[0]["exemplar"] == 0


def test_minhash_rows_poly_identical_docs_agree(spark):
    rows = dedup_text.minhash_rows_poly(_df(spark), num_perm=8).collect()
    sig = {}
    for r in rows:
        sig.setdefault(r["id"], {})[r["perm"]] = r["minhash"]
    assert sig[0] == sig[1]
    assert sig[0] != sig[2]
    assert len(sig[0]) == 8


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (1, "alpha beta gamma delta epsilon zeta eta iota"),
            (2, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    s = {r["id"]: r["simhash"] for r in dedup_text.simhash_table(df).collect()}
    near = bin((s[0] ^ s[1]) & (2**64 - 1)).count("1")
    far = bin((s[0] ^ s[2]) & (2**64 - 1)).count("1")
    assert near < far


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h"),
            (1, "a b c d e f g x"),   # 6 shared 3-grams of (6,6)... high overlap
            (2, "p q r s t u v w"),
        ],
        ["doc_id", "text"],
    )
    # default path: the df-cap guard is ON (max_df=1000) but far above any
    # df here, so the result equals exact semantics with zero drops
    pairs, dropped = dedup_text.ngram_jaccard_pairs(df, k=3, threshold=0.5)
    assert {(p["a"], p["b"]) for p in pairs.collect()} == {(0, 1)}
    assert dropped.count() == 0
    # explicit opt-out keeps exact semantics (the oracle configuration)
    pairs_exact, _ = dedup_text.ngram_jaccard_pairs(
        df, k=3, threshold=0.5, max_df=None
    )
    assert {(p["a"], p["b"]) for p in pairs_exact.collect()} == {(0, 1)}


def test_ngram_jaccard_df_cap_bounds_flood(spark):
    """One shingle present in every doc must not quadratically explode the
    inverted-index join: with max_df set it is dropped and accounted."""
    n = 50
    # every doc starts with the same 3 words (one flood shingle) and then
    # has a unique tail — without a cap the flood shingle alone contributes
    # C(50,2)=1225 candidate pairs
    rows = [(i, f"common stop words unique{i} tail{i} end{i}") for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs, dropped = dedup_text.ngram_jaccard_pairs(
        df, k=3, threshold=0.01, max_df=10
    )
    d = {r["shingle"]: r["df"] for r in dropped.collect()}
    assert "common stop words" in d and d["common stop words"] == n
    assert pairs.count() == 0  # nothing shared beyond the dropped shingle
