"""Substring search engine — dupers' `search` semantics + suffix-array index.

Baseline variants reproduce pkg/database/database.go:374-447 and
pkg/cmd/task/search/search.go:47-78 exactly:

  contains            bytes.Contains(key, term)            case-sensitive
  contains_nocase     lowercase both sides
  basename            filepath.Base(key) before contains
  basename_nocase     both
  exact / exact_nocase  (-exact flag) whole-string equality

All are JVM predicates; Catalyst pushes the scan-side projection down. A
single query is one full scan — the suffix-array index below amortizes
repeated queries (north_rule upgrade, SURVEY §3.2).

Suffix-array design (distributed, shard-per-partition):
  * docs are hash-partitioned; each partition builds ONE suffix array over
    the concatenation of its docs (numpy argsort in applyInPandas — the
    only Python stage, Arrow-batched, justified: no SQL primitive sorts
    suffixes).
  * the index is a DataFrame (shard_id, concat, sa, doc_ids, offsets) —
    persisted as a parquet/Iceberg stage table, resumable.
  * a query fans out to all shards (classic search-index shard model),
    binary-searches the SA per shard (O(|term| · log n) per shard), unions
    matching doc ids. A global monolithic SA would serialize the build; the
    shard model keeps build AND query embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

SEP = "\x00"  # cannot occur in captions


# ----------------------------------------------------------- scan baselines

def search_contains(df: DataFrame, term: str, col: str = "caption",
                    case_sensitive: bool = True) -> DataFrame:
    """database.Compare / CompareNoCase (database.go:397-447)."""
    c = F.col(col)
    t = F.lit(term)
    pred = c.contains(t) if case_sensitive else F.lower(c).contains(F.lower(t))
    return df.filter(pred)


def search_basename(df: DataFrame, term: str, col: str = "image_id",
                    case_sensitive: bool = True) -> DataFrame:
    """CompareBase: match on the path basename only (database.go:426-431)."""
    base = F.element_at(F.split(F.col(col), "/"), -1)
    t = F.lit(term)
    pred = base.contains(t) if case_sensitive else F.lower(base).contains(F.lower(t))
    return df.filter(pred)


def search_exact(df: DataFrame, term: str, col: str = "caption",
                 case_sensitive: bool = True) -> DataFrame:
    """-exact flag: whole-string equality."""
    c = F.col(col)
    pred = (c == term) if case_sensitive else (F.lower(c) == term.lower())
    return df.filter(pred)


# ------------------------------------------------------- suffix-array index

def _suffix_array(s: str) -> np.ndarray:
    """O(n log² n) prefix-doubling suffix array, fully vectorized numpy.

    Ranks start from unicode code points, so suffix order equals Python
    string comparison order (what the binary-search probe uses).
    """
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.fromiter(map(ord, s), dtype=np.int64, count=n)
    idx = np.arange(n, dtype=np.int64)
    k = 1
    while True:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        new_rank = np.empty(n, dtype=np.int64)
        key_prev = (rank[order[:-1]], second[order[:-1]])
        key_cur = (rank[order[1:]], second[order[1:]])
        bump = (key_cur[0] != key_prev[0]) | (key_cur[1] != key_prev[1])
        new_rank[order] = np.concatenate(([0], np.cumsum(bump)))
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2
        if k >= n:
            return np.lexsort((idx, rank))


SA_SCHEMA = T.StructType([
    T.StructField("shard_id", T.IntegerType(), False),
    T.StructField("concat", T.StringType(), False),
    T.StructField("sa", T.ArrayType(T.IntegerType()), False),
    T.StructField("doc_ids", T.ArrayType(T.StringType()), False),
    T.StructField("offsets", T.ArrayType(T.IntegerType()), False),
])


def build_suffix_index(df: DataFrame, id_col: str = "image_id",
                       text_col: str = "caption", shards: int | None = None,
                       target_shard_bytes: int = 256 << 20,
                       shard_offset: int = 0) -> DataFrame:
    """One suffix array per shard over concatenated docs.

    applyInPandas-per-shard: numpy lexicographic suffix sort. The build is
    one shuffle + embarrassingly parallel sorts.

    Shard count is sized from DATA VOLUME, not core count: each shard
    stores its whole concatenation as one string row, and a single value
    has hard ~2 GB JVM/Arrow limits long before executor memory matters —
    a parallelism-derived count would blow through that at 100× scale.
    shards = ⌈Σ octet_length(text) / target_shard_bytes⌉ (floored at the
    session's parallelism so small corpora still build in parallel); the
    sizing agg is one column-pruned scan, paid once per index build.

    shard_offset: shifts this build's shard ids — the append primitive.
    An append batch is built as NEW shards beyond the existing index's
    (see :func:`append_suffix_index`); since every query fans out over
    all shards and unions doc hits, adding shards is exactly correct —
    no existing shard is ever re-sorted.
    """
    if shards is None:
        total_bytes = df.select(
            F.sum(F.octet_length(F.col(text_col).cast("string"))).alias("b")
        ).collect()[0]["b"] or 0
        by_volume = -(-int(total_bytes) // target_shard_bytes)  # ceil
        shards = max(df.sparkSession.sparkContext.defaultParallelism,
                     4, by_volume)

    sharded = df.select(
        (F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
         + F.lit(shard_offset)).alias("shard_id"),
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(text_col).alias("text"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")  # deterministic across parallelism
        texts = pdf["text"].fillna("").tolist()
        ids = pdf["doc_id"].astype(str).tolist()
        offsets, pos = [], 0
        for t in texts:
            offsets.append(pos)
            pos += len(t) + 1
        concat = SEP.join(texts) + SEP
        sa = _suffix_array(concat)
        return pd.DataFrame([{
            "shard_id": int(pdf["shard_id"].iloc[0]),
            "concat": concat,
            "sa": np.array(sa, dtype=np.int32),
            "doc_ids": ids,
            "offsets": np.array(offsets, dtype=np.int32),
        }])

    return sharded.groupBy("shard_id").applyInPandas(build, schema=SA_SCHEMA)


def append_suffix_index(store, name: str, new_docs: DataFrame,
                        id_col: str = "image_id", text_col: str = "caption",
                        target_shard_bytes: int = 256 << 20) -> DataFrame:
    """Incremental SA maintenance: index an append batch as NEW shards and
    append them to the persisted stage — dupers' `up` for the search index
    (the reference re-puts only new keys into the bbolt index,
    dupe.go:941-966; here a batch adds sorted shards, never re-sorting the
    existing ones).

    Correctness is structural: a query is a fan-out over all shards with a
    union of doc hits, so (old shards ∪ batch shards) answers exactly like
    a from-scratch rebuild over (old ∪ batch) — the shard partition of the
    corpus differs, the answer set cannot. Many small appends accrete many
    small shards (query cost grows with shard count); compact by
    rebuilding when shard count ≫ volume-derived count.

    Returns the appended shard frame. The max-shard-id agg is one-row.
    """
    existing = store.read(name)
    offset = (existing.agg(F.max("shard_id")).collect()[0][0] or 0) + 1
    idx_new = build_suffix_index(new_docs, id_col, text_col,
                                 target_shard_bytes=target_shard_bytes,
                                 shard_offset=offset)
    store.append(name, idx_new)
    return idx_new


def query_suffix_index(index: DataFrame, term: str) -> DataFrame:
    """→ DataFrame(doc_id) of docs containing ``term`` — SA binary search
    per shard via mapInPandas (no full text scan).
    """
    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hits: set[str] = set()
            # per-row loop is rows == shards (one SA per shard); inside a
            # shard everything is O(|term|·log n) + vectorized numpy — a
            # term with 10⁶ occurrences costs two binary searches and one
            # searchsorted, never a per-occurrence Python walk
            for concat, sa, offsets, doc_ids in zip(
                pdf["concat"], pdf["sa"], pdf["offsets"], pdf["doc_ids"]
            ):
                sa = np.asarray(sa, dtype=np.int64)
                lo, hi = 0, len(sa)
                while lo < hi:  # lower bound of term in suffix order
                    mid = (lo + hi) // 2
                    if concat[sa[mid]: sa[mid] + len(term)] < term:
                        lo = mid + 1
                    else:
                        hi = mid
                lo2, hi2 = lo, len(sa)
                while lo2 < hi2:  # upper bound: first prefix > term
                    mid = (lo2 + hi2) // 2
                    if concat[sa[mid]: sa[mid] + len(term)] <= term:
                        lo2 = mid + 1
                    else:
                        hi2 = mid
                if lo2 > lo:
                    starts = sa[lo:lo2]
                    offs = np.asarray(offsets, dtype=np.int64)
                    idx = np.unique(np.searchsorted(offs, starts, side="right") - 1)
                    ids_arr = np.asarray(doc_ids, dtype=object)
                    hits.update(ids_arr[idx].tolist())
            yield pd.DataFrame({"doc_id": sorted(hits)})

    return index.mapInPandas(probe, schema="doc_id string")
