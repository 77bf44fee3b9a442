"""Per-round benchmark. Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Headline = end-to-end image dedup pipeline throughput (images/sec), plus the
operator suite over the driver tables at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS] (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from dupers_spark.operators import ann, dedup_text, exact, minhash_lsh as ml, search  # noqa: E402
from dupers_spark.operators.components import connected_components  # noqa: E402
from dupers_spark.operators.simhash import phash_near_dup_edges  # noqa: E402
from dupers_spark.session import build_session  # noqa: E402
from dupers_spark.sources import datagen  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "5000"))


def main() -> None:
    spark = build_session("dupers_spark_bench", cores=CPUS,
                          shuffle_partitions=max(CPUS, 8))
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)

    # headline: full image dedup (exact + caption LSH + phash + CC)
    def images_dedup():
        images = datagen.make_images(spark, N_IMAGES).cache()
        n = images.count()
        sigs = exact.signatures(images)
        exact_edges = exact.dup_edges(sigs)
        lsh_edges, _v, _d = ml.near_dup_edges(images)
        ph_edges, _, _ = phash_near_dup_edges(images.filter(F.length("bytes") > 0))
        edges = exact_edges.unionByName(lsh_edges).unionByName(ph_edges)
        assign = connected_components(edges)
        extras["dedup_clusters"] = assign.select("component_id").distinct().count()
        images.unpersist()
        return n

    t0 = time.time()
    n_img = images_dedup()
    dt = time.time() - t0
    timings["images_dedup_pipeline"] = round(dt, 3)
    extras["images_per_sec"] = round(n_img / dt, 1)
    extras["n_images"] = n_img

    timed("exact_dedup_docs", lambda: dedup_text.exact_dup_groups(
        docs.withColumn(
            "text", F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 2))
        )
    ).count())

    timed("minhash_lsh_docs", lambda: connected_components(
        ml.near_dup_edges(
            docs.select(F.col("doc_id").cast("string").alias("image_id"),
                        F.col("text").alias("caption"))
        )[0]
    ).count())

    timed("simhash_docs", lambda: dedup_text.simhash_table(docs).agg(
        F.sum(F.abs(F.col("simhash")) % 1000)
    ).collect())

    def suffix():
        idx = search.build_suffix_index(docs, "doc_id", "text").cache()
        idx.count()
        search.query_suffix_index(idx, "merge join").count()
        idx.unpersist()

    timed("suffix_index_build_query", suffix)

    timed("ann_topk", lambda: ann.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 16), k=10
    ).count())

    timed("lineitem_pricing", lambda: (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .collect()
    ))

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "dedup_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
