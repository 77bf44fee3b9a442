"""Phase-instrumented scaling probe: where does the wall time go at
local[LO] vs local[HI]?  Usage: python tests/scaling_probe.py <cores> <input>
Prints one JSON line with per-phase seconds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dupers_spark.operators import exact, minhash_lsh as ml  # noqa: E402
from dupers_spark.operators import multimodal as mm  # noqa: E402
from dupers_spark.operators.components import connected_components  # noqa: E402
from dupers_spark.operators.simhash import phash_near_dup_edges  # noqa: E402
from dupers_spark.session import build_session  # noqa: E402

cores = int(sys.argv[1])
inp = sys.argv[2]

spark = build_session("scaling_probe", cores=cores, shuffle_partitions=max(cores, 8))
images = spark.read.parquet(inp)

phases = {}
t_all = time.time()

def phase(name, fn):
    t0 = time.time()
    out = fn()
    phases[name] = round(time.time() - t0, 2)
    return out

n = phase("count", lambda: images.count())
features = phase("features_decode", lambda: mm.image_features(images)
                 .filter(F.col("decode_ok"))
                 .select("image_id", "phash").localCheckpoint())
sigs = phase("exact_sigs", lambda: exact.signatures(images).localCheckpoint())
exact_edges = phase("exact_edges", lambda: exact.dup_edges(sigs).localCheckpoint())
lsh_edges = phase("lsh_edges", lambda: ml.near_dup_edges(images)[0].localCheckpoint())
ph_edges = phase("phash_edges", lambda: phash_near_dup_edges(features)[0].localCheckpoint())
edges = exact_edges.unionByName(lsh_edges).unionByName(ph_edges)
assign = phase("cc", lambda: connected_components(edges).localCheckpoint())
clusters = phase("cluster_count", lambda: assign.select("component_id").distinct().count())

dt = time.time() - t_all
print(json.dumps({"cores": cores, "images": n, "clusters": clusters,
                  "total": round(dt, 2), "phases": phases,
                  "images_per_sec": round(n / dt, 1)}))
spark.stop()
