"""Two-parallelism scaling bench (north_rule: N vs 4N executor efficiency).

No real cluster exists in this sandbox, so — per the driver instruction —
executor scaling is evidenced by running the IDENTICAL dedup job on the
IDENTICAL on-disk input at local[8] and local[32] (cores as executor proxy)
in fresh JVMs, and reporting throughput at both plus
    eff = throughput_32 / (4 × throughput_8).

Input is generated once (deterministic, seed 42) and written to parquet;
the timed job reads it from disk — generation cost is excluded, exactly as
a cluster job would read a pre-existing Iceberg table.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "400000"))
INPUT = f"/tmp/dupers_scaling_images_{N}.parquet"

JOB = r"""
import sys, time, json
sys.path.insert(0, {repo!r})
from dupers_spark.session import build_session
from dupers_spark.operators import exact, minhash_lsh as ml
from dupers_spark.operators.simhash import phash_near_dup_edges
from dupers_spark.operators.components import connected_components
from pyspark.sql import functions as F

from dupers_spark.operators import multimodal as mm

cores = {cores}
spark = build_session("scaling_bench", cores=cores, shuffle_partitions=max(cores, 8))
images = spark.read.parquet({input!r})
t0 = time.time()
n = images.count()
# NORMAL mode (dupers re-hash semantics): decode every payload, recompute
# perceptual features — the compute-bound path a 100 TB run would take.
features = mm.image_features(images).filter(F.col("decode_ok")) \
    .select("image_id", "phash").localCheckpoint()
sigs = exact.signatures(images)
exact_edges = (exact.dup_groups(sigs)
    .select("exemplar", F.explode("members").alias("member"))
    .filter(F.col("member") != F.col("exemplar"))
    .select(F.col("member").alias("a"), F.col("exemplar").alias("b")))
lsh_edges, _v, _d = ml.near_dup_edges(images)
ph_edges, _ = phash_near_dup_edges(features)
edges = exact_edges.unionByName(lsh_edges).unionByName(ph_edges)
assign = connected_components(edges)
clusters = assign.select("component_id").distinct().count()
dt = time.time() - t0
print(json.dumps({{"cores": cores, "images": n, "clusters": clusters,
                   "seconds": round(dt, 2),
                   "images_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


REPEATS = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))


def run_job(cores: int) -> dict:
    code = JOB.format(repo=REPO, cores=cores, input=INPUT)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"scaling job at cores={cores} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def best_of(cores: int, n: int, log: list) -> dict:
    """Best-of-n: this sandbox shows heavy host CPU steal (load ≈ 8-11 with
    zero local processes), so single runs swing 2-3×. Min wall time is the
    standard steal-robust estimator; all runs are reported for honesty."""
    runs = [run_job(cores) for _ in range(n)]
    log.extend(runs)
    return min(runs, key=lambda r: r["seconds"])


def main() -> None:
    if not os.path.exists(INPUT):
        gen = f"""
import sys; sys.path.insert(0, {REPO!r})
from dupers_spark.session import build_session
from dupers_spark.sources import datagen
spark = build_session("scaling_datagen", cores=32)
datagen.make_images(spark, {N}).write.mode("overwrite").parquet({INPUT!r})
spark.stop()
"""
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", gen], capture_output=True, text=True,
                           timeout=3600)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise RuntimeError("datagen failed")
        sys.stderr.write(f"generated {N} images in {time.time()-t0:.0f}s\n")

    all_runs: list = []
    # interleave configs so host-steal episodes hit both roughly equally
    runs8, runs32 = [], []
    for _ in range(REPEATS):
        runs8.append(run_job(8))
        runs32.append(run_job(32))
    all_runs = runs8 + runs32
    r8 = min(runs8, key=lambda r: r["seconds"])
    r32 = min(runs32, key=lambda r: r["seconds"])
    eff = r32["images_per_sec"] / (4 * r8["images_per_sec"])
    result = {
        "metric": "scaling_efficiency_8_to_32_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_images": N,
        "local8": r8,
        "local32": r32,
        "all_runs": all_runs,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    clusters_match = r8["clusters"] == r32["clusters"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule requires N→4N executor scaling efficiency ≥ 0.8. No real cluster
exists in this sandbox, so (per driver instruction) the identical dedup job
ran at `local[8]` and `local[32]` on the identical on-disk input
({N} deterministic synthetic images, seed 42, parquet).

Job: read parquet → exact SHA-256 edges → caption MinHash/LSH edges →
phash Hamming-ball edges → connected components → cluster count.

| parallelism | seconds (best of {REPEATS}) | images/sec | clusters |
|---|---|---|---|
| local[8]  | {r8['seconds']} | {r8['images_per_sec']} | {r8['clusters']} |
| local[32] | {r32['seconds']} | {r32['images_per_sec']} | {r32['clusters']} |

**scaling efficiency** = throughput_32 / (4 × throughput_8) =
{r32['images_per_sec']} / (4 × {r8['images_per_sec']}) = **{eff:.3f}**

All runs (interleaved; this sandbox shows heavy host CPU steal — load ≈ 10
with zero local processes — so best-of-n wall time is used):

| cores | seconds per run |
|---|---|
| 8  | {", ".join(str(r['seconds']) for r in runs8)} |
| 32 | {", ".join(str(r['seconds']) for r in runs32)} |

Cluster counts identical across parallelism levels: **{clusters_match}**
(the determinism requirement — signatures and components are
partitioning-invariant, so the scaling run doubles as a correctness check).

Reference context (BASELINE.md): dupers' own headline numbers are single
-node anecdotes (213k files/s index-only, 4.1k files/s full re-hash); the
comparable full-pipeline number here includes decode-free signature,
near-dup banding and clustering, not just an exact-hash probe.
""")


if __name__ == "__main__":
    main()
