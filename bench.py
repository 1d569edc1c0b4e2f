#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` plus the ER pipeline
on the seeded synthetic corpus, and prints ONE JSON line:

  {"metric": "e2e_bench_sec", "value": <total>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": 0.1,
   "er_pipeline": {...pairs-scored/sec + stage stats...}}

Each query is forced end-to-end with the noop sink (full materialization, no
collect-to-driver skew). ER synthetic input is cached under /tmp keyed by
scale so repeated runs measure compute, not datagen.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "dedup_minhash_lsh_pairs",
    "dedup_ngram_jaccard_pairs",
    "er_cc_clusters",
    "dedup_simhash",
    "ann_cosine_topk",
    "ann_srp_buckets",
    "ann_srp_topk",
    "ann_ivf_topk",
    "text_fingerprint",
    "events_overlap_join",
    "spans_sentences",
    "dedup_embedding_cosine",
    "tpch_q1_agg",
    "join_star_revenue",
    "window_running_total",
    "events_hourly_window",
]

ER_SCALE = os.environ.get("BELB_BENCH_ER_SCALE", "small")


def _cpu_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — hypervisor CPU steal is the
    only in-guest signal that a co-tenant is eating the cores (guest loadavg
    cannot see it), so each query carries its steal share."""
    p = open("/proc/stat").readline().split()
    vals = list(map(int, p[1:9]))  # user nice sys idle iowait irq softirq steal
    return vals[7], sum(vals)


def run_er(spark, scale: str) -> dict:
    from belb_spark import datagen
    from belb_spark.pipeline import run_pipeline

    cfg = datagen.SCALES[scale]
    data_dir = pathlib.Path(datagen.cache_dir(scale))
    if not (data_dir / "repos.parquet").exists():
        datagen.generate_and_save(str(data_dir), cfg)
    repos = spark.read.parquet(str(data_dir / "repos.parquet"))
    syn = spark.read.parquet(str(data_dir / "synonym_dict.parquet"))
    lp = spark.read.parquet(str(data_dir / "labeled_pairs.parquet"))

    import shutil
    import tempfile

    ckpt = tempfile.mkdtemp(prefix="belb_bench_ckpt_")
    t0 = time.time()
    res = run_pipeline(spark, repos, syn, lp, checkpoint_dir=ckpt)
    wall = time.time() - t0
    shutil.rmtree(ckpt, ignore_errors=True)
    m = res.metrics
    pairs_total = m["pairs_scored"] + m["exact_dup_edges"]
    return {
        "scale": scale,
        "rows": m["rows_in"],
        "pairs_scored": m["pairs_scored"],
        "exact_dup_edges": m["exact_dup_edges"],
        "wall_sec": round(wall, 2),
        "scoring_wall_sec": round(m["scoring_wall_sec"], 2),
        "pairs_per_sec": round(pairs_total / max(wall, 1e-9), 1),
        "rows_per_sec": round(m["rows_in"] / max(wall, 1e-9), 1),
        "test_f1": m.get("eval", {}).get("test", {}).get("f1"),
    }


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import __spark_entry__ as entrymod
    from belb_spark.session import get_spark

    spark = get_spark(
        "belb_spark_bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    repeats = int(os.environ.get("BELB_BENCH_REPEATS", "2"))
    qs = entrymod.queries()
    times: dict[str, float] = {}
    loadavg: dict[str, list[float]] = {}  # 1-min loadavg before/after each
    # query, so a reviewer can separate real drift from co-tenant noise
    # without re-running (VERDICT r4 #9)
    steal: dict[str, float] = {}  # hypervisor steal % over each query window
    t_all = time.time()
    for name in BENCH_QUERIES:
        best = float("inf")
        la0 = os.getloadavg()[0]
        s0, j0 = _cpu_jiffies()
        for _ in range(repeats):  # best-of-N: damp co-tenant CPU noise
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        spark.catalog.clearCache()  # drop the ops' persisted intermediates
        times[name] = round(best, 3)
        loadavg[name] = [round(la0, 2), round(os.getloadavg()[0], 2)]
        s1, j1 = _cpu_jiffies()
        steal[name] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)

    la_er0 = os.getloadavg()[0]
    s0, j0 = _cpu_jiffies()
    er = run_er(spark, ER_SCALE)
    er["loadavg"] = [round(la_er0, 2), round(os.getloadavg()[0], 2)]
    s1, j1 = _cpu_jiffies()
    er["steal_pct"] = round(100 * (s1 - s0) / max(1, j1 - j0), 2)
    total = round(time.time() - t_all, 3)

    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None
    print(
        json.dumps(
            {
                "metric": "e2e_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "loadavg": loadavg,
                "steal_pct": steal,
                "sf": sf,
                "cpus": int(cpus),
                "er_pipeline": er,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
