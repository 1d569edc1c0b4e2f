#!/usr/bin/env python
"""Stage-04 (pairwise scoring) isolation lab.

The contracted scaling metric is scored-pairs / scoring-stage wall at N vs
4N cores (BASELINE.json). This lab materializes the scoring stage's inputs
ONCE (stages 01-03 of the xxl pipeline, kept on disk) and then re-measures
stage 04 alone under controlled variants, one spark-submit per run, so a
~60 s experiment replaces a ~6 min full-pipeline run and no side-thread
QAQC jobs pollute the measured wall.

  python scripts/score_stage_lab.py prep                      # once (~3 min)
  python scripts/score_stage_lab.py run --master local[16] --variant base
  python scripts/score_stage_lab.py run --master local[4] --variant carry_h --heap 8g
  python scripts/score_stage_lab.py report

Variants:
  base     score_pairs on (uid_a, uid_b) pairs — the two uid→h joins happen
           inside the measured stage (r3 production shape)
  carry_h  pairs already carry (h_a, h_b) — the shape where stage 03 emits
           keyed pairs and stage 04 skips both uid joins
Results append to BENCH/lab_runs.jsonl with loadavg per run.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

LAB_CKPT = "/tmp/belb_lab_ckpt_xxl"

RUNNER = r"""
import json, sys, time, tempfile, shutil, pathlib
master, ckpt, variant = sys.argv[1], sys.argv[2], sys.argv[3]
batch = sys.argv[4]
from belb_spark.session import get_spark, cores_from_master
from pyspark.sql import functions as F
cores = cores_from_master(master)
extra = {}
if batch and batch != "0":
    extra["spark.sql.execution.arrow.maxRecordsPerBatch"] = batch
spark = get_spark("lab", master=master, shuffle_partitions=3 * cores, extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
d = pathlib.Path(ckpt)
norm = spark.read.parquet(str(d / "01_normalize"))
norm = norm.withColumn("norm_text", F.array_join("norm_tokens", " ")).withColumn(
    "token_set", F.array_sort(F.array_distinct("norm_tokens"))
)
from belb_spark.operators.scoring import ScoringConfig, score_pairs
cfg = ScoringConfig(hash_joins=True) if variant.endswith("_hash") else ScoringConfig()
if variant.endswith("_bucket"):
    # bucketed-table checkpoint: the pair scan reports HashPartitioning
    # (h_a, h_b) so BOTH the payload distinct and the final score join-back
    # consume it with zero exchange of the pair table (the Iceberg
    # bucket-partition story at prod scale). The catalog entry is
    # session-local; the files persist — re-register by DDL + LOCATION.
    spark.sql(
        "CREATE TABLE IF NOT EXISTS lab_pairs_hb (uid_a BIGINT, uid_b BIGINT, "
        "h_a BINARY, h_b BINARY) USING parquet "
        "CLUSTERED BY (h_a, h_b) INTO 48 BUCKETS "
        f"LOCATION '{ckpt}/pairs_h_bucketed'"
    )
    pairs = spark.table("lab_pairs_hb")
elif variant.startswith("carry_h"):
    pairs = spark.read.parquet(str(d / "pairs_h"))
else:
    pairs = (
        spark.read.parquet(str(d / "03_candidates"))
        .filter(F.col("src") == "block")
        .select("uid_a", "uid_b")
    )
out_dir = tempfile.mkdtemp(prefix="lab_scores_")
t0 = time.time()
scored = score_pairs(pairs, norm, cfg)
scored.write.mode("overwrite").parquet(out_dir)
wall = time.time() - t0
import pyarrow.parquet as pq
rows = sum(pq.ParquetFile(p).metadata.num_rows for p in pathlib.Path(out_dir).rglob("*.parquet"))
shutil.rmtree(out_dir, ignore_errors=True)
print("RESULT " + json.dumps({
    "master": master, "cores": cores, "variant": variant, "batch": batch,
    "wall_sec": round(wall, 2), "pairs_scored": rows,
    "pairs_scored_per_sec": round(rows / wall, 1),
}))
"""


def _loadavg() -> str:
    return open("/proc/loadavg").read().split()[0]


def prep() -> None:
    """Run the xxl pipeline once (16c, sync) into LAB_CKPT, then write the
    pre-keyed pairs table for the carry_h variant."""
    subprocess.run(
        ["bash", "-c", f"cd {REPO} && mkdir -p dist && rm -f dist/belb_spark.zip && zip -qr dist/belb_spark.zip belb_spark -x '*__pycache__*'"],
        check=True,
    )
    from belb_spark import datagen

    data_dir = datagen.cache_dir("xxl")
    if not pathlib.Path(f"{data_dir}/repos.parquet").exists():
        datagen.generate_and_save(data_dir, datagen.SCALES["xxl"])
    prep_code = f"""
import pathlib, time
from belb_spark.session import get_spark
from belb_spark.pipeline import ERConfig, run_pipeline
from pyspark.sql import functions as F
spark = get_spark("lab_prep", master="local[16]", shuffle_partitions=48)
spark.sparkContext.setLogLevel("ERROR")
d = pathlib.Path({data_dir!r})
repos = spark.read.parquet(str(d / "repos.parquet"))
syn = spark.read.parquet(str(d / "synonym_dict.parquet"))
lp = spark.read.parquet(str(d / "labeled_pairs.parquet"))
res = run_pipeline(spark, repos, syn, lp, checkpoint_dir={LAB_CKPT!r},
                   cfg=ERConfig(checkpoint_mode="sync"))
# pre-keyed pairs for the carry_h variant
norm = spark.read.parquet({LAB_CKPT!r} + "/01_normalize")
pairs = (spark.read.parquet({LAB_CKPT!r} + "/03_candidates")
         .filter(F.col("src") == "block").select("uid_a", "uid_b"))
ha = norm.select(F.col("uid").alias("uid_a"), F.col("h").alias("h_a"))
hb = norm.select(F.col("uid").alias("uid_b"), F.col("h").alias("h_b"))
pairs.join(ha, "uid_a").join(hb, "uid_b").write.mode("overwrite").parquet(
    {LAB_CKPT!r} + "/pairs_h")
print("PREP DONE", res.metrics["pairs_scored"])
"""
    p = REPO / "scripts" / "_lab_prep.py"
    p.write_text(prep_code)
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[16]",
         "--driver-memory", "16g",
         "--py-files", str(REPO / "dist" / "belb_spark.zip"), str(p)],
        capture_output=True, text=True, cwd="/tmp",
    )
    if "PREP DONE" not in r.stdout:
        print(r.stdout[-2000:], r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError("prep failed")
    print([l for l in r.stdout.splitlines() if "PREP DONE" in l][0])


def prep_bucket() -> None:
    """Write the pre-keyed pair table ONCE as a 48-bucket parquet table
    (bucketBy h_a, h_b) under LAB_CKPT for the carry_h_bucket variant."""
    code = f"""
import shutil
from belb_spark.session import get_spark
spark = get_spark("lab_bucket_prep", master="local[16]", shuffle_partitions=48,
                  extra_conf={{"spark.sql.warehouse.dir": "/tmp/belb_lab_wh"}})
spark.sparkContext.setLogLevel("ERROR")
shutil.rmtree({LAB_CKPT!r} + "/pairs_h_bucketed", ignore_errors=True)
spark.sql("DROP TABLE IF EXISTS lab_pairs_hb_w")
(spark.read.parquet({LAB_CKPT!r} + "/pairs_h")
 .write.bucketBy(48, "h_a", "h_b")
 .option("path", {LAB_CKPT!r} + "/pairs_h_bucketed")
 .saveAsTable("lab_pairs_hb_w"))
print("BUCKET PREP DONE")
"""
    p = REPO / "scripts" / "_lab_prep.py"
    p.write_text(code)
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[16]",
         "--driver-memory", "16g",
         "--py-files", str(REPO / "dist" / "belb_spark.zip"), str(p)],
        capture_output=True, text=True, cwd="/tmp",
    )
    if "BUCKET PREP DONE" not in r.stdout:
        print(r.stdout[-2000:], r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError("bucket prep failed")
    print("BUCKET PREP DONE")


def run(master: str, variant: str, heap: str, batch: str) -> dict:
    runner = REPO / "scripts" / "_lab_runner.py"
    runner.write_text(RUNNER)
    load_before = _loadavg()
    r = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", master,
         "--driver-memory", heap,
         "--py-files", str(REPO / "dist" / "belb_spark.zip"),
         str(runner), master, LAB_CKPT, variant, batch],
        capture_output=True, text=True, cwd="/tmp",
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(r.stdout[-2000:], r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"no RESULT from {master}")
    out = json.loads(lines[-1][len("RESULT "):])
    out["heap"] = heap
    out["load_before"] = load_before
    out["load_after"] = _loadavg()
    f = REPO / "BENCH" / "lab_runs.jsonl"
    with f.open("a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out))
    return out


def report() -> None:
    f = REPO / "BENCH" / "lab_runs.jsonl"
    rows = [json.loads(l) for l in f.read_text().splitlines() if l.strip()]
    best: dict[tuple, dict] = {}
    for r in rows:
        k = (r["variant"], r["cores"], r["heap"], r["batch"])
        if k not in best or r["wall_sec"] < best[k]["wall_sec"]:
            best[k] = r
    for k in sorted(best):
        r = best[k]
        print(f"{k}: wall={r['wall_sec']}s rate={r['pairs_scored_per_sec']}/s")


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("prep")
    sub.add_parser("prep_bucket")
    rp = sub.add_parser("run")
    rp.add_argument("--master", required=True)
    rp.add_argument("--variant", default="base",
                    choices=["base", "carry_h", "base_hash", "carry_h_hash",
                             "carry_h_bucket"])
    rp.add_argument("--heap", default="16g")
    rp.add_argument("--batch", default="0")
    sub.add_parser("report")
    args = ap.parse_args()
    if args.cmd == "prep":
        prep()
    elif args.cmd == "prep_bucket":
        prep_bucket()
    elif args.cmd == "run":
        run(args.master, args.variant, args.heap, args.batch)
    else:
        report()
    return 0


if __name__ == "__main__":
    sys.exit(main())
