
import json, sys, time, tempfile, shutil, pathlib
master, data_dir, scale = sys.argv[1], sys.argv[2], sys.argv[3]
from belb_spark.session import get_spark, cores_from_master
from belb_spark.pipeline import run_pipeline
cores = cores_from_master(master)
spark = get_spark("scaling", master=master, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
d = pathlib.Path(data_dir)
repos = spark.read.parquet(str(d / "repos.parquet"))
syn = spark.read.parquet(str(d / "synonym_dict.parquet"))
lp = spark.read.parquet(str(d / "labeled_pairs.parquet"))
ckpt = tempfile.mkdtemp(prefix="belb_scaling_ckpt_")
t0 = time.time()
res = run_pipeline(spark, repos, syn, lp, checkpoint_dir=ckpt)
wall = time.time() - t0
shutil.rmtree(ckpt, ignore_errors=True)
m = res.metrics
pairs = m["pairs_scored"] + m["exact_dup_edges"]
print("RESULT " + json.dumps({
    "master": master, "cores": cores, "wall_sec": round(wall, 2),
    "rows": m["rows_in"], "pairs": pairs,
    "pairs_per_sec": round(pairs / wall, 1),
    "rows_per_sec": round(m["rows_in"] / wall, 1),
    "test_f1": m["eval"]["test"]["f1"],
    "score_wall_sec": round(m["scoring_wall_sec"], 2),
    "pairs_scored": m["pairs_scored"],
    "pairs_scored_per_sec": round(m["pairs_scored"] / m["scoring_wall_sec"], 1),
    "stage_walls": {s["stage"]: round(s.get("wall_sec", 0), 1) for s in res.stages},
}))
