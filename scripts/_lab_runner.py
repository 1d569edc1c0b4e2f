
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
