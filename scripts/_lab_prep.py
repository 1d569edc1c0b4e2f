
import pathlib, time
from belb_spark.session import get_spark
from belb_spark.pipeline import ERConfig, run_pipeline
from pyspark.sql import functions as F
spark = get_spark("lab_prep", master="local[16]", shuffle_partitions=48)
spark.sparkContext.setLogLevel("ERROR")
d = pathlib.Path('/tmp/belb_bench_data_xxl_42_v2')
repos = spark.read.parquet(str(d / "repos.parquet"))
syn = spark.read.parquet(str(d / "synonym_dict.parquet"))
lp = spark.read.parquet(str(d / "labeled_pairs.parquet"))
res = run_pipeline(spark, repos, syn, lp, checkpoint_dir='/tmp/belb_lab_ckpt_xxl',
                   cfg=ERConfig(checkpoint_mode="sync"))
# pre-keyed pairs for the carry_h variant
norm = spark.read.parquet('/tmp/belb_lab_ckpt_xxl' + "/01_normalize")
pairs = (spark.read.parquet('/tmp/belb_lab_ckpt_xxl' + "/03_candidates")
         .filter(F.col("src") == "block").select("uid_a", "uid_b"))
ha = norm.select(F.col("uid").alias("uid_a"), F.col("h").alias("h_a"))
hb = norm.select(F.col("uid").alias("uid_b"), F.col("h").alias("h_b"))
pairs.join(ha, "uid_a").join(hb, "uid_b").write.mode("overwrite").parquet(
    '/tmp/belb_lab_ckpt_xxl' + "/pairs_h")
print("PREP DONE", res.metrics["pairs_scored"])
